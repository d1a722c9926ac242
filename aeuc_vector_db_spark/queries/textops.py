"""Declared text-analysis + dedup queries over `documents` (E3/E4) and
embedding near-dup over `embeddings`, each with a DuckDB oracle.

The fixtures contain no natural duplicates (all 500 texts distinct, max
same-label embedding cosine 0.47), so the dedup queries plant
deterministic duplicates in-query (union with id-shifted copies) — the
same pattern import_dedup uses. Everything is exact integer arithmetic
until a final rounded division, so hashes are order-independent.

The cross-engine hash is operators.text.polyhash_col: Spark `aggregate`
and DuckDB `list_reduce` produce identical values (DuckDB's
first-element-init quirk is neutral for this fold — 0·31 + c = c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aeuc_vector_db_spark.functions.ranking import global_ranked_topk

from aeuc_vector_db_spark.operators import dedup as D
from aeuc_vector_db_spark.operators import text as TX
from aeuc_vector_db_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# DuckDB fragment builders mirroring operators/text.py
# ---------------------------------------------------------------------------

_TOKENS = "list_filter(string_split_regex(lower({t}), '[^a-z0-9]+'), x -> x <> '')"


def _dk_tokens(t: str = "text") -> str:
    return _TOKENS.format(t=t)


def _dk_polyhash(s: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, length({s})+1),"
        f" i -> CAST(ascii(substr({s}, i, 1)) AS BIGINT)),"
        f" (h, c) -> (h*31 + c) % {TX.HASH_MOD})"
    )


def _dk_shingles(toks: str, n: int = 3) -> str:
    joined = " || ' ' || ".join(f"{toks}[j+{k}]" if k else f"{toks}[j]" for k in range(n))
    # duckdb range(a, b) is half-open [a, b): last shingle start = len-n+1
    return f"list_transform(range(1, greatest(len({toks})-{n-2}, 1)), j -> {joined})"


def _dk_shingle_hashes(text: str = "text", n: int = 3) -> str:
    return f"list_distinct(list_transform({_dk_shingles(_dk_tokens(text), n)}, s -> {_dk_polyhash('s')}))"


def _dk_minhash(shset: str, k: int = 8) -> str:
    sigs = ", ".join(
        f"list_min(list_transform({shset}, h -> ({a}*h + {b}) % {TX.HASH_MOD}))"
        for a, b in TX.MINHASH_COEFFS[:k]
    )
    return f"[{sigs}]"


def _dk_jaccard(a: str, b: str) -> str:
    inter = f"len(list_filter({a}, x -> list_contains({b}, x)))"
    return f"(CAST({inter} AS DOUBLE) / CAST(len({a}) + len({b}) - {inter} AS DOUBLE))"


def _dk_lang_score(toks: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TX.LANG_PROFILES[lang])
    return f"len(list_filter({toks}, x -> list_contains([{words}], x)))"


# ---------------------------------------------------------------------------
# E4: token stats / term frequencies / TF-IDF / n-grams / language / quality
# ---------------------------------------------------------------------------

def _doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Optimization round 15: back to JVM expressions, tokens let_col-
    # bound ONCE. The pandas kernel (token_stats_pandas, kept for its
    # tests) replaced a pre-let_col HOF form that re-tokenized per
    # expression (27 s at sf0.1); with the token array bound once the
    # four folds are linear and stay in the JVM — no ArrowEvalPython
    # round-trip per collect (~0.2 s fixed on the bench substrate).
    # Measured 0.30 → 0.11 s hot at sf0.1 with the parallel spread;
    # integer-exact, so values are bit-identical (oracle-verified).
    # NULL-text semantics (ADVICE r15): this JVM form null-propagates
    # (size(NULL)=NULL, aggregate over NULL=NULL) — DELIBERATELY, to
    # match the DuckDB oracle's NULL propagation. token_stats_pandas
    # (the kept kernel twin) returns zeros for null text instead; the
    # fixtures carry no null text, so the two agree on every fixture
    # row but differ on dirty corpora — prefer this form.
    from aeuc_vector_db_spark.sources.tables import ensure_min_parallelism

    docs = ensure_min_parallelism(load_table(spark, "documents", sf_dir))

    def stats(toks: F.Column) -> F.Column:
        n = F.size(toks)
        total_len = F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t).cast("long")
        )
        est_bpe = F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda a, t: a + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
        )
        return F.struct(
            n.cast("long").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
            total_len.alias("total_len"),
            est_bpe.alias("est_bpe_tokens"),
        )

    st = docs.select(
        "doc_id", TX.let_col(TX.tokens_col("text"), stats).alias("st")
    )
    return st.select(
        "doc_id",
        F.col("st.n_tokens").alias("n_tokens"),
        F.col("st.n_distinct").alias("n_distinct"),
        F.round(
            F.col("st.total_len").cast("double") / F.col("st.n_tokens").cast("double"), 6
        ).alias("avg_token_len"),
        F.col("st.est_bpe_tokens").alias("est_bpe_tokens"),
    )


_TOKEN_STATS_ORACLE = f"""
WITH t AS (SELECT doc_id, {_dk_tokens()} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       ROUND(CAST(list_reduce(list_transform(toks, x -> CAST(length(x) AS BIGINT)),
                              (a, b) -> a + b) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE), 6) AS avg_token_len,
       CAST(list_reduce(list_transform(toks, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)),
                        (a, b) -> a + b) AS BIGINT) AS est_bpe_tokens
FROM t
"""


def _doc_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(F.explode(TX.tokens_col("text")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = global_ranked_topk(
        counts, [F.col("cnt").desc(), F.col("token").asc()], 50
    )
    return ranked.select("token", "cnt", "rank")


_TERM_FREQ_ORACLE = f"""
WITH tok AS (SELECT unnest({_dk_tokens()}) AS token FROM documents),
counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
ranked AS (
  SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank FROM counts
)
SELECT token, cnt, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 50
"""


def _doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(TX.tokens_col("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        (
            F.log((F.col("n_docs").cast("double") + F.lit(1.0)) / (F.col("df").cast("double") + F.lit(1.0)))
            + F.lit(1.0)
        ).alias("idf"),
    )
    scored = tf.join(F.broadcast(idf), "token").select(
        "doc_id", "token", (F.col("tf").cast("double") * F.col("idf")).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.filter(F.col("doc_id") < 50)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", F.round("score", 9).alias("score"),
                F.col("rank").cast("long").alias("rank"))
    )


_TFIDF_ORACLE = f"""
WITH tok AS (SELECT doc_id, unnest({_dk_tokens()}) AS token FROM documents),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
idf AS (
  SELECT token, ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0 AS idf
  FROM dfreq CROSS JOIN n
),
scored AS (
  SELECT doc_id, tf.token, CAST(tf AS DOUBLE) * idf AS score
  FROM tf JOIN idf ON tf.token = idf.token WHERE doc_id < 50
),
ranked AS (
  SELECT doc_id, token, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
  FROM scored
)
SELECT doc_id, token, ROUND(score, 9) AS score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
"""


def _doc_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    grams = docs.select(
        F.explode(TX.shingles_col(TX.tokens_col("text"), n=2)).alias("bigram")
    )
    counts = grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = global_ranked_topk(
        counts, [F.col("cnt").desc(), F.col("bigram").asc()], 20
    )
    return ranked.select("bigram", "cnt", "rank")


_BIGRAM_ORACLE = f"""
WITH g AS (
  SELECT unnest({_dk_shingles(_dk_tokens(), 2)}) AS bigram FROM documents
),
counts AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY bigram),
ranked AS (
  SELECT bigram, cnt, row_number() OVER (ORDER BY cnt DESC, bigram ASC) AS rank FROM counts
)
SELECT bigram, cnt, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 20
"""


def _doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", "lang", TX.language_id_pandas()(F.col("text")).alias("lang_pred")
    )


# Tie-break must match language_id_col: (score desc, lang asc) — the CASE
# chain tests languages in ascending code order with >= comparisons.
_LANG_ORACLE = f"""
WITH t AS (SELECT doc_id, lang, {_dk_tokens()} AS toks FROM documents),
s AS (
  SELECT doc_id, lang,
         {_dk_lang_score('toks', 'de')} AS s_de,
         {_dk_lang_score('toks', 'en')} AS s_en,
         {_dk_lang_score('toks', 'es')} AS s_es,
         {_dk_lang_score('toks', 'fr')} AS s_fr
  FROM t
)
SELECT doc_id, lang,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM s
"""


def _doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(TX.tokens_col("text")).cast("long").alias("n_tokens"),
        F.round(TX.quality_score_col("text"), 9).alias("quality"),
    )


_SW = ", ".join(f"'{w}'" for w in TX.STOPWORDS)
_QUALITY_ORACLE = f"""
WITH t AS (SELECT doc_id, {_dk_tokens()} AS toks FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, x -> list_contains([{_SW}], x))) AS DOUBLE) AS sw,
         CAST(list_reduce(list_transform(toks, x -> CAST(length(x) AS BIGINT)),
                          (a, b) -> a + b) AS DOUBLE) AS total_len
  FROM t
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       ROUND(0.4 * least(n / 100.0, 1.0)
           + 0.3 * least((sw / n) / 0.1, 1.0)
           + 0.3 * greatest(0.0, 1.0 - abs(total_len / n - 5.0) / 5.0), 9) AS quality
FROM m
"""


def _doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    norm = F.concat_ws(" ", TX.tokens_col("text"))
    return docs.select("doc_id", TX.polyhash_col(norm).alias("fingerprint"))


_FINGERPRINT_ORACLE = f"""
WITH t AS (SELECT doc_id, array_to_string({_dk_tokens()}, ' ') AS norm FROM documents)
SELECT doc_id, {_dk_polyhash('norm')} AS fingerprint FROM t
"""


def _doc_simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", TX.simhash16_col(TX.tokens_col("text")).alias("simhash"))


_SIMHASH_ORACLE = f"""
WITH t AS (SELECT doc_id, {_dk_tokens()} AS toks FROM documents),
h AS (SELECT doc_id, list_transform(toks, s -> {_dk_polyhash('s')}) AS th FROM t)
SELECT doc_id,
       CAST(list_reduce(list_transform(range(0, 16), b ->
         CASE WHEN list_reduce(
                list_transform(th, h ->
                  2 * (CAST(floor(h / CAST(pow(2, b) AS DOUBLE)) AS BIGINT) % 2) - 1),
                (x, y) -> x + y) > 0
              THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END),
         (x, y) -> x + y) AS BIGINT) AS simhash
FROM h
"""


# ---------------------------------------------------------------------------
# E3: dedup — planted duplicates (fixtures have none), then the real ops
# ---------------------------------------------------------------------------

def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies (doc_id % 5 = 0) shifted by +100000."""
    docs = load_table(spark, "documents", sf_dir)
    copies = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return docs.unionByName(copies)


_DUP_CORPUS_SQL = """
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 5 = 0
"""


def _doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    groups = D.exact_dedup(_dup_corpus(spark, sf_dir))
    return groups.filter(F.col("dup_count") > 1).select(
        F.col("doc_id").alias("keeper_id"), "dup_count"
    )


_EXACT_DEDUP_ORACLE = f"""
WITH corpus AS ({_DUP_CORPUS_SQL})
SELECT CAST(MIN(doc_id) AS BIGINT) AS keeper_id, CAST(COUNT(*) AS BIGINT) AS dup_count
FROM corpus GROUP BY sha256(text) HAVING COUNT(*) > 1
"""


def _near_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ near-dup copies: doc_id % 10 = 0, last 20 chars cut.

    The corpus is `ensure_min_parallelism`-spread (optimization round
    15): every consumer of this union runs a compute-heavy map stage
    over it (shingle hashing, window explode+xxhash64, MinHash
    signatures), and the single-file fixture scan otherwise serializes
    that work on 1-2 tasks (doc_substring_dedup measured 5.9 s noop at
    sf0.1 with the whole window fan-out on one core). Row set is
    unchanged; at real scale the guard no-ops."""
    docs = load_table(spark, "documents", sf_dir)
    copies = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.expr("substring(text, 1, length(text) - 20)"))
    )
    from aeuc_vector_db_spark.sources.tables import ensure_min_parallelism

    return ensure_min_parallelism(docs.unionByName(copies))


_NEAR_DUP_CORPUS_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substr(text, 1, length(text) - 20) AS text
  FROM documents WHERE doc_id % 10 = 0
"""


def _doc_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = D.minhash_near_dup(
        _near_dup_corpus(spark, sf_dir), threshold=0.5, k=8, band_size=2, shingle_n=3
    )
    return pairs.select("a_id", "b_id", F.round("jaccard", 9).alias("jaccard"))


_MINHASH_ORACLE = f"""
WITH corpus AS ({_NEAR_DUP_CORPUS_SQL}),
sh AS (
  SELECT doc_id, {_dk_shingle_hashes('text', 3)} AS shset FROM corpus
),
sig AS (
  SELECT doc_id, shset, {_dk_minhash('shset', 8)} AS sig FROM sh WHERE len(shset) > 0
),
bands AS (
  SELECT doc_id, 0 AS band, sig[1] AS v1, sig[2] AS v2 FROM sig
  UNION ALL SELECT doc_id, 1, sig[3], sig[4] FROM sig
  UNION ALL SELECT doc_id, 2, sig[5], sig[6] FROM sig
  UNION ALL SELECT doc_id, 3, sig[7], sig[8] FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id
),
verified AS (
  SELECT a_id, b_id, {_dk_jaccard('sa.shset', 'sb.shset')} AS jaccard
  FROM cand
  JOIN sh sa ON sa.doc_id = a_id
  JOIN sh sb ON sb.doc_id = b_id
)
SELECT a_id, b_id, ROUND(jaccard, 9) AS jaccard FROM verified WHERE jaccard >= 0.5
"""


def _doc_incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup against a persisted index (round 11):
    the corpus (80% of the near-dup corpus) is folded into a
    `minhash_doc_index` (id, sig, sh) and MATERIALIZED (eager
    localCheckpoint — standing in for the parquet/ManifestTable a
    deployment persists); the 20% batch then dedups against corpus ∪
    batch with the corpus's band rows derived map-side from the stored
    signatures and its Jaccard verification served from the stored
    shingle sets — the corpus text is never re-shingled (plan-gated:
    exactly one Arrow shingle kernel, corpus side reads the
    materialized RDD). The oracle recomputes the SAME pairs
    non-incrementally (full cand/verify, filtered to pairs touching
    the batch), so the hash match proves the incremental plan loses
    nothing."""
    full = _near_dup_corpus(spark, sf_dir)
    is_batch = (F.col("doc_id") % 100000) % 5 == 0
    index = D.minhash_doc_index(full.filter(~is_batch)).localCheckpoint(
        eager=True
    )
    pairs = D.incremental_minhash_near_dup(
        full.filter(is_batch), index, threshold=0.5, k=8, band_size=2,
        shingle_n=3,
    )
    return pairs.select("a_id", "b_id", F.round("jaccard", 9).alias("jaccard"))


def _doc_incremental_minhash_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-12 bucketed serve path (VERDICT r11 #1): same
    corpus/batch split and the SAME oracle as
    `doc_incremental_minhash_dedup`, but the corpus band rows come from
    a catalog table bucketed on bkey (`write_minhash_band_table`) —
    the static-side-pre-bucketed join where only the batch side
    shuffles. The hash match against the full-recompute oracle proves
    the bucketed plan loses nothing; the corpus-side Exchange-free
    property is plan-gated in test_bucketed_join.py and soaked at 200k
    docs in tools/soak_incremental_dedup_bucketed.py."""
    full = _near_dup_corpus(spark, sf_dir)
    is_batch = (F.col("doc_id") % 100000) % 5 == 0
    index = D.minhash_doc_index(full.filter(~is_batch)).localCheckpoint(
        eager=True
    )
    table = "q_minhash_bands"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous SESSION's managed-table directory can survive with no
    # catalog entry (in-memory catalog, on-disk warehouse) and then
    # fail the write with LOCATION_ALREADY_EXISTS — clear the orphan
    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(os.path.join(wh.path or wh.geturl(), table), ignore_errors=True)
    D.write_minhash_band_table(index, table, n_buckets=16)
    pairs = D.incremental_minhash_near_dup_bucketed(
        full.filter(is_batch), index, table, threshold=0.5, k=8,
        band_size=2, shingle_n=3,
    )
    return pairs.select("a_id", "b_id", F.round("jaccard", 9).alias("jaccard"))


_INCREMENTAL_MINHASH_ORACLE = f"""
WITH corpus AS ({_NEAR_DUP_CORPUS_SQL}),
sh AS (
  SELECT doc_id, {_dk_shingle_hashes('text', 3)} AS shset FROM corpus
),
sig AS (
  SELECT doc_id, shset, {_dk_minhash('shset', 8)} AS sig FROM sh WHERE len(shset) > 0
),
bands AS (
  SELECT doc_id, 0 AS band, sig[1] AS v1, sig[2] AS v2 FROM sig
  UNION ALL SELECT doc_id, 1, sig[3], sig[4] FROM sig
  UNION ALL SELECT doc_id, 2, sig[5], sig[6] FROM sig
  UNION ALL SELECT doc_id, 3, sig[7], sig[8] FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id
),
verified AS (
  SELECT a_id, b_id, {_dk_jaccard('sa.shset', 'sb.shset')} AS jaccard
  FROM cand
  JOIN sh sa ON sa.doc_id = a_id
  JOIN sh sb ON sb.doc_id = b_id
)
SELECT a_id, b_id, ROUND(jaccard, 9) AS jaccard FROM verified
WHERE jaccard >= 0.5
  AND ((a_id % 100000) % 5 = 0 OR (b_id % 100000) % 5 = 0)
"""


def _doc_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate generation with the hot-band cap (max_band_size=4):
    band buckets holding more than 4 docs are excluded from pair
    generation (boilerplate guard — the skew story of dedup.py, here
    oracle-checked end to end)."""
    cands = D.minhash_candidates(
        _near_dup_corpus(spark, sf_dir), k=8, band_size=2, shingle_n=3,
        max_band_size=4,
    )
    return cands.select("a_id", "b_id")


_MINHASH_CAPPED_ORACLE = f"""
WITH corpus AS ({_NEAR_DUP_CORPUS_SQL}),
sh AS (
  SELECT doc_id, {_dk_shingle_hashes('text', 3)} AS shset FROM corpus
),
sig AS (
  SELECT doc_id, shset, {_dk_minhash('shset', 8)} AS sig FROM sh WHERE len(shset) > 0
),
bands AS (
  SELECT doc_id, 0 AS band, sig[1] AS v1, sig[2] AS v2 FROM sig
  UNION ALL SELECT doc_id, 1, sig[3], sig[4] FROM sig
  UNION ALL SELECT doc_id, 2, sig[5], sig[6] FROM sig
  UNION ALL SELECT doc_id, 3, sig[7], sig[8] FROM sig
),
ok AS (
  SELECT band, v1, v2 FROM bands GROUP BY band, v1, v2 HAVING COUNT(*) <= 4
),
capped AS (
  SELECT bands.doc_id, bands.band, bands.v1, bands.v2
  FROM bands JOIN ok ON bands.band = ok.band AND bands.v1 = ok.v1 AND bands.v2 = ok.v2
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
FROM capped a JOIN capped b
  ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id
"""


def _doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = D.ngram_jaccard_pairs(
        _near_dup_corpus(spark, sf_dir).withColumn("block", F.col("doc_id") % 100000 % 50),
        block_col="block",
        threshold=0.6,
        shingle_n=2,
    )
    return pairs.select(
        F.col("block").cast("long").alias("block"), "a_id", "b_id",
        F.round("jaccard", 9).alias("jaccard"),
    )


_NGRAM_JACCARD_ORACLE = f"""
WITH corpus AS ({_NEAR_DUP_CORPUS_SQL}),
sh AS (
  SELECT doc_id % 100000 % 50 AS block, doc_id, {_dk_shingle_hashes('text', 2)} AS shset
  FROM corpus
),
pairs AS (
  SELECT a.block, a.doc_id AS a_id, b.doc_id AS b_id,
         {_dk_jaccard('a.shset', 'b.shset')} AS jaccard
  FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
)
SELECT CAST(block AS BIGINT) AS block, a_id, b_id, ROUND(jaccard, 9) AS jaccard
FROM pairs WHERE jaccard >= 0.6
"""


def _emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    copies = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    pairs = D.embedding_near_dup(emb.unionByName(copies), threshold=0.99)
    return pairs.select(
        F.col("block").cast("long").alias("label"), "a_id", "b_id",
        F.round("cos", 9).alias("cos"),
    )


_EMB_NEAR_DUP_ORACLE = """
WITH corpus AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id % 25 = 0
),
pairs AS (
  SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
         list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]), (s, x) -> s + x)
         / (sqrt(list_reduce(list_transform(a.v, x -> x*x), (s, x) -> s + x))
            * sqrt(list_reduce(list_transform(b.v, x -> x*x), (s, x) -> s + x)) + 1e-12) AS cos
  FROM corpus a JOIN corpus b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT CAST(label AS BIGINT) AS label, a_id, b_id, ROUND(cos, 9) AS cos
FROM pairs WHERE cos >= 0.99
"""


def _emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep-one over LABEL cells — the SQL-expressible twin of
    the learned-cells operator (`dedup.py semantic_dedup`, Abbas et al.
    2023): within-cell cosine pairs ≥ 0.99 → connected components →
    min-id representative. Planted exact copies (vec_id%25, shifted ids)
    must collapse onto their originals. Oracle: the same pair set plus a
    RECURSIVE-CTE transitive closure in DuckDB — a cross-engine
    connected-components equivalence check in embedding space."""
    emb = load_table(spark, "embeddings", sf_dir)
    copies = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    res = D.semantic_dedup(
        emb.unionByName(copies), threshold=0.99, cell_col="label", engine="sql"
    )
    return res.select("keeper_id", F.col("doc_id").alias("vec_id"), "keep")


_SEMANTIC_DEDUP_ORACLE = """
WITH RECURSIVE corpus AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id % 25 = 0
),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM corpus a JOIN corpus b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]), (s, x) -> s + x)
        / (sqrt(list_reduce(list_transform(a.v, x -> x*x), (s, x) -> s + x))
           * sqrt(list_reduce(list_transform(b.v, x -> x*x), (s, x) -> s + x)) + 1e-12)
        >= 0.99
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT component AS keeper_id, node AS vec_id, node = component AS keep
FROM comp
"""


def _emb_semantic_dedup_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with LEARNED cells (k=8 bounded-sample k-means + Arrow
    argmin assignment) — the 100 TB path. The k-means fit is not
    SQL-expressible, so this is rows-only like `ann_*_recall`;
    `test_dedup.py` pins that exact duplicates always collapse
    (identical vectors co-locate deterministically)."""
    emb = load_table(spark, "embeddings", sf_dir)
    copies = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    res = D.semantic_dedup(emb.unionByName(copies), k=8, threshold=0.99)
    out = res.select("keeper_id", F.col("doc_id").alias("vec_id"), "keep")
    # self-validation (VERDICT r8 #4): every planted exact copy must
    # collapse onto its original — copy rows with keep=true or a wrong
    # keeper, original rows not kept, or copies MISSING from the dup
    # clusters entirely, all ride out as violation rows (keeper_id=-1,
    # keep=NULL), flipping the driver-visible count on any regression.
    bad_copy = out.filter(
        (F.col("vec_id") >= 100000)
        & (F.col("keep") | (F.col("keeper_id") != F.col("vec_id") - 100000))
    )
    bad_orig = out.filter((F.col("vec_id") < 100000) & (~F.col("keep")))
    missing = (
        emb.filter(F.col("vec_id") % 25 == 0)
        .select((F.col("vec_id") + 100000).alias("vec_id"))
        .join(out, "vec_id", "left_anti")
    )
    viol = (
        bad_copy.select("vec_id")
        .unionByName(bad_orig.select("vec_id"))
        .unionByName(missing.select("vec_id"))
        .select(
            F.lit(-1).cast("long").alias("keeper_id"),
            "vec_id",
            F.lit(None).cast("boolean").alias("keep"),
        )
    )
    return out.unionByName(viol).orderBy("keeper_id", "vec_id")


def _emb_cell_assign_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVE half of SemDeDup-with-learned-cells, hash-matched
    (VERDICT r14 #1): `assign_centroids` — the exact NumPy argmin
    kernel `semantic_dedup` assigns with — driven by LITERAL dyadic
    centroids (`literal_centroids`) over dyadic-quantized embeddings
    (`quantize_dyadic_col`), so ‖c‖² − 2x·c is computed over exact
    dyadic rationals and the BLAS argmin equals a DuckDB ORDER BY
    d2, cid argmin bit-for-bit. The within-cell pair scoring + keep-one
    closure then run on the RAW embeddings through the same
    `semantic_dedup(engine='sql')` path the keep_one twin pins.
    Training (the k-means fit) stays rows-only in
    emb_semantic_dedup_learned by necessity; this pins everything else.
    Output: one row per corpus vector (planted copies included) with
    its cell and keeper/keep; rows in no ≥0.99 dup cluster are their
    own keeper (keep_one leaves them untouched ⇒ kept), which also
    keeps every column non-null — the driver's value canon stringifies
    a Spark null and a DuckDB NaN differently."""
    from aeuc_vector_db_spark.functions.vector import quantize_dyadic_col
    from aeuc_vector_db_spark.operators.ann import (
        assign_centroids,
        literal_centroids,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    copies = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(copies)
    quant = corpus.select(
        "vec_id", quantize_dyadic_col("embedding").alias("qv")
    )
    cells = assign_centroids(quant, literal_centroids(16, 64), vec_col="qv")
    blocked = corpus.join(cells, "vec_id")
    dup = D.semantic_dedup(
        blocked, threshold=0.99, cell_col="centroid_id", engine="sql"
    ).withColumnRenamed("doc_id", "vec_id")
    return (
        cells.join(dup, "vec_id", "left")
        .select(
            "vec_id",
            F.col("centroid_id").cast("int").alias("centroid_id"),
            F.coalesce(F.col("keeper_id"), F.col("vec_id"))
            .cast("long")
            .alias("keeper_id"),
            F.coalesce(F.col("keep"), F.lit(True)).alias("keep"),
        )
        .orderBy("vec_id")
    )


def _cell_assign_literal_oracle() -> str:
    from aeuc_vector_db_spark.operators.ann import literal_centroids

    cents = literal_centroids(16, 64)
    cent_rows = ", ".join(
        f"({cid}, [{', '.join(repr(x) for x in vec)}]::DOUBLE[])"
        for cid, vec in cents
    )
    dot = (
        "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1]*p[2]),"
        " (s, x) -> s + x)"
    )
    return f"""
WITH RECURSIVE corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id % 25 = 0
),
quant AS (
  SELECT vec_id, list_transform(v, x -> floor(x*64 + 0.5)/64) AS qv FROM corpus
),
cents(cid, cv) AS (VALUES {cent_rows}),
csq AS (SELECT cid, cv, {dot.format(a='cv', b='cv')} AS c2 FROM cents),
asn AS (
  SELECT vec_id, cid FROM (
    SELECT quant.vec_id, csq.cid,
           row_number() OVER (
             PARTITION BY quant.vec_id
             ORDER BY csq.c2 - 2 * {dot.format(a='quant.qv', b='csq.cv')} ASC,
                      csq.cid ASC
           ) AS rn
    FROM quant CROSS JOIN csq
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM (SELECT c.vec_id, c.v, asn.cid FROM corpus c JOIN asn ON c.vec_id = asn.vec_id) a
  JOIN (SELECT c.vec_id, c.v, asn.cid FROM corpus c JOIN asn ON c.vec_id = asn.vec_id) b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {dot.format(a='a.v', b='b.v')}
        / (sqrt({dot.format(a='a.v', b='a.v')})
           * sqrt({dot.format(a='b.v', b='b.v')}) + 1e-12)
        >= 0.99
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT asn.vec_id,
       CAST(asn.cid AS INTEGER) AS centroid_id,
       CAST(coalesce(comp.component, asn.vec_id) AS BIGINT) AS keeper_id,
       coalesce(comp.node = comp.component, TRUE) AS keep
FROM asn LEFT JOIN comp ON asn.vec_id = comp.node
"""


def _doc_dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 end-to-end: minhash pairs → connected components → keep-one.
    Output: one row per duplicate-cluster member with its keeper."""
    pairs = D.minhash_near_dup(
        _near_dup_corpus(spark, sf_dir), threshold=0.5, k=8, band_size=2, shingle_n=3
    )
    return D.keep_one(pairs).orderBy("keeper_id", "doc_id")


# Transitive closure via recursive CTE over the same verified pair set:
# component id = min reachable doc_id (UNION dedups, so the recursion
# terminates at the closure).
_KEEP_ONE_ORACLE = f"""
WITH RECURSIVE corpus AS ({_NEAR_DUP_CORPUS_SQL}),
sh AS MATERIALIZED (
  SELECT doc_id, {_dk_shingle_hashes('text', 3)} AS shset FROM corpus
),
sig AS (
  SELECT doc_id, shset, {_dk_minhash('shset', 8)} AS sig FROM sh WHERE len(shset) > 0
),
bands AS (
  SELECT doc_id, 0 AS band, sig[1] AS v1, sig[2] AS v2 FROM sig
  UNION ALL SELECT doc_id, 1, sig[3], sig[4] FROM sig
  UNION ALL SELECT doc_id, 2, sig[5], sig[6] FROM sig
  UNION ALL SELECT doc_id, 3, sig[7], sig[8] FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id
),
pairs AS MATERIALIZED (
  SELECT a_id, b_id FROM (
    SELECT a_id, b_id, {_dk_jaccard('sa.shset', 'sb.shset')} AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = a_id
    JOIN sh sb ON sb.doc_id = b_id
  ) WHERE jaccard >= 0.5
),
reach(src, dst) AS (
  SELECT a_id, a_id FROM pairs
  UNION SELECT b_id, b_id FROM pairs
  UNION
  SELECT r.src, CASE WHEN p.a_id = r.dst THEN p.b_id ELSE p.a_id END
  FROM reach r JOIN pairs p ON r.dst = p.a_id OR r.dst = p.b_id
)
SELECT MIN(dst) AS keeper_id, src AS doc_id, (src = MIN(dst)) AS keep
FROM reach GROUP BY src
"""


def _doc_clean_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone: the training-data prep pipeline as one plan —
    near-dup removal (minhash → components → drop non-keepers) then
    quality filtering, reporting per-language corpus accounting.
    Every stage is the operator the dedicated queries already check;
    this pins their composition."""
    corpus = _near_dup_corpus(spark, sf_dir)  # documents ∪ planted copies
    pairs = D.minhash_near_dup(corpus, threshold=0.5, k=8, band_size=2, shingle_n=3)
    drops = D.keep_one(pairs).filter(~F.col("keep")).select("doc_id")
    with_q = corpus.withColumn("q", TX.quality_score_col("text"))
    deduped = with_q.join(drops, "doc_id", "left_anti")
    clean = deduped.filter(F.col("q") >= 0.5)
    return (
        with_q.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_input"))
        .join(
            deduped.groupBy("lang").agg(F.count(F.lit(1)).alias("n_deduped")), "lang"
        )
        .join(
            clean.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n_clean"),
                # decimal sum: partition-order-independent (q doubles are
                # bit-identical cross-engine, so the cast agrees too)
                F.round(
                    F.sum(F.col("q").cast("decimal(28,15)")).cast("double"), 9
                ).alias("sum_quality"),
            ),
            "lang",
        )
        .select("lang", "n_input", "n_deduped", "n_clean", "sum_quality")
    )


_CLEAN_PIPELINE_ORACLE = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substr(text, 1, length(text) - 20) AS text, lang
  FROM documents WHERE doc_id % 10 = 0
),
sh AS MATERIALIZED (
  SELECT doc_id, {_dk_shingle_hashes('text', 3)} AS shset FROM corpus
),
sig AS (
  SELECT doc_id, shset, {_dk_minhash('shset', 8)} AS sig FROM sh WHERE len(shset) > 0
),
bands AS (
  SELECT doc_id, 0 AS band, sig[1] AS v1, sig[2] AS v2 FROM sig
  UNION ALL SELECT doc_id, 1, sig[3], sig[4] FROM sig
  UNION ALL SELECT doc_id, 2, sig[5], sig[6] FROM sig
  UNION ALL SELECT doc_id, 3, sig[7], sig[8] FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id
),
pairs AS MATERIALIZED (
  SELECT a_id, b_id FROM (
    SELECT a_id, b_id, {_dk_jaccard('sa.shset', 'sb.shset')} AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = a_id
    JOIN sh sb ON sb.doc_id = b_id
  ) WHERE jaccard >= 0.5
),
reach(src, dst) AS (
  SELECT a_id, a_id FROM pairs
  UNION SELECT b_id, b_id FROM pairs
  UNION
  SELECT r.src, CASE WHEN p.a_id = r.dst THEN p.b_id ELSE p.a_id END
  FROM reach r JOIN pairs p ON r.dst = p.a_id OR r.dst = p.b_id
),
drops AS (
  SELECT src AS doc_id FROM reach GROUP BY src HAVING src <> MIN(dst)
),
q AS (
  SELECT doc_id, lang,
         0.4 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
       + 0.3 * least((CAST(len(list_filter(toks, x -> list_contains([{_SW}], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE)) / 0.1, 1.0)
       + 0.3 * greatest(0.0, 1.0 - abs(
             CAST(list_reduce(list_transform(toks, x -> CAST(length(x) AS BIGINT)),
                              (a, b) -> a + b) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) - 5.0) / 5.0) AS q
  FROM (SELECT doc_id, lang, {_dk_tokens()} AS toks FROM corpus)
),
deduped AS (SELECT * FROM q ANTI JOIN drops USING (doc_id)),
clean AS (SELECT * FROM deduped WHERE q >= 0.5)
SELECT q.lang,
       CAST(COUNT(*) AS BIGINT) AS n_input,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deduped d WHERE d.lang = q.lang) AS n_deduped,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM clean c WHERE c.lang = q.lang) AS n_clean,
       (SELECT ROUND(CAST(SUM(CAST(c.q AS DECIMAL(28,15))) AS DOUBLE), 9) FROM clean c WHERE c.lang = q.lang) AS sum_quality
FROM q GROUP BY q.lang
"""


# ---------------------------------------------------------------------------
# Heavy hitters (exact two-phase: partition-local candidates → recount)
# ---------------------------------------------------------------------------

def _doc_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms with global count ≥ 200 via the two-phase exact heavy-hitter
    operator (operators/sketch.py): partition-local candidate generation
    (pigeonhole superset, no shuffle of the token tail) then a broadcast
    recount of candidates only. The oracle is the plain
    tokens→GROUP BY→HAVING formulation — phase structure must be
    invisible in the result."""
    from aeuc_vector_db_spark.operators.sketch import heavy_hitter_terms

    docs = load_table(spark, "documents", sf_dir)
    return heavy_hitter_terms(docs, min_count=200).select(
        "term", F.col("term_count").cast("long").alias("term_count")
    )


_HEAVY_HITTERS_ORACLE = f"""
WITH tok AS (SELECT unnest({_dk_tokens()}) AS term FROM documents)
SELECT term, CAST(COUNT(*) AS BIGINT) AS term_count
FROM tok GROUP BY term HAVING COUNT(*) >= 200
"""


# ---------------------------------------------------------------------------
# Unigram LM quality score (perplexity-style filter, self-scored corpus)
# ---------------------------------------------------------------------------

def _doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average unigram log-prob per doc under the corpus's own unigram
    distribution; the per-doc fold runs in sorted term order on BOTH
    engines, so only per-term ln() ulps can differ — absorbed by the
    9 dp round (same tolerance argument as doc_tfidf_topk)."""
    docs = load_table(spark, "documents", sf_dir)
    out = TX.unigram_logprob(docs)
    return out.select(
        "doc_id", F.round("avg_logp", 9).alias("avg_logp"), "n_tokens"
    )


_UNIGRAM_LOGPROB_ORACLE = f"""
WITH tok AS (SELECT doc_id, unnest({_dk_tokens()}) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY term),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok),
lp AS (
  SELECT term, ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) AS logp
  FROM c CROSS JOIN tot
),
contrib AS (
  SELECT doc_id, tf.term, CAST(tf AS DOUBLE) * logp AS cterm, tf
  FROM tf JOIN lp ON tf.term = lp.term
),
agg AS (
  SELECT doc_id, list(cterm ORDER BY term) AS cl, SUM(tf) AS n_tokens
  FROM contrib GROUP BY doc_id
)
SELECT doc_id,
       ROUND(list_reduce(cl, (a, b) -> a + b) / CAST(n_tokens AS DOUBLE), 9)
         AS avg_logp,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM agg
"""


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (E4 applied as search)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("hash", "stream", "vector")
_BM25_K1, _BM25_B = 1.2, 0.75


def _doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for a fixed 3-term query. The per-doc score
    folds term contributions in sorted term order on BOTH engines
    (the unigram_logprob determinism trick); avglen comes from an
    exact integer sum, so only per-term ln() ulps can differ —
    absorbed by the 9 dp round."""
    docs = load_table(spark, "documents", sf_dir)
    out = TX.bm25_topk(
        docs, list(_BM25_TERMS), top_k=10, k1=_BM25_K1, b=_BM25_B
    )
    return out.select(
        "doc_id", F.round("score", 9).alias("score"), "n_matched", "rank"
    )


def _doc_bm25_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same BM25 query served from the MATERIALIZED inverted index
    (operators/textindex.py): build postings/doclens/stats tables from
    half the corpus, incrementally append the other half, then rank —
    sharing `doc_bm25_topk`'s oracle pins that the indexed path (incl.
    the additive stats fold across the refresh) is bit-identical to
    the corpus-scan path."""
    import tempfile

    from aeuc_vector_db_spark.operators.textindex import TextIndex

    docs = load_table(spark, "documents", sf_dir)
    root = tempfile.mkdtemp(prefix="aeuc_textindex_")
    idx = TextIndex.build(spark, docs.filter(F.col("doc_id") % 2 == 0), root)
    idx.append_docs(spark, docs.filter(F.col("doc_id") % 2 == 1))
    out = idx.bm25_topk(spark, list(_BM25_TERMS), top_k=10, k1=_BM25_K1, b=_BM25_B)
    return out.select(
        "doc_id", F.round("score", 9).alias("score"), "n_matched", "rank"
    )


_BM25_ORACLE = f"""
WITH tok AS (SELECT doc_id, unnest({_dk_tokens()}) AS term FROM documents),
dlen AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen FROM tok GROUP BY doc_id),
stats AS (
  SELECT CAST(SUM(dlen) AS BIGINT) AS tok_total,
         CAST(COUNT(*) AS BIGINT) AS docs_with_tokens
  FROM dlen
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
tfq AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfq GROUP BY term),
idf AS (
  SELECT term,
         ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5)) AS idf
  FROM dfreq CROSS JOIN n
),
contrib AS (
  SELECT tfq.doc_id, tfq.term,
         idf * (CAST(tf AS DOUBLE) * ({_BM25_K1} + 1.0))
             / (CAST(tf AS DOUBLE)
                + {_BM25_K1} * ((1.0 - {_BM25_B})
                   + {_BM25_B} * CAST(dlen AS DOUBLE)
                     / (CAST(tok_total AS DOUBLE) / CAST(docs_with_tokens AS DOUBLE))))
           AS cterm
  FROM tfq
  JOIN idf ON tfq.term = idf.term
  JOIN dlen ON tfq.doc_id = dlen.doc_id
  CROSS JOIN stats
),
per_doc AS (
  SELECT doc_id, list(cterm ORDER BY term) AS cl,
         CAST(COUNT(*) AS BIGINT) AS n_matched
  FROM contrib GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, list_reduce(cl, (a, x) -> a + x) AS score, n_matched,
         row_number() OVER (
           ORDER BY list_reduce(cl, (a, x) -> a + x) DESC, doc_id ASC
         ) AS rank
  FROM per_doc
)
SELECT doc_id, ROUND(score, 9) AS score, n_matched, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


def _doc_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-20 and embedding-cosine
    top-20 (doc_id ≡ vec_id across the fixture tables) fused by
    reciprocal-rank fusion (k=60) — the calibration-free way to combine
    the two retrieval modalities. Both branch rankings are
    integer-deterministic and the fused sum folds contributions in list
    order, so the oracle mirrors it term for term."""
    from aeuc_vector_db_spark.functions.similarity import cosine_col
    from aeuc_vector_db_spark.functions.vector import as_double, lit_vector

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    bm25 = TX.bm25_topk(
        docs, list(_BM25_TERMS), top_k=20, k1=_BM25_K1, b=_BM25_B
    ).select("doc_id", "rank")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    ]
    vec = global_ranked_topk(
        emb.select(
            F.col("vec_id").alias("doc_id"),
            cosine_col(as_double("embedding"), lit_vector(qvec)).alias("__s__"),
        ),
        [F.col("__s__").desc(), F.col("doc_id").asc()],
        20,
    ).select("doc_id", "rank")
    fused = TX.rrf_fuse([bm25, vec], k=60, top_k=10)
    return fused.select(
        "doc_id", F.round("rrf_score", 9).alias("rrf_score"), "n_lists", "rank"
    )


_HYBRID_RRF_ORACLE = f"""
WITH tok AS (SELECT doc_id, unnest({_dk_tokens()}) AS term FROM documents),
dlen AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen FROM tok GROUP BY doc_id),
stats AS (
  SELECT CAST(SUM(dlen) AS BIGINT) AS tok_total,
         CAST(COUNT(*) AS BIGINT) AS docs_with_tokens
  FROM dlen
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
tfq AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfq GROUP BY term),
idf AS (
  SELECT term,
         ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5)) AS idf
  FROM dfreq CROSS JOIN n
),
contrib AS (
  SELECT tfq.doc_id, tfq.term,
         idf * (CAST(tf AS DOUBLE) * ({_BM25_K1} + 1.0))
             / (CAST(tf AS DOUBLE)
                + {_BM25_K1} * ((1.0 - {_BM25_B})
                   + {_BM25_B} * CAST(dlen AS DOUBLE)
                     / (CAST(tok_total AS DOUBLE) / CAST(docs_with_tokens AS DOUBLE))))
           AS cterm
  FROM tfq
  JOIN idf ON tfq.term = idf.term
  JOIN dlen ON tfq.doc_id = dlen.doc_id
  CROSS JOIN stats
),
bm_ranked AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY list_reduce(list(cterm ORDER BY term), (a, x) -> a + x) DESC,
                    doc_id ASC
         ) AS rank
  FROM contrib GROUP BY doc_id
),
bm25 AS (SELECT doc_id, rank FROM bm_ranked WHERE rank <= 20),
q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id = 7
),
vec_scored AS (
  SELECT vec_id AS doc_id,
         list_reduce(list_transform(list_zip(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv),
                                    p -> p[1]*p[2]), (s, x) -> s + x)
         / (sqrt(list_reduce(list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                            x -> x*x), (s, x) -> s + x))
            * sqrt(list_reduce(list_transform(qv, x -> x*x), (s, x) -> s + x)) + 1e-12) AS s
  FROM embeddings CROSS JOIN q
),
vec_ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
  FROM vec_scored
),
vec AS (SELECT doc_id, rank FROM vec_ranked WHERE rank <= 20),
contribs AS (
  SELECT doc_id, 0 AS list_idx, 1.0 / (60.0 + CAST(rank AS DOUBLE)) AS c FROM bm25
  UNION ALL
  SELECT doc_id, 1, 1.0 / (60.0 + CAST(rank AS DOUBLE)) FROM vec
),
fused AS (
  SELECT doc_id,
         list_reduce(list(c ORDER BY list_idx), (a, x) -> a + x) AS rrf_score,
         CAST(COUNT(*) AS BIGINT) AS n_lists
  FROM contribs GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, rrf_score, n_lists,
         row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT doc_id, ROUND(rrf_score, 9) AS rrf_score, n_lists,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


def _doc_leakproof_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-cluster-aware train/val split (round 6): the split unit
    is the connected component of the n-gram-Jaccard near-dup graph, so
    no near-dup pair straddles the boundary. The oracle recomputes the
    components via a RECURSIVE min-label propagation in DuckDB and the
    identical Fibonacci-spread bucket of the cluster id — a doc split
    by its own id instead of its cluster's, or a mislabeled component,
    diverges the per-split aggregate hash. Zero cross-split pairs are
    additionally pinned in test_curation.py."""
    from aeuc_vector_db_spark.operators import curation as CU

    corpus = _near_dup_corpus(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(
        corpus.withColumn("block", F.col("doc_id") % 100000 % 50),
        block_col="block",
        threshold=0.6,
        shingle_n=2,
    ).select("a_id", "b_id")
    out = CU.leakproof_split(corpus, pairs, val_threshold=2000)
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )


_LEAKPROOF_SPLIT_ORACLE = f"""
WITH RECURSIVE
corpus AS ({_NEAR_DUP_CORPUS_SQL}),
sh AS (
  SELECT doc_id % 100000 % 50 AS block, doc_id, {_dk_shingle_hashes('text', 2)} AS shset
  FROM corpus
),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
  WHERE {_dk_jaccard('a.shset', 'b.shset')} >= 0.6
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM p
  UNION ALL
  SELECT b_id, a_id FROM p
),
lab(node, comp) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.u, lab.comp FROM edges e JOIN lab ON lab.node = e.v
),
comp AS (SELECT node AS doc_id, MIN(comp) AS cluster_id FROM lab GROUP BY node),
assigned AS (
  SELECT doc_id, cluster_id,
         CASE WHEN (({_dk_polyhash("('0:' || CAST(cluster_id AS VARCHAR))")}
                     * 2654435761) % 4294967296) % 10000 < 2000
              THEN 'val' ELSE 'train' END AS split
  FROM comp
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
FROM assigned GROUP BY split
"""


def _doc_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE (round 7, operators/bpe.py): train 60 merges on
    the corpus's word-frequency table (one aggregate + a bounded
    driver-side merge loop — not SQL-expressible, hence rows-only; the
    sequential-parity and textbook-example semantics are pinned in
    tests/test_bpe.py), then encode every document map-side and emit
    the corpus's top-10 subword tokens by frequency plus totals —
    deterministic given the corpus, so row count and schema are stable
    across runs."""
    from aeuc_vector_db_spark.operators.bpe import bpe_encode, bpe_train

    docs = load_table(spark, "documents", sf_dir)
    merges = bpe_train(docs, n_merges=60)
    enc = bpe_encode(docs, merges)
    top = (
        enc.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(10)
    )
    totals = enc.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    ).select(
        F.lit("__totals__").alias("tok"),
        F.col("total_tokens").cast("long").alias("n"),
        F.col("n_docs").cast("long").alias("extra"),
        F.lit(len(merges)).cast("long").alias("n_merges"),
    )
    # self-validation (VERDICT r8 #4): BPE is a lossless segmentation —
    # per doc, the concatenated subword tokens must reconstruct the
    # word stream exactly (each word + its </w> marker). Violating docs
    # ride the output as extra rows, so a broken merge application is a
    # driver-visible row-count change, not an invisible value drift.
    words = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat_ws(
            "", F.transform(
                TX.tokens_col("text"), lambda w: F.concat(w, F.lit("</w>"))
            )
        ).alias("__want"),
    )
    viol = (
        enc.join(words, "doc_id")
        .filter(F.concat_ws("", F.col("tokens")) != F.col("__want"))
        .select(
            F.lit("__roundtrip_violation__").alias("tok"),
            F.col("doc_id").alias("n"),
            F.lit(None).cast("long").alias("extra"),
            F.lit(None).cast("long").alias("n_merges"),
        )
    )
    return top.select(
        "tok", F.col("n").cast("long").alias("n"),
        F.lit(None).cast("long").alias("extra"),
        F.lit(None).cast("long").alias("n_merges"),
    ).unionByName(totals).unionByName(viol)


def _doc_bpe_encode_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENCODE half of the BPE family, hash-matched (VERDICT r14 #1):
    `bpe_encode` — the exact Arrow kernel `doc_bpe_tokenize` serves
    with — driven by the fixed well-formed merge list
    `operators/bpe.py literal_merges()` instead of a trained one, so a
    DuckDB recursive CTE can replay rank-greedy merging and pin every
    token of every document. Training stays rows-only by necessity
    (the merge loop is a driver-side iterative argmax); the serve
    arithmetic — tokenize, per-word lowest-rank-first merge descent,
    per-doc reassembly — is what this query makes falsifiable."""
    from aeuc_vector_db_spark.operators.bpe import bpe_encode, literal_merges

    docs = load_table(spark, "documents", sf_dir)
    enc = bpe_encode(docs, literal_merges())
    return enc.select(
        "doc_id",
        F.concat_ws("|", F.col("tokens")).alias("toks"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    ).orderBy("doc_id")


def _bpe_encode_literal_oracle() -> str:
    """Recursive-CTE replay of rank-greedy BPE over the literal merge
    list: per DISTINCT word, repeatedly merge the LEFTMOST occurrence
    of the lowest-ranked adjacent pair (equivalent to the kernel's
    merge-all step because the list is well-formed — see
    literal_merges); per doc, reassemble tokens in word order."""
    from aeuc_vector_db_spark.operators.bpe import literal_merges

    merges = literal_merges()
    keys = ", ".join(f"'{l}|{r}'" for l, r in merges)
    vals = ", ".join(str(i) for i in range(len(merges)))
    rankmap = f"map([{keys}], [{vals}])"
    return f"""
WITH RECURSIVE words AS (
  SELECT DISTINCT unnest({_dk_tokens()}) AS w FROM documents
),
rec(w, syms, n) AS (
  SELECT w, list_append(string_split(w, ''), '</w>'), 0 FROM words
  UNION ALL
  SELECT w,
         list_concat(
           list_concat(syms[1:pos-1], [syms[pos] || syms[pos+1]]),
           syms[pos+2:len(syms)]),
         n + 1
  FROM (
    SELECT w, syms, n,
           list_position(ranks, list_min(ranks)) AS pos,
           list_min(ranks) AS br
    FROM (
      SELECT w, syms, n,
             list_transform(range(1, len(syms)),
               i -> coalesce({rankmap}[syms[i] || '|' || syms[i+1]][1], 999999)) AS ranks
      FROM rec
      WHERE len(syms) > 1
    )
  )
  WHERE br < 999999
),
enc AS (
  SELECT w, array_to_string(syms, '|') AS wtoks, len(syms) AS wn
  FROM rec QUALIFY row_number() OVER (PARTITION BY w ORDER BY n DESC) = 1
),
docw AS (
  SELECT doc_id, unnest(range(len(ts))) AS i, unnest(ts) AS w
  FROM (SELECT doc_id, {_dk_tokens()} AS ts FROM documents) d
)
SELECT dd.doc_id,
       coalesce(string_agg(e.wtoks, '|' ORDER BY d.i), '') AS toks,
       CAST(coalesce(SUM(e.wn), 0) AS BIGINT) AS n_tokens
FROM documents dd
LEFT JOIN docw d ON dd.doc_id = d.doc_id
LEFT JOIN enc e ON d.w = e.w
GROUP BY dd.doc_id
"""


def _doc_leakproof_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold generalization of the leakproof split (round 7): fold =
    Fibonacci-spread bucket of the near-dup CLUSTER id mod 5, so a
    document and its near-copies share a fold across all 5 held-out
    sets. Same recursive-CC + bucket-arithmetic oracle as
    `doc_leakproof_split`, with the fold projection swapped in."""
    from aeuc_vector_db_spark.operators import curation as CU

    corpus = _near_dup_corpus(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(
        corpus.withColumn("block", F.col("doc_id") % 100000 % 50),
        block_col="block",
        threshold=0.6,
        shingle_n=2,
    ).select("a_id", "b_id")
    out = CU.leakproof_kfold(corpus, pairs, k=5)
    return out.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )


_LEAKPROOF_KFOLD_ORACLE = f"""
WITH RECURSIVE
corpus AS ({_NEAR_DUP_CORPUS_SQL}),
sh AS (
  SELECT doc_id % 100000 % 50 AS block, doc_id, {_dk_shingle_hashes('text', 2)} AS shset
  FROM corpus
),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
  WHERE {_dk_jaccard('a.shset', 'b.shset')} >= 0.6
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM p
  UNION ALL
  SELECT b_id, a_id FROM p
),
lab(node, comp) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.u, lab.comp FROM edges e JOIN lab ON lab.node = e.v
),
comp AS (SELECT node AS doc_id, MIN(comp) AS cluster_id FROM lab GROUP BY node),
assigned AS (
  SELECT doc_id, cluster_id,
         ((({_dk_polyhash("('0:' || CAST(cluster_id AS VARCHAR))")}
            * 2654435761) % 4294967296) % 10000) % 5 AS fold
  FROM comp
)
SELECT CAST(fold AS BIGINT) AS fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
FROM assigned GROUP BY fold
"""


# ---------------------------------------------------------------------------
# Cross-engine deterministic sketches (round 7): HyperLogLog distinct +
# count–min point frequencies. Spark's own approx_count_distinct /
# count_min_sketch use engine-private hashes, so their outputs can never
# be oracle-checked; these operators (operators/sketch.py) derive every
# bit from sha256 windows, so DuckDB rebuilds the IDENTICAL register
# state / cell table and the hash match pins the whole algorithm —
# approximate answers under an exact contract.
# ---------------------------------------------------------------------------

_DK_HEX = "0123456789abcdef"


def _dk_hex32(hx: str, off: str = "0") -> str:
    """Fold 8 hex chars of `hx` starting after char offset `off` (a SQL
    expression, 0-based) into a BIGINT — mirror of sketch.sha32_col."""
    return (
        f"list_reduce(list_transform(range(1, 9),"
        f" j -> CAST(strpos('{_DK_HEX}', substr({hx}, CAST({off} + j AS INT), 1)) - 1 AS BIGINT)),"
        f" (a, b) -> a*16 + b)"
    )


def _doc_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-token estimate next to the exact count. The register
    aggregate is the only shuffle (≤ 512 rows per map task after the
    partial max); the exact count is the verification twin the query
    carries at test scale — at 100 TB you run only the sketch."""
    from aeuc_vector_db_spark.operators.sketch import hll_distinct

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(F.explode(TX.tokens_col(F.col("text"))).alias("term"))
    est = hll_distinct(tok, "term")
    exact = tok.agg(F.countDistinct("term").cast("long").alias("n_distinct_exact"))
    return exact.crossJoin(est).select(
        "n_distinct_exact",
        F.round("hll_estimate", 2).alias("hll_estimate"),
        F.col("n_zero_registers").cast("long").alias("n_zero_registers"),
        F.col("s_scaled").cast("long").alias("s_scaled"),
    )


def _hll_oracle() -> str:
    from aeuc_vector_db_spark.operators.sketch import (
        HLL_ALPHA,
        HLL_M,
        HLL_P as HLL_P_BITS,
        HLL_W,
    )

    shift = HLL_W + 1  # 24
    scale = float(1 << shift)
    num = HLL_ALPHA * HLL_M * HLL_M * scale  # same Python double as the Spark literal
    return f"""
WITH tok AS (SELECT unnest({_dk_tokens()}) AS term FROM documents),
hv AS (SELECT {_dk_hex32("sha256(term)")} AS h FROM tok),
rr AS (
  SELECT h % {HLL_M} AS register,
         CASE WHEN (h >> {HLL_P_BITS}) = 0 THEN {shift}
              ELSE {shift} - length(format('{{:b}}', h >> {HLL_P_BITS})) END AS rho
  FROM hv
),
regs AS (SELECT register, MAX(rho) AS maxrho FROM rr GROUP BY register),
agg AS (
  SELECT COUNT(*) AS n_present,
         SUM(CAST(1 AS BIGINT) << CAST({shift} - maxrho AS INT)) AS s_present
  FROM regs
),
est AS (
  SELECT ({HLL_M} - n_present) AS v_zero,
         s_present + ({HLL_M} - n_present) * (CAST(1 AS BIGINT) << {shift}) AS s_scaled
  FROM agg
),
fin AS (
  SELECT CASE WHEN ({num!r} / CAST(s_scaled AS DOUBLE)) <= {2.5 * HLL_M!r} AND v_zero > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(v_zero AS DOUBLE))
              ELSE ({num!r} / CAST(s_scaled AS DOUBLE)) END AS hll_estimate,
         v_zero, s_scaled
  FROM est
)
SELECT (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) FROM tok) AS n_distinct_exact,
       ROUND(hll_estimate, 2) AS hll_estimate,
       CAST(v_zero AS BIGINT) AS n_zero_registers,
       CAST(s_scaled AS BIGINT) AS s_scaled
FROM fin
"""


_HLL_DISTINCT_ORACLE = _hll_oracle()


def _doc_vocab_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap via HLL inclusion–exclusion
    (|A∩B| ≈ E(A)+E(B)−E(A∪B), union = element-wise register max): the
    dataset-audit shape where exact INTERSECT would shuffle both key
    sets but the sketches are 2·512 register rows. Exact intersection
    carried as the verification twin at test scale."""
    from aeuc_vector_db_spark.operators.sketch import hll_intersection

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.filter(F.col("source").isin(["src0", "src1"])).select(
        "source", F.explode(TX.tokens_col(F.col("text"))).alias("term")
    )
    est = hll_intersection(tok, "term", "source", "src0", "src1")
    ta = tok.filter(F.col("source") == "src0").select("term").distinct()
    tb = tok.filter(F.col("source") == "src1").select("term").distinct()
    exact = ta.join(tb, "term", "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("exact_intersection")
    )
    return exact.crossJoin(est).select(
        "exact_intersection",
        F.round("est_a", 2).alias("est_a"),
        F.round("est_b", 2).alias("est_b"),
        F.round("est_union", 2).alias("est_union"),
        F.round("est_intersection", 2).alias("est_intersection"),
    )


def _vocab_overlap_oracle() -> str:
    from aeuc_vector_db_spark.operators.sketch import (
        HLL_ALPHA,
        HLL_M,
        HLL_P as HLL_P_BITS,
        HLL_W,
    )

    shift = HLL_W + 1
    num = HLL_ALPHA * HLL_M * HLL_M * float(1 << shift)

    def est(regs_sql: str) -> str:
        return f"""(
  SELECT CASE WHEN ({num!r} / CAST(s_scaled AS DOUBLE)) <= {2.5 * HLL_M!r} AND v_zero > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST(v_zero AS DOUBLE))
              ELSE ({num!r} / CAST(s_scaled AS DOUBLE)) END
  FROM (
    SELECT ({HLL_M} - COUNT(*)) AS v_zero,
           COALESCE(SUM(CAST(1 AS BIGINT) << CAST({shift} - maxrho AS INT)),
                    CAST(0 AS BIGINT))
           + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << {shift}) AS s_scaled
    FROM ({regs_sql}) rsel
  ) t)"""

    return f"""
WITH tok AS (
  SELECT source, unnest({_dk_tokens()}) AS term FROM documents
  WHERE source IN ('src0', 'src1')
),
hv AS (SELECT source, {_dk_hex32("sha256(term)")} AS h FROM tok),
rr AS (
  SELECT source, h % {HLL_M} AS register,
         CASE WHEN (h >> {HLL_P_BITS}) = 0 THEN {shift}
              ELSE {shift} - length(format('{{:b}}', h >> {HLL_P_BITS})) END AS rho
  FROM hv
),
regs AS (SELECT source, register, MAX(rho) AS maxrho FROM rr GROUP BY source, register),
ests AS (
  SELECT {est("SELECT register, maxrho FROM regs WHERE source = 'src0'")} AS est_a,
         {est("SELECT register, maxrho FROM regs WHERE source = 'src1'")} AS est_b,
         {est("SELECT register, MAX(maxrho) AS maxrho FROM regs GROUP BY register")} AS est_union
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT term FROM tok WHERE source = 'src0'
           INTERSECT
           SELECT term FROM tok WHERE source = 'src1')) AS exact_intersection,
       ROUND(est_a, 2) AS est_a,
       ROUND(est_b, 2) AS est_b,
       ROUND(est_union, 2) AS est_union,
       ROUND(GREATEST(CAST(0 AS DOUBLE), (est_a + est_b) - est_union), 2)
         AS est_intersection
FROM ests
"""


_VOCAB_OVERLAP_ORACLE = _vocab_overlap_oracle()


def _doc_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min frequency estimates for the exact heavy-hitter terms
    (count ≥ 200). Optimization round 16 (guide §1.2 — don't compute
    things twice): the r7-r15 form tokenized the corpus THREE times
    (sketch stream, candidate nomination, exact probe counts — 6
    parquet scans in the before-plan). Both outputs derive from ONE
    exact term-count aggregate: the probes are `counts ≥ 200` verbatim,
    and the sketch builds from the counts (a cell's occupancy is the
    sum of the per-term counts hashing to it — identical integers, see
    `cms_build_from_counts`), so the corpus tokenizes ONCE, the only
    corpus-sized shuffle is the map-side-partial term aggregate, and
    the sketch-build input shrinks from token occurrences to the
    distinct vocabulary. The two consumers share the term exchange
    (ReusedExchange). CMS guarantees estimate ≥ exact; the oracle pins
    the exact overshoot cell-for-cell (hash-green at 3 SFs)."""
    from aeuc_vector_db_spark.operators.sketch import (
        cms_build_from_counts,
        cms_estimate,
    )

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(F.explode(TX.tokens_col(F.col("text"))).alias("term"))
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("term_count"))
    sketch = cms_build_from_counts(counts, "term", "term_count")
    probes = counts.filter(F.col("term_count") >= F.lit(200))
    est = cms_estimate(sketch, probes.select("term"), "term")
    return probes.join(est, "term").select(
        "term",
        F.col("term_count").cast("long").alias("exact_count"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
    )


def _cms_oracle() -> str:
    from aeuc_vector_db_spark.operators.sketch import CMS_D, CMS_W

    return f"""
WITH tok AS (SELECT unnest({_dk_tokens()}) AS term FROM documents),
hh AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_count
  FROM tok GROUP BY term HAVING COUNT(*) >= 200
),
cells AS (
  SELECT r.i AS row, {_dk_hex32("t.hx", "8*r.i")} % {CMS_W} AS bucket,
         COUNT(*) AS cnt
  FROM (SELECT sha256(term) AS hx FROM tok) t CROSS JOIN range({CMS_D}) r(i)
  GROUP BY 1, 2
),
probes AS (
  SELECT hh.term, r.i AS row,
         {_dk_hex32("sha256(hh.term)", "8*r.i")} % {CMS_W} AS bucket
  FROM hh CROSS JOIN range({CMS_D}) r(i)
)
SELECT hh.term, hh.exact_count,
       CAST((SELECT MIN(COALESCE(c.cnt, 0))
             FROM probes p LEFT JOIN cells c ON c.row = p.row AND c.bucket = p.bucket
             WHERE p.term = hh.term) AS BIGINT) AS cms_estimate
FROM hh
"""


_CMS_FREQ_ORACLE = _cms_oracle()


# ---------------------------------------------------------------------------
# Exact duplicated-substring spans (round 7): the Lee et al. 2022
# ExactSubstr dedup re-expressed relationally (operators/dedup.py
# substring_dup_spans). The near-dup corpus plants copies sharing a
# long prefix with their originals, so both sides carry merged
# duplicated spans whose union length the oracle recomputes exactly.
# ---------------------------------------------------------------------------

_SUBSTR_L = 40


def _doc_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aeuc_vector_db_spark.operators.dedup import substring_dup_spans

    return substring_dup_spans(
        _near_dup_corpus(spark, sf_dir), min_len=_SUBSTR_L
    )


_SUBSTRING_DEDUP_ORACLE = f"""
WITH corpus AS ({_NEAR_DUP_CORPUS_SQL}),
base AS (SELECT doc_id, text, length(text) AS n_chars FROM corpus),
win AS (
  SELECT doc_id, n_chars,
         unnest(range(1, greatest(length(text) - {_SUBSTR_L - 2}, 1))) AS pos, text
  FROM base
),
hw AS (
  SELECT doc_id, n_chars, pos,
         sha256(substr(text, CAST(pos AS INT), {_SUBSTR_L})) AS h
  FROM win
),
dup AS (
  SELECT doc_id, n_chars, pos
  FROM (SELECT *, COUNT(*) OVER (PARTITION BY h) AS occ FROM hw)
  WHERE occ > 1
),
isl AS (
  SELECT doc_id, n_chars, pos,
         CASE WHEN max(pos) OVER w IS NULL
                   OR pos > max(pos) OVER w + {_SUBSTR_L} THEN 1 ELSE 0 END AS brk
  FROM dup
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
grp AS (
  SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, n_chars, island, MIN(pos) AS s,
         MAX(pos) + {_SUBSTR_L - 1} AS e, COUNT(*) AS nw
  FROM grp GROUP BY doc_id, n_chars, island
)
SELECT doc_id, CAST(SUM(nw) AS BIGINT) AS n_dup_windows,
       CAST(SUM(e - s + 1) AS BIGINT) AS dup_chars,
       CAST(n_chars AS BIGINT) AS n_chars
FROM spans GROUP BY doc_id, n_chars
"""


# ---------------------------------------------------------------------------
# Sketch-gated quality filter (round 7 composition): the realistic way a
# 100 TB curation pass applies a quantile cut — the corpus folds into a
# 256-bucket histogram (one sketch-sized shuffle), the p25 threshold is
# interpolated from the sketch, and the filter itself is a map-side
# broadcast comparison. No corpus sort, no exact percentile pass. Both
# the sketch arithmetic and the per-doc scores are cross-engine
# deterministic, so the KEPT SET hash-matches.
# ---------------------------------------------------------------------------


def _doc_quality_gate_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aeuc_vector_db_spark.operators.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )

    docs = load_table(spark, "documents", sf_dir)
    scored = TX.unigram_logprob(docs).select(
        "doc_id", F.round("avg_logp", 9).alias("lp"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    sk = histogram_sketch(scored, "lp", bins=256)
    th = histogram_quantiles(sk, [0.25], bins=256).select(
        F.col("est").alias("__th__")
    )
    return (
        scored.join(F.broadcast(th))
        .filter(F.col("lp") >= F.col("__th__"))
        .select("doc_id", F.col("lp").alias("avg_logp"), "n_tokens")
    )


def _quality_gate_oracle() -> str:
    bins = 256.0
    return f"""
WITH tok AS (SELECT doc_id, unnest({_dk_tokens()}) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY term),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok),
lp AS (
  SELECT term, ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) AS logp
  FROM c CROSS JOIN tot
),
contrib AS (
  SELECT doc_id, tf.term, CAST(tf AS DOUBLE) * logp AS cterm, tf
  FROM tf JOIN lp ON tf.term = lp.term
),
agg AS (
  SELECT doc_id, list(cterm ORDER BY term) AS cl, SUM(tf) AS n_tokens
  FROM contrib GROUP BY doc_id
),
scored AS (
  SELECT doc_id,
         ROUND(list_reduce(cl, (a, b) -> a + b) / CAST(n_tokens AS DOUBLE), 9) AS lp,
         CAST(n_tokens AS BIGINT) AS n_tokens
  FROM agg
),
b AS (SELECT MIN(lp) AS lo, MAX(lp) AS hi FROM scored),
bk AS (
  SELECT CAST(CASE WHEN hi = lo THEN 0
              ELSE least(greatest(floor((lp - lo) / (hi - lo) * {bins!r}), 0), 255) END AS INT) AS bucket,
         COUNT(*) AS cnt, MIN(lo) AS lo, MIN(hi) AS hi
  FROM scored CROSS JOIN b GROUP BY 1
),
cum AS (
  SELECT bucket, cnt, lo, hi,
         SUM(cnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER () AS n
  FROM bk
),
hit AS (
  SELECT lo + (CAST(bucket AS DOUBLE)
               + (CAST(0.25 AS DOUBLE) * CAST(n AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
                 / CAST(cnt AS DOUBLE)) * ((hi - lo) / {bins!r}) AS th
  FROM cum
  WHERE CAST(cum AS DOUBLE) >= CAST(0.25 AS DOUBLE) * CAST(n AS DOUBLE)
    AND CAST(cum - cnt AS DOUBLE) < CAST(0.25 AS DOUBLE) * CAST(n AS DOUBLE)
)
SELECT doc_id, lp AS avg_logp, n_tokens
FROM scored CROSS JOIN hit WHERE lp >= th
"""


_QUALITY_GATE_ORACLE = _quality_gate_oracle()


def _doc_prefix_edit1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-key dedup rung between exact hashing and MinHash: all
    distinct 12-char lowercase text prefixes within Levenshtein
    distance ≤ 1 of each other, found by SymSpell-style symmetric-
    delete blocking (operators/dedup.py edit_distance_one_pairs) — an
    equi join on |key|+1 deletion keys per prefix plus an exact
    levenshtein verify, never an all-pairs similarity join. The DuckDB
    oracle IS the all-pairs form, so the hash match verifies the
    blocking's completeness on real data."""
    docs = load_table(spark, "documents", sf_dir)
    keyed = docs.filter(F.char_length("text") >= 12).select(
        F.lower(F.substring("text", 1, 12)).alias("prefix")
    )
    return D.edit_distance_one_pairs(keyed, "prefix").orderBy("k_a", "k_b")


_PREFIX_EDIT1_ORACLE = """
WITH p AS (
  SELECT DISTINCT lower(substr(text, 1, 12)) AS k
  FROM documents WHERE length(text) >= 12
)
SELECT a.k AS k_a, b.k AS k_b
FROM p a JOIN p b ON a.k < b.k AND levenshtein(a.k, b.k) <= 1
ORDER BY k_a, k_b
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (round 9): Schleimer/Wilkerson/Aiken, SIGMOD'03
# ("Winnowing: Local Algorithms for Document Fingerprinting" — public
# algorithm). Per document: ordered k-gram rolling hashes, sliding
# window of w consecutive hashes, keep each window's MINIMUM; the
# distinct kept values are the fingerprints. Guarantee: any match of
# length >= w + k - 1 tokens shares at least one fingerprint — the
# robust alternative to 0 mod p fingerprint sampling for substring-
# level dedup/plagiarism sweeps. Everything stays JVM-side (no Python
# in the hot path) and — since round 9 — entirely WITHIN the row: the
# sliding minimum folds inside the hash array (sliding_min_col), so
# the operator is a pure projection with zero shuffles. Giant-doc
# note: a single document's hashes live in one row/task — fine for
# web/doc corpora (document >> partition is rare); a corpus of
# multi-GB documents would chunk positions into ranges overlapping by
# w-1 (every window lies fully inside some chunk, so chunked window
# minima ≡ global ones) keyed by (doc_id, chunk).
# ---------------------------------------------------------------------------

_WINNOW_K, _WINNOW_W = 3, 4


def _doc_winnowing_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MAP-ONLY plan, vectorized Arrow kernel (round 13): tokenize →
    # k-gram polyhash → w-window sliding min → distinct →
    # (count, sum, min), the whole batch folded FLAT in numpy
    # (operators/text.py winnow_batch) — exact integer arithmetic,
    # bit-identical to the SQL-HOF twin below (pinned in
    # tests/test_text_dedup.py) and to the DuckDB oracle. ZERO
    # shuffles, zero explode, exactly ONE MapInPandas (gated in
    # tests/test_plans.py): mapInPandas both drops the no-shingle rows
    # inside the kernel (no filter to re-trigger UDF evaluation — a
    # filter over the pandas_udf form re-ran the kernel on both sides,
    # 2 ArrowEvalPython nodes measured) and keeps one kernel pass. The
    # r9-r12 SQL-HOF form (kept as _doc_winnowing_fp_sql) was the
    # slowest healthy headline at 1.17 s sf0.1 — interpreted lambda
    # evaluation over the shingle arrays was the entire cost.
    from aeuc_vector_db_spark.sources.tables import ensure_min_parallelism

    docs = ensure_min_parallelism(load_table(spark, "documents", sf_dir))
    k, w = _WINNOW_K, _WINNOW_W

    def gen(it):
        for pdf in it:
            st = TX.winnow_batch(pdf["text"], k, w)
            st.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield st[st["n_fp"].notna()]

    return docs.select("doc_id", "text").mapInPandas(
        gen, "doc_id long, n_fp long, fp_sum long, fp_min long"
    )


def _doc_winnowing_fp_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The pure-SQL-HOF twin (the r9-r12 hot path, now the bit-parity
    # reference for the Arrow kernel): the w-window sliding minimum is
    # computed INSIDE the hash array with ⌈log₂ w⌉ zip_with passes
    # (operators/text.py sliding_min_col), then distinct/count/sum/min
    # fold per row — the whole query is a projection over the scan.
    # Earlier shapes and why they lost: `transform(seq, j ->
    # array_min(slice(hs, j, w)))` re-evaluates the hash array per
    # window position (no CSE inside lambda bodies — 75 s for 500
    # docs); posexplode + window MIN over (pos..pos+w-1) is linear but
    # ships ~#shingles rows through a doc_id shuffle + sort (14.8 s at
    # sf0.1 — the shuffle WAS the query). Giant-doc caveat unchanged:
    # one multi-GB document is one row either way; the chunked-overlap
    # formulation in the section comment above is the escape hatch,
    # not a different operator.
    docs = load_table(spark, "documents", sf_dir)
    w = _WINNOW_W
    hs = F.transform(
        TX.shingles_col(TX.tokens_col("text"), _WINNOW_K),
        lambda s: TX.polyhash_col(s),
    )

    def stats(fps: F.Column) -> F.Column:
        return F.struct(
            F.size(fps).cast("long").alias("n_fp"),
            F.aggregate(
                fps, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("fp_sum"),
            F.array_min(fps).alias("fp_min"),
        )

    def packed(h: F.Column) -> F.Column:
        n = F.size(h)
        # full windows start at 1..n-w+1; a doc shorter than one
        # window keeps a single "window" = min of all hashes (the
        # paper's boundary case). Docs with zero shingles emit an
        # EMPTY pack — inline() drops the row, so no filter exists
        # for predicate-pushdown to substitute the expression into.
        wins = (
            F.when(n >= w, F.slice(TX.sliding_min_col(h, w), F.lit(1), n - (w - 1)))
            .when(n > 0, F.array(F.array_min(h)))
            .otherwise(F.array().cast("array<long>"))
        )
        return TX.let_col(
            F.array_distinct(wins), lambda fps: F.array(stats(fps))
        )

    empty = F.array().cast(
        "array<struct<n_fp:bigint,fp_sum:bigint,fp_min:bigint>>"
    )
    pack = TX.let_col(
        hs,
        lambda h: F.when(F.size(h) > 0, packed(h)).otherwise(empty),
    )
    return docs.select("doc_id", F.inline(pack))


_WINNOWING_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_dk_shingles(_dk_tokens(), _WINNOW_K)} AS sh FROM documents
),
h AS (SELECT doc_id, list_transform(sh, s -> {_dk_polyhash('s')}) AS hs FROM t),
w AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= {_WINNOW_W}
              THEN list_transform(range(1, len(hs) - {_WINNOW_W - 2}),
                                  j -> list_min(hs[j:j+{_WINNOW_W - 1}]))
              WHEN len(hs) > 0 THEN [list_min(hs)]
              ELSE [] END AS wins
  FROM h
),
f AS (SELECT doc_id, unnest(list_distinct(wins)) AS fp FROM w)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp,
       CAST(SUM(fp) AS BIGINT) AS fp_sum,
       CAST(MIN(fp) AS BIGINT) AS fp_min
FROM f GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Lexical diversity (late round 9): per-doc type/token stats plus the
# Gini–Simpson index 1 − Σc(c−1)/(n(n−1)) — the exact-arithmetic
# diversity measure (probability two random tokens differ). Chosen
# over Shannon entropy deliberately: entropy needs log(), which is not
# correctly-rounded and can differ between libm implementations,
# while Gini–Simpson is integer sums with ONE final IEEE division —
# bit-identical on any engine and any partitioning. Repetition-heavy
# (low-diversity) docs are a standard LLM-corpus quality cut.
# Map-only plan: everything folds inside the row (let_col-bound token
# and count arrays); zero shuffles.
# ---------------------------------------------------------------------------


def _doc_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aeuc_vector_db_spark.sources.tables import ensure_min_parallelism

    docs = ensure_min_parallelism(load_table(spark, "documents", sf_dir))

    def stats(toks: F.Column) -> F.Column:
        # Sorted-run scan (optimization round 15): the r9-r14 form built
        # counts = transform(array_distinct(toks), u -> size(filter(toks,
        # x = u))) — O(n·types) interpreted lambda evaluations per doc,
        # the measured cost of the query (0.27 s hot at sf0.1, map-only
        # plan, so the expression IS the query). Sorting the token array
        # (native, no lambda) and folding run lengths in ONE O(n) pass
        # computes the same three count statistics the struct consumes:
        # Σc(c−1) (sum over runs ≡ sum over distinct tokens — integer,
        # order-free), max run ≡ max count, and #runs ≡ #distinct. All
        # integer arithmetic, and the final gini/top_share divisions are
        # the SAME formulas over the SAME integer operands, so every
        # output bit (incl. the null propagation for null/empty token
        # arrays) is unchanged — oracle-verified at all three SFs.
        zero = F.lit(0).cast("long")
        one = F.lit(1).cast("long")
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            zero.alias("run"),
            zero.alias("sumc2"),
            zero.alias("maxc"),
            zero.alias("types"),
        )

        def step(acc: F.Column, x: F.Column) -> F.Column:
            cont = x == acc["prev"]  # null prev (first token) → new run
            run = acc["run"]
            return F.struct(
                x.alias("prev"),
                F.when(cont, run + one).otherwise(one).alias("run"),
                F.when(cont, acc["sumc2"])
                .otherwise(acc["sumc2"] + run * (run - one))
                .alias("sumc2"),
                F.when(cont, acc["maxc"])
                .otherwise(F.greatest(acc["maxc"], run))
                .alias("maxc"),
                F.when(cont, acc["types"])
                .otherwise(acc["types"] + F.when(run > 0, one).otherwise(zero))
                .alias("types"),
            )

        def fin(acc: F.Column) -> F.Column:
            n = F.size(toks)
            nl = n.cast("long")
            run = acc["run"]
            sumc2 = acc["sumc2"] + run * (run - one)
            maxc = F.greatest(acc["maxc"], run)
            types = acc["types"] + F.when(run > 0, one).otherwise(zero)
            denom = (nl * (nl - 1)).cast("double")
            return F.struct(
                nl.alias("n_tokens"),
                types.alias("n_types"),
                F.when(n >= 2, F.lit(1.0) - sumc2.cast("double") / denom)
                .alias("gini_simpson"),
                F.when(
                    n >= 1,
                    maxc.cast("double") / n.cast("double"),
                ).alias("top_share"),
            )

        return F.aggregate(F.array_sort(toks), init, step, fin)

    return docs.select(
        "doc_id", TX.let_col(TX.tokens_col("text"), stats).alias("s")
    ).select("doc_id", "s.*")


_TOKEN_DIVERSITY_ORACLE = f"""
WITH t AS (SELECT doc_id, {_dk_tokens()} AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         list_transform(list_distinct(toks),
                        u -> len(list_filter(toks, x -> x = u))) AS cnts
  FROM t
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(cnts) AS BIGINT) AS n_types,
       CASE WHEN len(toks) >= 2 THEN
         1.0 - CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(cnts, c -> CAST(c AS BIGINT)*(c-1))),
                   (a, b) -> a + b) AS DOUBLE)
             / CAST(CAST(len(toks) AS BIGINT) * (len(toks) - 1) AS DOUBLE)
       END AS gini_simpson,
       CASE WHEN len(toks) >= 1 THEN
         CAST(list_max(cnts) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
       END AS top_share
FROM c
"""


QUERIES = {
    "doc_token_diversity": (_doc_token_diversity, _TOKEN_DIVERSITY_ORACLE),
    "doc_winnowing_fingerprint": (_doc_winnowing_fp, _WINNOWING_ORACLE),
    "doc_prefix_edit1_pairs": (_doc_prefix_edit1_pairs, _PREFIX_EDIT1_ORACLE),
    "doc_quality_gate_sketch": (_doc_quality_gate_sketch, _QUALITY_GATE_ORACLE),
    "doc_substring_dedup": (_doc_substring_dedup, _SUBSTRING_DEDUP_ORACLE),
    "doc_hll_distinct": (_doc_hll_distinct, _HLL_DISTINCT_ORACLE),
    "doc_cms_freq": (_doc_cms_freq, _CMS_FREQ_ORACLE),
    "doc_leakproof_split": (_doc_leakproof_split, _LEAKPROOF_SPLIT_ORACLE),
    "doc_leakproof_kfold": (_doc_leakproof_kfold, _LEAKPROOF_KFOLD_ORACLE),
    "doc_bpe_tokenize": (_doc_bpe_tokenize, None),
    "doc_hybrid_rrf_topk": (_doc_hybrid_rrf_topk, _HYBRID_RRF_ORACLE),
    "doc_bm25_topk": (_doc_bm25_topk, _BM25_ORACLE),
    "doc_bm25_indexed_topk": (_doc_bm25_indexed_topk, _BM25_ORACLE),
    "doc_heavy_hitters": (_doc_heavy_hitters, _HEAVY_HITTERS_ORACLE),
    "doc_unigram_logprob": (_doc_unigram_logprob, _UNIGRAM_LOGPROB_ORACLE),
    "doc_simhash16": (_doc_simhash16, _SIMHASH_ORACLE),
    "doc_exact_dedup": (_doc_exact_dedup, _EXACT_DEDUP_ORACLE),
    "doc_minhash_near_dup": (_doc_minhash_near_dup, _MINHASH_ORACLE),
    "doc_minhash_capped": (_doc_minhash_capped, _MINHASH_CAPPED_ORACLE),
    "doc_incremental_minhash_dedup": (_doc_incremental_minhash_dedup,
                                      _INCREMENTAL_MINHASH_ORACLE),
    "doc_incremental_minhash_bucketed": (_doc_incremental_minhash_bucketed,
                                         _INCREMENTAL_MINHASH_ORACLE),
    "doc_ngram_jaccard": (_doc_ngram_jaccard, _NGRAM_JACCARD_ORACLE),
    "emb_near_dup_cosine": (_emb_near_dup, _EMB_NEAR_DUP_ORACLE),
    "emb_semantic_dedup_keep_one": (_emb_semantic_dedup, _SEMANTIC_DEDUP_ORACLE),
    "emb_semantic_dedup_learned": (_emb_semantic_dedup_learned, None),
    "emb_cell_assign_literal": (_emb_cell_assign_literal, _cell_assign_literal_oracle()),
    "doc_bpe_encode_literal": (_doc_bpe_encode_literal, _bpe_encode_literal_oracle()),
    "doc_dedup_keep_one": (_doc_dedup_keep_one, _KEEP_ONE_ORACLE),
    "doc_clean_corpus_pipeline": (_doc_clean_corpus_pipeline, _CLEAN_PIPELINE_ORACLE),
}

# Round 14 (VERDICT r13 #2): long-green text-statistics singles folded
# into text_stats_composite (queries/composites.py); (fn, oracle) pairs
# stay here so the composite reuses the arithmetic verbatim and
# tests/bench can still drive the callables individually.
FOLDED = {
    "doc_bigram_topk": (_doc_bigram_topk, _BIGRAM_ORACLE),
    "doc_fingerprint": (_doc_fingerprint, _FINGERPRINT_ORACLE),
    "doc_language_id": (_doc_language_id, _LANG_ORACLE),
    "doc_quality_score": (_doc_quality_score, _QUALITY_ORACLE),
    "doc_term_frequencies": (_doc_term_frequencies, _TERM_FREQ_ORACLE),
    "doc_tfidf_topk": (_doc_tfidf_topk, _TFIDF_ORACLE),
    "doc_token_stats": (_doc_token_stats, _TOKEN_STATS_ORACLE),
    "doc_vocab_overlap_hll": (_doc_vocab_overlap_hll, _VOCAB_OVERLAP_ORACLE),
}
