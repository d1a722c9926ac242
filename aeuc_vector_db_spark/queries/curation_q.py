"""Declared training-data curation queries (charter §2.C extensions):
benchmark decontamination, deterministic stratified sampling, PII
scrubbing, sequence packing, int8 quantization — each DuckDB-oracled.

No reference analog (the reference stops at vector CRUD+search); these
are the standard pretraining-pipeline operations the charter adds. All
arithmetic is exact integers or order-independent float reductions
(max / single divisions), rounded at the end — hash-stable across
engines per FIXTURES.md rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators import curation as CU
from aeuc_vector_db_spark.queries.textops import (
    _dk_polyhash,
    _dk_shingle_hashes,
    _dk_shingles,
    _dk_tokens,
)
from aeuc_vector_db_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------

def _doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus docs sharing ≥2 trigram-shingle hashes with the benchmark
    set (docs where doc_id % 97 = 5 stand in for an eval benchmark —
    they live in the corpus, so they flag themselves plus any true
    overlaps, which is exactly what decontamination must catch)."""
    from aeuc_vector_db_spark.sources.tables import ensure_min_parallelism

    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 5).select("text")
    # optimization round 16: spread the single-file corpus scan — the
    # corpus-side Arrow shingle kernel otherwise runs on one task (the
    # benchmark side stays unspread: it is the tiny filtered slice)
    out = CU.contaminated_docs(
        ensure_min_parallelism(docs), bench, shingle_n=3, min_overlap=2
    )
    return out.select("doc_id", F.col("n_hits").cast("long").alias("n_hits"))


_DECONTAMINATE_ORACLE = f"""
WITH bsh AS (
  SELECT DISTINCT unnest({_dk_shingle_hashes('text', 3)}) AS sh
  FROM documents WHERE doc_id % 97 = 5
),
csh AS (
  SELECT doc_id, unnest({_dk_shingle_hashes('text', 3)}) AS sh FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM csh JOIN bsh USING (sh)
GROUP BY doc_id HAVING COUNT(*) >= 2
"""


def _doc_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix (round 11): for every unordered
    pair of corpus sources, the number of DISTINCT trigram-shingle
    hashes the two sources share — the source-level contamination
    report a pipeline reads before deciding which sources may co-exist
    in train vs eval (the generalization of `doc_decontaminate`'s
    corpus-vs-benchmark probe to all-pairs-of-sources).

    Scale shape: one Arrow shingle pass + one DISTINCT shuffle to the
    (source, shingle) level — volume is the distinct-shingle vocabulary
    per source, not the corpus; then (optimization round 16) ONE
    group-by-shingle collecting each hash's sorted source set and a
    map-side pair expansion — a shingle shared by s sources emits its
    s·(s−1)/2 pairs from an array expression, bounded by the SOURCE
    count squared per hash, a constant. The r11-r15 self-join computed
    the whole shingle subtree TWICE (the duplicated ArrowEvalPython
    never canonicalizes equal, so ReuseExchange cannot dedupe it — the
    Arrow kernel ran once per join side, 2× the query's real work) and
    shuffled both copies; the grouped form runs the kernel once and
    shuffles once. Pair multiset unchanged: per shingle, the sorted
    distinct sources expand to exactly the (src_a < src_b) pairs the
    equi-join + filter produced — oracle hash-green at 3 SFs. The
    final aggregate has ≤ #sources² groups."""
    from aeuc_vector_db_spark.operators.text import shingle_hashes_pandas
    from aeuc_vector_db_spark.sources.tables import ensure_min_parallelism

    # spread the single-file scan: the Arrow shingle kernel (the
    # query's map-side cost) otherwise runs on ONE task
    docs = ensure_min_parallelism(load_table(spark, "documents", sf_dir))
    sh = docs.select(
        "source",
        F.explode(shingle_hashes_pandas(3)(F.col("text"))).alias("sh"),
    ).distinct()
    srcs = F.col("srcs")
    pairs = F.flatten(
        F.transform(
            srcs,
            lambda x, i: F.transform(
                F.slice(srcs, i + F.lit(2), F.size(srcs)),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    return (
        sh.groupBy("sh")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .orderBy("src_a", "src_b")
    )


_CROSS_SOURCE_ORACLE = f"""
WITH s AS (
  SELECT DISTINCT source, sh FROM (
    SELECT source, unnest({_dk_shingle_hashes('text', 3)}) AS sh FROM documents
  )
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
FROM s a JOIN s b ON a.sh = b.sh AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample (round 11 —
    `operators/curation.py weighted_priority_sample`): 200 docs drawn
    without replacement with inclusion probability tracking n_chars
    (priority sampling, Duffield/Lund/Thorup JACM 2007), deterministic
    via the content-addressed spread hash — re-running reproduces the
    EXACT membership, which the per-source (count, sum of ids)
    aggregate pins against the oracle's identical integer arithmetic."""
    from aeuc_vector_db_spark.operators.curation import weighted_priority_sample

    docs = load_table(spark, "documents", sf_dir)
    sampled = weighted_priority_sample(docs, "n_chars", k=200, salt=0)
    return (
        sampled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("source")
    )


_WEIGHTED_SAMPLE_ORACLE = f"""
WITH u AS (
  SELECT doc_id, source,
         (({_dk_polyhash("('0:' || CAST(doc_id AS VARCHAR))")}
           * 2654435761) % 4294967296) + 1 AS u,
         GREATEST(n_chars, 1) AS w
  FROM documents
),
top AS (
  SELECT source, doc_id
  FROM u ORDER BY (u * 1048576) // w, doc_id LIMIT 200
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM top GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------

_RATES = {"en": 0.5, "de": 0.25, "fr": 0.1, "es": 0.75}  # zh → default 0.0


def _doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling; the aggregate (count + id
    sum per stratum) pins the exact membership, not just the rate."""
    docs = load_table(spark, "documents", sf_dir)
    sampled = CU.stratified_sample(docs, _RATES, stratum_col="lang", salt=0)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


def _threshold_case_sql() -> str:
    """Integer keep-thresholds, precomputed in Python exactly as the
    operator does — deriving them in-engine from float rates diverges
    (Spark truncates 0.043*10000.0=429.99…994 to 429, DuckDB's exact
    DECIMAL literal math gives 430)."""
    whens = " ".join(
        f"WHEN '{k}' THEN {int(round(v * 10000))}" for k, v in sorted(_RATES.items())
    )
    return f"(CASE lang {whens} ELSE 0 END)"


_STRATIFIED_ORACLE = f"""
WITH b AS (
  SELECT lang, doc_id,
         (({_dk_polyhash("('0:' || CAST(doc_id AS VARCHAR))")}
           * 2654435761) % 4294967296) % 10000 AS bucket
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM b WHERE bucket < {_threshold_case_sql()}
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture texts carry no PII, so plant deterministic emails
    (doc_id % 7 = 0), international phone numbers (doc_id % 11 = 0) and
    separator-grouped local numbers (doc_id % 13 = 0) — the same
    in-query planting pattern the dedup queries use. The local plant
    exercises PHONE_RE's second alternative cross-engine."""
    docs = load_table(spark, "documents", sf_dir)
    with_email = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(F.col("text"))
    docs = docs.withColumn("text", with_email)
    with_phone = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.col("text"),
            F.lit(" call +1 (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    docs = docs.withColumn("text", with_phone)
    with_local = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(
            F.col("text"),
            F.lit(" or ring (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    return docs.withColumn("text", with_local)


_PII_CORPUS_SQL = """
  SELECT doc_id,
         (CASE WHEN doc_id % 7 = 0
               THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
               ELSE text END)
         || (CASE WHEN doc_id % 11 = 0
                  THEN ' call +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END)
         || (CASE WHEN doc_id % 13 = 0
                  THEN ' or ring (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END) AS text
  FROM documents
"""


def _doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = CU.scrub_pii(_pii_corpus(spark, sf_dir))
    return out.filter((F.col("n_emails") > 0) | (F.col("n_phones") > 0)).select(
        "doc_id",
        F.col("n_emails").cast("long").alias("n_emails"),
        F.col("n_phones").cast("long").alias("n_phones"),
        F.length("text_scrubbed").cast("long").alias("scrubbed_len"),
    )


_PII_ORACLE = f"""
WITH corpus AS ({_PII_CORPUS_SQL}),
scrubbed AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{CU.EMAIL_RE}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '{CU.PHONE_RE}')) AS BIGINT) AS n_phones,
         regexp_replace(regexp_replace(text, '{CU.EMAIL_RE}', '<EMAIL>', 'g'),
                        '{CU.PHONE_RE}', '<PHONE>', 'g') AS t
  FROM corpus
)
SELECT doc_id, n_emails, n_phones, CAST(length(t) AS BIGINT) AS scrubbed_len
FROM scrubbed WHERE n_emails > 0 OR n_phones > 0
"""


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

def _doc_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack each language's doc stream into 256-token chunks; the
    per-chunk (n_docs, token sum) aggregate pins every assignment."""
    docs = load_table(spark, "documents", sf_dir)
    packed = CU.pack_sequences(docs, budget_tokens=256, part_col="lang")
    return packed.groupBy("lang", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )


_SEQUENCE_PACK_ORACLE = f"""
WITH t AS (
  SELECT lang, doc_id, CAST(len({_dk_tokens('text')}) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strm_off
  FROM t
)
SELECT lang, CAST(FLOOR(strm_off / 256.0) AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
FROM o GROUP BY lang, chunk_id
"""


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------

def _emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize → dequantize → report per-vector scale, integer checksum
    of the quantized codes, and max reconstruction error. Exact max /
    single-division float ops only — order-independent, hash-stable."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = CU.quantize_int8(emb)
    deq = CU.dequantize_col("q_vec", "q_scale")
    err = F.zip_with(
        F.col("embedding").cast("array<double>"), deq, lambda a, b: F.abs(a - b)
    )
    # max_err is computed BEFORE the select that aliases the rounded
    # scale as "q_scale" — inside that select, lateral column alias
    # resolution would silently rebind deq's q_scale reference to the
    # ROUNDED value and shift the reconstruction error by ~1e-8
    q = q.withColumn(
        "__max_err__", F.aggregate(err, F.lit(0.0), lambda s, x: F.greatest(s, x))
    )
    return q.select(
        "vec_id",
        F.round("q_scale", 9).alias("q_scale"),
        F.aggregate("q_vec", F.lit(0).cast("long"), lambda s, x: s + x).alias("sum_q"),
        F.round("__max_err__", 9).alias("max_err"),
    )


_QUANTIZE_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
s AS (
  SELECT vec_id, ve,
         list_reduce(list_transform(ve, x -> abs(x)), (a, b) -> greatest(a, b)) AS amax
  FROM v
),
sc AS (
  SELECT vec_id, ve,
         CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS scale
  FROM s
),
q AS (
  SELECT vec_id, ve, scale,
         list_transform(ve, x ->
           greatest(-127, least(127, CAST(floor(x / scale + 0.5) AS INT)))) AS qv
  FROM sc
)
SELECT vec_id, ROUND(scale, 9) AS q_scale,
       CAST(list_reduce(qv, (a, b) -> a + b) AS BIGINT) AS sum_q,
       ROUND(list_reduce(
         list_transform(list_zip(ve, qv), p -> abs(p[1] - p[2] * scale)),
         (a, b) -> greatest(a, b)), 9) AS max_err
FROM q
"""


# ---------------------------------------------------------------------------
# Repetition ratio (intra-doc quality signal)
# ---------------------------------------------------------------------------

def _doc_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram repetition (1 − distinct/total), the Gopher-style
    boilerplate signal; docs ranked most-repetitive-first pin the exact
    per-doc values, not just an aggregate."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.round(CU.repetition_ratio_pandas(2)(F.col("text")), 6).alias("rep_ratio"),
    )


_REPETITION_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_dk_shingles(_dk_tokens('text'), 2)} AS grams FROM documents
)
SELECT doc_id,
       ROUND(CASE WHEN len(grams) > 0
                  THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                           / CAST(len(grams) AS DOUBLE)
                  ELSE 0.0 END, 6) AS rep_ratio
FROM sh
"""


# ---------------------------------------------------------------------------
# Source rebalancing (sample to a target stratum mix)
# ---------------------------------------------------------------------------

_TARGET_MIX = {"en": 0.3, "de": 0.2, "fr": 0.2, "es": 0.2, "zh": 0.1}


def _doc_source_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshape the corpus to the target language mix; the per-stratum
    (count, id-sum) aggregate pins the exact membership. Thresholds are
    data-derived (floor((share·B)/count·10⁴), B = min count/share) —
    the oracle recomputes the identical IEEE double sequence in SQL."""
    docs = load_table(spark, "documents", sf_dir)
    sampled = CU.source_rebalance(docs, _TARGET_MIX, stratum_col="lang", salt=0)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


def _target_values_sql() -> str:
    rows = ", ".join(f"('{k}', {v!r})" for k, v in sorted(_TARGET_MIX.items()))
    return f"(VALUES {rows}) t(lang, share)"


_REBALANCE_ORACLE = f"""
WITH c AS (
  SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
),
p AS (SELECT * FROM {_target_values_sql()}),
b AS (
  SELECT MIN(CAST(cnt AS DOUBLE) / share) AS budget
  FROM c JOIN p USING (lang) WHERE share > 0
),
thr AS (
  -- binding stratum clamps to 10000: its rate is exactly 1.0 but the
  -- IEEE round trip can floor to 9999 (same double equality as the
  -- operator's Python computation)
  SELECT c.lang,
         CASE WHEN CAST(c.cnt AS DOUBLE) / p.share = b.budget THEN 10000
              ELSE CAST(FLOOR(((p.share * b.budget) / CAST(c.cnt AS DOUBLE)) * 10000)
                        AS BIGINT) END AS t
  FROM c JOIN p USING (lang) CROSS JOIN b WHERE p.share > 0
),
s AS (
  SELECT lang, doc_id,
         (({_dk_polyhash("('0:' || CAST(doc_id AS VARCHAR))")}
           * 2654435761) % 4294967296) % 10000 AS bucket
  FROM documents
)
SELECT s.lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(s.doc_id) AS BIGINT) AS sum_doc_id
FROM s JOIN thr ON s.lang = thr.lang AND s.bucket < thr.t
GROUP BY s.lang
"""


# ---------------------------------------------------------------------------
# PCA projection (rows-only: eigendecomposition is not SQL-expressible)
# ---------------------------------------------------------------------------

def _emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project embeddings 64→8 dims; per-vector projected L2 norm plus
    the model's cumulative explained-variance (a constant column) make
    the transform's effect visible row by row. Rows-only check — the
    LEARNED matrix can't be hash-matched (eigendecomposition + BLAS
    fold orders are engine-private); the application arithmetic is
    hash-matched by the companion emb_pca_apply, which drives the same
    `project_components` code path under literal components. Variance
    ordering/energy bounds are pinned in test_curation.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    out, variance = CU.pca_project(emb, k=8)
    cum_var = float(sum(variance))
    norm = F.sqrt(
        F.aggregate("pca", F.lit(0.0), lambda s, x: s + x * x)
    )
    base = out.select(
        "vec_id",
        F.round(norm, 6).alias("pca_norm"),
        F.round(F.lit(cum_var), 4).alias("explained_var"),
    )
    # self-validation (VERDICT r8 #4): MLlib's transform projects the
    # RAW vector onto orthonormal components, so ‖Wᵀx‖ ≤ ‖x‖ must hold
    # per vector, and the projection must emit exactly k components.
    # Vectors violating either ride out as extra rows (vec_id, norm
    # excess, NULL explained_var) — a non-orthonormal or mis-shaped
    # component matrix flips the driver-visible row count.
    orig_norm = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda s, x: s + x * x,
        )
    )
    viol = (
        out.withColumn("__orig", orig_norm)
        .withColumn("__pn", norm)
        .filter(
            (F.col("__pn") > F.col("__orig") + F.lit(1e-6))
            | (F.size("pca") != F.lit(8))
        )
        .select(
            F.col("vec_id"),
            F.round(F.col("__pn") - F.col("__orig"), 6).alias("pca_norm"),
            F.lit(None).cast("double").alias("explained_var"),
        )
    )
    return base.unionByName(viol)


# ---------------------------------------------------------------------------
# Linear-projection application (hash-matched half of the PCA story)
# ---------------------------------------------------------------------------

def _emb_pca_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The projection-APPLY arithmetic of the PCA family, hash-matched:
    `project_components` (the exact code path `pca_project` uses to
    apply its learned matrix) under an 8×64 integer-derived literal
    matrix embedded verbatim in the DuckDB oracle — the
    emb_hard_negatives hyperplane-literal trick applied to PCA
    (VERDICT r12 #8). Training stays rows-only by necessity:
    eigendecomposition + BLAS gemv fold orders are engine-private, so
    only the apply half can be made bit-stable. Every dot is the same
    sequential left-to-right fold on both sides."""
    emb = load_table(spark, "embeddings", sf_dir)
    comps = CU.literal_components(8, 64)
    out = CU.project_components(emb, comps, vec_col="embedding", out_col="proj")
    return out.select(
        "vec_id",
        *[F.round(F.col("proj")[i], 9).alias(f"p{i + 1}") for i in range(8)],
    ).orderBy("vec_id")


def _pca_apply_oracle() -> str:
    from aeuc_vector_db_spark.operators.curation import literal_components

    comps = literal_components(8, 64)

    def dot_c(row):
        lits = "[" + ", ".join(repr(x) for x in row) + "]"
        return (
            f"list_reduce(list_transform(list_zip(v, {lits}), "
            "p -> p[1]*p[2]), (s, x) -> s + x)"
        )

    cols = ",\n       ".join(
        f"ROUND({dot_c(r)}, 9) AS p{i + 1}" for i, r in enumerate(comps)
    )
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT vec_id, {cols}
FROM v ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Epoch shuffle (deterministic global training order)
# ---------------------------------------------------------------------------

def _doc_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 100 documents of epoch 1's shuffled order. The seeded
    polyhash key makes the permutation engine-independent (DuckDB
    reproduces it exactly); orderBy+limit plans as
    TakeOrderedAndProject — a distributed top-k, no global sort
    materialization for the declared slice."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        CU.epoch_shuffle(docs, seed=1)
        .select("doc_id", F.col("shuffle_key").cast("long").alias("shuffle_key"))
        .limit(100)
    )


_EPOCH_SHUFFLE_ORACLE = f"""
SELECT doc_id,
       ({_dk_polyhash("('1:' || CAST(doc_id AS VARCHAR))")}
        * 2654435761) % 4294967296 AS shuffle_key
FROM documents
ORDER BY shuffle_key, doc_id
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Per-source token budget (cap each stratum's token mass)
# ---------------------------------------------------------------------------

def _doc_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at 600 tokens, drawing docs in seeded-shuffle
    order; the per-source (n_kept, token sum, id sum) pins the exact
    kept membership."""
    docs = load_table(spark, "documents", sf_dir)
    kept = CU.source_token_budget(docs, budget_tokens=600, seed=0)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


_TOKEN_BUDGET_ORACLE = f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len({_dk_tokens('text')}) AS BIGINT) AS n_tokens,
         ({_dk_polyhash("('0:' || CAST(doc_id AS VARCHAR))")}
          * 2654435761) % 4294967296 AS draw
  FROM documents
),
o AS (
  SELECT source, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY draw, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM o WHERE off < 600 GROUP BY source
"""


# ---------------------------------------------------------------------------
# End-to-end pipeline composition (round 7): the LLM training-data prep
# chain the charter names, as ONE declared oracle query
# ---------------------------------------------------------------------------

def _doc_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean (quality + repetition) → exact dedup → near dedup →
    decontaminate → leakproof split → per-(split,source) token budget →
    sequence pack, over documents ∪ planted exact copies (+200000,
    doc_id%10=0) ∪ planted near copies (+100000, doc_id%10=5, 20 chars
    cut). Every stage is an operator the dedicated queries already
    check individually; this query pins their COMPOSITION — column
    contracts, ordering determinism, and the data-dependent thresholds
    — against a DuckDB replay of the full chain. A drift in any stage
    (a doc leaking past dedup, a split assigned by doc instead of
    cluster, a budget drawing in the wrong order) diverges the final
    per-(split, source) aggregate hash."""
    from aeuc_vector_db_spark.operators import dedup as D
    from aeuc_vector_db_spark.operators import text as TX

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text", "lang", "source"
    )
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 200000
        )
    ).unionByName(
        docs.filter(F.col("doc_id") % 10 == 5)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.expr("substring(text, 1, length(text) - 20)"))
    )
    # 1. clean: quality floor + repetition ceiling
    clean = (
        corpus.withColumn("__q", TX.quality_score_col("text"))
        .withColumn("__rep", CU.repetition_ratio_pandas(2)(F.col("text")))
        .filter((F.col("__q") >= 0.5) & (F.col("__rep") < 0.9))
        .drop("__q", "__rep")
    )
    # 2. exact dedup: keep min-id per identical text. From here the
    # chain is consumed by ITERATIVE consumers (keep_one's and
    # leakproof_split's connected-components rounds each fire actions),
    # so the checkpoint is load-bearing: without it Spark re-executes
    # the Arrow quality/repetition kernels per action (the r8 sweep's
    # 57.6 s entry — VERDICT #2).
    keepers = D.exact_dedup(clean).select("doc_id")
    s2 = clean.join(keepers, "doc_id", "left_semi").localCheckpoint(eager=True)
    # 3+5 share ONE blocked-Jaccard pair computation: the shingle join
    # runs once at the BROADER 0.25 threshold keeping the jaccard value,
    # the dedup stage filters >= 0.6 from it. Jaccard is a pure function
    # of the two texts, so pairs(s2, 0.25) ∩ s4×s4 ≡ pairs(s4, 0.25) —
    # the semi-joins below reproduce stage 5's pair set exactly.
    blk = (F.col("doc_id") % 100000 % 50).alias("block")
    pairs_all = D.ngram_jaccard_pairs(
        s2.withColumn("block", blk), block_col="block",
        threshold=0.25, shingle_n=2,
    ).select("a_id", "b_id", "jaccard").localCheckpoint(eager=True)
    pairs_dup = pairs_all.filter(F.col("jaccard") >= 0.6).select("a_id", "b_id")
    drops = D.keep_one(pairs_dup).filter(~F.col("keep")).select("doc_id")
    s3 = s2.join(drops, "doc_id", "left_anti")
    # 4. decontaminate vs the benchmark stand-in (doc_id % 97 = 5)
    bench = docs.filter(F.col("doc_id") % 97 == 5).select("text")
    cont = CU.contaminated_docs(s3, bench, shingle_n=3, min_overlap=2).select(
        "doc_id"
    )
    s4 = s3.join(cont, "doc_id", "left_anti").localCheckpoint(eager=True)
    # 5. leakproof split: clusters from the broader 0.25 pair set
    # restricted to s4 survivors — related-but-not-duplicate docs must
    # not straddle the train/val boundary
    s4_ids = s4.select("doc_id")
    pairs_rel = (
        pairs_all.join(s4_ids.withColumnRenamed("doc_id", "a_id"), "a_id", "left_semi")
        .join(s4_ids.withColumnRenamed("doc_id", "b_id"), "b_id", "left_semi")
        .select("a_id", "b_id")
    )
    assigned = CU.leakproof_split(s4, pairs_rel, val_threshold=2000)
    # 6. per-(split, source) token budget in seeded-shuffle order
    budgeted = CU.source_token_budget(
        assigned.withColumn(
            "__part", F.concat_ws(":", F.col("split"), F.col("source"))
        ),
        budget_tokens=600, seed=0, stratum_col="__part",
    )
    # 7. pack the kept docs into 256-token chunks per (split, source)
    packed = CU.pack_sequences(
        budgeted, budget_tokens=256, part_col="__part",
        token_count_col=F.col("n_tokens"),
    )
    return packed.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.countDistinct("chunk_id").alias("n_chunks"),
    )


def _pipeline_oracle() -> str:
    from aeuc_vector_db_spark.queries.textops import _dk_jaccard, _SW

    quality = f"""
         0.4 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
       + 0.3 * least((CAST(len(list_filter(toks, x -> list_contains([{_SW}], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE)) / 0.1, 1.0)
       + 0.3 * greatest(0.0, 1.0 - abs(
             CAST(list_reduce(list_transform(toks, x -> CAST(length(x) AS BIGINT)),
                              (a, b) -> a + b) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) - 5.0) / 5.0)"""
    return f"""
WITH RECURSIVE
corpus AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + 200000, text, lang, source FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 100000, substr(text, 1, length(text) - 20), lang, source
  FROM documents WHERE doc_id % 10 = 5
),
scored AS (
  SELECT doc_id, text, lang, source,
         {quality} AS q,
         CASE WHEN len(grams) > 0
              THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                       / CAST(len(grams) AS DOUBLE)
              ELSE 0.0 END AS rep
  FROM (SELECT *, {_dk_tokens('text')} AS toks,
               {_dk_shingles(_dk_tokens('text'), 2)} AS grams FROM corpus)
),
clean AS (SELECT doc_id, text, lang, source FROM scored WHERE q >= 0.5 AND rep < 0.9),
s2 AS MATERIALIZED (
  SELECT doc_id, text, lang, source FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keeper FROM clean
  ) WHERE doc_id = keeper
),
sh2 AS MATERIALIZED (
  SELECT doc_id % 100000 % 50 AS block, doc_id, {_dk_shingle_hashes('text', 2)} AS shset
  FROM s2
),
-- ONE blocked-Jaccard pass at the broader 0.25 threshold, keeping the
-- value (the O(|a|·|b|) list-intersection is the oracle's hot loop —
-- mirroring the Spark side, stage 3 filters >= 0.6 from this set and
-- stage 5 restricts it to s4 survivors instead of recomputing)
p_all AS MATERIALIZED (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         {_dk_jaccard('a.shset', 'b.shset')} AS j
  FROM sh2 a JOIN sh2 b ON a.block = b.block AND a.doc_id < b.doc_id
  WHERE {_dk_jaccard('a.shset', 'b.shset')} >= 0.25
),
p_dup AS (SELECT a_id, b_id FROM p_all WHERE j >= 0.6),
e_dup AS (SELECT a_id AS u, b_id AS v FROM p_dup UNION ALL SELECT b_id, a_id FROM p_dup),
lab_dup(node, comp) AS (
  SELECT a_id, a_id FROM p_dup UNION SELECT b_id, b_id FROM p_dup
  UNION
  SELECT e.u, lab_dup.comp FROM e_dup e JOIN lab_dup ON lab_dup.node = e.v
),
drops AS (
  SELECT node AS doc_id FROM lab_dup GROUP BY node HAVING node <> MIN(comp)
),
s3 AS (SELECT * FROM s2 ANTI JOIN drops USING (doc_id)),
bsh AS (
  SELECT DISTINCT unnest({_dk_shingle_hashes('text', 3)}) AS sh
  FROM documents WHERE doc_id % 97 = 5
),
csh AS (SELECT doc_id, unnest({_dk_shingle_hashes('text', 3)}) AS sh FROM s3),
cont AS (
  SELECT doc_id FROM csh JOIN bsh USING (sh) GROUP BY doc_id HAVING COUNT(*) >= 2
),
s4 AS MATERIALIZED (SELECT * FROM s3 ANTI JOIN cont USING (doc_id)),
p_rel AS (
  SELECT a_id, b_id FROM p_all
  WHERE a_id IN (SELECT doc_id FROM s4) AND b_id IN (SELECT doc_id FROM s4)
),
e_rel AS (SELECT a_id AS u, b_id AS v FROM p_rel UNION ALL SELECT b_id, a_id FROM p_rel),
lab_rel(node, comp) AS (
  SELECT doc_id, doc_id FROM s4
  UNION
  SELECT e.u, lab_rel.comp FROM e_rel e JOIN lab_rel ON lab_rel.node = e.v
),
clusters AS (SELECT node AS doc_id, MIN(comp) AS cluster_id FROM lab_rel GROUP BY node),
assigned AS (
  SELECT s4.*,
         CASE WHEN (({_dk_polyhash("('0:' || CAST(c.cluster_id AS VARCHAR))")}
                     * 2654435761) % 4294967296) % 10000 < 2000
              THEN 'val' ELSE 'train' END AS split
  FROM s4 JOIN clusters c USING (doc_id)
),
t AS (
  SELECT split, source, doc_id,
         CAST(len({_dk_tokens('text')}) AS BIGINT) AS n_tokens,
         ({_dk_polyhash("('0:' || CAST(doc_id AS VARCHAR))")}
          * 2654435761) % 4294967296 AS draw
  FROM assigned
),
o AS (
  SELECT split, source, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY split, source ORDER BY draw, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t
),
kept AS (SELECT split, source, doc_id, n_tokens FROM o WHERE off < 600),
packed AS (
  SELECT split, source, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY split, source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strm_off
  FROM kept
)
SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
       CAST(COUNT(DISTINCT FLOOR(strm_off / 256.0)) AS BIGINT) AS n_chunks
FROM packed GROUP BY split, source
"""


def _doc_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum scheduling (round 7): length-bucketed easy→hard order
    with seeded intra-band shuffle. The check pins BOTH layers: per-band
    doc counts/char spans AND the first three doc_ids of each band in
    curriculum order (ordered string_agg in the oracle vs the rank-
    sorted fold here) — a mis-bucketed doc or a wrong shuffle key moves
    some band's head and diverges the hash."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    out = CU.curriculum_order(docs, "n_chars", n_buckets=8)
    stats = out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
    w = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    head = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("bucket")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "doc_id"))),
                    lambda s: s["doc_id"].cast("string"),
                ),
            ).alias("head_docs")
        )
    )
    return stats.join(head, "bucket")


_CURRICULUM_ORACLE = f"""
WITH b AS (
  SELECT CAST(MIN(n_chars) AS DOUBLE) AS lo, CAST(MAX(n_chars) AS DOUBLE) AS hi
  FROM documents
),
assigned AS (
  SELECT doc_id, n_chars,
         CAST(CASE WHEN hi = lo THEN 0
              ELSE least(greatest(floor((CAST(n_chars AS DOUBLE) - lo)
                                        / (hi - lo) * 8.0), 0), 7) END AS INT)
           AS bucket,
         (({_dk_polyhash("('0:' || CAST(doc_id AS VARCHAR))")}
           * 2654435761) % 4294967296) % 10000 AS shuffle_key
  FROM documents CROSS JOIN b
),
ranked AS (
  SELECT bucket, doc_id,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY shuffle_key, doc_id) AS rn
  FROM assigned
)
SELECT a.bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(a.n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(a.n_chars) AS BIGINT) AS max_chars,
       (SELECT string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn)
        FROM ranked r WHERE r.bucket = a.bucket AND r.rn <= 3) AS head_docs
FROM assigned a GROUP BY a.bucket
"""




# ---------------------------------------------------------------------------
# Hard-negative mining (round 12)
# ---------------------------------------------------------------------------


def _emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining over the embeddings fixture:
    per anchor, the top-3 most-cosine-similar vectors with a DIFFERENT
    label, mined within cosine-LSH buckets (sign pattern of 4 fixed
    hyperplanes) so pair volume is sum(bucket^2), never N^2 — see
    `operators/curation.py hard_negatives_within_buckets`. The
    hyperplanes are pure-integer-derived literals embedded verbatim in
    the DuckDB oracle, and every float fold (hyperplane dots, cosine)
    is the same sequential left-to-right fold as the k-NN family, so
    the rank order — which compares UNROUNDED doubles — hash-matches
    cross-engine."""
    emb = load_table(spark, "embeddings", sf_dir)
    out = CU.hard_negatives_within_buckets(emb, k=3, n_planes=4, dim=64)
    return out.select(
        "a_id", "neg_id", "r", F.round("cos", 9).alias("cos")
    ).orderBy("a_id", "r")


def _hard_negatives_oracle() -> str:
    from aeuc_vector_db_spark.operators.curation import lsh_hyperplanes

    planes = lsh_hyperplanes(4, 64)

    def dot_h(h):
        lits = "[" + ", ".join(repr(x) for x in h) + "]"
        return (f"list_reduce(list_transform(list_zip(v, {lits}), "
                "p -> p[1]*p[2]), (s, x) -> s + x)")

    bucket = " + ".join(
        f"(CASE WHEN {dot_h(h)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, h in enumerate(planes)
    )
    cos = (
        "(list_reduce(list_transform(list_zip(a.v, c.v), p -> p[1]*p[2]), (s, x) -> s + x)"
        " / (sqrt(list_reduce(list_transform(a.v, x -> x*x), (s, x) -> s + x))"
        " * sqrt(list_reduce(list_transform(c.v, x -> x*x), (s, x) -> s + x)) + 1e-12))"
    )
    return f"""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
b AS (SELECT vec_id, label, v, {bucket} AS bkt FROM v),
p AS (
  SELECT a.vec_id AS a_id, c.vec_id AS neg_id, {cos} AS cos
  FROM b a JOIN b c ON a.bkt = c.bkt
  WHERE a.vec_id <> c.vec_id AND a.label <> c.label
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos DESC, neg_id) AS r
  FROM p
)
SELECT a_id, neg_id, CAST(r AS BIGINT) AS r, ROUND(cos, 9) AS cos
FROM r WHERE r <= 3 ORDER BY a_id, r
"""




# ---------------------------------------------------------------------------
# Temperature-smoothed source mixing (round 12)
# ---------------------------------------------------------------------------


def _doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ=2 temperature mix over the language strata (the mT5/XLM-R
    multilingual recipe: per-stratum budgets ∝ √count, Hamilton
    largest-remainder allocation to exactly half the corpus, exact
    per-stratum rank selection by the content-addressed draw) — see
    `operators/curation.py temperature_budgets` / `temperature_mix`.
    Everything after the one IEEE √ (whose 10⁶-grid floor is
    bit-identical cross-engine) is BIGINT arithmetic, so the oracle
    reproduces the budgets exactly; the per-stratum (count, id-sum)
    aggregate pins exact membership."""
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("lang").isNotNull()
    )
    total = docs.count() // 2
    sampled = CU.temperature_mix(docs, total, stratum_col="lang", salt=0)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("lang")
    )


_TEMPERATURE_MIX_ORACLE = f"""
WITH d AS (SELECT lang, doc_id FROM documents WHERE lang IS NOT NULL),
tt AS (SELECT CAST(COUNT(*) // 2 AS BIGINT) AS total FROM d),
c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY lang),
w AS (
  SELECT lang, cnt,
         CAST(FLOOR(SQRT(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
  FROM c
),
ws AS (SELECT SUM(w) AS tw FROM w),
b0 AS (
  SELECT lang, cnt, w, (total * w) // tw AS b,
         total * w - ((total * w) // tw) * tw AS rem
  FROM w CROSS JOIN ws CROSS JOIN tt
),
lo AS (SELECT total - SUM(b) AS leftover FROM b0 CROSS JOIN tt GROUP BY total),
rk AS (
  SELECT lang, cnt, b, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rr
  FROM b0
),
bud AS (
  SELECT lang,
         LEAST(b + CASE WHEN rr <= leftover THEN 1 ELSE 0 END, cnt) AS budget
  FROM rk CROSS JOIN lo
),
s AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY (({_dk_polyhash("('0:' || CAST(doc_id AS VARCHAR))")}
                      * 2654435761) % 4294967296), doc_id
         ) AS rn
  FROM d
)
SELECT s.lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(s.doc_id) AS BIGINT) AS sum_doc_id
FROM s JOIN bud USING (lang) WHERE s.rn <= bud.budget
GROUP BY s.lang ORDER BY s.lang
"""




# ---------------------------------------------------------------------------
# Luhn-gated credit-card detection (round 12)
# ---------------------------------------------------------------------------


def _ccn_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture texts carry no card numbers, so plant them (the
    _pii_corpus pattern): a KNOWN-VALID PAN literal (doc_id % 9 = 0),
    a near-miss with the check digit off by one (doc_id % 10 = 0), and
    a doc-id-derived 16-digit run (doc_id % 12 = 0) whose Luhn
    validity varies — the detector, not the plant, decides."""
    docs = load_table(spark, "documents", sf_dir)
    planted = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 9 == 0,
               F.lit(" pay 4111111111111111 now")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 10 == 0,
               F.lit(" card 4111111111111112 maybe")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 12 == 0,
            F.concat(
                F.lit(" ref "),
                # overflow-safe derived run: mod doc_id down BEFORE the
                # square — Spark (non-ANSI) silently wraps int64 while
                # DuckDB raises on BIGINT overflow, so the raw
                # doc_id*doc_id*7919 form diverges once doc_id > ~3.4e7
                # (larger scale factors). Operands stay < 1e8, products
                # < 1e16 « 2^63, identical in both engines.
                F.lpad(
                    (((F.col("doc_id") % 100000003)
                      * (((F.col("doc_id") % 100000003) * 7919) % 100000003))
                     % F.lit(10_000_000_000_000_000)).cast("string"),
                    16, "0",
                ),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.withColumn("text", planted)


def _doc_pii_ccn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn-gated credit-card detection over the planted corpus — see
    `operators/curation.py ccn_detect` (map-side nested HOFs, exact
    integer mod-10 arithmetic identical in the oracle)."""
    out = CU.ccn_detect(_ccn_corpus(spark, sf_dir))
    return out.filter(F.col("n_ccn_candidates") > 0).orderBy("doc_id")


_CCN_ORACLE = """
WITH planted AS (
  SELECT doc_id,
         text
         || (CASE WHEN doc_id % 9 = 0 THEN ' pay 4111111111111111 now' ELSE '' END)
         || (CASE WHEN doc_id % 10 = 0 THEN ' card 4111111111111112 maybe' ELSE '' END)
         || (CASE WHEN doc_id % 12 = 0
                  THEN ' ref ' || lpad(CAST(
                         ((doc_id % 100000003)
                          * (((doc_id % 100000003) * 7919) % 100000003))
                         % 10000000000000000 AS VARCHAR), 16, '0')
                  ELSE '' END) AS text
  FROM documents
),
runs AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[0-9]+')) AS run
  FROM planted
),
cand AS (
  SELECT doc_id, run,
         CASE WHEN list_sum(list_transform(range(1, length(run)+1), i ->
                CASE WHEN (length(run) - i + 1) % 2 = 0
                     THEN CASE WHEN 2*(ascii(substr(run,i,1))-48) > 9
                               THEN 2*(ascii(substr(run,i,1))-48)-9
                               ELSE 2*(ascii(substr(run,i,1))-48) END
                     ELSE ascii(substr(run,i,1))-48 END)) % 10 = 0
              THEN 1 ELSE 0 END AS ok
  FROM runs WHERE length(run) BETWEEN 13 AND 19
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ccn_candidates,
       CAST(SUM(ok) AS BIGINT) AS n_ccn_valid
FROM cand GROUP BY doc_id ORDER BY doc_id
"""


QUERIES = {
    "doc_curriculum_order": (_doc_curriculum_order, _CURRICULUM_ORACLE),
    "doc_pipeline_e2e": (_doc_pipeline_e2e, _pipeline_oracle()),
    "doc_decontaminate": (_doc_decontaminate, _DECONTAMINATE_ORACLE),
    "doc_cross_source_contamination": (_doc_cross_source_contamination,
                                       _CROSS_SOURCE_ORACLE),
    "doc_weighted_sample": (_doc_weighted_sample, _WEIGHTED_SAMPLE_ORACLE),
    "doc_epoch_shuffle": (_doc_epoch_shuffle, _EPOCH_SHUFFLE_ORACLE),
    "doc_source_token_budget": (_doc_source_token_budget, _TOKEN_BUDGET_ORACLE),
    "doc_repetition_ratio": (_doc_repetition_ratio, _REPETITION_ORACLE),
    "doc_source_rebalance": (_doc_source_rebalance, _REBALANCE_ORACLE),
    "emb_pca_project": (_emb_pca_project, None),
    "emb_pca_apply": (_emb_pca_apply, _pca_apply_oracle()),
    "doc_stratified_sample": (_doc_stratified_sample, _STRATIFIED_ORACLE),
    "doc_pii_scrub": (_doc_pii_scrub, _PII_ORACLE),
    "doc_sequence_pack": (_doc_sequence_pack, _SEQUENCE_PACK_ORACLE),
    "emb_quantize_int8": (_emb_quantize_int8, _QUANTIZE_ORACLE),
    "emb_hard_negatives": (_emb_hard_negatives, _hard_negatives_oracle()),
    "doc_temperature_mix": (_doc_temperature_mix, _TEMPERATURE_MIX_ORACLE),
    "doc_pii_ccn": (_doc_pii_ccn, _CCN_ORACLE),
}
