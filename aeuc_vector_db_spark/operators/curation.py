"""Training-data curation operators: benchmark decontamination,
deterministic stratified sampling, PII scrubbing, sequence packing, and
int8 embedding quantization.

These extend the engine beyond the reference's surface (charter §2.C:
"the operations a large-scale training-data pipeline would need"). No
reference analog — the semantics follow standard pretraining-pipeline
practice:

- decontamination: flag corpus documents sharing n-gram overlap with an
  evaluation/benchmark set (the GPT-3 appendix-C recipe: 13-gram
  collision ⇒ contaminated; n is a knob here).
- stratified sampling: per-stratum keep-rates applied via a
  deterministic content hash, so the sample is reproducible across runs
  and engines — never `rand()`.
- PII scrubbing: regex redaction of emails/phone numbers with per-doc
  redaction counts (patterns kept RE2-and-Java-compatible so the DuckDB
  oracle runs the identical regex).
- sequence packing: concat-then-chunk assignment of documents to
  fixed-token-budget training chunks (a document's chunk is where its
  first token lands in the per-stratum concatenated stream).
- int8 quantization: per-vector symmetric scale (max|x|/127), explicit
  half-up rounding so Spark and the oracle agree bit-for-bit.

Scale notes (100 TB):
- Decontamination broadcasts the benchmark shingle-hash set (benchmarks
  are small by construction — MBs, not TBs), so the corpus pass is
  map-side: no shuffle of corpus text, only the per-doc hit counts.
- Stratified sampling is a pure map-side filter (hash + literal rate
  lookup) — fully pushdown-friendly, zero shuffle.
- PII scrubbing is per-row regex — narrow, no shuffle; at scale the
  regex runs inside whole-stage codegen (built-in regexp_*, no UDF).
- Sequence packing needs a per-stratum running sum — one shuffle on the
  stratum key; the stream order is an explicit column (not partition
  luck), so chunk ids are deterministic under any parallelism.
- Quantization is per-row HOF arithmetic — narrow; quantized vectors
  are 4× smaller on disk, which is the point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aeuc_vector_db_spark.functions.vector import as_double
from aeuc_vector_db_spark.operators.text import (
    polyhash_col,
    shingle_hashes_col,
    tokens_col,
)

# RE2-and-Java-compatible (no backreferences, no lookaround): the DuckDB
# oracle must be able to run the IDENTICAL pattern.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Two alternatives: international ('+' prefix, ≥8 chars of digits and
# separators) and separator-grouped NANP-style locals — 555-010-4242,
# (555) 010-4242, 555 010 4242. Deliberately NOT matched: bare digit
# runs without separators (5550104242) and 7-digit 3-4 locals — both
# collide with ids/quantities far more often than they catch real PII.
PHONE_RE = r"\+[0-9][0-9() -]{6,}[0-9]|\(?[0-9]{3}\)?[ -][0-9]{3}[ -][0-9]{4}"


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    shingle_n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """(id, n_hits): corpus docs sharing ≥ min_overlap distinct n-gram
    hashes with ANY benchmark text.

    The benchmark's distinct shingle-hash set is broadcast; the corpus
    side explodes its (already distinct per doc) shingle hashes and
    semi-joins map-side, so n_hits = |doc's shingles ∩ benchmark
    shingles| with no corpus shuffle of text — only (id, count) pairs
    reach the aggregate.
    """
    from aeuc_vector_db_spark.operators.text import shingle_hashes_pandas

    # corpus side: Arrow batch kernel (the HOF SQL form is interpreted —
    # fine for the small benchmark side, ~10× slower on the corpus side)
    c = corpus.select(
        F.col(id_col),
        F.explode(shingle_hashes_pandas(shingle_n)(F.col(text_col))).alias("__sh__"),
    )
    b = (
        benchmark.select(
            F.explode(shingle_hashes_col(F.col(bench_text_col), shingle_n)).alias("__sh__")
        )
        .distinct()
    )
    return (
        c.join(F.broadcast(b), "__sh__")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_overlap)
    )


SAMPLE_SPREAD = 2654435761  # Knuth's multiplicative constant, ⌊2³²/φ⌋


def sample_bucket_col(id_col: Column | str, salt: int = 0, buckets: int = 10000) -> Column:
    """Deterministic per-row sample bucket in [0, buckets):
    Fibonacci-spread polyhash of "<salt>:<id>" — content-addressed,
    reproducible across engines (the oracle computes the identical
    arithmetic), unlike rand(seed) which is partition-order-dependent.

    The raw polyhash of sequential numeric ids is a low-avalanche
    polynomial (ids 0..299 all bucket into one ~25% span — a rate-0.2
    sample would draw NOTHING); multiplying by ⌊2³²/φ⌋ mod 2³²
    equidistributes consecutive hashes across the bucket space
    (multiplicative hashing). polyhash < 2³¹ keeps the product under
    2⁶³ — exact in BIGINT on both engines."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    # salt goes FIRST: the fold is h = h*31 + char, so a trailing salt
    # would only shift every hash by a constant (salt 0 and 1 would draw
    # near-identical samples); a leading salt multiplies through every
    # subsequent character and fully decorrelates the draws
    key = F.concat_ws(":", F.lit(str(salt)), c.cast("string"))
    spread = F.pmod(polyhash_col(key) * F.lit(SAMPLE_SPREAD), F.lit(4294967296))
    return F.pmod(spread, F.lit(buckets))


def weighted_priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic weight-proportional sample WITHOUT replacement —
    priority sampling (Duffield/Lund/Thorup, JACM 2007; public
    algorithm): each row draws a pseudo-uniform u from the same
    content-addressed spread hash as `stratified_sample`, gets priority
    u/weight, and the k smallest priorities are kept — heavier rows
    draw proportionally smaller priorities, so inclusion probability
    tracks weight (the length/quality-weighted document sampling a
    training pipeline runs). All-integer: priority is
    (u · 2²⁰) div weight with u < 2³² (product < 2⁵³ — exact in BIGINT
    on both engines), ties broken by id, so the sample is a pure
    function of (corpus, salt) and the DuckDB oracle reproduces the
    exact membership.

    Scale shape: the hash/priority is map-side; the k-smallest
    selection is a TakeOrderedAndProject (per-partition top-k, then a
    k-row merge on the driver side of the exchange) — no global sort,
    no shuffle of the corpus. Weights < 1 clamp to 1 (priority needs a
    positive integer divisor)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.concat_ws(":", F.lit(str(salt)), F.col(id_col).cast("string"))
    u = F.pmod(
        polyhash_col(key) * F.lit(SAMPLE_SPREAD), F.lit(4294967296)
    ) + F.lit(1)
    w = F.greatest(F.col(weight_col).cast("long"), F.lit(1))
    out = (
        df.withColumn("__u__", u)
        .withColumn("__w__", w)
        .withColumn("__pri__", F.expr("(__u__ * 1048576) div __w__"))
        .orderBy("__pri__", id_col)
        .limit(k)
    )
    return out.drop("__u__", "__w__", "__pri__")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its deterministic sample bucket falls under its
    stratum's rate: bucket(id, salt) < rate[stratum] * 10000.

    Map-side only — the rate table is a literal CASE chain (strata are
    few by definition), the hash is a per-row fold: no join, no shuffle,
    survives predicate pushdown reordering. Re-running with the same
    salt reproduces the exact sample; changing salt draws a fresh one.

    The per-stratum keep-threshold is computed ONCE in Python as an
    integer (round(rate·10000)) and embedded as a literal: deriving it
    in-engine from the float rate diverges between engines (Spark's
    double 0.043*10000.0 = 429.99…994 truncates to 429; DuckDB
    evaluates the literal in exact DECIMAL and gets 430), which would
    break oracle parity for most three-decimal rates.
    """
    thresholds = {k: int(round(v * 10000)) for k, v in rates.items()}
    return _threshold_filter(
        df, thresholds, stratum_col, id_col, salt,
        default_threshold=int(round(default_rate * 10000)),
    )


def _threshold_filter(
    df: DataFrame,
    thresholds: dict[str, int],
    stratum_col: str,
    id_col: str,
    salt: int,
    default_threshold: int = 0,
) -> DataFrame:
    """Shared keep-filter: bucket(id, salt) < integer threshold looked up
    by stratum via a literal CASE chain (used by stratified_sample and
    source_rebalance — one implementation to keep in sync, not two).
    None strata (possible when thresholds are data-derived) are skipped
    in the chain and fall to the default."""
    thr = None
    for k, t in sorted((k, t) for k, t in thresholds.items() if k is not None):
        cond = F.col(stratum_col) == F.lit(k)
        lit = F.lit(int(t))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    default_t = F.lit(int(default_threshold))
    thr = default_t if thr is None else thr.otherwise(default_t)
    return df.filter(sample_bucket_col(id_col, salt) < thr)


def repetition_ratio_col(text_col: Column | str, n: int = 2) -> Column:
    """Intra-document repetition: 1 − distinct-n-grams / total-n-grams
    (0.0 for docs with no n-grams). The Gopher/C4-style quality signal —
    boilerplate and looping generations repeat n-grams heavily. Pure
    per-row HOF arithmetic: narrow, no shuffle, oracle-expressible.
    """
    from aeuc_vector_db_spark.operators.text import shingles_col

    sh = shingles_col(tokens_col(text_col), n)
    total = F.size(sh).cast("double")
    distinct = F.size(F.array_distinct(sh)).cast("double")
    return F.when(total > 0.0, F.lit(1.0) - distinct / total).otherwise(F.lit(0.0))


def repetition_ratio_pandas(n: int = 2):
    """Arrow twin of repetition_ratio_col — identical values (the ratio
    is 1 − distinct/total over exact integer counts; one IEEE division
    both paths). The interpreted HOF form costs ~10× more per row; this
    is the corpus-scale path, the Column form is the oracle-parity
    documentation."""
    import pandas as pd

    from aeuc_vector_db_spark.operators.text import _py_tokens

    def f(texts):
        out = []
        for s in texts:
            toks = _py_tokens(s)
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            out.append(1.0 - len(set(grams)) / len(grams) if grams else 0.0)
        return pd.Series(out)

    # real type objects, not strings — `from __future__ import
    # annotations` would stringify inline hints and break inference
    f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(f, "double")


def rebalance_thresholds(
    counts: dict[str, int], target: dict[str, float], buckets: int = 10000
) -> dict[str, int]:
    """Per-stratum sample thresholds that reshape observed counts to a
    target mix, keeping ALL of the scarcest (relative to its target
    share) stratum: budget B = min over strata of count/share; stratum s
    keeps rate share_s·B/count_s (≤ 1 by construction of B).

    Thresholds are floor(rate·buckets) as INTEGERS, computed driver-side
    with the exact IEEE sequence ((share · B) / count) · buckets that
    the oracle SQL spells out — floor, not round(), because Python
    rounds half-to-even and SQL rounds half-away (the stratified_sample
    lesson, with data-derived rates this time).

    Binding strata (count/share == B) are clamped to `buckets` exactly:
    their rate is mathematically 1.0, but the IEEE round trip
    ((share·(count/share))/count)·buckets can land at 9999.999…, and
    flooring THAT silently drops rows from precisely the stratum the
    budget was chosen to keep whole. The oracle replicates the clamp
    with the same double equality.

    Strata absent from `target` (or None — these keys are data-derived)
    get threshold 0 (excluded); target entries absent from the data are
    ignored.
    """
    import math

    ratio = {
        s: float(counts[s]) / target[s]
        for s in counts
        if s is not None and s in target and target[s] > 0
    }
    if not ratio:
        return {s: 0 for s in counts}
    budget = min(ratio.values())
    return {
        s: (
            0
            if s not in ratio
            else buckets
            if ratio[s] == budget
            else math.floor(((target[s] * budget) / float(counts[s])) * buckets)
        )
        for s in counts
    }


def source_rebalance(
    df: DataFrame,
    target: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Sample the corpus to a target stratum mix (deterministic
    content-hash draw). One aggregate collect (|strata| rows) to derive
    thresholds, then the same map-side filter as stratified_sample —
    no join, no shuffle of the data itself."""
    counts = {
        r[stratum_col]: r["count"]
        for r in df.groupBy(stratum_col).count().collect()
    }
    thrs = rebalance_thresholds(counts, target)
    return _threshold_filter(df, thrs, stratum_col, id_col, salt)


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_scrubbed",
) -> DataFrame:
    """Redact emails/phones; adds (out_col, n_emails, n_phones).

    Counts are taken BEFORE replacement (a phone inside an email would
    otherwise be double-handled); emails are replaced first, then
    phones, so the redaction tokens themselves can't match the phone
    pattern. Pure built-in regexp_* — whole-stage codegen, no UDF.
    """
    t = F.col(text_col)
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(EMAIL_RE)))
        .withColumn("n_phones", F.regexp_count(t, F.lit(PHONE_RE)))
        .withColumn(
            out_col,
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
            ),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    part_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: Column | None = None,
) -> DataFrame:
    """Concat-then-chunk packing: within each stratum, documents are laid
    out in `order_col` order as one token stream; a document's chunk_id
    is floor(stream_offset / budget_tokens) — where its first token
    lands. Adds (n_tokens, stream_offset, chunk_id).

    One shuffle (the per-stratum window). The stream order is an
    explicit column, so chunk assignment is deterministic under any
    partitioning — never rely on arrival order. At 100 TB you pack
    within natural shards (date, source) rather than one global stream;
    part_col IS that shard key, so no global sort exists anywhere.
    """
    n_tok = (
        token_count_col
        if token_count_col is not None
        else F.size(tokens_col(F.col(text_col)))
    )
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("n_tokens", n_tok.cast("bigint"))
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return out.withColumn("stream_offset", offset).withColumn(
        "chunk_id", F.floor(F.col("stream_offset") / F.lit(budget_tokens))
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_col: str = "q_scale",
    q_col: str = "q_vec",
) -> DataFrame:
    """Adds (scale_col DOUBLE, q_col ARRAY<INT>): symmetric per-vector
    int8 quantization. scale = max|x| / 127 (1.0 for the all-zero vector
    so dequantization is total); q = clamp(floor(x/scale + 0.5), -127,
    127) — floor(x+0.5) is EXPLICIT half-up rounding, chosen over
    round() because Spark and DuckDB disagree on banker's rounding of
    doubles.

    DataFrame-level on purpose: the scale must be materialized as a
    column BEFORE the per-element transform references it — embedding
    the max-abs aggregate inside the element lambda would re-fold the
    whole array per element (O(d²); HOFs are interpreted, no CSE rescue
    — the jaccard_col lesson).
    """
    from aeuc_vector_db_spark.functions.vector import let_col

    v = as_double(vec_col)
    amax = F.aggregate(v, F.lit(0.0), lambda s, x: F.greatest(s, F.abs(x)))
    # let-bound: the when() references the max-abs fold in both the
    # predicate and the value — unbound it folds the array twice per row
    out = df.withColumn(
        scale_col,
        let_col(
            amax,
            lambda m: F.when(m > 0.0, m / F.lit(127.0)).otherwise(F.lit(1.0)),
        ),
    )
    s = F.col(scale_col)
    return out.withColumn(
        q_col,
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x / s + F.lit(0.5)).cast("int")),
            ),
        ),
    )


def pca_project(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> tuple[DataFrame, list[float]]:
    """MLlib PCA projection of an embedding column to k dims.

    Returns (df + out_col ARRAY<DOUBLE>, explained-variance ratios,
    length k, non-increasing). The fit is MLlib's distributed
    covariance + local eigendecomposition — one pass over the corpus;
    the projection afterwards is a map-side matrix multiply. The other
    compression lever next to quantize_int8: 64→8 dims is 8× smaller
    and keeps the top-variance structure for coarse search/clustering.

    Not SQL-expressible (eigendecomposition), so declared queries over
    this are rows-only checks; semantics are pinned by unit tests
    (dimension, variance ordering, energy bound, refit determinism).
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    vec = df.withColumn("__features__", array_to_vector(as_double(vec_col)))
    model = PCA(k=k, inputCol="__features__", outputCol="__pca__").fit(vec)
    # apply through the shared literal-matrix fold (project_components)
    # instead of model.transform: same math (MLlib's transform is x·PC
    # with no centering), but the multiply stays inside whole-stage
    # codegen as HOF folds — no Vector UDT round trip per row — and the
    # application arithmetic is the exact code path the hash-matched
    # emb_pca_apply query pins against DuckDB
    pc = model.pc.toArray()  # d × k
    comps = [pc[:, i].tolist() for i in range(k)]
    out = project_components(df, comps, vec_col=vec_col, out_col=out_col)
    return out, [float(v) for v in model.explainedVariance]


def project_components(
    df: DataFrame,
    components: "list[list[float]]",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Map-side application of a k×d projection matrix:
    `out_col[i] = <components[i], vec>` — the apply half of PCA (and of
    any learned linear projection), factored out so it can be pinned
    cross-engine. Each dot is the engine's standard sequential
    left-to-right fold (`dot_col`), so with literal components the
    result is bit-reproducible in any engine folding the same way.
    PCA *training* can never be hash-matched (eigendecomposition + BLAS
    gemv use engine-private fold orders), which is why emb_pca_project
    stays rows-only while emb_pca_apply — this operator under
    integer-derived literal components — hash-matches the arithmetic.

    Plan shape: zero shuffles, zero UDFs — k codegen'd HOF folds per
    row; the matrix rides in the plan as literals (k·d ≤ a few
    thousand), never a join."""
    from aeuc_vector_db_spark.functions.vector import dot_col

    v = as_double(vec_col)
    return df.withColumn(
        out_col,
        F.array(
            *[
                dot_col(v, F.array(*[F.lit(float(x)) for x in row]))
                for row in components
            ]
        ),
    )


def literal_components(k: int, dim: int) -> "list[list[float]]":
    """Deterministic integer-derived k×d component matrix with exactly
    representable dyadic entries — the lsh_hyperplanes recipe applied
    to projection testing, so the SAME literals are constructible in
    any engine:

        c[i][j] = ((i·53 + j·29) mod 17 − 8) / 8  ∈ [−1, 1]
    """
    return [
        [((i * 53 + j * 29) % 17 - 8) / 8.0 for j in range(dim)]
        for i in range(k)
    ]


def dequantize_col(q_col: Column | str, scale_col: Column | str) -> Column:
    """ARRAY<DOUBLE> back from quantize_int8's (q_vec, q_scale) pair.
    scale_col must be a plain column reference (see quantize_int8's
    note on embedding aggregates in element lambdas)."""
    q = F.col(q_col) if isinstance(q_col, str) else q_col
    s = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    return F.transform(q, lambda x: x.cast("double") * s)


def epoch_shuffle_key_col(
    id_col: Column | str, seed: int = 0
) -> Column:
    """Deterministic pseudorandom sort key for training-epoch shuffling:
    Knuth-finalized polyhash of (seed || ':' || id). Different seeds
    decorrelate epoch orders; the same seed reproduces the exact order
    on any engine (polyhash + integer finalizer both have exact DuckDB
    mirrors — never `rand()`, whose sequence is partitioning-dependent).

    The multiplicative finalizer (× 2654435761 mod 2³²) is REQUIRED, not
    decoration: the raw rolling polyhash of sequential ids is monotone in
    the final digit (h("1:41") = h("1:4")·31 + '1'), so sorting by it
    nearly reproduces id order — the same reason sample_bucket_col
    finalizes. Ids are short strings, so the per-char HOF fold is O(10)
    per row — unlike text hashing, no Arrow twin is needed."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    raw = polyhash_col(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    return (raw * F.lit(2654435761)) % F.lit(4294967296)


def epoch_shuffle(
    df: DataFrame, seed: int = 0, id_col: str = "doc_id", key_col: str = "shuffle_key"
) -> DataFrame:
    """Globally shuffled epoch order: adds the seeded key column and
    sorts by (key, id) — id tie-break keeps the order total.

    Scale shape: `orderBy` is Spark's range-partitioned distributed
    sort (sampled range boundaries → per-partition sort) — no global
    row_number/single-partition window anywhere. Writers consume the
    sorted partitions directly (file order IS epoch order); a global
    position column is deliberately NOT produced, because materializing
    one serializes the pipeline through a 1-partition window."""
    return df.withColumn(key_col, epoch_shuffle_key_col(id_col, seed)).orderBy(
        key_col, id_col
    )


def source_token_budget(
    df: DataFrame,
    budget_tokens: int,
    seed: int = 0,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cap each stratum at a token budget: within each source, documents
    are drawn in seeded-shuffle order (fair, deterministic — not
    "whatever sorted first") and kept while the running token total of
    PRIOR kept docs is below the budget; the first doc crossing the
    budget is the last one in. Adds (n_tokens, budget_offset) and
    filters to the kept prefix.

    One shuffle (per-stratum window on the shuffle key). This is the
    mix-control primitive next to source_rebalance: rebalance hits a
    target DOCUMENT mix, this caps TOKENS — what actually bounds
    training cost. Skewed strata are fine: the window partitions by
    stratum, and a stratum's rows sort within their partitions."""
    out = df.withColumn("n_tokens", F.size(tokens_col(F.col(text_col))).cast("bigint"))
    out = out.withColumn("__draw__", epoch_shuffle_key_col(id_col, seed))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy("__draw__", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = out.withColumn(
        "budget_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return out.filter(F.col("budget_offset") < F.lit(budget_tokens)).drop("__draw__")


def leakproof_split(
    docs: DataFrame,
    pairs: DataFrame,
    val_threshold: int = 2000,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Near-dup-aware train/validation split: the split UNIT is the
    connected component of the near-duplicate graph, never the
    document — so no near-dup pair can straddle the boundary (the
    classic eval leak: a validation doc whose near-copy sits in the
    training set makes the benchmark score a memorization probe).

    `pairs` is any (a_id, b_id) near-dup pair set (MinHash, n-gram
    Jaccard, embedding cosine — all of dedup.py's generators fit);
    components come from the O(log n)-round star contraction, and docs
    with no dup edge are their own singleton cluster. The split
    assignment hashes the CLUSTER id through the same deterministic
    Fibonacci-spread bucket as stratified_sample (bucket <
    `val_threshold` of 10,000 → 'val'), so re-running reproduces the
    split exactly and changing `salt` redraws it.

    Returns docs + (cluster_id, split). Scale shape: one CC over the
    pair set (tiny relative to the corpus), one left join back, then a
    pure map-side hash — no extra corpus shuffle.
    """
    from aeuc_vector_db_spark.operators.dedup import connected_components

    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    out = docs.join(comp, id_col, "left")
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    bucket = sample_bucket_col(cluster.cast("string"), salt=salt)
    split = F.when(bucket < F.lit(int(val_threshold)), F.lit("val")).otherwise(
        F.lit("train")
    )
    return out.select(
        *[F.col(c) for c in docs.columns],
        cluster.alias("cluster_id"),
        split.alias("split"),
    )


def leakproof_kfold(
    docs: DataFrame,
    pairs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """K-fold cross-validation assignment with the same no-leak
    guarantee as `leakproof_split`: the fold UNIT is the near-dup
    graph's connected component, so a document and its near-copies
    always land in the same fold — no fold's held-out set contains a
    near-duplicate of another fold's training data.

    Fold = (Fibonacci-spread bucket of the CLUSTER id) mod k: the
    bucket is equidistributed over [0, 10000), so folds are balanced in
    expectation at the cluster level; `salt` redraws the assignment
    deterministically. Returns docs + (cluster_id, fold ∈ [0, k)).
    Scale shape identical to leakproof_split: one CC over the pair set,
    one left join, map-side hash — no corpus shuffle."""
    if not 2 <= k <= 10000:
        raise ValueError(f"k must be in [2, 10000], got {k}")
    from aeuc_vector_db_spark.operators.dedup import connected_components

    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    out = docs.join(comp, id_col, "left")
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    bucket = sample_bucket_col(cluster.cast("string"), salt=salt)
    return out.select(
        *[F.col(c) for c in docs.columns],
        cluster.alias("cluster_id"),
        F.pmod(bucket, F.lit(k)).cast("long").alias("fold"),
    )


def curriculum_order(
    docs: DataFrame,
    score_col: str,
    n_buckets: int = 8,
    salt: int = 0,
    id_col: str = "doc_id",
    hard_first: bool = False,
) -> DataFrame:
    """Deterministic curriculum scheduling: bucket the corpus by a
    difficulty proxy (length, quality score, loss estimate) into
    `n_buckets` equi-width bands over the observed [min, max] — the
    same cross-engine-exact bucket arithmetic as `histogram_sketch` —
    and shuffle WITHIN each band by the seeded Fibonacci-spread hash.
    The training order is the tuple sort (bucket, shuffle_key, id):
    easy→hard band progression (or hard→easy with `hard_first`) with
    reproducible intra-band mixing; `salt` redraws the mix per epoch.

    Returns docs + (bucket INT, shuffle_key LONG). Deliberately NOT a
    global row_number: the consumer materializes the order with a
    distributed range sort (`orderBy(bucket, shuffle_key, id).write`),
    which scales; a single-partition position window would not. NULL
    scores go to the last bucket (they sort after every real band).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    v = F.col(score_col).cast("double")
    bounds = docs.agg(
        F.min(v).alias("lo"), F.max(v).alias("hi")
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:  # all-NULL scores: one band, hash order
        bucket = F.lit(0)
    else:
        raw = F.floor(
            (v - F.lit(lo)) / (F.lit(hi) - F.lit(lo)) * F.lit(float(n_buckets))
        )
        band = (
            F.when(F.lit(hi == lo), F.lit(0))
            .otherwise(F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)))
            .cast("int")
        )
        if hard_first:
            band = F.lit(n_buckets - 1) - band
        bucket = F.when(v.isNull(), F.lit(n_buckets)).otherwise(band)
    key = sample_bucket_col(F.col(id_col).cast("string"), salt=salt)
    return docs.select(
        *[F.col(c) for c in docs.columns],
        bucket.cast("int").alias("bucket"),
        key.cast("long").alias("shuffle_key"),
    )


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Foreign-key audit: child rows whose key has no parent — the
    cross-TABLE data-quality check beside the manifest's single-table
    CHECK constraints. One broadcast/shuffled LEFT ANTI join (never a
    full materialization of either side); NULL child keys are reported
    separately (SQL FK semantics: NULL references nothing and violates
    nothing, but you want to SEE the count). Output: one row,
    (n_orphans, n_null_keys, orphan_key_sample — smallest 5 for a
    stable, actionable error message)."""
    nn = child.filter(F.col(child_key).isNotNull())
    orphans = nn.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    sample = (
        orphans.select(child_key).distinct().orderBy(child_key).limit(5)
    )
    agg = orphans.agg(F.count(F.lit(1)).alias("n_orphans")).crossJoin(
        child.agg(
            F.sum(F.col(child_key).isNull().cast("long")).alias("n_null_keys")
        )
    )
    keys = sample.agg(
        F.concat_ws(",", F.collect_list(F.col(child_key).cast("string"))).alias(
            "orphan_key_sample"
        )
    )
    return agg.crossJoin(keys)


def histogram_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    bins: int = 64,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Distribution drift between two datasets over `value_col`: total
    variation distance ½·Σ|p_a − p_b| computed from two equi-width
    histogram sketches with COMMON bounds. The numerator is held as an
    EXACT integer — Σ|c_a·n_b − c_b·n_a| — with one double division at
    the end, so the drift score is hash-exact cross-engine and
    order-independent. Shuffle = 2×bins rows; the monitoring pass a
    100 TB table gets nightly. Output: (tvd, n_a, n_b)."""
    from aeuc_vector_db_spark.operators.sketch import histogram_sketch

    if lo is None or hi is None:
        bounds = (
            a.select(F.col(value_col).cast("double").alias("__v__"))
            .unionAll(b.select(F.col(value_col).cast("double").alias("__v__")))
            .agg(F.min("__v__").alias("lo"), F.max("__v__").alias("hi"))
            .first()
        )
        lo, hi = float(bounds["lo"]), float(bounds["hi"])
    sa = histogram_sketch(a, value_col, bins=bins, lo=lo, hi=hi).select(
        "bucket", F.col("cnt").alias("ca")
    )
    sb = histogram_sketch(b, value_col, bins=bins, lo=lo, hi=hi).select(
        "bucket", F.col("cnt").alias("cb")
    )
    j = sa.join(sb, "bucket", "full_outer").select(
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    totals = j.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    # exact integer numerator over the (tiny, <= bins-row) cell table
    num = (
        j.crossJoin(F.broadcast(totals))
        .agg(
            F.sum(
                F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
            ).cast("long").alias("numer"),
            F.min("n_a").alias("n_a"),
            F.min("n_b").alias("n_b"),
        )
    )
    tvd = F.col("numer").cast("double") / (
        F.lit(2.0) * F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return num.select(tvd.alias("tvd"), "n_a", "n_b")


def lsh_hyperplanes(n_planes: int, dim: int) -> "list[list[float]]":
    """Deterministic pseudo-random hyperplanes for cosine-LSH
    bucketing (Charikar, STOC'02 random hyperplane rounding) — pure
    integer arithmetic so the SAME literals are constructible in any
    engine (the DuckDB oracle embeds them verbatim):

        h[i][j] = ((i·97 + j·31) mod 19 − 9) / 9  ∈ [−1, 1]
    """
    return [
        [((i * 97 + j * 31) % 19 - 9) / 9.0 for j in range(dim)]
        for i in range(n_planes)
    ]


def derive_n_planes(
    n_rows: int,
    target_bucket_rows: int = 2048,
    min_planes: int = 4,
    max_planes: int = 16,
) -> int:
    """Auto-derive the LSH plane count from corpus size (the
    `_derive_sample_mod` pattern applied to bucketed mining): enough
    planes that the EXPECTED bucket size n/2^p falls at or below
    `target_bucket_rows`, clamped to [min_planes, max_planes]. With
    even buckets the pair volume Σnᵢ² is then ≈ n·target — linear in
    n, the property that keeps mining feasible at 100 TB instead of
    N². Real buckets skew with directional clustering (same-pointing
    vectors are the POINT of the bucketing), so measured Σnᵢ² runs
    above the even-bucket floor; tools/soak_hard_negatives.py measures
    the real curve at 500k vectors. Derivation is a starting point,
    not a guarantee — pass n_planes explicitly to pin a plan."""
    import math

    p = math.ceil(math.log2(max(1.0, n_rows / max(1, target_bucket_rows))))
    return max(min_planes, min(max_planes, p))


def hard_negatives_within_buckets(
    emb: DataFrame,
    k: int = 3,
    n_planes: "int | None" = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training data: for every
    anchor vector, the top-k most-similar vectors with a DIFFERENT
    label — the negatives that actually move an embedding model
    (random negatives are trivially separable; the informative ones
    are the near-misses).

    All-pairs mining is O(N²) — a non-starter at corpus scale — so
    pairs form only WITHIN cosine-LSH buckets (sign pattern of
    `n_planes` fixed random hyperplanes, Charikar STOC'02): vectors
    that could be hard negatives of each other point the same way and
    land in the same bucket with high probability. Pair volume is
    Σ nᵢ² over bucket sizes (the SemDeDup-style bound, never N²), and
    `n_planes` is the knob — each extra plane halves expected bucket
    size, quartering pair volume. Plan shape: one map-side bucket
    assignment (the hyperplane dots are literal-array folds inside
    codegen), one shuffle on the bucket key for the self-join, one
    shuffle on the anchor for the per-anchor top-k window; the rank
    order (cos DESC, id ASC) is total, and every float fold matches
    the DuckDB oracle's bit-for-bit (same sequential left-to-right
    fold as the k-NN family).

    `n_planes=None` auto-derives the plane count from the corpus size
    (`derive_n_planes`) at the cost of one count job at build time —
    the adaptive-RFM pattern; pass an explicit value to keep the build
    action-free and the plan pinned (the declared query does).

    Returns (a_id, neg_id, r, cos) with r ≤ k per anchor.
    """
    from aeuc_vector_db_spark.functions.vector import dot_col, sq_norm_col

    if n_planes is None:
        n_planes = derive_n_planes(emb.count())
    # Parallelism floor: the pair cos folds evaluate in the JOIN's
    # stage, which inherits the LEFT side's partitioning — a
    # single-file corpus (the sf fixtures) otherwise runs every pair
    # on ONE core while the window stage beyond it gets 32 (measured
    # 3.9 s for 324k pairs at sf0.1, core-bound on interpreted HOF
    # folds). A corpus big enough to matter already arrives in many
    # partitions, so this round-robin widen only ever fires on small
    # inputs; results are partitioning-invariant (soak-asserted).
    from aeuc_vector_db_spark.sources.tables import ensure_min_parallelism

    emb = ensure_min_parallelism(
        emb, target=emb.sparkSession.sparkContext.defaultParallelism
    )
    planes = lsh_hyperplanes(n_planes, dim)
    v = as_double(vec_col)
    bucket = None
    for i, h in enumerate(planes):
        bit = F.when(
            dot_col(v, F.array(*[F.lit(x) for x in h])) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    # norms fold ONCE PER ROW, not per pair (optimization round 16 —
    # the knn_cosine_range/maxsim hoist): the interpreted sq_norm fold
    # otherwise ran twice inside every of the Σnᵢ² pair expressions.
    # sqrt(sq_norm(v)) over the same array is the same double, and
    # cos = dot/(na·nn + 1e-12) multiplies the same operands in the
    # same order — every pair's cos is bit-for-bit unchanged
    # (oracle-verified at 3 SFs).
    base = emb.select(
        F.col(id_col), F.col(label_col).alias("__lbl__"), v.alias("__v__"),
        bucket.alias("__bkt__"),
    ).withColumn("__n__", F.sqrt(sq_norm_col("__v__")))
    a = base.select(
        F.col(id_col).alias("a_id"), F.col("__lbl__").alias("a_lbl"),
        F.col("__v__").alias("av"), F.col("__n__").alias("an"), "__bkt__",
    )
    c = base.select(
        F.col(id_col).alias("neg_id"), F.col("__lbl__").alias("n_lbl"),
        F.col("__v__").alias("nv"), F.col("__n__").alias("nn"), "__bkt__",
    )
    cos = dot_col("av", "nv") / (F.col("an") * F.col("nn") + F.lit(1e-12))
    pairs = (
        a.join(c, "__bkt__")
        .filter(
            (F.col("a_id") != F.col("neg_id"))
            & (F.col("a_lbl") != F.col("n_lbl"))
        )
        .select("a_id", "neg_id", cos.alias("cos"))
    )
    w = Window.partitionBy("a_id").orderBy(F.col("cos").desc(), F.col("neg_id"))
    return (
        pairs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("a_id", "neg_id", F.col("r").cast("long").alias("r"), "cos")
    )


def temperature_budgets(
    counts: "dict[str, int]", total: int
) -> "dict[str, int]":
    """Per-stratum budgets for temperature-smoothed source mixing
    (τ = 2): budget_i ∝ √count_i, allocated EXACTLY to `total` rows by
    floor + largest-remainder (Hamilton apportionment) in pure integer
    arithmetic — the standard multilingual-pretraining mix (mT5 /
    XLM-R style: raw proportions overfeed the head sources; p^(1/τ)
    flattens the tail up without inverting the order).

    w_i = ⌊√count_i · 10⁶⌋ (IEEE sqrt is correctly rounded, so the
    double round-trip is bit-identical in any engine; the 10⁶ grid
    makes everything after it BIGINT-exact): b_i = ⌊T·w_i / W⌋, the
    D = T − Σb_i leftover units go to the D largest remainders
    r_i = T·w_i − b_i·W (ties broken by stratum ascending). A budget
    never exceeds the stratum's count — clamping happens AFTER the one
    Hamilton pass and the clamped shortfall is NOT redistributed, so
    sum(budgets) may come in under `total` when a tiny stratum binds
    (e.g. counts {big: 10000, tiny: 2}, total 5000 → 4932 + 2).
    Callers that must hit `total` exactly can detect the shortfall as
    `total - sum(budgets.values())`; redistribution would need a
    fixpoint loop and the declared (oracle-matched) semantics is one
    pass over the √ weights."""
    import math

    w = {
        k: int(math.floor(math.sqrt(c) * 1_000_000.0))
        for k, c in counts.items()
        if c > 0
    }
    W = sum(w.values())
    if W == 0 or total <= 0:
        return {k: 0 for k in counts}
    b = {k: (total * wi) // W for k, wi in w.items()}
    rem = {k: total * wi - b[k] * W for k, wi in w.items()}
    leftover = total - sum(b.values())
    for k in sorted(rem, key=lambda k: (-rem[k], k))[:leftover]:
        b[k] += 1
    # clamp to stratum size (a tiny stratum can't fill a √-smoothed
    # budget); the shortfall is NOT redistributed — redistribution
    # would need a fixpoint loop and the declared semantics is one
    # Hamilton pass over the √ weights
    return {k: min(bi, counts[k]) for k, bi in b.items()}


def temperature_mix(
    df: DataFrame,
    total: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Select ~`total` rows with per-stratum counts following the
    τ = 2 temperature mix (see `temperature_budgets`): one tiny
    aggregate collect (|strata| rows) derives the integer budgets,
    then each stratum keeps its EXACT budget — rank by the
    content-addressed spread hash (the stratified_sample draw, so the
    selection is reproducible across engines and re-runs) with the id
    as the total-order tie-break, row_number ≤ budget. One shuffle on
    the stratum key for the per-stratum window; groups are bounded by
    stratum sizes. Rank selection (not a rate threshold) because the
    budgets are exact counts — Hamilton allocation is the point.

    The budgets attach via a BROADCAST JOIN on the stratum key, not a
    per-stratum `when()` chain: at the 10⁴-10⁵ source strata this
    operator exists for, a literal chain that long is a driver
    plan-compile hazard (the bloomjoin lesson — ~20 s to compile a
    2²¹-child literal; see operators/bloomjoin.py). The budget table is
    |strata| rows, always broadcastable."""
    spark = df.sparkSession
    counts = {
        r[stratum_col]: r["count"]
        for r in df.groupBy(stratum_col).count().collect()
    }
    budgets = temperature_budgets(
        {k: v for k, v in counts.items() if k is not None}, total
    )
    bschema = T.StructType([
        T.StructField("__stratum__", df.schema[stratum_col].dataType, True),
        T.StructField("__budget__", T.LongType(), False),
    ])
    bdf = spark.createDataFrame(
        [(k, int(t)) for k, t in sorted(budgets.items())], bschema
    )
    key = F.pmod(
        polyhash_col(
            F.concat_ws(":", F.lit(str(salt)), F.col(id_col).cast("string"))
        )
        * F.lit(SAMPLE_SPREAD),
        F.lit(4294967296),
    )
    w = Window.partitionBy(stratum_col).orderBy(key, F.col(id_col))
    return (
        df.join(
            F.broadcast(bdf),
            F.col(stratum_col).eqNullSafe(F.col("__stratum__")),
            "left",
        )
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= F.coalesce(F.col("__budget__"), F.lit(0)))
        .drop("__rn__", "__stratum__", "__budget__")
    )


def luhn_valid_col(run: Column) -> Column:
    """Exact-integer Luhn checksum validity (ISO/IEC 7812 mod-10) of a
    digit-string column: from the right, every second digit doubles
    (minus 9 when > 9), total ≡ 0 (mod 10). Pure integer HOF fold —
    whole-stage codegen, no UDF, and the DuckDB oracle computes the
    character-identical arithmetic."""
    d = lambda i: F.ascii(F.substr(run, i, F.lit(1))) - F.lit(48)  # noqa: E731

    def term(acc, i):
        dd = d(i)
        pos_right = F.length(run) - i + F.lit(1)
        dbl = dd * 2
        return acc + F.when(
            pos_right % 2 == 0, F.when(dbl > 9, dbl - 9).otherwise(dbl)
        ).otherwise(dd)

    total = F.aggregate(F.sequence(F.lit(1), F.length(run)), F.lit(0), term)
    return total % 10 == 0


def ccn_detect(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 13,
    max_len: int = 19,
) -> DataFrame:
    """Credit-card-number detection — the PII scrubber stage regexes
    alone get wrong in both directions: a bare \\d{13,19} regex flags
    every order id and misses nothing, so production scrubbers gate
    candidates on the Luhn checksum (PAN lengths 13-19 per ISO/IEC
    7812; ~10% of random digit runs pass, so Luhn cuts false positives
    ~10× while true PANs always pass).

    Candidates are MAXIMAL digit runs (regexp_extract_all('[0-9]+') —
    maximality gives exact boundaries without lookarounds, which RE2
    oracles don't support) of plausible PAN length. Entirely map-side:
    the length filter and the Luhn fold are nested higher-order
    functions over the per-row candidate array — no explode, no
    shuffle, no UDF. Returns (id, n_ccn_candidates, n_ccn_valid)."""
    runs = F.regexp_extract_all(F.col(text_col), F.lit("[0-9]+"), 0)
    cand = F.filter(
        runs,
        lambda r: (F.length(r) >= min_len) & (F.length(r) <= max_len),
    )
    return df.select(
        F.col(id_col),
        F.size(cand).cast("long").alias("n_ccn_candidates"),
        F.size(F.filter(cand, luhn_valid_col)).cast("long").alias("n_ccn_valid"),
    )
