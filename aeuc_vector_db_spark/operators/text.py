"""Text-analysis operators over a documents table (SURVEY.md §2.C E4).

The reference has no text surface; these are the charter's LLM-data-
pipeline operators (BASELINE.json north star: "text analysis"), built
from public Spark SQL primitives. Everything here is a pure Column
expression (higher-order functions over token arrays) so the same
formula can be mirrored term-for-term in a DuckDB oracle.

Cross-engine hash primitive: `polyhash_col` — the classic Java-style
rolling hash h = (31·h + char) mod (2³¹−1), expressible identically in
Spark (`aggregate`) and DuckDB (`list_reduce`; its first-element-init
quirk is neutral because 0·31 + c = c). xxhash64/sha2 are available and
JVM-fast, but their outputs can't be reproduced by DuckDB SQL, so every
fingerprint that the oracle must verify goes through polyhash.

Scale notes (100 TB design point):
- token/shingle work is per-row (narrow) — no shuffle; it parallelizes
  with the scan and pushes column pruning down to (doc_id, text).
- term/document frequencies are groupBy aggs — partial aggregation
  (map-side combine) keeps shuffle volume at #distinct-terms, not
  #token-occurrences.
- HOF expressions are CodegenFallback (interpreted). At real scale the
  same formulas drop into an Arrow-batched pandas UDF (see
  similarity._phi_scores_sequential for the pattern); the declared
  queries keep the SQL form because bit-identical oracle parity matters
  more at test scale than constant-factor speed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aeuc_vector_db_spark.functions.ranking import global_ranked_topk

from aeuc_vector_db_spark.functions.vector import _c, let_col

#: mod for the rolling hash — the Mersenne prime 2³¹ − 1.
HASH_MOD = 2_147_483_647

#: Fixed affine rehash constants (aᵢ·h + bᵢ mod HASH_MOD) for MinHash
#: signatures — literals so Spark and DuckDB share the exact same family.
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (69_069, 362_437),
    (134_775_813, 1),
    (22_695_477, 7_777_777),
    (48_271, 39_916_801),
    (65_539, 999_983),
    (16_807, 104_729),
)

TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: Small fixed stopword list (public-domain common English function words).
STOPWORDS: tuple[str, ...] = ("the", "a", "an", "of", "to", "in", "and", "is", "on", "for")

#: Keyword profiles for the n-gram/stopword language-ID heuristic.
#: Deterministic argmax (score desc, lang asc); docs matching nothing → 'und'.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "an", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "de", "y", "es"),
    "fr": ("le", "la", "les", "et", "est", "un"),
}


def tokens_col(text: Column | str) -> Column:
    """Lowercased word tokens: split on non-alphanumeric runs, drop empties.

    This is the whitespace+punctuation tokenizer; `token_count_bpe_ish`
    adds the subword-style estimate.
    """
    return F.filter(F.split(F.lower(_c(text)), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def polyhash_col(s: Column | str) -> Column:
    """Rolling hash of a string: fold (31·h + ascii(char)) mod 2³¹−1.

    Sequential left-to-right over characters — DuckDB mirror:
    list_reduce(list_transform(range(1, length(s)+1),
                i -> ascii(substr(s, i, 1))), (h, c) -> (h*31 + c) % m).
    """
    # split('') yields the char array in ONE pass. The previous
    # transform(sequence(1, len), i -> ascii(substr(s, i, 1))) form paid
    # an O(i) UTF8 char-seek per position — O(len²) per string — and
    # referenced the string expression from inside the lambda (per-
    # element re-evaluation when callers pass an expression). Values
    # are identical: ascii(per-char split element) ≡ ascii(substr(s,i,1))
    # code point by code point, and ''→[''] folds to the same 0 as the
    # old empty-sequence fold (ascii('') = 0).
    chars = F.transform(F.split(_c(s), ""), lambda c: F.ascii(c))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, c: (h * F.lit(31) + c.cast("long")) % F.lit(HASH_MOD),
    )


def shingles_col(tokens: Column | str, n: int = 3) -> Column:
    """n-word shingles as space-joined strings; < n tokens → empty array.

    The token array is `let_col`-bound: callers routinely pass the
    whole `tokens_col(text)` expression, and every `element_at` inside
    the per-shingle lambda would otherwise re-evaluate the full
    tokenize (lambda bodies get no CSE) — O(n²) characters per doc,
    measured as the dominant cost of every shingle consumer.
    """

    def make(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - F.lit(n - 1))
        sh = F.transform(
            idx,
            lambda j: F.concat_ws(
                " ", *[F.element_at(t, (j + F.lit(k)).cast("int")) for k in range(n)]
            ),
        )
        return F.when(F.size(t) >= n, sh).otherwise(F.array().cast("array<string>"))

    return let_col(_c(tokens), make)


def shingle_hashes_col(text: Column | str, n: int = 3) -> Column:
    """Distinct polyhashes of the text's n-word shingles (the MinHash input set)."""
    return F.array_distinct(F.transform(shingles_col(tokens_col(text), n), polyhash_col))


def sliding_min_col(arr: Column | str, w: int) -> Column:
    """Per-position minimum over the length-`w` window ``[j, j+w-1]``
    of an array column, via the sparse-table doubling trick: ⌈log₂ w⌉
    `zip_with(a, slice(a, 1+step, ·), least)` passes, each linear in
    the array — never `transform(positions, j -> array_min(slice(a,
    j, w)))`, which re-evaluates inside the lambda per window position
    (lambda bodies get no CSE — measured quadratic on long docs).
    Each doubling step is `let_col`-bound so the whole ladder costs
    one evaluation per level even though every level is referenced
    twice by the next. zip_with null-pads the shorter side and `least`
    skips nulls, so tail entries ``j > n-w+1`` hold the min of the
    TRUNCATED window; callers wanting full windows only slice to the
    first ``n-w+1`` entries. Same length and element type as `arr`;
    empty in → empty out.
    """
    if w < 1:
        raise ValueError(f"window must be >= 1, got {w}")

    def fold(a: Column, span: int) -> Column:
        if span >= w:
            return a
        step = min(span, w - span)
        tail = F.greatest(F.size(a) - F.lit(step), F.lit(0))
        nxt = F.zip_with(
            a,
            F.slice(a, F.lit(step + 1), tail),
            lambda x, y: F.least(x, y),
        )
        return let_col(nxt, lambda v: fold(v, span + step))

    return fold(_c(arr), 1)


def _py_tokens(s: str | None) -> list[str]:
    import re

    # NULL text → no tokens: every Arrow kernel built on this
    # (shingles, language-ID, token stats) must degrade per-row like its
    # SQL HOF twin (which null-propagates) instead of crashing the task —
    # dirty corpora carry null text and a crashed task is not a contract
    if s is None:
        return []
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _py_polyhash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


def shingle_hashes_pandas(n: int = 3):
    """Arrow-batched twin of shingle_hashes_col — identical values (integer
    arithmetic is exact on both paths; ord == ascii code point), ~100×
    faster than the interpreted nested-HOF expression. The hot path for
    the dedup operators; element order differs from the SQL form but all
    consumers (array_min, array_intersect) are order-insensitive.
    """
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def f(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            toks = _py_tokens(s)
            hs = {
                _py_polyhash(" ".join(toks[i : i + n]))
                for i in range(len(toks) - n + 1)
            }
            out.append(list(hs))
        return pd.Series(out)

    return f


def winnow_batch(texts: "pd.Series", k: int = 3, w: int = 4) -> "pd.DataFrame":
    """Vectorized winnowing-fingerprint statistics for one Arrow batch
    (round 13, VERDICT r12 #7): per document, ordered k-gram
    polyhashes, sliding minimum over windows of `w`, distinct kept
    values, then (n_fp, fp_sum, fp_min). Returns one row per input doc
    (all-null for docs with zero shingles — the caller drops or
    filters, matching the SQL form's empty inline()).

    Identical values to the SQL HOF formulation (`sliding_min_col` +
    per-row folds) — everything is exact 64-bit integer arithmetic,
    pinned bit-for-bit by tests/test_text_dedup.py. The per-doc Python
    loop version measured ~1 s for 5k docs (the numpy-per-tiny-doc
    overhead was most of it), so this folds the WHOLE batch flat:

      - tokens are pure [a-z0-9] ASCII by construction (_py_tokens),
        so all tokens hash in max_token_len column passes over one
        padded byte matrix;
      - each shingle hash derives from its token hashes by the concat
        identity h(x·y) = (h(x)·31^len(y) + h(y)) mod m — O(chars)
        total instead of O(k·chars) re-hashing every k-gram, same
        left-to-right fold values (intermediate products < 2^62,
        int64-exact);
      - the w-window sliding min is w-1 shifted np.minimum passes over
        the flat shingle-hash array (windows never cross docs: each
        doc's shingles are contiguous and only in-doc window starts
        are selected);
      - per-doc distinct/sum/min via one lexsort + segment reduceat.
    """
    import numpy as np

    n_docs = len(texts)
    out = pd.DataFrame(
        {
            "n_fp": pd.array([pd.NA] * n_docs, dtype="Int64"),
            "fp_sum": pd.array([pd.NA] * n_docs, dtype="Int64"),
            "fp_min": pd.array([pd.NA] * n_docs, dtype="Int64"),
        }
    )
    tok_lists = [_py_tokens(s) for s in texts]
    ntoks = np.fromiter((len(t) for t in tok_lists), np.int64, count=n_docs)
    n_tok = int(ntoks.sum())
    if n_tok == 0:
        return out
    lens = np.fromiter(
        (len(t) for lst in tok_lists for t in lst), np.int64, count=n_tok
    )
    blob = np.frombuffer(
        "".join(t for lst in tok_lists for t in lst).encode("ascii"), np.uint8
    )
    # token polyhash: padded byte matrix, one fold pass per char column
    max_len = int(lens.max())
    ends = np.cumsum(lens)
    offs = ends - lens
    th = np.zeros(n_tok, np.int64)
    for c in range(max_len):
        live = lens > c
        th[live] = (th[live] * 31 + blob[offs[live] + c]) % HASH_MOD
    # shingle hashes via the concat identity (p31 by token length)
    p31 = np.ones(max_len + 1, np.int64)
    for i in range(1, max_len + 1):
        p31[i] = (p31[i - 1] * 31) % HASH_MOD
    pl = p31[lens]
    m = np.maximum(ntoks - (k - 1), 0)
    n_sh = int(m.sum())
    if n_sh == 0:
        return out
    doc_tok_off = np.concatenate(([0], np.cumsum(ntoks)))[:-1]
    grp = np.cumsum(m) - m  # shingle-flat offset of each doc
    starts = np.repeat(doc_tok_off, m) + (np.arange(n_sh) - np.repeat(grp, m))
    hs = th[starts]
    for j in range(1, k):
        idx = starts + j
        hs = ((hs * 31 + 32) % HASH_MOD * pl[idx] + th[idx]) % HASH_MOD
    # sliding min over full windows; short docs (0 < m < w) take the
    # min of ALL their hashes (the paper's boundary case)
    has_sh = m > 0
    wn = np.where(m >= w, m - (w - 1), np.minimum(m, 1))
    long_doc = m >= w
    if n_sh >= w:
        sw = hs[: n_sh - (w - 1)].copy()
        for j in range(1, w):
            np.minimum(sw, hs[j : n_sh - (w - 1) + j], out=sw)
    else:
        sw = np.empty(0, np.int64)
    n_win = int(wn.sum())
    wgrp = np.cumsum(wn) - wn
    wpos = np.arange(n_win) - np.repeat(wgrp, wn)  # window index within doc
    win_doc = np.repeat(np.arange(n_docs), wn)
    flat_start = np.repeat(grp, wn) + wpos
    is_long = np.repeat(long_doc, wn)
    if len(sw) > 0:
        long_vals = sw[np.minimum(flat_start, len(sw) - 1)]
    else:
        long_vals = np.zeros(n_win, np.int64)
    if bool((~long_doc & has_sh).any()):
        short_mins = np.minimum.reduceat(hs, grp[has_sh])
        short_vals = short_mins[
            np.searchsorted(np.flatnonzero(has_sh), win_doc)
        ]
    else:
        short_vals = np.zeros(n_win, np.int64)
    wins = np.where(is_long, long_vals, short_vals)
    # distinct + (count, sum, min) per doc: one lexsort, first-in-run
    # mask, segment reduceat (values ascend within a doc, so the
    # segment head IS the min)
    order = np.lexsort((wins, win_doc))
    wd, wv = win_doc[order], wins[order]
    keep = np.ones(n_win, bool)
    keep[1:] = (wd[1:] != wd[:-1]) | (wv[1:] != wv[:-1])
    fd, fv = wd[keep], wv[keep]
    seg = np.flatnonzero(
        np.concatenate(([True], fd[1:] != fd[:-1]))
    )
    docs_at = fd[seg]
    out.iloc[docs_at, 0] = np.diff(np.concatenate((seg, [len(fd)])))
    out.iloc[docs_at, 1] = np.add.reduceat(fv, seg)
    out.iloc[docs_at, 2] = fv[seg]
    return out


def winnow_stats_pandas(k: int = 3, w: int = 4):
    """Arrow-batched pandas_udf over `winnow_batch` — the column-form
    twin (struct<n_fp, fp_sum, fp_min>, null struct fields for docs
    with no shingles). The declared query uses mapInPandas instead
    (one kernel pass; a filter over this UDF's output re-evaluates the
    UDF on both sides of the filter — two ArrowEvalPython nodes,
    measured 2× the cost)."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([
        StructField("n_fp", LongType()),
        StructField("fp_sum", LongType()),
        StructField("fp_min", LongType()),
    ])

    @F.pandas_udf(schema)
    def f(texts: pd.Series) -> pd.DataFrame:
        return winnow_batch(texts, k, w)

    return f


def minhash_signature_col(hash_set: Column, k: int = 8) -> Column:
    """k-element MinHash signature: min over the set of (aᵢ·h + bᵢ) mod m.

    aᵢ·h < 2⁶² so the arithmetic stays exact in 64-bit integers in both
    engines. Empty sets yield nulls (callers filter docs with no shingles).
    """
    def affine(a: int, b: int):
        # closure factory: a 1-arg lambda (a default-arg 2nd param would make
        # pyspark treat it as the (element, index) two-arg transform form)
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(HASH_MOD)

    # let-bound: the k per-coefficient transforms each reference the
    # hash set, and callers pass the whole shingle-hash EXPRESSION —
    # unbound it would re-run the shingle kernel k times per row
    return let_col(
        _c(hash_set),
        lambda hs: F.array(
            *[F.array_min(F.transform(hs, affine(a, b))) for a, b in MINHASH_COEFFS[:k]]
        ),
    )


def simhash16_col(tokens: Column | str) -> Column:
    """16-bit SimHash over token polyhashes.

    bit b of the fingerprint is 1 iff Σ_tokens (2·((h ≫ b) & 1) − 1) > 0.
    The shift is floor(h / 2ᵇ) — h < 2³¹ so double division is exact.
    """
    # the token-hash array is let-bound: bit_contrib runs inside a
    # 16-element transform, and an unbound `hashes` re-ran polyhash
    # over every token 16 times per row (lambda bodies get no CSE)
    def fp(hashes: Column) -> Column:
        def bit_contrib(b: Column) -> Column:
            pw = F.floor(F.pow(F.lit(2.0), b.cast("double"))).cast("long")
            vote = F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + (F.lit(2) * (F.floor(h / pw) % F.lit(2)) - F.lit(1)),
            )
            return F.when(vote > 0, pw).otherwise(F.lit(0).cast("long"))

        return F.aggregate(
            F.transform(F.sequence(F.lit(0), F.lit(15)), bit_contrib),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return let_col(F.transform(_c(tokens), polyhash_col), fp)


def jaccard_col(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| for pre-distincted arrays (exact integer counts,
    double division at the end — order-independent)."""
    # one intersect + one union — the previous |A|+|B|−|A∩B| form evaluated
    # array_intersect twice, and these run interpreted (no codegen CSE)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b))
    return inter / union.cast("double")


def language_id_col(tokens: Column | str) -> Column:
    """Keyword-profile language ID: argmax profile hit-count, ties broken
    by language code ascending; zero hits everywhere → 'und'.

    let_col-bound at three levels (tokens, per-language score, winning
    struct): unbound, the token expression was re-evaluated once per
    (language × struct-field × consumer) reference — up to ~24
    tokenizations per row when callers pass `tokens_col(text)`."""

    def body(t: Column) -> Column:
        def lang_struct(lang: str) -> Column:
            prof = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
            score = F.size(F.filter(t, lambda x: F.array_contains(prof, x)))
            # (-score, lang) sorts ascending to (score DESC, lang ASC)
            return let_col(
                score,
                lambda sc: F.struct(
                    (-sc).alias("neg"), F.lit(lang).alias("lang"), sc.alias("s")
                ),
            )

        ranked = F.array_sort(
            F.array(*[lang_struct(lang) for lang in sorted(LANG_PROFILES)])
        )
        return let_col(
            F.element_at(ranked, 1),
            lambda best: F.when(best["s"] > 0, best["lang"]).otherwise(
                F.lit("und")
            ),
        )

    return let_col(_c(tokens), body)


def language_id_pandas():
    """Arrow-batched twin of language_id_col — same argmax/tie-break
    semantics ((score desc, lang asc), zero hits → 'und') in exact
    integer logic; the interpreted HOF form measured 2 s at sf0.1.

    Round 12 (VERDICT r11 #7): one inverted token→languages dict,
    built once per worker, replaces the per-text per-language set
    membership loops — per text the work is one token pass with one
    dict probe each, instead of |languages| full passes (measured
    1.6× on the kernel loop). The tokenizer is inlined as a positive
    findall — for any string, `[t for t in split(r"[^a-z0-9]+") if t]`
    equals `findall(r"[a-z0-9]+")` (the split form only adds empty
    edge strings, which the filter drops), and findall skips both the
    empties and the second pass. None text → no tokens → 'und', same
    as _py_tokens' [] degrade. The argmax is unchanged: languages
    iterate in sorted order and a strictly greater score replaces, so
    the winner is still the ascending-first language at the max score,
    'und' on zero hits everywhere — bit-identical output (the sweep
    oracle is unchanged; parity with language_id_col test-pinned)."""
    import re

    from pyspark.sql.types import StringType

    langs = sorted(LANG_PROFILES)
    tok_to_langs: dict[str, tuple[int, ...]] = {}
    for li, lang in enumerate(langs):
        for w in LANG_PROFILES[lang]:
            tok_to_langs[w] = tok_to_langs.get(w, ()) + (li,)
    tok_pat = re.compile(r"[a-z0-9]+")

    @F.pandas_udf(StringType())
    def f(texts: pd.Series) -> pd.Series:
        get = tok_to_langs.get
        findall = tok_pat.findall
        n_langs = len(langs)
        out = []
        for s in texts:
            scores = [0] * n_langs
            if s is not None:
                for t in findall(s.lower()):
                    hit = get(t)
                    if hit is not None:
                        for li in hit:
                            scores[li] += 1
            best_lang, best_score = "und", 0
            for li, sc in enumerate(scores):
                if sc > best_score:
                    best_lang, best_score = langs[li], sc
            out.append(best_lang)
        return pd.Series(out)

    return f


def quality_score_col(text: Column | str) -> Column:
    """Heuristic doc-quality score in [0,1]: blends length, stopword
    ratio, and mean token length (the classic cheap pre-filters a
    training-data pipeline runs before expensive model scoring).

    score = 0.4·min(n_tokens/100, 1)
          + 0.3·min(stopword_ratio/0.1, 1)
          + 0.3·(1 − |mean_len − 5| / 5, floored at 0)
    """
    # token array let-bound: the score references it ~6 times (n appears
    # in three terms, plus the stopword filter and the length fold) —
    # unbound, each reference re-ran the tokenize
    def body(t: Column) -> Column:
        n = F.size(t).cast("double")  # O(1) on the bound array variable
        sw = F.array(*[F.lit(w) for w in STOPWORDS])
        sw_ratio = (
            F.size(F.filter(t, lambda x: F.array_contains(sw, x))).cast("double") / n
        )
        total_len = F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
        )
        mean_len = total_len.cast("double") / n
        len_term = F.greatest(
            F.lit(0.0), F.lit(1.0) - F.abs(mean_len - F.lit(5.0)) / F.lit(5.0)
        )
        return (
            F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
            + F.lit(0.3) * F.least(sw_ratio / F.lit(0.1), F.lit(1.0))
            + F.lit(0.3) * len_term
        )

    return let_col(tokens_col(text), body)


def token_count_bpe_ish(text: Column | str) -> Column:
    """Subword-style token-count estimate: words plus an extra token per
    started 4-char chunk beyond the first (a cheap BPE proxy —
    ⌈len/4⌉ per word, summed)."""
    t = tokens_col(text)
    return F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.ceil(F.length(x).cast("double") / F.lit(4.0)).cast("long"),
    )


def token_stats_pandas():
    """Arrow-batched one-pass token stats: struct(n_tokens, n_distinct,
    total_len, est_bpe_tokens) per text. Integer-exact, so identical to
    the four separate HOF expressions (which re-tokenize per expression —
    measured 27 s vs ~2 s at sf0.1)."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("n_tokens", LongType()),
            StructField("n_distinct", LongType()),
            StructField("total_len", LongType()),
            StructField("est_bpe_tokens", LongType()),
        ]
    )

    @F.pandas_udf(schema)
    def f(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for s in texts:
            toks = _py_tokens(s)
            rows.append(
                (
                    len(toks),
                    len(set(toks)),
                    sum(len(t) for t in toks),
                    sum(-(-len(t) // 4) for t in toks),
                )
            )
        return pd.DataFrame(rows, columns=["n_tokens", "n_distinct", "total_len", "est_bpe_tokens"])

    return f


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the standard feature columns to a documents df."""
    t = tokens_col(text_col)
    return (
        df.withColumn("tokens", t)
        .withColumn("n_tokens", F.size("tokens").cast("long"))
        .withColumn("quality", quality_score_col(text_col))
        .withColumn("lang_pred", language_id_col("tokens"))
        .withColumn("fingerprint", polyhash_col(F.concat_ws(" ", F.col("tokens"))))
    )


def unigram_logprob(
    docs, text_col: str = "text", id_col: str = "doc_id"
):
    """Per-document average unigram log-probability under the corpus's
    own unigram LM — the perplexity-style quality signal (fluent text
    scores high; keyboard-mash and boilerplate-of-rare-tokens score
    low). No external model: p(t) = count(t)/total over this corpus.

    Output: (id_col, avg_logp DOUBLE, n_tokens BIGINT); zero-token docs
    produce no row (no distribution to score them under).

    Determinism: the per-doc sum folds term contributions in SORTED
    term order via a sequential array fold (the centroids trick) —
    a groupBy(sum) of doubles would be partial-agg-order-dependent and
    break cross-engine hashes. Scale shape: two aggregations keyed by
    (doc, term) and (term), one term-keyed join (vocab vs corpus —
    both shuffle on term; vocab is NOT assumed broadcastable at 100 TB),
    everything else map-side.
    """
    from pyspark.sql import functions as F

    tok = docs.select(id_col, F.explode(tokens_col(F.col(text_col))).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    logp = cnt.crossJoin(F.broadcast(total)).select(
        "term",
        F.log(F.col("cnt").cast("double") / F.col("total").cast("double")).alias(
            "logp"
        ),
    )
    contrib = tf.join(logp, "term").select(
        id_col,
        "term",
        (F.col("tf").cast("double") * F.col("logp")).alias("cterm"),
        "tf",
    )
    per_doc = contrib.groupBy(id_col).agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", "cterm"))),
                lambda s: s["cterm"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("__sum__"),
        F.sum("tf").alias("n_tokens"),
    )
    return per_doc.select(
        id_col,
        (F.col("__sum__") / F.col("n_tokens").cast("double")).alias("avg_logp"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )


def bm25_topk(
    docs,
    query_terms: "list[str]",
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Okapi BM25 retrieval over the corpus (the standard lexical
    ranking function; Robertson & Zaragoza 2009 — public method):

        idf(t)     = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
        score(d)   = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avglen))

    with N = total docs, |d| = token count, avglen = mean token count
    over docs with ≥1 token. Output: (id_col, score DOUBLE,
    n_matched BIGINT) for the top_k docs, ranked (score DESC, id ASC).

    Scale shape: the FIRST operation after tokenization filters to the
    |q| query terms (broadcast isin) — a 100 TB corpus reduces to the
    postings of a handful of terms before any shuffle; doc lengths are
    one map-side count per doc; avglen folds to one scalar via an
    EXACT integer sum (no float partial-agg order dependence); the
    per-doc score folds term contributions in SORTED term order (the
    unigram_logprob trick), so cross-engine hashes survive.

    Reference analog: none — the reference searches embeddings only;
    lexical retrieval is charter surface (E4 text analysis applied as
    search).
    """
    from pyspark.sql import functions as F

    qt = sorted({t for t in query_terms if t})
    if not qt:
        raise ValueError("bm25_topk: empty query")
    tok = docs.select(id_col, F.explode(tokens_col(F.col(text_col))).alias("term"))
    dlen = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dlen"))
    stats = dlen.agg(
        F.sum("dlen").alias("tok_total"), F.count(F.lit(1)).alias("docs_with_tokens")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf_q = (
        tok.filter(F.col("term").isin(qt))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf_q.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
        ).alias("idf"),
    )
    # semi-bound the doc-length side BEFORE the contrib join: dlen has
    # one row per corpus doc, but only matched docs contribute — the
    # broadcast left-semi filters dlen map-side so the contrib join
    # shuffles O(matched), not O(corpus). The matched-id set is bounded
    # by the same assumption the final global rank window already
    # makes (a |q|-term query matches a manageable doc set); the FULL
    # dlen pass survives only as the avglen scalar fold above.
    dlen_q = dlen.join(
        F.broadcast(tf_q.select(id_col).distinct()), id_col, "left_semi"
    )
    contrib = (
        tf_q.join(F.broadcast(idf), "term")
        .join(dlen_q, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
            (
                F.col("idf")
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b)
                        * F.col("dlen").cast("double")
                        / (
                            F.col("tok_total").cast("double")
                            / F.col("docs_with_tokens").cast("double")
                        )
                    )
                )
            ).alias("cterm"),
        )
    )
    per_doc = contrib.groupBy(id_col).agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", "cterm"))),
                lambda s: s["cterm"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("score"),
        F.count(F.lit(1)).alias("n_matched"),
    )
    ranked = global_ranked_topk(
        per_doc, [F.col("score").desc(), F.col(id_col).asc()], top_k
    )
    return ranked.select(
        id_col,
        "score",
        F.col("n_matched").cast("bigint").alias("n_matched"),
        "rank",
    )


def rrf_fuse(
    rankings: "list",
    k: int = 60,
    top_k: int = 10,
    id_col: str = "doc_id",
) -> "DataFrame":
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009 —
    public method): fuse any number of ranked lists into one by
    score(d) = Σ_lists 1/(k + rank_list(d)), the standard way to combine
    lexical (BM25) and vector (k-NN) retrieval without score
    calibration — ranks are comparable where raw scores are not.

    Each input DataFrame needs (id_col, rank). Docs absent from a list
    contribute nothing for it (the conventional treatment). The fused
    score is a sum of exact dyadic-free rationals evaluated in LIST
    ORDER via a sequential fold over the per-doc contributions sorted
    by list index — deterministic across partitionings and engines.
    Output: (id_col, rrf_score, n_lists, rank), ranked
    (rrf_score DESC, id ASC).
    """
    from pyspark.sql import functions as F

    if not rankings:
        raise ValueError("rrf_fuse: no rankings")
    parts = []
    for i, r in enumerate(rankings):
        parts.append(
            r.select(
                F.col(id_col),
                F.lit(i).alias("__list__"),
                (F.lit(1.0) / (F.lit(float(k)) + F.col("rank").cast("double"))).alias(
                    "__c__"
                ),
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = allc.groupBy(id_col).agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__list__", "__c__"))),
                lambda s: s["__c__"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    ranked = global_ranked_topk(
        fused, [F.col("rrf_score").desc(), F.col(id_col).asc()], top_k
    )
    return ranked.select(
        id_col,
        "rrf_score",
        F.col("n_lists").cast("bigint").alias("n_lists"),
        "rank",
    )
