"""Byte-pair-encoding tokenizer: distributed training + map-side encode.

BPE (Sennrich, Haddow & Birch, ACL 2016 — the standard subword
tokenizer construction) trains on the WORD-FREQUENCY TABLE, not the
raw corpus: each merge round needs pair counts weighted by word
frequency, and the word table is vocabulary-bounded while the corpus
is not. That observation gives the honest 100 TB shape:

  1. ONE distributed pass: tokenize → `groupBy(word).count()` — the
     only corpus-sized job, a plain partial+final aggregate;
  2. collect the frequency table to the driver, BOUNDED by
     `vocab_cap` with a deterministic cut (count DESC, word ASC) —
     the pq_train sample-cap discipline: never an unbounded collect;
  3. run the merge rounds in exact integer arithmetic driver-side
     (each round: count weighted adjacent pairs, take the argmax with
     a lexicographic tie-break, rewrite the table) — O(vocab) per
     round regardless of corpus size.

Encoding is embarrassingly parallel: the merge list broadcasts by
closure into an Arrow kernel that applies merges in training order
per word (rank-greedy, the published algorithm), with a per-batch
word cache — map-side only, no shuffle.

Training is iterative and driver-coordinated, so it is NOT
SQL-expressible (the `ann_pq_recall` situation): the declared query is
rows-only and the semantics are pinned by tests against a sequential
reference implementation and the textbook "low/lower/newest" example.

Reference analog: none — tokenization is charter E4 surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"  # end-of-word marker (Sennrich et al. §3.2)


def literal_merges() -> "list[tuple[str, str]]":
    """A fixed, WELL-FORMED merge list for the literal-parameter encode
    query (doc_bpe_encode_literal) — the `literal_components` pattern
    applied to BPE serving. Well-formed means every merge's input
    symbols exist before it is reached (base characters, _EOW, or the
    output of an EARLIER merge). That property is what makes
    one-pair-at-a-time leftmost merging (the only shape a DuckDB
    recursive CTE can express) provably equivalent to
    `bpe_encode_word`'s merge-all-occurrences step: a merge at rank r
    can only create pairs whose ranks are > r, so the lowest-ranked
    present pair stays lowest until its occurrences are exhausted, and
    both procedures consume occurrences left to right.
    `tests/test_bpe.py` pins well-formedness structurally."""
    return [
        ("e", _EOW),
        ("t", "a"),
        ("r", "o"),
        ("s", "t"),
        ("a", "s"),
        ("h", "a"),
        ("l", "e" + _EOW),
        ("ta", "b"),
        ("tab", "le" + _EOW),
        ("ro", "w"),
        ("row", _EOW),
        ("ha", "s"),
        ("has", "h"),
        ("hash", _EOW),
        ("s", "c"),
        ("sc", "a"),
        ("sca", "n"),
        ("scan", _EOW),
        ("q", "u"),
        ("e", "r"),
        ("er", "y"),
        ("qu", "ery"),
        ("st", "r"),
        ("a", _EOW),
        ("o", "r"),
        ("or", "t"),
        ("s", "ort"),
        ("w", "i"),
        ("wi", "n"),
        ("d", "o"),
        ("win", "do"),
    ]


def _pair_counts(words: "list[tuple[tuple[str, ...], int]]") -> dict:
    counts: dict = {}
    for syms, freq in words:
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def _merge_word(syms: "tuple[str, ...]", pair: "tuple[str, str]") -> "tuple[str, ...]":
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train_on_counts(
    word_counts: "list[tuple[str, int]]", n_merges: int
) -> "list[tuple[str, str]]":
    """The sequential merge loop over a (word, freq) table — exact
    integer pair counts, argmax per round with the total
    (count DESC, pair ASC) order, so the merge list is a pure function
    of the table. Stops early when no pair repeats."""
    words = [
        (tuple(list(w) + [_EOW]), int(f)) for w, f in word_counts if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(words)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break  # nothing repeats: further merges are noise
        merges.append(best[0])
        words = [(_merge_word(s, best[0]), f) for s, f in words]
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    vocab_cap: int = 100_000,
) -> "list[tuple[str, str]]":
    """Distributed BPE training: one corpus aggregate builds the word
    frequency table; the driver-side merge loop runs on at most
    `vocab_cap` distinct words (deterministic count-DESC/word-ASC cut —
    dropping the rarest tail is the standard practice and changes pair
    counts by at most the dropped mass). Returns the ordered merge
    list."""
    from aeuc_vector_db_spark.operators.text import tokens_col

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    wc = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.col("f").desc(), F.col("w").asc())
        .limit(vocab_cap)
        .collect()
    )
    return bpe_train_on_counts([(r["w"], r["f"]) for r in wc], n_merges)


def bpe_encode_word(
    word: str, merge_rank: "dict[tuple[str, str], int]"
) -> "list[str]":
    """Rank-greedy application of the trained merges to one word: while
    any adjacent pair has a trained rank, merge every occurrence of the
    LOWEST-ranked such pair (training order is priority order — the
    published decode-time algorithm). Unseen characters pass through
    as single symbols."""
    syms: "tuple[str, ...]" = tuple(list(word) + [_EOW])
    while len(syms) > 1:
        ranked = [
            (merge_rank[(syms[i], syms[i + 1])], (syms[i], syms[i + 1]))
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in merge_rank
        ]
        if not ranked:
            break
        syms = _merge_word(syms, min(ranked)[1])
    return list(syms)


def bpe_encode(
    docs: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens ARRAY<STRING>, n_tokens) per doc — the merge list
    rides into an Arrow kernel by closure (a few KB), applied per word
    with a per-batch cache over distinct words; map-side only, the
    encode never shuffles."""
    import pandas as pd

    from aeuc_vector_db_spark.operators.text import tokens_col

    merge_rank = {p: i for i, p in enumerate(merges)}
    schema = f"{id_col} long, tokens array<string>, n_tokens long"

    def _kernel(batches):
        cache: dict = {}

        def enc(word):
            got = cache.get(word)
            if got is None:
                got = cache[word] = bpe_encode_word(word, merge_rank)
            return got

        for pdf in batches:
            out_ids, out_toks, out_n = [], [], []
            for i, words in zip(pdf[id_col], pdf["__words"]):
                toks: list = []
                for w in words:
                    toks.extend(enc(w))
                out_ids.append(i)
                out_toks.append(toks)
                out_n.append(len(toks))
            yield pd.DataFrame(
                {id_col: out_ids, "tokens": out_toks, "n_tokens": out_n}
            )

    prepped = docs.select(
        F.col(id_col).cast("long"),
        tokens_col(F.col(text_col)).alias("__words"),
    )
    return prepped.mapInPandas(_kernel, schema)
