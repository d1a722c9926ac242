"""BPE trainer/encoder: the textbook example, distributed ≡ sequential
training parity, rank-greedy encoding, and the bounded-collect cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_word,
    bpe_train,
    bpe_train_on_counts,
)


def test_textbook_example_merges():
    """Sennrich et al.'s low/lower/newest/widest shape: the most
    frequent weighted pair merges first, ties break lexicographically,
    and encoding reuses the trained merges."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train_on_counts(counts, n_merges=4)
    # 'es' occurs in newest+widest = 9, 'st' likewise 9, 'e s' vs 's t':
    # counts tie at 9 → lexicographic pair order decides ('e','s') < ('s','t')
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    rank = {p: i for i, p in enumerate(merges)}
    assert "est" in "".join(bpe_encode_word("newest", rank))
    # unseen characters survive as single symbols
    assert bpe_encode_word("zq", rank) == ["z", "q", "</w>"]


def test_distributed_training_matches_sequential(spark):
    docs = spark.createDataFrame(
        [(i, "low lower newest widest newest low") for i in range(7)],
        "doc_id long, text string",
    )
    got = bpe_train(docs, n_merges=6)
    # sequential reference over the exact same word counts
    want = bpe_train_on_counts(
        [("low", 14), ("lower", 7), ("newest", 14), ("widest", 7)], 6
    )
    assert got == want
    # repartitioning the corpus cannot change the merge list
    assert bpe_train(docs.repartition(8), n_merges=6) == got


def test_encode_dataframe_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "newest"), (3, None)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs.filter(F.col("text").isNotNull()), n_merges=8)
    out = {r["doc_id"]: (r["tokens"], r["n_tokens"])
           for r in bpe_encode(docs.filter(F.col("text").isNotNull()), merges).collect()}
    rank = {p: i for i, p in enumerate(merges)}
    assert out[1][0] == bpe_encode_word("low", rank) + bpe_encode_word("lower", rank)
    assert out[2][1] == len(bpe_encode_word("newest", rank))


def test_vocab_cap_and_guards(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i} common common") for i in range(50)],
        "doc_id long, text string",
    )
    # cap=1 keeps only the most frequent word ('common'); merges can only
    # come from inside it
    merges = bpe_train(docs, n_merges=3, vocab_cap=1)
    for a, b in merges:
        assert set(a + b.replace("</w>", "")) <= set("common")
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(docs, n_merges=0)


def test_literal_merges_well_formed():
    """The literal list must be WELL-FORMED: every merge's inputs exist
    before it is reached (base chars, the _EOW marker, a char+_EOW
    tail, or an EARLIER merge's output). That property is the proof
    obligation behind the doc_bpe_encode_literal oracle: it makes
    one-pair-at-a-time leftmost merging (the recursive-CTE shape)
    equivalent to bpe_encode_word's merge-all step, because a merge at
    rank r can only create pairs of rank > r."""
    from aeuc_vector_db_spark.operators.bpe import _EOW, literal_merges

    merges = literal_merges()
    assert len(merges) == len(set(merges))  # ranks are unambiguous

    def base(sym: str) -> bool:
        core = sym[: -len(_EOW)] if sym.endswith(_EOW) else sym
        return len(core) <= 1  # single char, bare _EOW, or char+_EOW

    available = set()
    for left, right in merges:
        assert base(left) or left in available, (left, right)
        assert base(right) or right in available, (left, right)
        available.add(left + right)


def test_literal_merges_one_at_a_time_equivalence():
    """bpe_encode_word (merge ALL occurrences of the best pair) vs the
    oracle's one-occurrence-at-a-time leftmost replay — equal on every
    corpus word plus adversarial repeats/overlaps, pinning the
    equivalence the DuckDB recursive CTE relies on."""
    from aeuc_vector_db_spark.operators.bpe import (
        _EOW,
        bpe_encode_word,
        literal_merges,
    )

    merges = literal_merges()
    rank = {p: i for i, p in enumerate(merges)}

    def one_at_a_time(word: str) -> list:
        syms = list(word) + [_EOW]
        while len(syms) > 1:
            cands = [
                (rank[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in rank
            ]
            if not cands:
                break
            _, i = min(cands)  # lowest rank, then leftmost
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return syms

    words = [
        "table", "row", "hash", "scan", "query", "sort", "window",
        "stream", "fast", "a", "the", "customer", "vector",
        # adversarial: overlapping/repeated pairs and rank collisions
        "aaa", "aaaa", "aaaaa", "tata", "roro", "stst", "hashhash",
        "tabletable", "erer", "sss", "asas", "squery", "xyzzy", "",
    ]
    for w in words:
        assert bpe_encode_word(w, rank) == one_at_a_time(w), w
