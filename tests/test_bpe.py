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
