"""Materialized inverted text index — BM25 without the corpus scan.

`bm25_topk` (operators/text.py) re-tokenizes the corpus per query
batch; correct, but at 100 TB the tokenize+filter pass dominates every
query. The standard fix is the inverted index: materialize the postings
ONCE, then serve each query from the few files containing its terms.

Layout (three transactional manifest tables under one root):

  postings/   (term, doc_id, tf)   — stats+bloom on `term`, compacted
              `sort_by=["term"]` so term-range files are disjoint and
              `read_where(term IN q)` opens O(files containing the
              query's terms), not O(index)
  doclens/    (doc_id, dlen)       — one slim row per tokenized doc
  stats/      (n_docs, tok_total, docs_with_tokens) — ONE row,
              maintained additively on refresh (the avglen/N scalars
              never require an index scan)

Query cost shape: pruned postings read (|q| terms' files) → per-term
df + idf (broadcast) → doc-length semi-join bounded to matched docs →
sorted-term score fold. Bit-identical to `bm25_topk` on the same
corpus (same formulas, same fold order) — pinned by sharing its DuckDB
oracle.

Incremental maintenance: `append_docs` tokenizes ONLY the new docs,
appends their postings/doclens, and folds their counts into the stats
row — O(delta), never O(corpus). New doc_ids must be new (the caller
dedups; the index is append-only like the corpus it mirrors).

Reference analog: none — the reference searches embeddings only;
lexical retrieval is charter surface (E4 applied as search). Public
method: Robertson & Zaragoza 2009 (BM25); Zobel & Moffat 2006
(inverted indexes for search engines).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aeuc_vector_db_spark.functions.ranking import global_ranked_topk

from aeuc_vector_db_spark.operators.text import tokens_col
from aeuc_vector_db_spark.sources.manifest import ManifestTable


class TextIndex:
    """Handle on a materialized inverted index rooted at `root`."""

    def __init__(self, root: str):
        self.root = root
        self.postings = ManifestTable(
            os.path.join(root, "postings"),
            stats_cols=["term"], bloom_cols=["term"],
        )
        self.doclens = ManifestTable(os.path.join(root, "doclens"))
        self.stats = ManifestTable(os.path.join(root, "stats"))

    # -- build / maintain ------------------------------------------------

    @staticmethod
    def _postings_of(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """(term, doc_id, tf) from one tokenize+explode pass. Spread an
        under-parallel scan first (optimization round 15): the explode
        fan-out and regex tokenize are the build's compute, and a
        single-file corpus otherwise runs them on one task."""
        from aeuc_vector_db_spark.sources.tables import ensure_min_parallelism

        tok = ensure_min_parallelism(docs).select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        return tok.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))

    @staticmethod
    def _dlen_of(postings: DataFrame) -> DataFrame:
        """doclens derived FROM postings: Σ tf per doc ≡ the token count
        the retired per-table tokenize computed (exact integers). Lets
        build/append tokenize the corpus ONCE and derive the other two
        tables from the already-materialized postings (optimization
        round 15 — the old build re-ran tokenize+explode per committed
        table, 3× the corpus passes)."""
        return postings.groupBy("doc_id").agg(
            F.sum("tf").cast("long").alias("dlen")
        )

    @staticmethod
    def _stats_of(dlen: DataFrame, n_docs_df: DataFrame) -> DataFrame:
        return dlen.agg(
            F.sum("dlen").alias("tok_total"),
            F.count(F.lit(1)).alias("docs_with_tokens"),
        ).crossJoin(F.broadcast(n_docs_df)).select(
            F.col("n_docs").cast("long"),
            F.coalesce(F.col("tok_total"), F.lit(0)).cast("long").alias("tok_total"),
            F.col("docs_with_tokens").cast("long"),
        )

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        root: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_term_files: int = 8,
    ) -> "TextIndex":
        """Materialize the index: ONE tokenize pass over the corpus
        (postings), postings term-sorted into `n_term_files` files with
        disjoint term ranges (what makes the per-query pruning bite);
        doclens and stats derive from the committed postings files —
        no second or third corpus pass."""
        idx = cls(root)
        postings = cls._postings_of(docs, text_col, id_col)
        idx.postings.commit_overwrite(postings)
        idx.postings.compact(spark, sort_by=["term"], n_files=n_term_files)
        committed = idx.postings.read(spark)
        dlen = cls._dlen_of(committed)
        idx.doclens.commit_overwrite(dlen)
        idx.stats.commit_overwrite(cls._stats_of(
            idx.doclens.read(spark),
            docs.agg(F.count(F.lit(1)).alias("n_docs")),
        ))
        return idx

    def append_docs(
        self,
        spark: SparkSession,
        new_docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        """Incremental refresh: index ONLY the delta and fold its
        counts into the stats row. Cost is O(new docs); the existing
        postings files are untouched (append commit). Appended postings
        files carry their own term stats/blooms, so pruned queries stay
        pruned across refreshes (term-range overlap between the base
        and delta files costs extra opened files, not correctness —
        re-compact(sort_by=["term"]) to restore disjoint ranges).
        Like build, the delta is tokenized ONCE: the delta postings are
        eagerly localCheckpoint-ed (bounded — O(new docs) by this
        method's contract) and doclens/stats derive from that
        materialization instead of re-tokenizing the delta per table."""
        postings = self._postings_of(new_docs, text_col, id_col).localCheckpoint(
            eager=True
        )
        self.postings.commit_append(postings)
        dlen = self._dlen_of(postings)
        self.doclens.commit_append(dlen)
        cur = self.stats.read(spark).collect()[0]
        d = self._stats_of(
            dlen, new_docs.agg(F.count(F.lit(1)).alias("n_docs"))
        ).collect()[0]
        merged = spark.createDataFrame(
            [(
                cur["n_docs"] + d["n_docs"],
                cur["tok_total"] + d["tok_total"],
                cur["docs_with_tokens"] + d["docs_with_tokens"],
            )],
            "n_docs long, tok_total long, docs_with_tokens long",
        )
        self.stats.commit_overwrite(merged)

    # -- serve -----------------------------------------------------------

    def bm25_topk(
        self,
        spark: SparkSession,
        query_terms: "list[str]",
        top_k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """BM25 top-k from the materialized postings — same formulas,
        same sorted-term fold order, same output schema as
        text.bm25_topk, so results are bit-identical to the scan path
        (shared oracle). The corpus is never touched: the only reads
        are the term-pruned postings files, the slim doc-length table
        (semi-bounded to matched docs), and the one-row stats table."""
        qt = sorted({t for t in query_terms if t})
        if not qt:
            raise ValueError("bm25_topk: empty query")
        tf_q = self.postings.read_where(spark, [("term", "in", qt)]).select(
            "doc_id", "term", "tf"
        )
        st = self.stats.read(spark).collect()[0]
        n_docs, tok_total, docs_with = (
            st["n_docs"], st["tok_total"], st["docs_with_tokens"],
        )
        dfreq = tf_q.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        idf = dfreq.select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df").cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            ).alias("idf"),
        )
        dlen_q = self.doclens.read(spark).join(
            F.broadcast(tf_q.select("doc_id").distinct()), "doc_id", "left_semi"
        )
        avglen = float(tok_total) / float(docs_with) if docs_with else 1.0
        contrib = (
            tf_q.join(F.broadcast(idf), "term")
            .join(dlen_q, "doc_id")
            .select(
                "doc_id",
                "term",
                (
                    F.col("idf")
                    * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                    / (
                        F.col("tf").cast("double")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b) * F.col("dlen").cast("double") / F.lit(avglen)
                        )
                    )
                ).alias("cterm"),
            )
        )
        per_doc = contrib.groupBy("doc_id").agg(
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
            per_doc, [F.col("score").desc(), F.col("doc_id").asc()], top_k
        )
        return ranked.select(
            "doc_id",
            "score",
            F.col("n_matched").cast("bigint").alias("n_matched"),
            "rank",
        )
