"""BM25 retrieval over an inverted index (Robertson & Zaragoza 2009)
— the keyword-search leg a training-data platform needs next to the
embedding ANN plane (operators/simsearch.py): decontamination
triage, corpus exploration, targeted subset pulls (ENGINE scope; the
reference has no retrieval surface).

Index build = one explode + one hash-agg shuffle producing the
classic postings table (term, doc_id, tf); document length and the
(N, avgdl) scalar derive from the SAME postings frame (dl = sum of a
doc's tfs), so the corpus text is scanned exactly once.

Query = the inverted-index probe, never a corpus scan: the query-term
frame is tiny and BROADCAST-semi-joined into the postings, so only
postings of matching terms leave the scan.  df for those terms is
computed on the pruned postings (small → broadcast back), dl joins on
doc_id for candidate docs only, (N, avgdl) rides a 1-row broadcast
cross join, and the final per-(query, doc) score is one hash-agg on
candidates + a per-query top-k window.  At 100 TB the only large
shuffle is the index build itself; a persisted index (bucketed by
term, sources/io.py write_bucketed) amortizes it across queries.

Scoring (Lucene-shaped, idf always positive):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(t, d) = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Ranking is over round(score, 4) with doc_id tiebreak, so the oracle
rank replays exactly (unrounded IEEE sums could order-flip ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prod2vec_spark.operators.text import tokens

K1 = 1.2
B = 0.75


def postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings (term, doc_id, tf): one explode + one
    hash-agg shuffle on (term, doc_id)."""
    return (
        docs.withColumn("_toks", tokens(F.col(text_col)))
        .select(F.col(id_col).alias("doc_id"), F.explode("_toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(post: DataFrame) -> DataFrame:
    """(doc_id, dl) from the postings frame — no second text scan."""
    return post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    text_col: str = "text",
    post: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query: (query_id, rank, doc_id, score).
    ``queries`` is a small driver-side list of (query_id, [terms]) —
    the retrieval request, not data.  Pass a cached/persisted
    ``post`` postings frame to amortize the index build."""
    spark = SparkSession.getActiveSession() or docs.sparkSession
    if post is None:
        post = postings(docs, id_col=id_col, text_col=text_col)
    dl = doc_lengths(post)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in set(terms)],
        "query_id string, term string",
    )
    hits = post.join(F.broadcast(qterms), "term")
    # df over the PRUNED postings: tiny (≤ #query terms rows) → broadcast
    df_t = hits.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    scored = (
        hits.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("s"), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
