"""Rank fusion for hybrid retrieval (ENGINE scope; the reference has
no retrieval surface — this completes the engine's retrieval plane:
BM25/QL/RM3 keyword ranking + the ANN family + THIS to combine them).

Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): a document
ranked r in list i contributes 1/(k + r); the fused score is the sum
over the lists that retrieved it.  RRF is the standard lexical+dense
hybrid because it needs NO score calibration — only ranks — so a BM25
score and a cosine similarity fuse without normalization games.

Scale shape: each input ranking is already top-k-per-query (tiny
relative to the corpus — |queries|·k rows), so the fusion is a union
of rank projections + ONE hash aggregate on (query, doc) + the
per-query rank window.  Nothing here touches the corpus again; the
expensive retrieval passes happen upstream and are not re-run.

Determinism: with two lists the fused score is a two-term IEEE sum
(commutative — order-free, oracle-exact); ties break by doc id.  With
3+ lists the aggregation order of the float sum is engine-dependent
at the ~1 ulp level — the entry-facing round(6) absorbs it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse per-query rankings into (query_id, doc_id, rrf_score,
    rank): score = Σ_lists 1/(k_rrf + rank_in_list), top-``k`` per
    query, ties to the lowest doc id.  Each input needs (query_col,
    id_col, rank_col); extra columns are ignored."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(rank_col))).alias("_c"),
        )
        for r in rankings
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), contribs)
    scored = unioned.groupBy("query_id", "doc_id").agg(
        F.sum("_c").alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round("rrf_score", 6).alias("rrf_score"),
            "rank",
        )
    )
