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

import numpy as np
import pandas as pd
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


def mmr_rerank(
    candidates: DataFrame,
    emb: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "rel",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein
    1998): greedily pick argmax of ``lam·rel(d) − (1−lam)·max_{s∈S}
    cos(d, s)`` — relevance traded against redundancy with what is
    already selected, the standard diversity post-processor for a
    retrieval shortlist (and for diverse training-example selection).

    Scale shape: ``candidates`` is a per-query TOP-N from an upstream
    retrieval pass — bounded per group — so the greedy loop runs in
    ONE ``applyInPandas`` over candidates enriched with their vectors
    (the declared Pandas-UDF boundary class: per-group sequential
    selection has no relational form).  The embedding join touches
    |queries|·N rows, never the corpus.  Greedy selection is
    inherently sequential, so this is a pytest-gated (rows-only)
    surface, like the k-means family.

    Determinism: candidates sort by (−rel, id) first and score ties
    resolve in that order (highest relevance, then lowest doc id).
    lam=1 reduces to relevance order (pytest-locked); the first pick
    is always the highest-relevance doc."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    # LEFT join so a candidate without an embedding row fails loudly
    # inside pick() (naming the doc ids) instead of silently vanishing
    # and letting a lower-relevance doc fill its rank
    enriched = candidates.select(query_col, id_col, rel_col).join(
        emb.select(
            F.col(emb_id_col).alias(id_col), F.col(vec_col).alias("_v")
        ),
        id_col,
        "left",
    )
    qt = candidates.schema[query_col].dataType.simpleString()
    it = candidates.schema[id_col].dataType.simpleString()
    out_schema = f"{query_col} {qt}, {id_col} {it}, mmr_score double, rank int"

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        missing = pdf.loc[pdf["_v"].isna(), id_col]
        if len(missing):
            raise ValueError(
                "mmr_rerank: candidates without an embedding row: "
                f"{sorted(missing.tolist())[:10]}"
            )
        if pdf[rel_col].isna().any():
            raise ValueError("mmr_rerank: null relevance in candidates")
        if pdf[id_col].duplicated().any():
            # a duplicated shortlist row would be scored independently
            # and the same doc could occupy two output ranks
            dups = sorted(pdf.loc[pdf[id_col].duplicated(), id_col].tolist())
            raise ValueError(
                f"mmr_rerank: duplicate candidate rows for docs: {dups[:10]}"
            )
        pdf = pdf.sort_values(
            [rel_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0  # zero vectors: cos contribution 0
        V = V / nrm
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        ids = pdf[id_col].to_numpy()
        n = len(pdf)
        picked: list[int] = []
        scores: list[float] = []
        max_sim = np.full(n, -np.inf)  # max cos to the selected set
        avail = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            penalty = np.where(np.isinf(max_sim), 0.0, max_sim)
            score = lam * rel - (1.0 - lam) * penalty
            score[~avail] = -np.inf
            best = score.max()
            j = int(np.flatnonzero(score == best)[0])  # lowest id wins
            picked.append(j)
            scores.append(float(best))
            avail[j] = False
            max_sim = np.maximum(max_sim, V @ V[j])
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[picked].to_numpy(),
                id_col: ids[picked],
                "mmr_score": np.round(scores, 6),
                "rank": np.arange(1, len(picked) + 1, dtype=np.int32),
            }
        )

    return enriched.groupBy(query_col).applyInPandas(pick, out_schema)


def linear_fuse(
    rankings: list[tuple[DataFrame, float]],
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Weighted linear score fusion with per-query min-max
    normalization (the other standard hybrid next to rank-only RRF):
    each list's scores scale to [0, 1] within the query — so a BM25
    score and a cosine become commensurable — then fuse as
    Σ wᵢ·normᵢ(d), missing-from-list contributing 0.  Use when score
    MAGNITUDES carry signal worth keeping (RRF throws them away);
    ``rankings`` is [(df, weight)] with (query_col, id_col,
    score_col) columns.

    Scale shape: inputs are per-query top-k slices, so normalization
    is a window over tiny groups and fusion is the same
    union + hash-agg + rank window as RRF — the corpus is never
    rescanned.  A constant-score list (max == min) normalizes to 1.0
    for every member (presence signal), matching the oracle."""
    if not rankings:
        raise ValueError("linear_fuse needs at least one ranking")
    parts = []
    for df, w in rankings:
        qw = Window.partitionBy(query_col)
        mn = F.min(score_col).over(qw)
        mx = F.max(score_col).over(qw)
        norm = F.when(mx > mn, (F.col(score_col) - mn) / (mx - mn)).otherwise(
            F.lit(1.0)
        )
        parts.append(
            df.select(
                F.col(query_col).alias("query_id"),
                F.col(id_col).alias("doc_id"),
                (F.lit(float(w)) * norm).alias("_c"),
            )
        )
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    scored = unioned.groupBy("query_id", "doc_id").agg(
        F.sum("_c").alias("fused_score")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("fused_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round("fused_score", 6).alias("fused_score"),
            "rank",
        )
    )
