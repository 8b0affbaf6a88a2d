"""Round-11: product-quantization ANN (ENGINE scope; reference anchor:
the reference has no similarity-search surface — SURVEY.md §2.12's
ANN family, of which this is the memory-compression scale path).

* ``ann_pq_topk`` — PQ/ADC approximate cosine top-5 (Jégou et al.
  2011): corpus vectors quantized to m=4 subspace codewords (8 per
  subspace, seeded-sampled by md5 order exactly like the IVF coarse
  quantizer), queries score candidates via per-subspace lookup
  tables.  At 100 TB the ADC scan reads m SMALL INTS per vector
  instead of dims doubles (~128x smaller), which is the entire point
  of PQ; the sim column is honestly named ``pq_sim`` — it is the ADC
  approximation, not the exact cosine (pq_topk's refine stage
  restores exactness; tests cover it).

Fully deterministic and FULLY ORACLED: codeword choice is md5 hash
order, encode/LUT arithmetic is strict left folds on both sides.
Catalog conventions (queries.py header) apply; superset entry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.operators import simsearch as SS
from prod2vec_spark.queries_ext import _DOT, _L2, _UNIT, EMB_DIMS
from prod2vec_spark.sources.io import read_table

_PQ_M = 4
_PQ_CODES = 8
_PQ_SUB = EMB_DIMS // _PQ_M


def q_ann_pq_topk(spark, sf_dir):
    """PQ/ADC approximate top-5 for query vectors vec_id < 20 — the
    compressed-scan member of the ANN family (exact: ann_topk;
    bucketed: ann_lsh_topk; inverted-file: ann_ivf_topk)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return SS.pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 20),
        dims=EMB_DIMS,
        k=5,
        m=_PQ_M,
        n_codes=_PQ_CODES,
    )


def _sql_ann_pq() -> str:
    # Replays the full PQ pipeline: seeded codeword sample (md5 order,
    # the IVF-oracle protocol) -> per-(vector, subspace) nearest
    # codeword by L2 with ties to the lowest j (Spark's strict-< fold
    # == ORDER BY d, j) -> ADC sim as the sum over subspaces of
    # <query-slice, codeword-slice> left-fold dots.  All folds are
    # list_reduce with a prepended 0.0, matching Spark's aggregate()
    # accumulation order bit-for-bit; the codeword values themselves
    # are re-derived via _UNIT (same IEEE ops as the driver-side
    # unit-scale that builds Spark's literals).
    sub = _PQ_SUB
    d2 = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {sub}), i -> "
        f"(n.nvec[s.mi*{sub}+i] - c.nvec[s.mi*{sub}+i]) "
        f"* (n.nvec[s.mi*{sub}+i] - c.nvec[s.mi*{sub}+i]))), (x, y) -> x + y)"
    )
    part = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {sub}), i -> "
        f"q.qn[k.mi*{sub}+i] * c.nvec[k.mi*{sub}+i])), (x, y) -> x + y)"
    )
    mi_rows = ", ".join(f"({mi})" for mi in range(_PQ_M))
    return f"""
WITH cw AS (
  SELECT row_number() OVER (ORDER BY md5('pq|' || vec_id), vec_id) - 1 AS j,
         nvec
  FROM (SELECT vec_id, {_UNIT.format(a='embedding')} AS nvec
        FROM embeddings
        WHERE {_L2.format(a='embedding')} > 0
        ORDER BY md5('pq|' || vec_id), vec_id LIMIT {_PQ_CODES})),
s AS (SELECT * FROM (VALUES {mi_rows}) AS t(mi)),
n AS (SELECT vec_id, {_UNIT.format(a='embedding')} AS nvec
      FROM embeddings
      WHERE {_L2.format(a='embedding')} > 0),
codes AS (
  SELECT vec_id, mi, j FROM (
    SELECT n.vec_id, s.mi, c.j,
           row_number() OVER (PARTITION BY n.vec_id, s.mi
                              ORDER BY ({d2}), c.j) AS rk
    FROM n CROSS JOIN s CROSS JOIN cw c)
  WHERE rk = 1),
q AS (SELECT vec_id AS query_id, nvec AS qn FROM n WHERE vec_id < 20),
adc AS (
  -- NOT sum(): Spark adds the m subspace contributions in mi order,
  -- and an order-free aggregate drifts ~1 ulp — enough to flip a
  -- pre-rounding rank tie.  An mi-ordered list + left fold replays
  -- Spark's exact addition order.
  SELECT query_id, vec_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), parts),
                     (x, y) -> x + y) AS sim
  FROM (SELECT q.query_id, k.vec_id, list({part} ORDER BY k.mi) AS parts
        FROM codes k JOIN cw c USING (j) CROSS JOIN q
        WHERE k.vec_id != q.query_id
        GROUP BY 1, 2))
SELECT query_id, vec_id AS neighbor_id, round(sim, 5) AS pq_sim,
       CAST(rank AS INT) AS rank
FROM (SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rank
      FROM adc)
WHERE rank <= 5
"""


_IVFPQ_CENTS = 8
_IVFPQ_PROBE = 2


def q_ann_ivfpq_topk(spark, sf_dir):
    """IVF+PQ approximate top-5 (the composed 100 TB layout): coarse
    cells prune candidates, ADC over m-int codes scores them — the
    candidate set is ann_ivf_topk's, the scoring is ann_pq_topk's."""
    # spread=False: the IVF/PQ codebook collects + probe legs run
    # multiple short jobs over this scan (see ann_ivf_topk's note)
    emb = read_table(spark, sf_dir, "embeddings", spread=False)
    return SS.ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 20),
        dims=EMB_DIMS,
        k=5,
        n_centroids=_IVFPQ_CENTS,
        nprobe=_IVFPQ_PROBE,
        m=_PQ_M,
        n_codes=_PQ_CODES,
    )


def _sql_ann_ivfpq() -> str:
    # The IVF oracle's cell assignment/probing (raw dots vs unit
    # 'ivf'-seeded centroids) composed with the PQ oracle's codes +
    # mi-ordered ADC fold; candidates are restricted to the probed
    # cells by the cid equi-join instead of the PQ oracle's cross
    # join.  Same fold discipline throughout (left folds, prepended
    # 0.0) so every double matches Spark bit-for-bit.
    sub = _PQ_SUB
    dot_ec = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {EMB_DIMS}), i -> "
        "e.embedding[i]::DOUBLE * c.cvec[i]::DOUBLE)), (x, y) -> x + y)"
    )
    dot_qc = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {EMB_DIMS}), i -> "
        "q.embedding[i]::DOUBLE * c.cvec[i]::DOUBLE)), (x, y) -> x + y)"
    )
    d2 = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {sub}), i -> "
        f"(n.nvec[s.mi*{sub}+i] - c.nvec[s.mi*{sub}+i]) "
        f"* (n.nvec[s.mi*{sub}+i] - c.nvec[s.mi*{sub}+i]))), (x, y) -> x + y)"
    )
    part = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {sub}), i -> "
        f"qp.qn[k.mi*{sub}+i] * c.nvec[k.mi*{sub}+i])), (x, y) -> x + y)"
    )
    mi_rows = ", ".join(f"({mi})" for mi in range(_PQ_M))
    return f"""
WITH cw AS (
  SELECT row_number() OVER (ORDER BY md5('pq|' || vec_id), vec_id) - 1 AS j,
         nvec
  FROM (SELECT vec_id, {_UNIT.format(a='embedding')} AS nvec
        FROM embeddings
        WHERE {_L2.format(a='embedding')} > 0
        ORDER BY md5('pq|' || vec_id), vec_id LIMIT {_PQ_CODES})),
s AS (SELECT * FROM (VALUES {mi_rows}) AS t(mi)),
n AS (SELECT vec_id, embedding, {_UNIT.format(a='embedding')} AS nvec
      FROM embeddings
      WHERE {_L2.format(a='embedding')} > 0),
codes AS (
  SELECT vec_id, mi, j FROM (
    SELECT n.vec_id, s.mi, c.j,
           row_number() OVER (PARTITION BY n.vec_id, s.mi
                              ORDER BY ({d2}), c.j) AS rk
    FROM n CROSS JOIN s CROSS JOIN cw c)
  WHERE rk = 1),
cid AS (
  SELECT row_number() OVER (ORDER BY md5('ivf|' || vec_id), vec_id) - 1 AS cid,
         cvec
  FROM (SELECT vec_id, {_UNIT.format(a='embedding')} AS cvec
        FROM embeddings
        WHERE {_L2.format(a='embedding')} > 0
        ORDER BY md5('ivf|' || vec_id), vec_id LIMIT {_IVFPQ_CENTS})),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY ({dot_ec}) DESC, c.cid) AS rk
    FROM (SELECT vec_id, embedding FROM n) e CROSS JOIN cid c)
  WHERE rk = 1),
q AS (SELECT vec_id AS query_id, embedding, nvec AS qn FROM n WHERE vec_id < 20),
qprobe AS (
  SELECT query_id, qn, cid FROM (
    SELECT q.query_id, q.qn, c.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY ({dot_qc}) DESC, c.cid) AS rk
    FROM q CROSS JOIN cid c)
  WHERE rk <= {_IVFPQ_PROBE}),
adc AS (
  SELECT query_id, vec_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), parts),
                     (x, y) -> x + y) AS sim
  FROM (SELECT qp.query_id, k.vec_id, list({part} ORDER BY k.mi) AS parts
        FROM assign a
        JOIN qprobe qp USING (cid)
        JOIN codes k ON k.vec_id = a.vec_id
        JOIN cw c ON c.j = k.j
        WHERE a.vec_id != qp.query_id
        GROUP BY 1, 2))
SELECT query_id, vec_id AS neighbor_id, round(sim, 5) AS pq_sim,
       CAST(rank AS INT) AS rank
FROM (SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rank
      FROM adc)
WHERE rank <= 5
"""


# ---------------------------------------------- hybrid RRF retrieval
_HYBRID_PROBES = [("q_spark", 0), ("q_scan", 1), ("q_stream", 2)]
_HYBRID_DEPTH = 10
_RRF_K = 60


def q_hybrid_rrf_topk(spark, sf_dir):
    """Hybrid lexical+dense retrieval: the BM25 keyword ranking and
    the exact-cosine ANN ranking (per-query probe vectors) fused by
    reciprocal-rank fusion — rank-only, so no score calibration
    between BM25 scores and cosines (operators/fusion.py)."""
    from prod2vec_spark.operators.bm25 import bm25_topk
    from prod2vec_spark.operators.fusion import rrf_fuse
    from prod2vec_spark.queries_r7 import BM25_QUERIES

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    bm = bm25_topk(docs, BM25_QUERIES, k=_HYBRID_DEPTH)
    probes = emb.where(
        F.col("vec_id").isin([v for _, v in _HYBRID_PROBES])
    )
    ann = SS.brute_force_topk(emb, probes, k=_HYBRID_DEPTH).select(
        F.col("query_id").alias("_vid"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    mapping = F.broadcast(
        spark.createDataFrame(_HYBRID_PROBES, "qid string, _vid long")
    )
    ann_m = ann.join(mapping, "_vid").select(
        F.col("qid").alias("query_id"), "doc_id", "rank"
    )
    return rrf_fuse(
        [bm.select("query_id", "doc_id", "rank"), ann_m],
        k=_HYBRID_DEPTH,
        k_rrf=_RRF_K,
    )


def _sql_hybrid_rrf() -> str:
    # The BM25 oracle embedded verbatim as a subquery + a brute-force
    # cosine ranking for the mapped probe vectors, fused with the
    # rank-only RRF formula.  Two lists → the fused sum is a two-term
    # IEEE add (commutative), so scores are oracle-exact pre-round.
    from prod2vec_spark.queries_r7 import _sql_bm25_topk

    map_rows = ", ".join(f"('{q}', {v})" for q, v in _HYBRID_PROBES)
    return f"""
WITH bm AS (SELECT * FROM ({_sql_bm25_topk()})),
map(query_id, vec_id) AS (VALUES {map_rows}),
n AS (SELECT vec_id, {_UNIT.format(a='embedding')} AS nvec FROM embeddings),
qv AS (SELECT m.query_id, n.vec_id, n.nvec AS qn
       FROM n JOIN map m USING (vec_id)),
p AS (SELECT qv.query_id, n.vec_id AS doc_id,
             ({_DOT.format(a='qv.qn', b='n.nvec')}) AS sim
      FROM n CROSS JOIN qv
      WHERE n.vec_id != qv.vec_id),
ar AS (SELECT query_id, doc_id,
              CAST(row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, doc_id) AS INT) AS rank
       FROM p),
u AS (SELECT query_id, doc_id, 1.0 / ({_RRF_K} + rank) AS c
      FROM bm
      UNION ALL
      SELECT query_id, doc_id, 1.0 / ({_RRF_K} + rank) AS c
      FROM ar WHERE rank <= {_HYBRID_DEPTH}),
f AS (SELECT query_id, doc_id, sum(c) AS rrf_score FROM u GROUP BY 1, 2)
SELECT query_id, doc_id, round(rrf_score, 6) AS rrf_score,
       CAST(rank AS INT) AS rank
FROM (SELECT query_id, doc_id, rrf_score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_score DESC, doc_id) AS rank
      FROM f)
WHERE rank <= {_HYBRID_DEPTH}
"""


_LIN_W_BM25 = 0.6
_LIN_W_DENSE = 0.4


def q_hybrid_linear_topk(spark, sf_dir):
    """Weighted min-max score fusion of the same BM25 + ANN legs as
    the RRF entry (operators/fusion.linear_fuse) — the score-magnitude
    hybrid; both legs' scores enter normalization ROUNDED (4/5 dp,
    their entry-facing precision) so min/max replay exactly."""
    from prod2vec_spark.operators.bm25 import bm25_topk
    from prod2vec_spark.operators.fusion import linear_fuse
    from prod2vec_spark.queries_r7 import BM25_QUERIES

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    bm = bm25_topk(docs, BM25_QUERIES, k=_HYBRID_DEPTH).select(
        "query_id", "doc_id", "score"
    )
    probes = emb.where(
        F.col("vec_id").isin([v for _, v in _HYBRID_PROBES])
    )
    ann = SS.brute_force_topk(emb, probes, k=_HYBRID_DEPTH).select(
        F.col("query_id").alias("_vid"),
        F.col("neighbor_id").alias("doc_id"),
        F.col("cosine_sim").alias("score"),
    )
    mapping = F.broadcast(
        spark.createDataFrame(_HYBRID_PROBES, "qid string, _vid long")
    )
    ann_m = ann.join(mapping, "_vid").select(
        F.col("qid").alias("query_id"), "doc_id", "score"
    )
    return linear_fuse(
        [(bm, _LIN_W_BM25), (ann_m, _LIN_W_DENSE)], k=_HYBRID_DEPTH
    )


def _sql_hybrid_linear() -> str:
    # same legs as _sql_hybrid_rrf, fused by weighted per-query
    # min-max normalization; both scores are the entries' ROUNDED
    # values so mn/mx/norm arithmetic replays bit-for-bit, and the
    # two-term weighted sum is an order-free IEEE add.
    from prod2vec_spark.queries_r7 import _sql_bm25_topk

    map_rows = ", ".join(f"('{q}', {v})" for q, v in _HYBRID_PROBES)
    return f"""
WITH bm AS (SELECT * FROM ({_sql_bm25_topk()})),
map(query_id, vec_id) AS (VALUES {map_rows}),
n AS (SELECT vec_id, {_UNIT.format(a='embedding')} AS nvec FROM embeddings),
qv AS (SELECT m.query_id, n.vec_id, n.nvec AS qn
       FROM n JOIN map m USING (vec_id)),
p AS (SELECT qv.query_id, n.vec_id AS doc_id,
             ({_DOT.format(a='qv.qn', b='n.nvec')}) AS sim
      FROM n CROSS JOIN qv
      WHERE n.vec_id != qv.vec_id),
ar AS (SELECT query_id, doc_id, round(sim, 5) AS score
       FROM (SELECT query_id, doc_id, sim,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, doc_id) AS rank
             FROM p)
       WHERE rank <= {_HYBRID_DEPTH}),
u AS (
  SELECT query_id, doc_id,
         {_LIN_W_BM25} * (CASE WHEN mx > mn THEN (score - mn) / (mx - mn)
                               ELSE 1.0 END) AS c
  FROM (SELECT query_id, doc_id, score,
               min(score) OVER (PARTITION BY query_id) AS mn,
               max(score) OVER (PARTITION BY query_id) AS mx
        FROM bm)
  UNION ALL
  SELECT query_id, doc_id,
         {_LIN_W_DENSE} * (CASE WHEN mx > mn THEN (score - mn) / (mx - mn)
                                ELSE 1.0 END) AS c
  FROM (SELECT query_id, doc_id, score,
               min(score) OVER (PARTITION BY query_id) AS mn,
               max(score) OVER (PARTITION BY query_id) AS mx
        FROM ar)),
f AS (SELECT query_id, doc_id, sum(c) AS fused_score FROM u GROUP BY 1, 2)
SELECT query_id, doc_id, round(fused_score, 6) AS fused_score,
       CAST(rank AS INT) AS rank
FROM (SELECT query_id, doc_id, fused_score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY fused_score DESC, doc_id) AS rank
      FROM f)
WHERE rank <= {_HYBRID_DEPTH}
"""


def q_mmr_diverse_topk(spark, sf_dir):
    """MMR diversity re-rank of an exact-cosine top-30 shortlist
    (operators/fusion.mmr_rerank).  FULLY ORACLED since round 15:
    greedy sequential selection was the declared applyInPandas
    boundary class ("no relational form"), but a DuckDB RECURSIVE CTE
    replays it exactly — the recursion carries the per-query selected
    set (ids + unit vectors) and a LATERAL argmax performs each greedy
    step with the operator's own tie-break (score desc, rel desc, doc
    id asc).  Score parity is exact at 6 dp because the testdata
    embeddings have 5-dp-quantized pairwise cosines, so every MMR
    score is mathematically an exact 6-dp decimal: both engines'
    float64 evaluations land within ~1e-15 of it, comparisons between
    candidates differ by ≥ 1e-6, and the 6-dp round is 5e-7 from any
    boundary — selection and values replay deterministically.  The
    exact-value/property gates (lam edge cases, failure modes) remain
    in tests/test_fusion.py."""
    from prod2vec_spark.operators.fusion import mmr_rerank

    emb = read_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    cand = SS.brute_force_topk(emb, probes, k=30).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("cosine_sim").alias("rel"),
    )
    out = mmr_rerank(cand, emb, k=10, lam=0.7)
    return out.withColumn("mmr_score", F.round("mmr_score", 6))


R11_QUERIES = {
    "ann_pq_topk": q_ann_pq_topk,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "hybrid_rrf_topk": q_hybrid_rrf_topk,
    "hybrid_linear_topk": q_hybrid_linear_topk,
    "mmr_diverse_topk": q_mmr_diverse_topk,
}
_MMR_LAM, _MMR_K, _MMR_N = 0.7, 10, 30


def _sql_mmr_diverse_topk() -> str:
    """Greedy MMR as a RECURSIVE CTE (round 15): state = one row per
    (query, step) carrying the selected ids + unit vectors; each
    recursive step is a LATERAL argmax over the remaining shortlist
    with penalty = max dot against the carried vectors.  Nested
    lambdas can't capture outer lambda variables in DuckDB, so the
    penalty dot unnests BOTH vectors positionally in a correlated
    plain-SQL subquery instead of list_transform."""
    from prod2vec_spark.queries_ext import _DOT, _UNIT

    pen = (
        "(SELECT max(dsum) FROM (SELECT (SELECT sum(z.a * z.b) FROM "
        "(SELECT unnest(c.vec) AS a, unnest(u.pv) AS b) z) AS dsum "
        "FROM (SELECT unnest(s.pvecs) AS pv) u) t)"
    )
    return f"""
WITH RECURSIVE
n AS (SELECT vec_id, {_UNIT.format(a='embedding')} AS nvec FROM embeddings),
q AS (SELECT vec_id AS query_id, nvec AS qn FROM n WHERE vec_id < 5),
p AS (SELECT query_id, vec_id AS doc_id,
             ({_DOT.format(a='qn', b='nvec')}) AS sim, nvec
      FROM n CROSS JOIN q WHERE vec_id != query_id),
cand AS (SELECT query_id, doc_id, round(sim, 5) AS rel, nvec AS vec
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                           ORDER BY sim DESC, doc_id) rn FROM p)
         WHERE rn <= {_MMR_N}),
sel AS (
  SELECT query_id, 1 AS rank, doc_id, {_MMR_LAM} * rel AS mmr_score,
         [doc_id] AS picked, [vec] AS pvecs
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY rel DESC, doc_id) rn FROM cand)
  WHERE rn = 1
  UNION ALL
  SELECT s.query_id, s.rank + 1, best.doc_id, best.mmr_score,
         list_append(s.picked, best.doc_id), list_append(s.pvecs, best.vec)
  FROM sel s, LATERAL (
     SELECT c.doc_id, c.vec,
            {_MMR_LAM} * c.rel - (1 - {_MMR_LAM}) * ({pen}) AS mmr_score,
            c.rel
     FROM cand c
     WHERE c.query_id = s.query_id
       AND NOT list_contains(s.picked, c.doc_id)
     ORDER BY mmr_score DESC, c.rel DESC, c.doc_id
     LIMIT 1
  ) best
  WHERE s.rank < {_MMR_K}
)
SELECT query_id, doc_id, round(mmr_score, 6) AS mmr_score,
       CAST(rank AS INT) AS rank
FROM sel
"""


R11_ORACLES: dict[str, str] = {
    "ann_pq_topk": _sql_ann_pq(),
    "ann_ivfpq_topk": _sql_ann_ivfpq(),
    "hybrid_rrf_topk": _sql_hybrid_rrf(),
    "hybrid_linear_topk": _sql_hybrid_linear(),
    # round-15 upgrade: the greedy re-rank replayed by recursion
    "mmr_diverse_topk": _sql_mmr_diverse_topk(),
}
