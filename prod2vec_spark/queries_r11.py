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
from prod2vec_spark.queries_ext import _L2, _UNIT, EMB_DIMS
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


R11_QUERIES = {
    "ann_pq_topk": q_ann_pq_topk,
}
R11_ORACLES: dict[str, str] = {
    "ann_pq_topk": _sql_ann_pq(),
}
