"""Round-4 catalog queries: verification-audit and pipeline operators
that turn docstring claims into checked numbers.

* ``ann_recall`` — recall@k of the two approximate ANN paths
  (sign-LSH buckets, IVF cells) against the exact brute-force top-k:
  the approximation quality of the scale path becomes a driver-checked
  value instead of a design note.
* ``minhash_jaccard_audit`` — for every LSH candidate pair, the
  MinHash-estimated Jaccard (matching signature positions /
  num_hashes) next to the exact Jaccard over the same 3-shingle sets,
  with the per-pair absolute estimation error: the sketch's accuracy
  is measured, not assumed.

Catalog conventions (queries.py header) apply: aliased columns on both
sides, deterministic md5-derived pseudo-randomness, DuckDB oracle
replays the identical arithmetic.

Scale notes (100 TB design point): both audits are joins/aggregations
over the OUTPUTS of already-bucketed operators (top-k lists, candidate
pairs) — orders of magnitude smaller than the base tables — so the
audit cost is negligible next to the operators it audits.  This is the
shape a production data-quality loop needs: the audit must not cost a
second pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F


# -------------------------------------------------------- ANN recall@k
def q_ann_recall(spark, sf_dir):
    """Recall@5 of ann_lsh_topk and ann_ivf_topk vs the exact ann_topk
    baseline (VERDICT r3 stretch: approximation quality as a checked
    number).  One row per approximate method: hits = |approx ∩ exact|
    per query, recall = total hits / total exact pairs."""
    from prod2vec_spark.queries_ext import q_ann_ivf_topk, q_ann_lsh_topk, q_ann_topk

    # materialize the exact top-k ONCE (it is ~100 rows) — without
    # this the costliest subquery re-evaluates per method iteration
    # and again inside the n_exact aggregate (ADVICE r4)
    exact = (
        q_ann_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    out = None
    for method, fn in (("ivf", q_ann_ivf_topk), ("lsh", q_ann_lsh_topk)):
        approx = fn(spark, sf_dir).select("query_id", "neighbor_id")
        # exact is 20 queries x 5 neighbors = 100 rows — broadcast it;
        # the join runs on the tiny top-k outputs, never the base table
        hits = F.broadcast(exact).join(approx, ["query_id", "neighbor_id"])
        row = (
            exact.agg(F.count(F.lit(1)).alias("n_exact"))
            .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
            .select(
                F.lit(method).alias("method"),
                "n_exact",
                "n_hits",
                F.round(F.col("n_hits") / F.col("n_exact"), 5).alias("recall"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_ann_recall() -> str:
    from prod2vec_spark.queries_ext import SQL_ANN_TOPK, _sql_ann_ivf, _sql_ann_lsh

    return f"""
WITH exact AS (SELECT query_id, neighbor_id FROM ({SQL_ANN_TOPK})),
ivf AS (SELECT query_id, neighbor_id FROM ({_sql_ann_ivf()})),
lsh AS (SELECT query_id, neighbor_id FROM ({_sql_ann_lsh()})),
ex_n AS (SELECT count(*) AS n_exact FROM exact)
SELECT 'ivf' AS method, n_exact,
       (SELECT count(*) FROM exact JOIN ivf USING (query_id, neighbor_id)) AS n_hits,
       round(CAST((SELECT count(*) FROM exact JOIN ivf USING (query_id, neighbor_id)) AS DOUBLE) / n_exact, 5) AS recall
FROM ex_n
UNION ALL
SELECT 'lsh' AS method, n_exact,
       (SELECT count(*) FROM exact JOIN lsh USING (query_id, neighbor_id)) AS n_hits,
       round(CAST((SELECT count(*) FROM exact JOIN lsh USING (query_id, neighbor_id)) AS DOUBLE) / n_exact, 5) AS recall
FROM ex_n
"""


# ---------------------------------------------- MinHash jaccard audit
NUM_HASHES = 8


def q_minhash_jaccard_audit(spark, sf_dir):
    """Sketch-accuracy audit (the dedup-plane companion of ann_recall):
    for every LSH candidate pair, MinHash-estimated Jaccard = matching
    signature positions / num_hashes, next to the EXACT Jaccard over
    the identical distinct word-3-shingle sets, plus |error|.

    Scale shape: the signature+shingle table is materialized once
    (localCheckpoint — one corpus pass feeds both the banding and the
    estimate); candidate pairs are an output of the already-bucketed
    LSH operator and are orders of magnitude smaller than the corpus,
    so they BROADCAST into two streaming joins against the
    materialized table — the exact-Jaccard verify never self-joins the
    corpus."""
    from prod2vec_spark.operators import dedup as DD
    from prod2vec_spark.queries_ext import LSH_MAX_GROUP
    from prod2vec_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    sigs = DD.minhash_sigs(docs, keep_shingles=True).localCheckpoint(eager=True)
    cand = DD.lsh_candidate_pairs(
        DD.bands_from_sigs(sigs.drop("_sh")), max_group=LSH_MAX_GROUP
    )
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("_sh").alias("sh_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(NUM_HASHES)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("_sh").alias("sh_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(NUM_HASHES)],
    )
    step1 = a.join(F.broadcast(cand), "doc_a")
    pairs = b.join(F.broadcast(step1), "doc_b")
    n_match = sum(
        (F.col(f"a{j}") == F.col(f"b{j}")).cast("int") for j in range(NUM_HASHES)
    )
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    n_union = F.size(F.array_union("sh_a", "sh_b"))
    exact = n_inter.cast("double") / n_union
    est = n_match / F.lit(float(NUM_HASHES))
    return pairs.select(
        "doc_a",
        "doc_b",
        n_match.alias("n_match"),
        F.round(est, 5).alias("est_jaccard"),
        F.round(exact, 5).alias("exact_jaccard"),
        F.round(F.abs(est - exact), 5).alias("abs_err"),
    )


def _sql_minhash_jaccard_audit() -> str:
    from prod2vec_spark.queries_ext import _SQL_MINHASH, _SQL_SHINGLES3, LSH_MAX_GROUP

    match_terms = " + ".join(
        f"CAST(ma.mh{j} = mb.mh{j} AS INT)" for j in range(NUM_HASHES)
    )
    return f"""
WITH {_SQL_SHINGLES3},
{_SQL_MINHASH},
eligible AS (
  SELECT band_id, band_sig FROM bands
  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND {LSH_MAX_GROUP}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN eligible e ON a.band_id = e.band_id AND a.band_sig = e.band_sig
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
det AS (
  SELECT doc_a, doc_b,
         ({match_terms}) AS n_match,
         len(list_intersect(sa.sh, sb.sh)) AS n_inter,
         len(list_distinct(list_concat(sa.sh, sb.sh))) AS n_union
  FROM pairs
  JOIN mh ma ON ma.doc_id = doc_a
  JOIN mh mb ON mb.doc_id = doc_b
  JOIN sh3 sa ON sa.doc_id = doc_a
  JOIN sh3 sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, CAST(n_match AS INT) AS n_match,
       round(n_match / {float(NUM_HASHES)}, 5) AS est_jaccard,
       round(CAST(n_inter AS DOUBLE) / n_union, 5) AS exact_jaccard,
       round(abs(n_match / {float(NUM_HASHES)} - CAST(n_inter AS DOUBLE) / n_union), 5) AS abs_err
FROM det
"""


R4_QUERIES = {
    "ann_recall": q_ann_recall,
    "minhash_jaccard_audit": q_minhash_jaccard_audit,
}

R4_ORACLES = {
    "ann_recall": _sql_ann_recall(),
    "minhash_jaccard_audit": _sql_minhash_jaccard_audit(),
}
