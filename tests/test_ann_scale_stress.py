"""ANN at 10x corpus density: amplify the embeddings table with
deterministically jittered replicas (planted nearest-neighbor
structure: each vector's 9 siblings are its true top neighbors), then
assert (a) exact brute force recovers the planted structure and
(b) IVF recall against exact ground truth holds at the denser corpus —
the ANN counterpart of the dedup 10x stress.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.operators.simsearch import brute_force_topk, ivf_topk
from prod2vec_spark.sources.io import read_table
from tests.conftest import SF_SMOKE
import pytest

pytestmark = pytest.mark.slow  # e2e/replay file: driver-budget suite skips it (conftest hook)

FACTOR = 10
K = 5
PROBE_BASE_IDS = [3, 17, 42, 101, 250]


def amplify_embeddings(emb, factor: int = FACTOR):
    """vec_id*factor + r; replica 0 keeps the vector verbatim, others
    get ±1% deterministic multiplicative jitter per component — row
    local, no shuffle, replayable (xxhash64-derived)."""
    r = F.col("replica")
    jittered = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            * (
                1.0
                + 0.02
                * (
                    F.pmod(F.xxhash64(F.col("vec_id"), r, i), F.lit(1000))
                    / 1000.0
                    - 0.5
                )
            )
        ).cast("float"),
    )
    return (
        emb.select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("replica"),
        )
        .select(
            (F.col("vec_id") * factor + r).cast("long").alias("vec_id"),
            F.when(r == 0, F.col("embedding")).otherwise(jittered).alias(
                "embedding"
            ),
        )
    )


def test_ann_recall_holds_at_10x(spark):
    corpus = amplify_embeddings(
        read_table(spark, SF_SMOKE, "embeddings")
    ).localCheckpoint()
    probes = corpus.where(
        F.col("vec_id").isin([b * FACTOR for b in PROBE_BASE_IDS])
    )

    exact = brute_force_topk(corpus, probes, k=K).localCheckpoint()

    # planted structure recovered: every exact top-5 neighbor of a
    # probe is one of its 9 jittered siblings
    fam = exact.withColumn(
        "same_family",
        (
            (F.col("neighbor_id") / FACTOR).cast("long")
            == (F.col("query_id") / FACTOR).cast("long")
        ).cast("int"),
    )
    per_probe = fam.groupBy("query_id").agg(
        F.sum("same_family").alias("n_fam"), F.count("*").alias("n")
    )
    for row in per_probe.collect():
        assert row["n"] == K
        assert row["n_fam"] == K, f"probe {row['query_id']}: {row['n_fam']}/5"

    # IVF over the dense corpus: recall@5 vs exact ground truth
    approx = ivf_topk(
        corpus, probes, dims=64, k=K, n_centroids=16, nprobe=4
    )
    hits = exact.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).count()
    recall = hits / (K * len(PROBE_BASE_IDS))
    # calibrated: measured 1.0 at nprobe 2/4/8 on this deterministic
    # corpus (±1% jitter keeps each family inside one IVF cell); the
    # bound leaves headroom only for a legitimately re-seeded sampler
    assert recall >= 0.9, f"IVF recall@5 at 10x = {recall}"
