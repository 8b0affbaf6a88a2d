"""Similarity search over ``embeddings`` (ENGINE scope): brute-force
cosine top-k as the exact baseline, sign-LSH bucketing as the scale
path, embedding-cosine near-dup on top of both.

Scale design: brute-force is a broadcast of the (small) query set
against a single streaming pass of the corpus — O(|corpus|·|queries|)
FLOPs but ZERO shuffle of the corpus and no materialized cross join;
the per-query top-k is a window over (query_id) partitions of the
already-filtered candidate rows.  Above ~10⁵ queries or ~10⁸ corpus
rows, sign-LSH buckets cut candidates by 2^num_planes; the hyperplanes
are hash-derived (deterministic, engine-portable) rather than RNG
matrices, so results reproduce across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prod2vec_spark.functions.vector import cosine_similarity, dot as vec_dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: every query vs every corpus vector, self
    excluded; deterministic tie-break by neighbor id."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
        )
    )
    sim = cosine_similarity(F.col("query_vec"), F.col(vec_col))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        corpus.crossJoin(q)
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round("sim", 5).alias("cosine_sim"),
            "rank",
        )
    )


def deterministic_planes(dims: int, num_planes: int) -> list[list[float]]:
    """Hyperplane matrix derived from md5 (hashlib, driver-side):
    component (p, d) = 2·(first-8-hex-digits of md5('plane|p|d'))/2^32 − 1.
    Deterministic with no RNG state — the identical constants embed in
    both the Spark plan and the DuckDB oracle SQL as literals, so
    bucket assignments agree bit-for-bit across engines."""
    import hashlib

    out = []
    for p in range(num_planes):
        row = []
        for d in range(dims):
            h = hashlib.md5(f"plane|{p}|{d}".encode()).hexdigest()[:8]
            row.append(2.0 * (int(h, 16) / 4294967296.0) - 1.0)
        out.append(row)
    return out


def sign_lsh_bucket(vec: Column, dims: int, num_planes: int = 8) -> Column:
    """Sign-LSH bucket id in [0, 2^num_planes): bit p = [⟨v, h_p⟩ > 0].
    Row-local expression — bucketing a 100 TB corpus is a single map
    pass, and the buckets co-partition the subsequent self-join.  The
    dot product is a strict left fold (aggregate over zip_with), the
    same order the oracle's list_reduce uses."""
    planes = deterministic_planes(dims, num_planes)
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane_arr = F.array(*[F.lit(c) for c in planes[p]])
        d = vec_dot(vec, plane_arr)
        bucket = bucket + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 10,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket
    (same-sign projection on every hyperplane), then exact cosine rank
    within the bucket.  Recall < 1 by construction; the bucket join is
    an equi-join (shuffle by bucket) instead of a cross join."""
    cb = corpus.withColumn("bucket", sign_lsh_bucket(F.col(vec_col), dims, num_planes))
    qb = F.broadcast(
        queries.withColumn("bucket", sign_lsh_bucket(F.col(vec_col), dims, num_planes)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
            "bucket",
        )
    )
    sim = cosine_similarity(F.col("query_vec"), F.col(vec_col))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        cb.join(qb, "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round("sim", 5).alias("cosine_sim"),
            "rank",
        )
    )


def embedding_neardup(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: bucket with sign-LSH, then
    exact cosine within buckets, keep pairs ≥ threshold.  At high
    thresholds near-dups almost always share all plane signs, so the
    bucket equi-join loses little recall while removing the O(n²)
    pair space."""
    dims_row = corpus.select(F.size(vec_col).alias("d")).first()
    dims = dims_row["d"]
    b = corpus.withColumn("bucket", sign_lsh_bucket(F.col(vec_col), dims, num_planes))
    l, r = b.alias("l"), b.alias("r")
    sim = cosine_similarity(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .withColumn("cosine_sim", F.round(sim, 5))
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            F.col(f"l.{id_col}").alias("vec_a"),
            F.col(f"r.{id_col}").alias("vec_b"),
            "cosine_sim",
        )
    )
