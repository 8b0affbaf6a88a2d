"""Similarity search over ``embeddings`` (ENGINE scope): brute-force
cosine top-k as the exact baseline, sign-LSH bucketing as the scale
path, banded-LSH embedding near-dup on top of both.

Scale design:

- **Normalize once, dot many.**  Every operator pre-computes the L2
  norm as a materialized column and unit-scales each vector in a
  single map pass, so the per-pair work inside joins is ONE strict
  left-fold dot product — not dot + two norms.  At 100 TB the pair
  space dominates; tripling per-pair FLOPs is the difference between
  a day and three.
- **Brute force** broadcasts the (small) query set against one
  streaming pass of the corpus — zero shuffle of the corpus, no
  materialized cross join; per-query top-k is a window over the
  candidate rows.
- **Sign-LSH** buckets cut candidates by 2^num_planes; hyperplanes
  are hash-derived (deterministic, engine-portable) rather than RNG
  matrices, so results reproduce across runs and engines.
- **Near-dup** uses BANDED sign-LSH (OR over bands of AND-ed planes,
  the MinHash-banding construction transplanted to hyperplanes):
  B bands × r planes gives candidate-probability
  1 − (1 − p^r)^B with p = 1 − θ/π, steep around the dup threshold —
  high recall where it matters, equi-join (shuffle on 16-bucket band
  signatures) instead of the O(n²) cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prod2vec_spark.functions.vector import dot as vec_dot, l2_norm, normalized


def _with_unit(df: DataFrame, vec_col: str, out: str = "nvec") -> DataFrame:
    """Attach a unit-scaled copy of ``vec_col``.  Norm materialized
    first (interpreted HOFs have no CSE — see functions/vector.py)."""
    return df.withColumn("_nrm", F.nullif(l2_norm(F.col(vec_col)), F.lit(0.0))).withColumn(
        out, normalized(F.col(vec_col), F.col("_nrm"))
    ).drop("_nrm")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: every query vs every corpus vector, self
    excluded; deterministic tie-break by neighbor id."""
    c = _with_unit(corpus, vec_col, "nvec")
    q = F.broadcast(
        _with_unit(queries, vec_col, "qn").select(
            F.col(id_col).alias("query_id"), "qn"
        )
    )
    sim = vec_dot(F.col("qn"), F.col("nvec"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        c.crossJoin(q)
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


def sign_lsh_bucket(
    vec: Column, dims: int, num_planes: int = 8, first_plane: int = 0
) -> Column:
    """Sign-LSH bucket id in [0, 2^num_planes): bit p = [⟨v, h_p⟩ > 0].
    Row-local expression — bucketing a 100 TB corpus is a single map
    pass, and the buckets co-partition the subsequent self-join.  The
    dot product is a strict left fold (aggregate over zip_with), the
    same order the oracle's list_reduce uses.  ``first_plane`` offsets
    into the shared plane family so bands use disjoint planes."""
    planes = deterministic_planes(dims, first_plane + num_planes)[first_plane:]
    bucket = F.lit(0).cast("long")
    for p, row in enumerate(planes):
        plane_arr = F.array(*[F.lit(c) for c in row])
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
    cb = _with_unit(
        corpus.withColumn("bucket", sign_lsh_bucket(F.col(vec_col), dims, num_planes)),
        vec_col,
        "nvec",
    )
    qb = F.broadcast(
        _with_unit(
            queries.withColumn(
                "bucket", sign_lsh_bucket(F.col(vec_col), dims, num_planes)
            ),
            vec_col,
            "qn",
        ).select(F.col(id_col).alias("query_id"), "qn", "bucket")
    )
    sim = vec_dot(F.col("qn"), F.col("nvec"))
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
    dims: int,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 4,
    planes_per_band: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded sign-LSH.

    Each vector gets ``bands`` signatures of ``planes_per_band``
    sign-bits over disjoint deterministic hyperplanes; candidate pairs
    share ANY band signature (explode → equi-join on (band, sig) →
    distinct), then exact cosine on unit vectors keeps pairs ≥
    threshold.  Candidate probability 1−(1−p^r)^B: ~0.95 at sim 0.9,
    ~0.5 at sim 0.4 — versus ~0.03 for a single 16-plane bucket.
    The join is an equi-join on a 2-int key; no cross join exists at
    any scale."""
    all_planes = planes_per_band * bands
    unit = _with_unit(corpus, vec_col, "nvec").select(id_col, "nvec")
    band_cols = []
    for b in range(bands):
        sig = F.lit(0).cast("long")
        planes = deterministic_planes(dims, all_planes)[
            b * planes_per_band : (b + 1) * planes_per_band
        ]
        for p, row in enumerate(planes):
            d = vec_dot(F.col("nvec"), F.array(*[F.lit(c) for c in row]))
            sig = sig + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        band_cols.append(F.struct(F.lit(b).alias("band"), sig.alias("sig")))
    sigs = unit.select(
        id_col, "nvec", F.explode(F.array(*band_cols)).alias("bs")
    ).select(id_col, "nvec", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    l, r = sigs.alias("l"), sigs.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("vec_a"),
            F.col(f"r.{id_col}").alias("vec_b"),
            F.col("l.nvec").alias("na"),
            F.col("r.nvec").alias("nb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cand.withColumn("cosine_sim", F.round(vec_dot(F.col("na"), F.col("nb")), 5))
        .filter(F.col("cosine_sim") >= threshold)
        .select("vec_a", "vec_b", "cosine_sim")
    )
