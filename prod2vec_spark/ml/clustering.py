"""MLlib KMeans over the embeddings table (ENGINE scope — the
reference's only estimator is the embedding model itself; clustering
is the natural companion the LLM-pipeline family needs: corpus
bucketing, IVF centroid refinement, diversity sampling).

Relation to simsearch.ivf_topk: IVF there uses md5-seeded SAMPLED
centroids (cheap, deterministic, oracle-checkable).  ``kmeans_fit``
is the quality upgrade — Lloyd-refined centroids drop mean
quantization error and tighten ANN recall at the same nprobe; the
collected centroid matrix plugs into the same assignment path.

Scale notes (100 TB design point): MLlib KMeans is the distributed
implementation (k-means|| init, per-iteration map-side partial sums —
one pass over the data per iteration, centroids live on the driver,
k x dim doubles).  Assignment via ``model.transform`` is row-local
against broadcast centroids: zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def kmeans_fit(
    emb: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 42,
    max_iter: int = 20,
):
    """Fit KMeans on an array<float> column; returns (model, assigned)
    where ``assigned`` = input rows + ``cluster`` int column.  The
    array column converts to the MLlib vector type row-locally
    (array_to_vector); no shuffle is added by assignment."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(
        k=k,
        seed=seed,
        maxIter=max_iter,
        featuresCol="_features",
        predictionCol="cluster",
    )
    model = km.fit(feats)
    return model, model.transform(feats).drop("_features")


def kmeans_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    seed: int = 42,
    max_iter: int = 10,
    vec_col: str = "embedding",
):
    """IVF ANN with Lloyd-refined centroids — the quality upgrade this
    module's docstring promises: fit MLlib KMeans, hand
    ``model.clusterCenters()`` to the same ivf_topk assignment/probe
    path (collected centroid literal, zero-shuffle corpus pass,
    broadcast probe join).  Refined cells track the data distribution,
    so at equal nprobe recall is at least that of seeded-sample cells
    (pytest-checked on the testdata).  No oracle — the centroid fit is
    iterative ML; the sampled-centroid `ann_ivf_topk` remains the
    hash-matched catalog entry."""
    from prod2vec_spark.operators.simsearch import ivf_topk

    model, _ = kmeans_fit(
        corpus, vec_col=vec_col, k=n_centroids, seed=seed, max_iter=max_iter
    )
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    centers = [c for c in centers if any(x != 0.0 for x in c)]
    if not centers:
        # degenerate corpus (all-zero vectors): ivf_topk would build a
        # malformed empty centroid matrix — fail with the cause instead
        raise ValueError(
            "kmeans_ivf_topk: all fitted cluster centers have zero norm "
            "(is the corpus all zero vectors?); no IVF cells to probe"
        )
    return ivf_topk(
        corpus,
        queries,
        dims=dims,
        k=k,
        n_centroids=len(centers),
        nprobe=nprobe,
        vec_col=vec_col,
        centroids=centers,
    )


def kmeans_pq_codebooks(
    corpus: DataFrame,
    dims: int,
    m: int = 4,
    n_codes: int = 8,
    seed: int = 42,
    max_iter: int = 10,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Lloyd-refined PQ codebooks — the quality upgrade for the PQ
    plane, exactly as kmeans_ivf_topk is for IVF: per subspace, fit
    MLlib KMeans over the UNIT vectors' slices (k-means minimizes the
    same squared-distance objective PQ's distortion is defined by, so
    refined codewords can only lower quantization error vs the
    seeded sample).  Returns the same [m][n_codes][sub] shape
    pq_codebooks does; plug into pq_topk / ivf_pq_topk via their
    ``codebooks`` parameter.  No oracle — the fit is iterative ML;
    the seeded-sample ann_pq_topk / ann_ivfpq_topk stay the
    hash-matched entries.  m independent fits, each one distributed
    pass per iteration over sub-wide slices."""
    from prod2vec_spark.operators.simsearch import _with_unit, l2_norm

    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m} subspaces")
    sub = dims // m
    unit = _with_unit(
        corpus.where(l2_norm(F.col(vec_col)) > 0), vec_col, "nvec"
    ).select("nvec")
    cbs = []
    for mi in range(m):
        sliced = unit.select(
            F.slice(F.col("nvec"), mi * sub + 1, sub).alias("_slice")
        )
        model, _ = kmeans_fit(
            sliced, vec_col="_slice", k=n_codes, seed=seed + mi,
            max_iter=max_iter,
        )
        cbs.append([list(map(float, c)) for c in model.clusterCenters()])
    return cbs


def cluster_profile(assigned: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-cluster summary (cluster, n_vecs, avg_norm): one hash-agg
    shuffle on the (tiny-cardinality) cluster key."""
    sq_norm = F.aggregate(
        vec_col, F.lit(0.0), lambda a, x: a + x.cast("double") * x
    )
    return (
        assigned.select("cluster", F.sqrt(sq_norm).alias("_nrm"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("_nrm"), 4).alias("avg_norm"),
        )
    )


def kmeans_semdedup(
    corpus,
    dims: int,
    n_clusters: int = 8,
    threshold: float = 0.4,
    seed: int = 42,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """SemDeDup with Lloyd-refined cells — the paper's actual shape
    (Abbas et al. 2023 cluster with k-means): fit MLlib KMeans, hand
    the centers to simsearch.semdedup's supplied-centroids path (same
    zero-norm guard as kmeans_ivf_topk).  Refined cells track the
    data, so near-duplicates co-cluster more reliably than with
    seeded-sample cells.  No oracle — the fit is iterative ML; the
    seeded-centroid `semdedup_audit` remains the hash-matched catalog
    entry, and the pytest asserts the refined variant drops at least
    every pair the seeded variant drops on planted duplicates."""
    from prod2vec_spark.operators.simsearch import semdedup

    model, _ = kmeans_fit(
        corpus, vec_col=vec_col, k=n_clusters, seed=seed, max_iter=max_iter
    )
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    centers = [c for c in centers if any(x != 0.0 for x in c)]
    if not centers:
        raise ValueError(
            "kmeans_semdedup: every fitted center is zero — degenerate corpus"
        )
    return semdedup(
        corpus,
        dims=dims,
        n_clusters=len(centers),
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        centroids=centers,
    )
