"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship prod2vec pipeline (baskets → vocab →
MLlib Word2Vec → cosine top-k neighbors, SURVEY.md §7.1) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the operator catalog from
``prod2vec_spark.queries`` for the sf0.01 DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: train product embeddings from baskets, return enriched
    top-5 neighbors for the 3 most frequent products."""
    from pyspark.sql import functions as F

    from prod2vec_spark.ml.prod2vec import (
        Prod2VecParams,
        embedding_table,
        enrich_embeddings,
        fit_prod2vec,
        top_k_similar,
    )
    from prod2vec_spark.operators.baskets import assemble_baskets, build_vocab
    from prod2vec_spark.sources.io import read_table

    li = read_table(spark, SF0001, "lineitem")
    part = read_table(spark, SF0001, "part")

    baskets = assemble_baskets(li, max_len=50)
    vocab = build_vocab(li, num_prods=201)
    model = fit_prod2vec(
        baskets, Prod2VecParams(vector_size=32, max_iter=1, num_partitions=4)
    )
    vectors = embedding_table(model)

    # F8: seeded sample of 3 probes from the top-20 products
    # (reference model_train.py:18-20 np.random.choice w/o replacement)
    from prod2vec_spark.operators.relational import seeded_sample

    probe_ids = [
        r["product_id"]
        for r in seeded_sample(
            vocab.filter(F.col("idx").between(1, 20)), 3, ["product_id"], seed=42
        ).collect()
    ]
    topk = top_k_similar(vectors, probe_ids, k=5)
    names = enrich_embeddings(
        topk.withColumnRenamed("neighbor_id", "product_id"), part
    )
    return names.select(
        "query_id",
        F.col("product_id").alias("neighbor_id"),
        "product_name",
        F.round("cosine_sim", 6).alias("cosine_sim"),
        "rank",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from prod2vec_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from prod2vec_spark.queries import ORACLES

    return dict(ORACLES)
