"""Prod2Vec: distributed product-embedding training (SURVEY.md §2.10).

Reference anchors:
  M1 two-tower Keras SGNS model     /root/reference/pipeline/model_train/model_train.py:97-124
  M2 tf.data input pipeline         model_train.py:89-95
  M3 similarity validation          model_train.py:14-49
  M4 embedding extraction + enrich  /root/reference/pipeline/post_processing/post_process.py:92-103
  M6 hyperparameter tuning          /root/reference/dags/prod2vec_train_dag.py:156-188

Engine: MLlib ``Word2Vec`` fit directly on basket arrays — it performs
its own skip-gram windowing + negative-path optimization distributed
across executors, subsuming the reference's explicit pair-gen + Keras
loop + SageMaker dispatch (G2).  The explicit pair-gen operators
(operators/skipgram.py) remain as queryable dataflow for parity and
oracle checks; training itself uses the estimator.

Loss values will NOT match the Keras model numerically (different
sampling schedule) — parity target is capability: embeddings exist,
neighbors are sensible, invariants hold (SURVEY.md §7.4 risk 2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.feature import Word2Vec, Word2VecModel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prod2vec_spark.functions.vector import cosine_similarity


@dataclass
class Prod2VecParams:
    """Mirrors config/prod2vec_config.yaml:25-48 of the reference."""

    vector_size: int = 64  # reference embedding_dim=1024; 64 for tests
    window_size: int = 4  # yaml:26
    max_iter: int = 3  # reference epochs=15
    step_size: float = 0.025  # reference lr=0.001 (RMSprop; MLlib SGD)
    min_count: int = 1
    max_sentence_length: int = 50  # basket cap, yaml:28
    num_partitions: int = 4
    seed: int = 42


def fit_prod2vec(baskets: DataFrame, params: Prod2VecParams | None = None) -> Word2VecModel:
    """M1+M2: train on (order_id, basket array<long>).  Items are cast
    to string (Word2Vec consumes tokens); numPartitions bounds the
    gradient-averaging parallelism at cluster scale."""
    p = params or Prod2VecParams()
    sentences = baskets.select(
        F.transform(F.col("basket"), lambda x: x.cast("string")).alias("sentence")
    )
    w2v = (
        Word2Vec()
        .setInputCol("sentence")
        .setOutputCol("vec")
        .setVectorSize(p.vector_size)
        .setWindowSize(p.window_size)
        .setMaxIter(p.max_iter)
        .setStepSize(p.step_size)
        .setMinCount(p.min_count)
        .setMaxSentenceLength(p.max_sentence_length)
        .setNumPartitions(p.num_partitions)
        .setSeed(p.seed)
    )
    return w2v.fit(sentences)


def save_model(model: Word2VecModel, path: str) -> None:
    """S7 model sink (reference model_train.py:131
    ``prod2vec.save('/opt/ml/model/prod2vec_model')``): persist the
    trained model as an MLlib artifact directory — parquet vectors +
    JSON metadata, readable by any Spark cluster.  Overwrites like the
    reference's fixed artifact path."""
    model.write().overwrite().save(path)


def load_model(spark, path: str) -> Word2VecModel:
    """S6 model source (reference post_process.py:85-89: untar
    model.tar.gz + keras load_model): reload a saved model so
    post-processing / serving can run without retraining.  ``spark``
    anchors the active session (MLlib reads through it)."""
    _ = spark  # the session must exist; MLlib resolves it implicitly
    return Word2VecModel.load(path)


def embedding_table(model: Word2VecModel) -> DataFrame:
    """M4: (product_id, vector array<float>) from the trained model —
    the engine's form of post_process.py:92-99."""
    return model.getVectors().select(
        F.col("word").cast("long").alias("product_id"),
        F.col("vector"),
    )


def enrich_embeddings(vectors: DataFrame, catalog: DataFrame,
                      id_col: str = "p_partkey", name_col: str = "p_name") -> DataFrame:
    """M4/J3: chained broadcast joins id -> name (post_process.py:96-99)."""
    dim = F.broadcast(catalog.select(F.col(id_col).alias("product_id"),
                                     F.col(name_col).alias("product_name")))
    return vectors.join(dim, "product_id", "left")


def top_k_similar(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 20,
) -> DataFrame:
    """M3 (J5+F7+W2): exact cosine top-k neighbors for each query id.

    The query side is tiny (≤ hundreds) → broadcast; the big side
    streams once.  Self-pairs excluded (model_train.py:38).  At vocab
    ≳100k this switches to LSH (operators/simsearch.py)."""
    queries = vectors.filter(F.col("product_id").isin(query_ids)).select(
        F.col("product_id").alias("query_id"),
        F.col("vector").alias("query_vec"),
    )
    sim = cosine_similarity(_vec_to_array("query_vec"), _vec_to_array("vector"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("product_id"))
    return (
        vectors.crossJoin(F.broadcast(queries))
        .filter(F.col("product_id") != F.col("query_id"))
        .withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("product_id").alias("neighbor_id"), "cosine_sim", "rank")
    )


def _vec_to_array(col: str):
    """MLlib VectorUDT -> array<double> for expression math."""
    from pyspark.ml.functions import vector_to_array

    return vector_to_array(F.col(col))


def neighbor_name_report(neighbors: DataFrame) -> DataFrame:
    """F9 (model_train.py:48 ``Series.str.cat(sep='; ')``): one row per
    query product with its neighbor names '; '-joined in rank order.
    collect_list order is partition-nondeterministic, so (rank, name)
    structs sort in-array before joining — same single shuffle."""
    names = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("rank"), F.col("product_name").alias("nm"))
                )
            ),
            lambda s: s["nm"],
        ),
        "; ",
    )
    return neighbors.groupBy("query_id").agg(names.alias("neighbor_names"))


def find_synonyms(model: Word2VecModel, product_id: int, k: int = 20) -> DataFrame:
    """M3 convenience: MLlib-native neighbor search."""
    return model.findSynonyms(str(product_id), k).select(
        F.col("word").cast("long").alias("neighbor_id"),
        F.col("similarity").alias("cosine_sim"),
    )
