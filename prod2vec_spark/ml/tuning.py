"""Hyperparameter tuning + tuning-results analysis (SURVEY.md §2.10
M5-M7).

Reference anchors:
  M6 Bayesian HPO over embedding_dim ∈ [100,1024], lr ∈ [1e-4,1e-3],
     5 jobs × 5 parallel, minimize training loss
     (/root/reference/dags/prod2vec_train_dag.py:156-188,
      config/prod2vec_config.yaml:49-55)
  M5 best-trial selection (post_process.py:60-68)
  M7 results table: iteration column, sort, CSV sink
     (tuning_analysis.py:14-74)

Engine: grid search (Bayesian strategy is out-of-Spark — documented
gap, SURVEY.md §7.3) over the same two hyperparameters.  MLlib
Word2Vec exposes no training loss, so the objective is a *real*
self-supervised eval computed distributed: mean cosine similarity of
observed co-occurring pairs minus mean similarity of random pairs
(higher = better embeddings; negated so 'minimize' matches the
reference's objective direction).  Trials parallelize via Spark's
scheduler within each fit; the outer loop is sequential like
CrossValidator with parallelism=1 (each fit already uses the whole
local cluster).

The reference's tuning_analysis.py:32 sorts WITHOUT assigning the
result (a no-op — SURVEY.md §2.6 O4); the engine defines iteration =
original trial order and does not replicate the bug.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prod2vec_spark.functions.vector import cosine_similarity
from prod2vec_spark.ml.prod2vec import Prod2VecParams, embedding_table, fit_prod2vec


@dataclass
class Trial:
    name: str
    embedding_dim: int
    learning_rate: float
    objective: float
    started_at: float


def pair_similarity_objective(
    vectors: DataFrame, pairs: DataFrame, sample_mod: int = 50, seed: int = 42
) -> float:
    """Negative mean cosine over a deterministic ~1/sample_mod hash
    sample of observed (target, context) pairs.  Lower is better
    (matches the reference's minimize-loss direction).

    The sample bound is a pure map-side filter
    (xxhash64 % sample_mod == 0) — no orderBy(hash).limit(n) global
    sort/limit funnel, so the objective scales with the pair table."""
    va = vectors.select(
        F.col("product_id").alias("target"),
        F.col("vector").alias("va"),
    )
    vb = vectors.select(
        F.col("product_id").alias("context"),
        F.col("vector").alias("vb"),
    )
    from pyspark.ml.functions import vector_to_array

    from prod2vec_spark.operators.relational import hash_sample_filter

    sample = (
        pairs.select("target", "context")
        .where(F.col("target") != F.col("context"))
        .where(hash_sample_filter(sample_mod, "target", "context", seed=seed))
    )
    joined = sample.join(F.broadcast(va), "target").join(F.broadcast(vb), "context")
    sim = cosine_similarity(vector_to_array(F.col("va")), vector_to_array(F.col("vb")))
    row = joined.agg(F.avg(sim).alias("m")).collect()[0]
    return -float(row["m"] if row["m"] is not None else 0.0)


def grid_tune(
    baskets: DataFrame,
    pairs: DataFrame,
    dims: list[int],
    lrs: list[float],
    base: Prod2VecParams | None = None,
) -> tuple[DataFrame, dict]:
    """M6 grid: fit each (dim, lr), score, return (results_df, best).

    results_df mirrors the SageMaker tuning table consumed by the
    reference (tuning_analysis.py:30-43): TrainingJobName,
    FinalObjectiveValue, TrainingStartTime, embedding_dim,
    learning_rate, iteration."""
    spark: SparkSession = baskets.sparkSession
    b = base or Prod2VecParams()
    trials: list[Trial] = []
    models = {}
    for i, (dim, lr) in enumerate([(d, l) for d in dims for l in lrs]):
        started = time.time()
        params = Prod2VecParams(
            vector_size=dim,
            window_size=b.window_size,
            max_iter=b.max_iter,
            step_size=lr,
            min_count=b.min_count,
            max_sentence_length=b.max_sentence_length,
            num_partitions=b.num_partitions,
            seed=b.seed,
        )
        model = fit_prod2vec(baskets, params)
        obj = pair_similarity_objective(embedding_table(model), pairs)
        name = f"trial-{i:03d}-dim{dim}-lr{lr}"
        trials.append(Trial(name, dim, lr, obj, started))
        models[name] = model

    results = spark.createDataFrame(
        [
            (
                t.name,
                t.objective,
                t.started_at,
                t.embedding_dim,
                t.learning_rate,
                i,  # iteration = original trial order (O4 bug not replicated)
            )
            for i, t in enumerate(trials)
        ],
        schema=(
            "TrainingJobName string, FinalObjectiveValue double, "
            "TrainingStartTime double, embedding_dim int, "
            "learning_rate double, iteration int"
        ),
    )
    best_name = best_trial(results)
    return results, {"name": best_name, "model": models[best_name]}


def random_search_tune(
    baskets: DataFrame,
    pairs: DataFrame,
    n_trials: int = 5,
    dim_range: tuple[int, int] = (8, 64),
    lr_range: tuple[float, float] = (1e-3, 1e-1),
    base: Prod2VecParams | None = None,
    seed: int = 42,
) -> tuple[DataFrame, dict]:
    """M6 seeded random search — closer to the reference's SageMaker
    tuner (random/Bayesian exploration over embedding_dim ∈ [100,1024]
    and lr ∈ [1e-4,1e-3], dags/prod2vec_train_dag.py:156-188) than the
    plain grid: dims draw uniformly, lrs log-uniformly, both from
    md5-derived uniforms so every run (and any other engine) replays
    the identical trial set.  The Bayesian surrogate itself remains a
    documented out-of-Spark gap (SURVEY.md §7.3); seeded random search
    is its standard strong baseline."""
    import hashlib
    import math

    def u(i: int, what: str) -> float:
        h = hashlib.md5(f"tune|{seed}|{i}|{what}".encode()).hexdigest()[:8]
        return int(h, 16) / 4294967296.0

    lo_d, hi_d = dim_range
    lo_l, hi_l = lr_range
    grid = [
        (
            lo_d + int(u(i, "dim") * (hi_d - lo_d + 1)),
            math.exp(
                math.log(lo_l) + u(i, "lr") * (math.log(hi_l) - math.log(lo_l))
            ),
        )
        for i in range(n_trials)
    ]
    spark: SparkSession = baskets.sparkSession
    b = base or Prod2VecParams()
    trials: list[Trial] = []
    models = {}
    for i, (dim, lr) in enumerate(grid):
        started = time.time()
        params = Prod2VecParams(
            vector_size=dim,
            window_size=b.window_size,
            max_iter=b.max_iter,
            step_size=lr,
            min_count=b.min_count,
            max_sentence_length=b.max_sentence_length,
            num_partitions=b.num_partitions,
            seed=b.seed,
        )
        model = fit_prod2vec(baskets, params)
        obj = pair_similarity_objective(embedding_table(model), pairs)
        name = f"rand-{i:03d}-dim{dim}-lr{round(lr, 6)}"
        trials.append(Trial(name, dim, lr, obj, started))
        models[name] = model
    results = spark.createDataFrame(
        [
            (t.name, t.objective, t.started_at, t.embedding_dim, t.learning_rate, i)
            for i, t in enumerate(trials)
        ],
        schema=(
            "TrainingJobName string, FinalObjectiveValue double, "
            "TrainingStartTime double, embedding_dim int, "
            "learning_rate double, iteration int"
        ),
    )
    best_name = best_trial(results)
    return results, {"name": best_name, "model": models[best_name]}


def best_trial(results: DataFrame) -> str:
    """M5/O3: minimal objective, deterministic tie-break by name
    (post_process.py:64-65: sort + take first)."""
    row = (
        results.orderBy(F.asc("FinalObjectiveValue"), F.asc("TrainingJobName"))
        .limit(1)
        .collect()[0]
    )
    return row["TrainingJobName"]


def tuning_report(results: DataFrame) -> DataFrame:
    """M7: analysis table sorted by objective with derived rank —
    the engine form of tuning_analysis.py:30-43."""
    from pyspark.sql import Window

    w = Window.orderBy(F.asc("FinalObjectiveValue"), F.asc("TrainingJobName"))
    return results.withColumn("objective_rank", F.row_number().over(w)).orderBy(
        "objective_rank"
    )
