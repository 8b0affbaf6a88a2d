"""Temperature-scaled source mixing — COMPUTE the training-data
recipe from corpus statistics (the companion to queries_r6's
``corpus_mix_sample``, which APPLIES a hand-specified recipe).

ENGINE scope: the standard multilingual/multi-source rebalancing rule
(exponentiated sampling, as published for mBERT/XLM-R-style training
mixes): a source with token mass n_i is sampled with probability

    p_i  ∝  n_i ** alpha,       0 < alpha <= 1

alpha = 1 reproduces the natural distribution; alpha → 0 flattens it —
low-resource sources are upsampled, dominant ones downsampled.  The
whole computation is two bounded aggregations (per-source, then a
1-row corpus total broadcast back), so it costs one scan + one tiny
shuffle regardless of corpus size; the per-source table it returns is
bounded by the number of sources, never by rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.operators import text as TX

DEFAULT_ALPHA = 0.7


def temperature_mix(
    docs: DataFrame,
    alpha: float = DEFAULT_ALPHA,
    budget_tokens: int = 1_000_000,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source mixing recipe: (source, n_docs, n_tokens, p_raw,
    p_temp, target_tokens, boost).

    * ``p_raw``  — natural token share n_i / N
    * ``p_temp`` — temperature share n_i^alpha / sum_j n_j^alpha
    * ``target_tokens`` — floor(budget * p_temp)
    * ``boost`` — p_temp / p_raw (the up/downsampling factor the
      recipe implies; > 1 means the source is repeated at training
      time)

    Plan: per-source hash aggregate (partial map-side combine), then a
    1-row total crossJoin-broadcast — the repo's standard scalar
    pattern.  All ratios rounded for portable float parity.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    per_src = (
        docs.select(
            F.col(source_col).alias("source"),
            F.size(TX.tokens(F.col(text_col))).cast("long").alias("_nt"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
        )
    )
    totals = per_src.agg(
        F.sum("n_tokens").cast("double").alias("_tot"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))).alias(
            "_tot_pow"
        ),
    )
    p_raw = F.col("n_tokens").cast("double") / F.col("_tot")
    p_temp = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha))) / F.col(
        "_tot_pow"
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(p_raw, 6).alias("p_raw"),
            F.round(p_temp, 6).alias("p_temp"),
            F.floor(F.lit(float(budget_tokens)) * p_temp).cast("long").alias(
                "target_tokens"
            ),
            F.round(p_temp / p_raw, 4).alias("boost"),
        )
    )
