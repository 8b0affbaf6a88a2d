"""As-of (point-in-time) join — an operator Spark's DataFrame API
lacks as a built-in (ENGINE scope; the capability class of
"latest state at event time" lookups every training-data pipeline
needs, e.g. joining each example to the newest feature snapshot at
its timestamp).

Spark-first formulation: NOT a theta join (left.ts >= right.ts is a
cross-product-shaped non-equi join that Catalyst can only nest-loop)
and NOT a per-row subquery.  Instead the classic union trick:

  1. tag both inputs and union them on the shared partition key,
  2. one window pass per key ordered by (ts, tag) carrying
     ``last(right_fields, ignoreNulls)`` forward,
  3. keep the left rows — each now annotated with the most recent
     right row at-or-before its timestamp.

Cost: ONE shuffle of left+right on the key (the union sorts within
partitions) — the same price as a plain equi-join, and AQE splits
skewed keys.  DuckDB validates via its native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the most recent
    right row with right_ts <= left_ts (direction='backward'; the only
    direction the union trick needs — 'forward' is backward over
    negated timestamps).  Right rows tie-break BEFORE left rows at the
    exact same timestamp (the standard as-of convention: a snapshot
    taken at t is visible to an event at t)."""
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = tagged_left.unionByName(tagged_right)
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_tag") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_f_{c}").alias(c) for c in value_cols],
    )
