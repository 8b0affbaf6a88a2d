"""Vector math over ``array<float>`` columns — pure higher-order-function
expressions (JVM-side, codegen), no UDFs.

Reference anchor: sklearn ``cosine_similarity`` at
/root/reference/pipeline/model_train/model_train.py:29-31 (F7 in
SURVEY.md §2.8).  Engine form: dot product via ``zip_with`` +
``aggregate``; accumulation in double regardless of input element type
so Spark and the DuckDB oracle (``list_cosine_similarity``) agree to
floating-point precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a||b|); NULL when either norm is zero (matches
    DuckDB's list_cosine_similarity NaN-avoidance via nullif)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def normalized(a: Column, norm: Column) -> Column:
    """Unit-scale ``a`` by a PRE-MATERIALIZED norm column.

    The norm must be computed once per row into its own column
    (``withColumn("nrm", l2_norm(v))``) before calling this —
    interpreted higher-order functions have no common-subexpression
    elimination, so inlining ``l2_norm(a)`` here would re-fold the
    whole array per element.  Pre-normalizing turns every pairwise
    cosine in a join into ONE dot product instead of dot + two norms:
    O(rows·d) preparation amortized across O(pairs·d) work — the only
    layout that survives a 100 TB corpus."""
    return F.transform(a, lambda x: x.cast("double") / norm)
