"""Engine-portable statistical aggregates (ENGINE scope).

Spearman rank correlation is implemented with EXACT integer rank
arithmetic (1 - 6·Σd²/(n(n²-1))): Pearson's co-moment sums drift
between engines under float addition order, but rank differences are
integers and hash-match bit-for-bit.  Ties break by the caller's id
column, so the variant is deterministic on any engine (classic
tie-corrected Spearman needs average ranks — float again; the id
tiebreak is the portable choice and converges to the same value as
ties thin out)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
    min_n: int = 2,
) -> DataFrame:
    """(group, n, sum_d2, spearman) per group.

    Scale note: per-group ranking is a sort WITHIN the group — run
    this on a bounded (sampled) frame, never a raw 100 TB corpus; a
    correlation estimate converges at thousands of rows, so the audit
    sample is fixed-size regardless of corpus scale.  sum_d2 <= n³:
    keep group sizes under ~10⁶ rows to stay inside int64."""
    w_x = Window.partitionBy(group_col).orderBy(
        F.col(x_col).asc(), F.col(id_col).asc()
    )
    w_y = Window.partitionBy(group_col).orderBy(
        F.col(y_col).asc(), F.col(id_col).asc()
    )
    d = F.col("_rx").cast("long") - F.col("_ry").cast("long")
    ranked = (
        df.withColumn("_rx", F.row_number().over(w_x))
        .withColumn("_ry", F.row_number().over(w_y))
        .withColumn("_d2", d * d)
    )
    g = ranked.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_d2").cast("long").alias("sum_d2"),
    )
    n = F.col("n").cast("double")
    return g.where(F.col("n") >= min_n).select(
        "group",
        "n",
        "sum_d2",
        F.round(
            F.lit(1.0)
            - F.lit(6.0) * F.col("sum_d2").cast("double") / (n * (n * n - F.lit(1.0))),
            4,
        ).alias("spearman"),
    )
