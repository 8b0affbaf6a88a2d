"""Range join + skew-safe join (ENGINE scope — operators Spark's
DataFrame API has no scale-safe built-in for).

Range join: Spark plans ``x BETWEEN lo AND hi`` as a
BroadcastNestedLoopJoin — every (point, interval) pair is tested,
which is fine for a literal handful of bands but quadratic the moment
the interval table grows.  ``bin_range_join`` turns it into an
equi-join: intervals explode to the fixed-width bins they cover,
points compute their bin, the join is hash-partitioned on the bin id,
and an exact residual predicate trims bin-boundary false positives.
Choose ``bin_width`` near the median interval width: fan-out per
interval is ~width/bin_width + 1, candidates per point are the
intervals sharing its bin.

Skew-safe join: one monster key (the classic null-ish / default-value
key) funnels an entire join partition through one reducer.
``salted_join`` spreads it: the fact side derives a deterministic salt
in [0, n) from its full row hash, the dim side replicates each row n
times, and the join key becomes (key, salt).  AQE's skew-join split
solves the common cases at runtime; explicit salting remains for
joins AQE can't split and for deterministic plan shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to the interval rows with
    lo <= point < hi, as a binned equi-join (see module docstring).

    ``how`` is restricted to inner/left: the exact range residual is
    part of the JOIN CONDITION (not a post-join filter), so a left
    join keeps unmatched point rows null-extended instead of silently
    dropping them (a post-join ``point >= lo`` evaluates to NULL on
    null-extended rows — the round-2 left-degenerates-to-inner bug).
    right/full would emit each unmatched interval row once per
    exploded bin, which has no sane semantics — rejected."""
    if how not in ("inner", "left"):
        raise ValueError(f"bin_range_join supports how='inner'|'left', got {how!r}")
    w = F.lit(float(bin_width))
    pts = points.withColumn(
        "_pbin", F.floor(F.col(point_col) / w).cast("long")
    )
    ivl = intervals.withColumn(
        "_ibin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    cond = (
        (pts["_pbin"] == ivl["_ibin"])
        & (pts[point_col] >= ivl[lo_col])
        & (pts[point_col] < ivl[hi_col])
    )
    return pts.join(ivl, cond, how).drop("_pbin", "_ibin")


def overlap_range_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
) -> DataFrame:
    """Interval-OVERLAP join (both sides are interval tables): pairs
    where ``[left_lo, left_hi)`` and ``[right_lo, right_hi)``
    intersect — the session-vs-outage / ad-exposure-vs-visit shape the
    point-in-interval join can't express.

    Same binning trick as ``bin_range_join``, applied to BOTH sides:
    each interval explodes to the fixed-width bins it covers, the join
    hash-partitions on the bin id, the exact overlap predicate
    (lo_a < hi_b AND lo_b < hi_a) trims boundary false positives, and
    a bin-ownership clause (the overlap's start bin) keeps each
    genuinely-overlapping pair from being emitted once per shared bin
    — dedup by construction, no post-join distinct over the pair
    blow-up.  Fan-out per row is ~width/bin_width + 1; Spark's native
    plan for the same predicate is a nested-loop join."""
    w = F.lit(float(bin_width))
    lb = left.withColumn(
        "_lbin",
        F.explode(
            F.sequence(
                F.floor(F.col(left_lo) / w).cast("long"),
                F.floor(F.col(left_hi) / w).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "_rbin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / w).cast("long"),
                F.floor(F.col(right_hi) / w).cast("long"),
            )
        ),
    )
    overlap_start_bin = F.floor(
        F.greatest(lb[left_lo], rb[right_lo]) / w
    ).cast("long")
    cond = (
        (lb["_lbin"] == rb["_rbin"])
        & (lb[left_lo] < rb[right_hi])
        & (rb[right_lo] < lb[left_hi])
        # ownership: only the bin containing the overlap's start emits
        & (lb["_lbin"] == overlap_start_bin)
    )
    return lb.join(rb, cond, "inner").drop("_lbin", "_rbin")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact's hot keys spread across ``n_salts``
    reducers.  Emits exactly the rows of ``fact.join(dim, on, how)``
    (inner/left): the salt is an internal partitioning detail.
    right/full are rejected — the dim side is replicated per salt, so
    an outer-preserved dim row would surface n_salts times."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how='inner'|'left', got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns], F.lit(7)), F.lit(n_salts)
    )
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return f.join(d, [on, "_salt"], how).drop("_salt")
