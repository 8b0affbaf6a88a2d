"""Multi-dimensional data layout (Z-order clustering) — the data-
skipping lever for 100 TB tables queried on MORE THAN ONE column
(ENGINE scope; the reference has no storage layout surface).

A single-column sort gives perfect parquet min/max pruning on that
column and none on any other.  Interleaving the bits of several
rank-scaled columns (Morton / Z-order, the Delta OPTIMIZE ZORDER
technique) gives every interleaved column moderately tight per-file
ranges, so predicates on ANY of them skip most files.

Everything is a Column expression (shift/AND/OR arithmetic — inside
whole-stage codegen, no UDF):

1. per-column (min, max) — ONE 1-row aggregate, broadcast back;
2. scale each value to a ``bits``-wide integer grid row-locally;
3. interleave bits into the Morton key;
4. range-repartition + sort by the key, write parquet.

The write pays exactly one range-exchange — the same cost as any
sorted write; the pruning benefit at read time is multiplicative in
file count.  tests/test_sources.py verifies the CLAIM with parquet
footer metadata: after a Z-order write, every interleaved column's
average per-file (max - min) range is a small fraction of its global
range, while a single-column sort leaves the other column's ranges at
~100%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Value scaled to [0, 2^bits) on the (broadcast) min/max grid;
    constant columns map to 0."""
    span = (mx - mn).cast("double")
    unit = F.when(
        span > 0, (col.cast("double") - mn.cast("double")) / span
    ).otherwise(F.lit(0.0))
    top = float(2**bits - 1)
    return F.least(
        F.lit(2**bits - 1),
        F.greatest(F.lit(0), F.round(unit * F.lit(top)).cast("long")),
    )


def morton_key(scaled: list[Column], bits: int) -> Column:
    """Bit-interleave ``scaled`` integer columns (each < 2^bits) into
    one Morton key: bit b of column i lands at position b*ncols + i.
    Pure shift/AND/OR arithmetic — whole-stage-codegen friendly.
    ncols * bits must fit a signed long (<= 62)."""
    n = len(scaled)
    if n * bits > 62:
        raise ValueError(f"morton_key: {n} cols x {bits} bits overflows long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order key of
    ``cols``: one broadcast min/max aggregate, row-local key, one
    range exchange, per-file sort.  Null values sort to grid 0."""
    stats = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(c).alias(f"_mn_{c}"),
                F.max(c).alias(f"_mx_{c}"),
            )
        ]
    )
    with_key = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scaled(
            F.coalesce(F.col(c), F.col(f"_mn_{c}")),
            F.col(f"_mn_{c}"),
            F.col(f"_mx_{c}"),
            bits,
        )
        for c in cols
    ]
    keyed = with_key.withColumn("_zkey", morton_key(scaled, bits)).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
