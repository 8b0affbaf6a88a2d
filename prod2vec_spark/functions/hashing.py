"""Deterministic hashing expression builders.

Engine policy (SURVEY.md §7.4): every "random" reference operation
(array shuffle, negative sampling, validation-set choice) becomes a
*seeded, hash-derived* pseudo-random expression so results are
reproducible across runs, partitionings, AND engines (the DuckDB oracle
evaluates the identical formula).  md5 is used as the portable hash —
both Spark and DuckDB produce identical hex digests — rather than
xxhash64/crc32, which are engine-specific.

All expressions are pure Column compositions: whole-stage-codegen
friendly, no Python UDFs (100 TB rules row-UDFs out, SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex digits = 60 bits — always fits a signed int64, no overflow in
# either engine (DuckDB raises on int64 overflow; Spark wraps).
_HEX_DIGITS = 15


def hex_prefix_long(col: Column, digits: int = _HEX_DIGITS) -> Column:
    """First ``digits`` hex chars of md5(col) as a non-negative long.

    DuckDB oracle equivalent:  ('0x' || substr(md5(x), 1, digits))::BIGINT
    """
    return F.conv(F.substring(F.md5(col), 1, digits), 16, 10).cast("long")


def hash_unit(col: Column) -> Column:
    """Deterministic uniform in [0, 1) derived from md5 — the portable
    replacement for ``rand(seed)`` wherever the oracle must reproduce the
    stream.  Uses 8 hex digits (32 bits) / 2^32."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )


def rolling_fingerprint(tokens: Column) -> Column:
    """Document fingerprint: polynomial rolling hash over the token array
    (ENGINE text-analysis surface; the reference has no fingerprinting).

    acc' = (acc * 131 + h(token)) mod 2147483647, with h(token) the
    31-bit md5 prefix — every intermediate < 2^39, overflow-free in both
    engines.  Pure ``aggregate`` higher-order function: no shuffle, no UDF.
    """
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, x: (
            acc * F.lit(131)
            + F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long") % F.lit(2147483647)
        )
        % F.lit(2147483647),
    )
