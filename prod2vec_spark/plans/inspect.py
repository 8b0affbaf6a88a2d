"""Physical-plan inspection helpers.

The 100 TB design rules (filters reach the parquet reader, small dims
broadcast, shuffles are counted and intentional) are asserted in tests
via these helpers rather than trusted — tests/test_plans.py locks the
physical shape of every flagship operator so a regression that silently
adds a shuffle or drops pushdown fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning evidence)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        for field in m.group(1).split(","):
            if ":" in field:
                cols.append(field.split(":")[0].strip())
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the plan — the scale
    currency.  AQE reuse/coalesce may merge at runtime; this counts the
    static plan's shuffle boundaries.  Formatted explain prints each
    node twice (tree + details), so count distinct node ids."""
    ids = set(re.findall(r"\((\d+)\) Exchange", explain_str(df)))
    return len(ids)


def count_operator_exchanges(df: DataFrame) -> int:
    """Exchanges EXCLUDING round-robin repartitions — the operator's
    own shuffle count.  The round-16 input-parallelism floor
    (sources/io.spread_scan) adds one RoundRobinPartitioning exchange
    when a local single-row-group scan would otherwise serialize
    per-row compute on one core; that exchange is an exact no-op at
    scale (the floor only fires when scan partitions < cores), so
    plan-shape tests locking an operator's 'shuffle-free / N-shuffle'
    claim count past it."""
    plan = explain_str(df)
    ids = set(re.findall(r"\((\d+)\) Exchange", plan))
    rr = set()
    for i in ids:
        m = re.search(
            rf"\({i}\) Exchange\n(?:.*\n){{0,3}}?"
            r"Arguments: RoundRobinPartitioning",
            plan,
        )
        if m:
            rr.add(i)
    return len(ids - rr)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)
