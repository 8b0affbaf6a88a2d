"""Dump `.explain("formatted")` for named catalog queries to
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
files (OPTIMIZATION_r16.md deliverable: judge checks plan claims
against these).

Usage:
    python tools/dump_plans.py <tag> <suffix> [query ...]

With no query names, dumps every catalog entry.  sf dir from
$SPARK_GRAFT_SF_DIR (default sf0.1 — the bench scale, so plan shapes
match what the bench measures; AQE initial plans).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from prod2vec_spark.queries import QUERIES
    from prod2vec_spark.session import get_spark

    spark = get_spark("dump-plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names or list(QUERIES):
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
