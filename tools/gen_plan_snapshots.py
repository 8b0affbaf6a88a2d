"""Regenerate tests/plan_snapshots.json — the per-entry physical-plan
shape baseline (VERDICT r5 stretch #8).

For every driver-catalog entry the snapshot records, at sf0.001 with
the standard test session confs:

  * ``exchanges`` — static-plan Exchange (shuffle) count, and
  * ``broadcast`` — whether the plan contains a BroadcastHashJoin.

tests/test_plan_snapshots.py recomputes both per entry and diffs
against this file, so ANY future plan regression (a silently added
shuffle, a dropped broadcast) fails structurally — not just via the
2x wall-clock bench gate.  Run this script ONLY to bless an
intentional plan change:

    python tools/gen_plan_snapshots.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "plan_snapshots.json")


def main() -> None:
    from prod2vec_spark.plans.inspect import count_exchanges, has_broadcast_join
    from prod2vec_spark.queries import QUERIES
    from prod2vec_spark.session import get_spark

    spark = get_spark("plan-snapshots", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    snap: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        df = fn(spark, SF)
        snap[name] = {
            "exchanges": count_exchanges(df),
            "broadcast": has_broadcast_join(df),
        }
        print(f"{name}: {snap[name]}", flush=True)
    with open(OUT, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(snap)} snapshots to {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
