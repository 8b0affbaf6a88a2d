"""Per-entry physical-plan shape gate (VERDICT r5 stretch #8): every
driver-catalog query's static-plan Exchange count and broadcast-join
presence is snapshotted in tests/plan_snapshots.json; this test
recomputes both and diffs, so a plan regression — a silently added
shuffle, a dropped broadcast — fails structurally, not just via the
2x wall-clock bench gate.

To bless an INTENTIONAL plan change: python tools/gen_plan_snapshots.py
(review the diff — an exchange-count increase needs a reason).

The snapshot is taken at sf0.001 with the standard test confs; plan
shape at fixed confs is deterministic (AQE alters runtime execution,
not the static plan these helpers read).
"""

from __future__ import annotations

import json
import os

import pytest

from prod2vec_spark.plans.inspect import count_exchanges, has_broadcast_join
from prod2vec_spark.queries import CATALOG, QUERIES
from tests.conftest import SF_SMOKE

_SNAP_PATH = os.path.join(os.path.dirname(__file__), "plan_snapshots.json")

with open(_SNAP_PATH) as _f:
    _SNAPSHOTS = json.load(_f)


def test_snapshot_covers_exact_catalog():
    """The snapshot file must track the driver catalog one-to-one —
    an added entry needs a blessed snapshot, a removed one must drop
    its stale row."""
    assert sorted(_SNAPSHOTS) == sorted(CATALOG)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_plan_shape_matches_snapshot(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    got = {
        "exchanges": count_exchanges(df),
        "broadcast": has_broadcast_join(df),
    }
    want = _SNAPSHOTS[name]
    assert got == want, (
        f"{name}: plan shape drifted {want} -> {got}; if intentional, "
        f"regenerate with tools/gen_plan_snapshots.py"
    )
