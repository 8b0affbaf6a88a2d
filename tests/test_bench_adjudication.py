"""Round-14: the bench adjudication verdict as a pure function —
bench.adjudicate implements the canary-normalized protocol
(BASELINE.md round 14); these tests pin its decision table so a
protocol regression fails structurally, not via a mislabeled
artifact a round later."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import adjudicate  # noqa: E402


def test_sub_floor_delta_is_noise_even_at_high_ratio():
    # 0.3 s over a 0.2 s baseline is 2.5x raw but under the 0.5 s
    # absolute floor — measurement resolution, never a regression
    verdict, _ = adjudicate(0.5, 0.2, 1.0)
    assert verdict == "noise"


def test_sub_1_2x_raw_ratio_is_noise():
    verdict, _ = adjudicate(2.3, 2.0, 1.0)
    assert verdict == "noise"


def test_ambient_drift_adjudicates_noise_ambient():
    # 1.45x raw with the canary itself at 1.4x: the query moved WITH
    # the VM (the r13 canonical_pick blemish this protocol closes)
    verdict, norm = adjudicate(2.9, 2.0, 1.4)
    assert verdict == "noise_ambient"
    assert norm == pytest.approx(1.45 / 1.4)


def test_real_regression_survives_the_canary():
    # 2.0x raw with the canary at 1.1x: normalized 1.82x — real
    verdict, norm = adjudicate(4.0, 2.0, 1.1)
    assert verdict == "regression"
    assert norm == pytest.approx(2.0 / 1.1)


def test_boundary_exactly_1_2x_normalized_is_ambient():
    verdict, _ = adjudicate(2.4 * 1.5, 2.0, 1.5)  # normalized exactly 1.2
    assert verdict == "noise_ambient"


def test_fast_vm_cannot_hide_a_regression():
    # callers clamp canary_factor at 1.0; at the clamp, a genuine 2x
    # stays a regression even if the raw canary read 0.5x
    verdict, _ = adjudicate(4.0, 2.0, 1.0)
    assert verdict == "regression"


def _baseline():
    import json

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE.json",
    )
    with open(path) as f:
        return json.load(f)


def test_every_catalog_entry_has_a_baseline_row():
    """VERDICT r15 'what's wrong' #1: dsir_select entered the catalog
    without a BASELINE.json row and silently escaped the 2x regression
    tripwire for five rounds.  Structural guard: every driver-catalog
    entry (plus the always-timed bench macros) must carry a recorded
    baseline, so a rotation can never ship outside the gate again."""
    from bench import CURATION10X, CURATION_ALL, CURATION_FULL, FLAGSHIP, STREAMING
    from prod2vec_spark.queries import CATALOG

    timed = set(CATALOG) | {
        FLAGSHIP, CURATION10X, CURATION_FULL, CURATION_ALL, STREAMING
    }
    baseline = set(_baseline().get("queries", {}))
    missing = sorted(timed - baseline)
    assert not missing, (
        f"timed bench entries with no BASELINE.json row (outside the "
        f"2x tripwire): {missing}"
    )


def test_every_baseline_row_has_a_protocol():
    """VERDICT r15 ask #9: adjudication code refuses cross-protocol
    comparisons via BASELINE.json's per-entry 'protocols' map — which
    only works if the map stays total over the recorded queries."""
    b = _baseline()
    queries = set(b.get("queries", {}))
    protocols = b.get("protocols", {})
    allowed = {"r3-raw", "isolated-raw", "canary-verified"}
    missing = sorted(queries - set(protocols))
    assert not missing, f"baseline rows with no protocol entry: {missing}"
    bad = {k: v for k, v in protocols.items() if v not in allowed}
    assert not bad, f"unknown protocol labels: {bad}"
