"""Mechanical SURVEY §2 coverage gate (VERDICT r5 ask #5): the
operator → evidence matrix in prod2vec_spark/coverage.py is asserted
against the live registries, so a future catalog consolidation that
orphans an operator (drops its last oracled entry, renames a test)
fails HERE instead of silently degrading a verdict table.

No Spark session needed — this is pure registry introspection.
"""

from __future__ import annotations

import importlib

from prod2vec_spark.coverage import COVERAGE
from prod2vec_spark.queries import ALL_ORACLES, ALL_QUERIES, CATALOG

_VALID_STATUS = {"implemented", "n/a", "documented"}


def test_statuses_are_valid():
    bad = {op: m["status"] for op, m in COVERAGE.items()
           if m["status"] not in _VALID_STATUS}
    assert not bad, bad


def test_na_operators_carry_a_reason():
    for op, m in COVERAGE.items():
        if m["status"] == "n/a":
            assert m.get("reason"), f"{op}: n/a without a reason"


def test_every_claimed_entry_exists_in_superset():
    stale = {
        op: [e for e in m.get("entries", []) if e not in ALL_QUERIES]
        for op, m in COVERAGE.items()
    }
    stale = {op: es for op, es in stale.items() if es}
    assert not stale, f"coverage claims entries not in ALL_QUERIES: {stale}"


def test_every_implemented_operator_keeps_oracled_or_tested_evidence():
    """The core invariant: implemented ⇒ ≥1 fully-oracled entry, or
    (for non-SQL-expressible surfaces) ≥1 named pytest."""
    orphans = []
    for op, m in COVERAGE.items():
        if m["status"] != "implemented":
            continue
        oracled = [e for e in m.get("entries", []) if e in ALL_ORACLES]
        if not oracled and not m.get("tests"):
            orphans.append(op)
    assert not orphans, f"operators with no oracled entry and no test: {orphans}"


def test_named_test_evidence_resolves():
    """Every (module, function) test reference must exist — a renamed
    or deleted test invalidates the matrix loudly."""
    missing = []
    for op, m in COVERAGE.items():
        for mod_name, fn_name in m.get("tests", []):
            try:
                mod = importlib.import_module(mod_name)
            except ImportError:
                missing.append((op, mod_name, fn_name, "module missing"))
                continue
            if not callable(getattr(mod, fn_name, None)):
                missing.append((op, mod_name, fn_name, "function missing"))
    assert not missing, missing


def test_every_driver_catalog_entry_is_claimed_by_an_operator():
    """Reverse direction: the 50-entry driver catalog exists to certify
    the §2 surface — an entry no operator claims is either padding or
    an un-tracked operator; both should fail loudly."""
    claimed = {e for m in COVERAGE.values() for e in m.get("entries", [])}
    unclaimed = sorted(set(CATALOG) - claimed)
    assert not unclaimed, f"catalog entries no operator claims: {unclaimed}"


def test_reference_parity_ids_all_present():
    """The §2 reference-parity id ranges must all appear (a deleted row
    would silently shrink the surface)."""
    expected = (
        [f"S{i}" for i in range(1, 10)]
        + [f"P{i}" for i in range(1, 9)]
        + [f"J{i}" for i in range(1, 6)]
        + [f"A{i}" for i in range(1, 8)]
        + ["W1", "W2"]
        + [f"O{i}" for i in range(1, 6)]
        + ["D1"]
        + [f"F{i}" for i in range(1, 13)]
        + [f"Q{i}" for i in range(1, 6)]
        + [f"M{i}" for i in range(1, 8)]
        + ["G1", "G2"]
    )
    missing = [op for op in expected if op not in COVERAGE]
    assert not missing, f"reference-parity operators missing from matrix: {missing}"


def test_readme_counts_match_registry():
    """The README's superset/oracle counts are machine-checked against
    the registry — the count-drift class of verdict nits ends here.
    (The test count is intentionally NOT asserted: pytest can't
    observe its own full collection cheaply; the two load-bearing
    registry numbers are.)"""
    import re

    from prod2vec_spark.queries import ALL_ORACLES, ALL_QUERIES

    with open("README.md") as f:
        readme = f.read()
    m = re.search(r"(\d+) queries in the superset\s+registry, (\d+) with DuckDB", readme)
    assert m, "README superset-count sentence not found"
    assert int(m.group(1)) == len(ALL_QUERIES), (
        f"README says {m.group(1)} superset queries, registry has {len(ALL_QUERIES)}"
    )
    assert int(m.group(2)) == len(ALL_ORACLES), (
        f"README says {m.group(2)} oracles, registry has {len(ALL_ORACLES)}"
    )
    m2 = re.search(r"the full (\d+)-query superset", readme)
    assert m2 and int(m2.group(1)) == len(ALL_QUERIES)
