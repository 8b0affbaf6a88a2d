"""Smoke: the driver-contract entry() runs end-to-end on sf0.001."""

from __future__ import annotations


def test_entry_runs(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"query_id", "neighbor_id", "cosine_sim", "rank"} <= cols
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]  # model_train.py:38 invariant
        assert 1 <= r["rank"] <= 5
