"""Local replica of the driver's t2 correctness gate: every query in
the catalog must match its DuckDB oracle at sf0.01 (row count, columns,
order-insensitive values)."""

from __future__ import annotations

import pytest

from prod2vec_spark.queries import ORACLES, QUERIES
from tests.conftest import assert_oracle_match


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    assert_oracle_match(spark, duck, QUERIES[name], ORACLES[name])


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)
