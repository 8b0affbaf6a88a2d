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


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_nonempty(spark, name):
    """Queries without an oracle (non-SQL-expressible: ML training,
    LSH near-dup) get the driver's weaker rows-only check — mirror it
    plus schema stability."""
    from tests.conftest import SF_ORACLE

    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() > 0
    assert len(df.columns) > 0
