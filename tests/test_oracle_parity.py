"""Differential oracle tests: every registered query with oracle SQL must
match DuckDB on sf0.001 (fast) — the driver runs the same check at sf0.01.

Run the heavier tier locally with:
    SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_parity.py
"""

from __future__ import annotations

import pytest

from big_data_project_spark import registry
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duckdb_connect

registry.load()
ORACLES = registry.all_oracles()
QUERIES = registry.all_queries()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, con):
    res = compare(name, QUERIES[name](spark, SF_DIR), con, ORACLES[name])
    assert res.ok, f"{name}: {res.detail}"


def test_all_queries_run(spark):
    # rows-only queries (no oracle) must at least run and return a schema
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, f"{name} returned no columns"
        df.limit(5).collect()
