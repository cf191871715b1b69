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


def test_q2_q11_prep_parity(spark, con):
    """sql_q2_min_cost_supplier / sql_q11_important_stock (prepped r18,
    un-registered — the synthetic-partsupp pair): identical text must
    match DuckDB exactly, like every registered query, BEFORE their
    queued registration.  Registration recipe in each docstring."""
    from big_data_project_spark.operators.sql_tpch import (
        Q2_TEXT,
        Q11_TEXT,
        sql_q2_min_cost_supplier,
        sql_q11_important_stock,
    )

    for name, fn, text in (
        ("sql_q2_min_cost_supplier", sql_q2_min_cost_supplier, Q2_TEXT),
        ("sql_q11_important_stock", sql_q11_important_stock, Q11_TEXT),
    ):
        res = compare(name, fn(spark, SF_DIR), con, text)
        assert res.ok, f"{name}: {res.detail}"
        assert res.spark_rows > 0, name
