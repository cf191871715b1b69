"""Unit tests for the oracle harness's comparison semantics — the local
mirror of the driver's value hash.  These pin the failure classes the
rounds have actually hit: signed zero (r07/x59), int-vs-float kind drift
(floor/ceil), NaN, and nested arrays — so a harness refactor can't
silently reopen one."""

from __future__ import annotations

import math

import pandas as pd

from tests.oracle_harness import _canon, _is_na, _values_equal


def test_signed_zero_distinct():
    # the r06 x59 red row: -0.0 == 0.0 numerically but hash-distinct
    assert not _values_equal(0.0, -0.0)
    assert not _values_equal(-0.0, 0.0)
    assert _values_equal(-0.0, -0.0)
    assert _values_equal(0.0, 0.0)


def test_nan_and_null_semantics():
    assert _values_equal(float("nan"), float("nan"))
    assert _values_equal(None, None)
    assert not _values_equal(None, 0.0)
    assert _is_na(None) and not _is_na(0.0) and not _is_na((1, 2))


def test_exact_float_equality_no_epsilon():
    # the driver hash is exact: one ulp of drift must fail locally too
    assert _values_equal(0.1234, 0.1234)
    assert not _values_equal(0.1234, 0.1234 + 1e-16 * 8)
    # cross-type numeric equality is fine at VALUE level (the column-level
    # dtype check owns kind drift)
    assert _values_equal(3, 3.0)


def test_nested_tuple_values():
    assert _values_equal((1.0, 2.0), (1.0, 2.0))
    assert not _values_equal((1.0, -0.0), (1.0, 0.0))
    assert not _values_equal((1.0,), (1.0, 2.0))


def test_canon_sorts_columns_and_rows():
    a = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    c = _canon(a)
    assert list(c.columns) == ["a", "b"]
    assert c["a"].tolist() == ["x", "y"] and c["b"].tolist() == [1, 2]


def test_canon_tuples_lists_for_sorting():
    a = pd.DataFrame({"v": [[3, 4], [1, 2]]})
    c = _canon(a)
    assert c["v"].tolist() == [(1, 2), (3, 4)]


def test_math_copysign_guard():
    # the implementation detail the signed-zero check relies on
    assert math.copysign(1.0, -0.0) == -1.0


def test_bench_calib_bands_match_emitted_keys():
    """bench.py's calib_flag iterates a literal dict whose keys must
    stay in lockstep with _CALIB_BANDS — a renamed key would otherwise
    first surface as a KeyError inside the DRIVER's bench run (r15).
    Parse the source rather than importing: bench.main() starts a
    SparkSession."""
    import ast
    import pathlib

    src = pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    tree = ast.parse(src.read_text())
    bands = None
    calib_dicts = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "_CALIB_BANDS" for t in node.targets
        ):
            bands = {k.value for k in node.value.keys}
        elif isinstance(node, ast.Dict) and node.keys:
            keys = {getattr(k, "value", None) for k in node.keys}
            if all(
                isinstance(k, str) and k.startswith("calib_") for k in keys
            ):
                calib_dicts.append(keys)
    assert bands, "_CALIB_BANDS not found in bench.py"
    assert calib_dicts, "calib_flag's value dict not found in bench.py"
    for keys in calib_dicts:
        assert bands <= keys, (bands, keys)


def test_partsupp_cte_distinct_suppliers():
    """The synthetic-partsupp stride (sql_tpch._PARTSUPP_CTE): 4 suppliers
    per part must be distinct for EVERY plausible supplier count S >= 10
    (10/100/1000 at the shipped tiers) — 0 < i*stride < S for i in 1..3
    guarantees the residues never collide.  Also execute the actual CTE
    text in DuckDB at sf0.001 and assert zero duplicate key pairs, so a
    formula edit can't drift from this pure-python mirror."""
    import duckdb

    from big_data_project_spark.operators.sql_tpch import _PARTSUPP_CTE

    for s_count in (10, 13, 37, 100, 101, 999, 1000, 10_000):
        stride = s_count // 4 + 1
        for p in (0, 1, s_count - 1, 7 * s_count + 3):
            residues = {(p + i * stride) % s_count for i in range(4)}
            assert len(residues) == 4, (s_count, p, residues)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/part.parquet')"
    )
    con.execute(
        "CREATE VIEW supplier AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/supplier.parquet')"
    )
    dup = con.execute(
        "WITH" + _PARTSUPP_CTE + """
        SELECT ps_partkey, ps_suppkey, count(*) AS c
        FROM partsupp GROUP BY 1, 2 HAVING count(*) > 1"""
    ).fetchall()
    assert dup == []
    n_parts, n_ps, costs = con.execute(
        "WITH" + _PARTSUPP_CTE + """
        SELECT (SELECT count(*) FROM part),
               (SELECT count(*) FROM partsupp),
               (SELECT count(*) FROM partsupp
                WHERE ps_supplycost_cents < 100
                   OR ps_supplycost_cents > 99999
                   OR ps_availqty < 1 OR ps_availqty > 9999)"""
    ).fetchone()
    assert n_ps == 4 * n_parts
    assert costs == 0
    con.close()
