"""Local differential harness mimicking the driver's DuckDB compare.

For each registered query with an oracle: run the Spark DataFrame and the
DuckDB SQL on the same sf dir, then compare

  1. row count,
  2. column-name set,
  3. order-insensitive values (columns sorted by name, rows sorted by all
     columns, exact match for non-floats, tiny-epsilon match for floats —
     queries are expected to round floats themselves, so float columns
     should in fact match exactly).

Used by tests/test_oracle_parity.py so parity breaks locally before the
driver sees them.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from big_data_project_spark.io import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1
    mismatches: list = field(default_factory=list)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # arrays/lists → tuple so they sort/compare
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, (str, bytes)) else v
            )
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    except TypeError:
        df = df.iloc[
            df.astype(str).apply(tuple, axis=1).argsort(kind="mergesort")
        ].reset_index(drop=True)
    return df


def _is_na(v) -> bool:
    if v is None:
        return True
    if isinstance(v, (list, tuple)) or hasattr(v, "__len__") and not isinstance(v, (str, bytes)):
        return False
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _values_equal(a, b) -> bool:
    if _is_na(a) or _is_na(b):
        return _is_na(a) and _is_na(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        # SIGNED ZERO: -0.0 == 0.0 numerically, but the driver hash tells
        # them apart (x59's r06 red row: 64 Gram cells were -0.0 in DuckDB
        # vs +0.0 in Spark while every value compared ==).  Spark's round()
        # goes through BigDecimal and never emits -0.0; DuckDB's keeps the
        # float sign bit — normalize the producing query (`+ 0.0` after the
        # oracle's round) when this fires.
        if af == 0.0 and bf == 0.0:
            return math.copysign(1.0, af) == math.copysign(1.0, bf)
        # EXACT float equality — the driver's value-hash is exact, so any
        # ulp drift that an epsilon would forgive here becomes a red driver
        # row.  The repo's rounding convention (round(x + 1e-9, 4) on both
        # sides) makes bit-exactness achievable; an r03 audit confirmed all
        # 183 oracle-backed queries are bit-exact at sf0.01.  If this ever
        # fails on a new query, fix the query's rounding, don't loosen this.
        return af == bf
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    if set(sp.columns) != set(du.columns):
        return CompareResult(
            name, False,
            f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(du.columns)}",
            len(sp), len(du),
        )
    if len(sp) != len(du):
        return CompareResult(name, False, f"row count {len(sp)} != {len(du)}", len(sp), len(du))
    # The driver's value-hash is dtype-sensitive: an integer column on one
    # side vs a float column on the other hashes differently even when every
    # value is numerically equal (seen on floor()/ceil(): DuckDB → DOUBLE,
    # Spark → BIGINT).  Catch int-vs-float drift here, before the driver
    # does; skip columns with nulls (pandas coerces nullable ints to float,
    # which would false-positive).
    # NOT width-sensitive: int32-vs-int64 pairs (b2 day_offset, x9 counts,
    # x39, x3) are all driver-GREEN, so the driver hash canonicalizes
    # integer widths (consistent with hashing stringified values: "3" is
    # "3" at any width, but 3 != 3.0 and -0.0 != 0.0 — the latter was
    # x59's actual r06 red-row cause, caught per-value below).
    for c in sorted(sp.columns):
        sk, dk = sp[c].dtype.kind, du[c].dtype.kind
        if {sk, dk} <= {"i", "u", "f"} and ("f" in (sk, dk)) != (sk == dk == "f"):
            if not (sp[c].isna().any() or du[c].isna().any()):
                return CompareResult(
                    name, False,
                    f"dtype mismatch on {c!r}: spark={sp[c].dtype} oracle={du[c].dtype} "
                    "(driver hash is type-sensitive — CAST the oracle or the query)",
                    len(sp), len(du),
                )
    sp, du = _canon(sp), _canon(du)
    mism = []
    for c in sp.columns:
        sv, dv = sp[c].tolist(), du[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not _values_equal(a, b):
                mism.append((c, i, a, b))
                if len(mism) >= 5:
                    break
        if len(mism) >= 5:
            break
    if mism:
        return CompareResult(name, False, f"value mismatches: {mism}", len(sp), len(du), mism)
    return CompareResult(name, True, "", len(sp), len(du))
