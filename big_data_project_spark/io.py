"""Table loaders over the driver's parquet fixtures (S1/S2).

Reference parity: the reference's scan is ``glob(data_path + "*.npz")`` then
per-file load + concat (``trainer/flax_model.py:102-120``). Spark's multi-file
parquet scan is the idiomatic equivalent: one declarative scan, column
pruning + predicate pushdown reach the footer, and partition planning is
handled by the data source (``maxPartitionBytes`` splits), so the same call
scales from one file to a 100 TB directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# cache of path -> list of timestamp[ns] column names (footer metadata)
_NANOS_COLS: dict[str, list[str]] = {}

# per-session memo of the analyzed lazy frame for each fixture table:
# ``spark.read.parquet`` re-lists the path and re-reads the footer schema
# driver-side on EVERY call (~50-100 ms/table), so a 5-table join paid
# ~0.5 s of pure driver metadata work per invocation — measured 0.588 s
# build+analyze for j3_star_join_revenue, ~66% of its bench wall.  The
# DataFrame is an immutable lazy plan, so handing the same one back is
# metadata reuse (the load_all ``_VIEWS`` precedent), never result
# caching: every action still scans parquet and recomputes.  Keyed by
# applicationId so a new session never sees a stale plan.
_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark 4 refuses them
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case
    they surface as LongType nanoseconds. Footer-only read, driver-side."""
    if path not in _NANOS_COLS:
        try:
            import pyarrow.parquet as pq

            schema = pq.read_schema(path)
            _NANOS_COLS[path] = [
                f.name for f in schema if str(f.type) == "timestamp[ns]"
            ]
        except Exception:
            _NANOS_COLS[path] = []
    return _NANOS_COLS[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S2: parquet scan of a named fixture table.

    Nanosecond-precision timestamp columns (events.ts) are read as long
    nanos and truncated to microsecond timestamps — the same truncation
    DuckDB applies, so oracle comparisons stay exact. Integer ``div`` (not
    float division) preserves full precision at ~1.7e18 ns.

    Parquet ``timestamp[us]`` without a timezone surfaces as TIMESTAMP_NTZ
    in Spark 4, which functions like ``unix_micros()`` reject under ANSI.
    The session timezone is UTC, so casting NTZ → TIMESTAMP is value-exact;
    normalizing here keeps every downstream query timestamp-typed no matter
    which physical parquet type the fixture generator emitted.
    """
    path = f"{sf_dir}/{name}.parquet"
    memo_key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_MEMO.get(memo_key)
    if cached is not None:
        return cached
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    _TABLE_MEMO[memo_key] = df
    return df


# per-session memo: last (sf_dir, frames) registered as temp views, so
# repeated spark.sql-surface calls don't pay 10 footer reads + view
# registrations each (measured ~0.6s/call of pure plan-build overhead)
_VIEWS: dict[str, tuple[str, dict[str, DataFrame]]] = {}


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table; also registers each as a temp view so the
    same query text can run through ``spark.sql``. Idempotent per
    (session, sf_dir): re-registers only when the sf_dir changes."""
    app_id = spark.sparkContext.applicationId
    cached = _VIEWS.get(app_id)
    if cached and cached[0] == sf_dir:
        return cached[1]
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    _VIEWS[app_id] = (sf_dir, out)
    return out
