"""Streaming operators (SURVEY.md §2.9, T1-T8) as batch/stream dual builders.

Reference grounding: the reference's epoch loop is an incremental
computation with per-step emission (``trainer/flax_model.py:349-382``) and
its missing Beam/Earth-Engine pipeline (``README.md:17``) was a windowed
dataflow; the driver ships ``events`` explicitly as a stream table.

Design: every transformation is a pure ``DataFrame -> DataFrame`` function
(``tumbling_counts``, ``session_stats``, …) applied identically to a batch
``spark.read`` frame (what the DuckDB oracle checks) and to a
``spark.readStream`` frame (exercised with real micro-batches in
``tests/test_streaming.py``). Same logical plan, two execution modes —
this is Structured Streaming's core contract, and it keeps every streaming
query oracle-checkable.

Scale: windowed aggregations shuffle by (window, key); watermarks bound
state size — without them a 100 TB stream accumulates unbounded window
state. Session windows use Spark's native session_window, which merges
overlapping per-key ranges at the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

# ---------------------------------------------------------------------------
# Pure transformations (shared by batch + streaming paths)
# ---------------------------------------------------------------------------


def tumbling_counts(events: DataFrame) -> DataFrame:
    """T1: 1-hour tumbling windows per event type."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """T2: 1-hour windows sliding every 15 minutes (each event in 4)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_stats(events: DataFrame) -> DataFrame:
    """T3: per-user sessions with a 30-minute inactivity gap."""
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """T5: exactly-once per event_id (first occurrence wins)."""
    return events.dropDuplicates(["event_id"])


def enrich_with_users(events: DataFrame, users: DataFrame) -> DataFrame:
    """T7: stream-static join — static dim broadcast to every micro-batch."""
    return events.join(F.broadcast(users), events.user_id == users.c_custkey).select(
        "event_id", "user_id", "event_type", "c_mktsegment",
        F.round("value", 4).alias("value_r"),
    )


def on_time_filter(events: DataFrame, watermark_delay: str = "10 minutes") -> DataFrame:
    """T4's batch analog: the watermark predicate as an explicit filter —
    an event is late if it arrives after max(event_time) - delay. In true
    streaming the engine tracks the high-water mark; the scripted
    micro-batch test in tests/test_streaming.py verifies real late-drop."""
    return events.withWatermark("ts", watermark_delay) if events.isStreaming else events


# ---------------------------------------------------------------------------
# Registry entries (batch mode over the events fixture)
# ---------------------------------------------------------------------------


@query(
    "t1_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def t1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@query(
    "t2_sliding_window",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS window_start,
           count(*) AS n_events
    FROM events
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 1
    """,
)
def t2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load_table(spark, sf_dir, "events"))


@query(
    "t3_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 4) AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def t3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats(load_table(spark, sf_dir, "events"))


@query(
    "t4_watermark_late_drop",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def t4_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics are streaming-only — in batch the watermark is
    by definition a no-op (no lateness), so the oracle is exactly the
    tumbling counts; what the hash check pins here is that adding the
    watermark does NOT perturb the batch plan's results. The real
    late-data drop is asserted with scripted micro-batches in
    tests/test_streaming.py."""
    e = load_table(spark, sf_dir, "events")
    return tumbling_counts(on_time_filter(e))


@query(
    "t5_streaming_dedup",
    oracle="""
    SELECT count(*) AS n_unique,
           CAST(sum(user_id) AS BIGINT) AS user_id_sum
    FROM (SELECT DISTINCT event_id, user_id FROM events)
    """,
)
def t5_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return dedup_events(e).agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("user_id").cast("bigint").alias("user_id_sum"),
    )


@query(
    "t7_stream_static_join",
    oracle="""
    SELECT event_id, user_id, event_type, c_mktsegment,
           round(value, 4) AS value_r
    FROM events JOIN customer ON user_id = c_custkey
    """,
)
def t7_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enrich_with_users(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )


# --- T6 / T8: true streaming runs registered as queries ---------------------
#
# Unlike T1-T5/T7/T9 (pure dual-mode transformations checked in batch mode),
# these two genuinely RUN a Structured Streaming query to completion inside
# the registry entry: the events fixture is staged as multiple parquet files,
# streamed with ``maxFilesPerTrigger=1`` + ``availableNow`` (so state really
# crosses micro-batch boundaries), and the sink contents come back as the
# result DataFrame.  Both are still oracle-checkable: T6's final per-key
# state equals a batch GROUP BY, and T8's sink holds exactly the input rows.


def _stage_events(spark: SparkSession, sf_dir: str, n_files: int) -> tuple[str, str]:
    """Write the events fixture into a fresh temp dir as ``n_files`` parquet
    files (→ ``n_files`` micro-batches under maxFilesPerTrigger=1) and
    return (input_dir, scratch_root)."""
    import tempfile

    root = tempfile.mkdtemp(prefix="bdp_stream_")
    input_dir = f"{root}/in"
    load_table(spark, sf_dir, "events").repartition(n_files).write.parquet(input_dir)
    return input_dir, root


@query(
    "t6_stateful_counts",
    oracle="""
    SELECT user_id, count(*) AS total_events
    FROM events
    GROUP BY user_id
    """,
)
def t6_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: arbitrary stateful per-key processing via applyInPandasWithState.

    A per-user running event count whose state survives micro-batch
    boundaries in the state store; output mode ``update`` emits the running
    value after every batch, so the FINAL state per user is the max emitted —
    which must equal the batch ``GROUP BY`` count (the oracle).  State is
    one long per key: bounded regardless of stream length, the property that
    keeps this runnable over a 100 TB event stream.

    (transformWithStateInPandas — the v2 API — is unavailable in this
    container: its state-server protocol imports google.protobuf, which is
    not installed, so the driver worker crashes at state-schema validation
    [verified: ImportError in transform_with_state_driver_worker]. The v1
    applyInPandasWithState path below is feature-equivalent for this
    operator; on a cluster with protobuf the processor body ports to a
    StatefulProcessor with one ValueState unchanged.)
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from big_data_project_spark.streaming.runner import (
        EVENTS_SCHEMA, run_available_now,
    )

    input_dir, root = _stage_events(spark, sf_dir, n_files=4)
    out_dir, ck = f"{root}/out", f"{root}/ck"

    def running_count(key, pdf_iter, state):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [n]})

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    counted = stream.groupBy("user_id").applyInPandasWithState(
        running_count,
        "user_id long, total_events long",
        "n long",
        "update",
        GroupStateTimeout.NoTimeout,
    )

    def sink(df: DataFrame, batch_id: int) -> None:
        if df.count():
            df.write.mode("append").parquet(out_dir)

    run_available_now(counted, out_dir, ck, output_mode="update", foreach_batch=sink)
    # final state per user = last (= max, counts are monotone) emitted value
    return (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max("total_events").alias("total_events"))
    )


@query(
    "t8_foreachbatch_sink",
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 4) AS value_r
    FROM events
    """,
)
def t8_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: foreachBatch custom sink — each micro-batch written with custom
    logic (partitioned-by-type parquet append), the pattern for routing a
    stream into any batch-only sink (JDBC, upsert, multi-table fanout) with
    exactly-once via the checkpoint's batch-id dedup.  Sink read back must
    hold exactly the input rows (the oracle)."""
    from big_data_project_spark.streaming.runner import (
        EVENTS_SCHEMA, run_available_now,
    )

    input_dir, root = _stage_events(spark, sf_dir, n_files=2)
    out_dir, ck = f"{root}/out", f"{root}/ck"

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def sink(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").partitionBy("event_type").parquet(out_dir)

    run_available_now(stream, out_dir, ck, foreach_batch=sink)
    return spark.read.parquet(out_dir).select(
        "event_id", "user_id", "event_type", F.round("value", 4).alias("value_r")
    )


@query(
    "t11_streaming_windowed_topk",
    oracle="""
    WITH counts AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             event_type, count(*) AS n
      FROM events
      GROUP BY 1, 2
    )
    SELECT window_start, event_type, n
    FROM (SELECT *, row_number() OVER (PARTITION BY window_start
                                       ORDER BY n DESC, event_type) AS rk
          FROM counts)
    WHERE rk <= 3
    """,
)
def t11_streaming_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed top-k: per-hour event-type counts maintained as
    streaming aggregation state across micro-batches (update mode), with
    the rank applied over the final counts — ranking is not incremental,
    so the stream maintains the windowed COUNTS (cheap, mergeable state)
    and top-k is the cheap finishing step, the standard split for
    streaming leaderboards.  Update mode re-emits a (window, type) row
    whenever a batch touches it; the final value per key is the max
    emitted (counts are monotone).  No watermark here so the batch oracle
    matches exactly over randomly-split files; production adds one to
    bound state (eviction semantics are T4's, tested with scripted
    micro-batches)."""
    from big_data_project_spark.streaming.runner import (
        EVENTS_SCHEMA, run_available_now,
    )

    input_dir, root = _stage_events(spark, sf_dir, n_files=3)
    out_dir, ck = f"{root}/out", f"{root}/ck"

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    counted = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )

    def sink(df: DataFrame, batch_id: int) -> None:
        if df.count():
            df.write.mode("append").parquet(out_dir)

    run_available_now(counted, out_dir, ck, output_mode="update", foreach_batch=sink)
    final = (
        spark.read.parquet(out_dir)
        .groupBy("window_start", "event_type")
        .agg(F.max("n").alias("n"))
    )
    w = Window.partitionBy("window_start").orderBy(F.col("n").desc(), "event_type")
    return (
        final.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("window_start", "event_type", "n")
    )


# --- T9: stream-stream join (view → purchase attribution) -------------------


def _attribution_joined(views: DataFrame, purchases: DataFrame, how: str) -> DataFrame:
    """Shared core of the t9/t12/t13 attribution family: rename both
    sides, join by user within the 30-minute attribution window with the
    given join type.  ONE definition of the window condition — a bound
    change here moves all three builders together."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        how,
    )


# gap on µs precision, floored ONCE — flooring each timestamp first
# (cast to long) disagrees with the oracle by ±1 s
_GAP_S = "(unix_micros(purchase_ts) - unix_micros(view_ts)) div 1000000"


def attribution_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Dual-mode builder: each purchase joined to every view by the same
    user within the preceding 30 minutes. In streaming both inputs carry
    watermarks and the time-bound condition lets Spark expire join state
    (without it, stream-stream join state grows forever — THE scale
    constraint for 100 TB/day event joins)."""
    return _attribution_joined(views, purchases, "inner").select(
        "view_id",
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.expr(_GAP_S).alias("gap_s"),
    )


@query(
    "t9_stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id,
           p.event_id AS purchase_id,
           p.user_id,
           (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def t9_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return attribution_join(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
    )


# --- T12: stream-stream LEFT OUTER join (unmatched emission) ----------------


def attribution_left_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Dual-mode builder: every view, with its attributed purchase when
    one lands within 30 minutes, else NULLs.  In streaming this is the
    materially harder variant of T9: Spark buffers each view until the
    purchase-side watermark has passed view_ts + 30 min, and only then
    emits the unmatched row — correctness depends on BOTH watermarks and
    the time-bound join condition, which also cap the state store.  A
    conversion-rate pipeline (did this impression convert?) needs exactly
    this unmatched emission; an inner join silently drops the negatives."""
    return _attribution_joined(views, purchases, "left_outer").select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        F.expr(_GAP_S).alias("gap_s"),
        F.col("purchase_id").isNotNull().cast("int").alias("converted"),
    )


@query(
    "t12_stream_stream_left_join",
    oracle="""
    SELECT v.event_id AS view_id,
           p.event_id AS purchase_id,
           v.user_id,
           (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS gap_s,
           CAST(p.event_id IS NOT NULL AS INT) AS converted
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def t12_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return attribution_left_join(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
    )


# --- T13: stream-stream FULL OUTER join (both-side unmatched emission) ------


def attribution_full_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Dual-mode builder: T12 completed — every view AND every purchase,
    matched when the purchase lands within 30 minutes of the view, each
    side's orphans emitted with NULLs for the other.  Streaming-wise the
    state story is symmetric now: a view is held until the purchase
    watermark passes view_ts + 30 min, a purchase until the view
    watermark passes purchase_ts (its earliest admissible view is
    purchase_ts - 30 min), so BOTH watermarks bound BOTH buffers.  An
    attribution audit needs exactly this shape: un-attributed purchases
    (organic conversions) are as much a signal as un-converted views."""
    return _attribution_joined(views, purchases, "full_outer").select(
        "view_id",
        "purchase_id",
        F.coalesce(F.col("v_user"), F.col("p_user")).alias("user_id"),
        F.expr(_GAP_S).alias("gap_s"),
        F.when(F.col("view_id").isNull(), F.lit("organic"))
        .when(F.col("purchase_id").isNull(), F.lit("unconverted"))
        .otherwise(F.lit("attributed"))
        .alias("outcome"),
    )


@query(
    "t13_stream_stream_full_join",
    oracle="""
    SELECT v.event_id AS view_id,
           p.event_id AS purchase_id,
           COALESCE(v.user_id, p.user_id) AS user_id,
           (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS gap_s,
           CASE WHEN v.event_id IS NULL THEN 'organic'
                WHEN p.event_id IS NULL THEN 'unconverted'
                ELSE 'attributed' END AS outcome
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def t13_stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return attribution_full_join(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
    )


# --- T14: watermark-bounded streaming dedup (dropDuplicatesWithinWatermark) --


@query(
    "t14_dedup_within_watermark",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_unique,
           CAST(sum(user_id) AS BIGINT) AS user_id_sum
    FROM events
    """,
)
def t14_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14: dropDuplicatesWithinWatermark — T5's unbounded-state dedup
    made production-viable: per-key dedup state is EVICTED once the
    watermark passes the key's event time + delay, so state size is
    bounded by the stream's rate × the watermark horizon instead of its
    entire history (the property that lets a 100 TB/day feed dedup
    forever).  This genuinely RUNS the stream (the T6/T8 cadence): the
    fixture is doubled on every ``event_id % 7 == 0`` row, the doubled
    input streams file-per-micro-batch, and the sink must hold exactly
    the ORIGINAL row set — the oracle recomputes it from the clean
    fixture.

    Determinism note: duplicates are byte-identical re-emissions
    hash-co-located into the SAME input file (repartition on event_id),
    so every duplicate pair shares a micro-batch; the 35-day watermark
    horizon is load-bearing and must EXCEED the fixture's full time span,
    because the hash-split files are not time-ordered — an early-timestamp
    file arriving after a late one would otherwise advance the watermark
    past (and evict) state a still-pending duplicate needs.  The API only
    guarantees dedup for duplicates within the watermark."""
    import tempfile

    from big_data_project_spark.streaming.runner import (
        EVENTS_SCHEMA, run_available_now,
    )

    root = tempfile.mkdtemp(prefix="bdp_stream_")
    input_dir, out_dir, ck = f"{root}/in", f"{root}/out", f"{root}/ck"
    e = load_table(spark, sf_dir, "events")
    dups = e.filter(F.col("event_id") % 7 == 0)
    e.unionAll(dups).repartition(4, "event_id").write.parquet(input_dir)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    deduped = stream.withWatermark("ts", "35 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )

    def sink(df: DataFrame, batch_id: int) -> None:
        if df.count():
            df.write.mode("append").parquet(out_dir)

    run_available_now(deduped, out_dir, ck, foreach_batch=sink)
    return spark.read.parquet(out_dir).agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("user_id").cast("bigint").alias("user_id_sum"),
    )
