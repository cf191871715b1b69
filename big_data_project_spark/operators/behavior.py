"""Behavioral analytics over the events table: funnels, cohort retention,
and event-sequence detection.

The reference's workload is temporal supervision — "observations at t
predict labels at t+6 months" (README.md:6) — which generalizes to
ordered-event analytics: did step B follow step A for this key, and how
do key cohorts evolve over time? These are the standard large-scale
event-warehouse queries (per-user ordered sequences), all expressible as
grouped min/lag/conditional aggregation — single shuffle on user_id,
no self-joins, which is what keeps them viable at 100 TB event volumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

# --- ordered funnel: view → click → purchase --------------------------------


@query(
    "b1_funnel",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purch
      FROM events
      GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_view) AS BIGINT) AS viewed,
           CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
           CAST(sum(CASE WHEN t_purch > t_click AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
             AS purchased_after_click
    FROM stages
    """,
)
def b1_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel via one grouped conditional-min pass —
    no per-stage self-joins (the n-way join formulation shuffles the
    event table once per stage; this shuffles it once, total)."""
    e = load_table(spark, sf_dir, "events")
    stages = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purch"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("viewed"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)
        ).alias("clicked_after_view"),
        F.sum(
            F.when(
                (F.col("t_purch") > F.col("t_click")) & (F.col("t_click") > F.col("t_view")), 1
            ).otherwise(0)
        ).alias("purchased_after_click"),
    )


# --- cohort retention: signup day × activity-day offset ---------------------


@query(
    "b2_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def b2_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-0 cohort assignment (min ts per user) joined back to activity;
    the first-seen frame is small (one row per user) → broadcast to the
    event scan, so the heavy side shuffles only for the final count."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = (
        e.join(F.broadcast(first_seen), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# --- consecutive-event pattern: error following purchase within 5 min -------


@query(
    "b3_next_event_pattern",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchase_then_error
    FROM ordered
    WHERE event_type = 'purchase' AND next_type = 'error'
      AND next_ts <= ts + INTERVAL 5 MINUTE
    GROUP BY user_id
    """,
)
def b3_next_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-event sequence detection (W2 lead over a per-user time
    window): purchases immediately followed by an error within 5 minutes.
    Unique tie-break (event_id) keeps lead() deterministic under equal
    timestamps in both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return (
        ordered.filter(
            (F.col("event_type") == "purchase")
            & (F.col("next_type") == "error")
            & (F.col("next_ts") <= F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchase_then_error"))
    )


# --- daily resample + forward fill (gap-filled time series) -----------------


@query(
    "b4_resample_ffill",
    oracle="""
    WITH bounds AS (
      SELECT user_id,
             date_trunc('day', min(ts)) AS d0,
             date_trunc('day', max(ts)) AS d1
      FROM events WHERE user_id < 10 GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds
    ),
    daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             round(avg(value), 4) AS day_value
      FROM events WHERE user_id < 10 GROUP BY 1, 2
    )
    SELECT g.user_id, g.day,
           last_value(d.day_value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def b4_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily resample: per-key day grid (sequence + explode —
    generated, never a driver loop), left join of observed daily
    aggregates, forward-fill via last(ignorenulls) over an unbounded-
    preceding frame. The raster analog is filling cloud-masked observation
    gaps in a satellite time series (the reference imputes spatially,
    flax_model.py:89-91; this is the temporal counterpart)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    daily = e.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.round(F.avg("value"), 4).alias("day_value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    )


# --- B5: exponential moving average (ordered fold) ---------------------------

_EMA_ALPHA = 0.2


@query(
    "b5_ema_smoothing",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(list_reduce(
                   list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                   (acc, x) -> acc * {1 - _EMA_ALPHA} + x * {_EMA_ALPHA})
                 + 1e-9, 6) AS ema
    FROM events
    GROUP BY user_id
    """,
)
def b5_ema_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average (α=0.2) of event values — the
    recursive time-series smoother SQL windows cannot express (each value
    depends on the previous OUTPUT, not a fixed frame).

    Expressed as an ordered array fold: collect each user's (ts,
    event_id, value) sequence, array_sort (ts then event_id so ties are
    deterministic), then F.aggregate seeded with the first value — a
    single JVM-side lambda fold, no Python boundary and no self-join
    recursion.  Both engines fold the identical sequence left-to-right in
    doubles, so results are bit-equal before the final rounding.  At
    100 TB per-key sequences are bounded (one user's events fit a row);
    the only exchange is the groupBy(user_id) collect."""
    e = load_table(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", F.col("value").cast("double").alias("v")))
        ).alias("s"),
    )
    rest = F.expr("slice(s, 2, size(s) - 1)")
    ema = F.aggregate(
        rest,
        F.element_at("s", 1).getField("v"),
        lambda acc, x: acc * F.lit(1 - _EMA_ALPHA) + x.getField("v") * F.lit(_EMA_ALPHA),
    )
    return seq.select(
        "user_id",
        "n_events",
        F.round(ema + F.lit(1e-9), 6).alias("ema"),
    )


# --- B6: rolling distinct active users (trailing-7-day MAU/DAU shape) -------


@query(
    "b6_rolling_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(count(DISTINCT du.user_id) AS BIGINT) AS active_7d
    FROM days d
    JOIN du ON du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
)
def b6_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the rolling
    MAU/DAU family.  COUNT(DISTINCT) cannot ride a sliding window
    frame in either engine, so the scalable form is: dedupe to
    (day, user) once — the big shuffle, corpus → |days|·|users| rows —
    then EXPLODE each (day, user) row into the ≤7 grid days it
    contributes to (sequence(day, day+6)) and equi-join the bounded
    day grid, the same bucketing discipline as j12's interval join.
    A raw BETWEEN join here would plan as a BroadcastNestedLoopJoin
    (days² × users comparisons); the explode form is a hash join —
    pinned by a no-nested-loop plan contract.  At 100 TB the heavy
    input collapses in the first dedup; the 7× fan-out and the
    per-day distinct are proportional to days × active-users, not
    events, and the grid (calendar days — ~4k rows/decade) broadcasts."""
    e = load_table(spark, sf_dir, "events")
    # persisted: the deduped frame feeds both the day grid and the
    # exploded join side — without the cache the corpus-sized distinct
    # runs twice.  Cache-release contract (the _train_centroids
    # convention): the registry entry point clears caches on entry, so
    # a caller COMPOSING this builder into a larger plan owns the
    # unpersist after its terminal action.
    du = e.select(F.col("ts").cast("date").alias("day"), "user_id").distinct().persist()
    days = du.select("day").distinct().select(F.col("day").alias("grid_day"))
    contrib = du.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("grid_day"),
        "user_id",
    )
    return (
        contrib.join(F.broadcast(days), "grid_day")
        .groupBy(F.col("grid_day").cast("string").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )


# --- B7: time-series gap fill by linear interpolation -----------------------


@query(
    "b7_gap_fill_interpolate",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             round(avg(value) + 1e-9, 6) AS v
      FROM events GROUP BY 1, 2
    ),
    kept AS (
      SELECT * FROM daily
      WHERE CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '@' || CAST(day AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 6
    ),
    grid AS (
      SELECT k.user_id, CAST(g.d AS DATE) AS day
      FROM (SELECT user_id, min(day) AS lo, max(day) AS hi FROM kept GROUP BY user_id) k,
           LATERAL (SELECT unnest(generate_series(k.lo, k.hi, INTERVAL 1 DAY)) AS d) g
    ),
    joined AS (
      SELECT g.user_id, g.day, k.v,
             last_value(k.v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN k.v IS NOT NULL THEN g.day END IGNORE NULLS)
               OVER w_prev AS pd,
             first_value(k.v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN k.v IS NOT NULL THEN g.day END IGNORE NULLS)
               OVER w_next AS nd
      FROM grid g LEFT JOIN kept k ON k.user_id = g.user_id AND k.day = g.day
      WINDOW
        w_prev AS (PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, CAST(day AS VARCHAR) AS day,
           CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed,
           round(CASE WHEN v IS NOT NULL THEN v
                      ELSE pv + (nv - pv) * (day - pd) / (nd - pd)
                 END + 1e-9, 4) AS value_filled
    FROM joined
    """,
)
def b7_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill by LINEAR INTERPOLATION between the nearest
    observed anchors — b4's resample/forward-fill sibling for signals
    where a flat hold is wrong (sensor readings, engagement scores).
    A deterministic md5 gate drops ~40% of the per-user daily points
    first (the simulated outage — same integer-hash reproducibility as
    o7/o12), the per-user calendar grid is densified with
    explode(sequence(lo, hi)), and each missing day takes
    pv + (nv-pv)·(day-pd)/(nd-pd) from the bracketing anchors.

    Scale design: ONE (user, day) collapse shuffle, then the grid
    explode is a narrow ≤|days| fan-out and both anchor scans ride a
    single per-user window exchange (two frames over the same sort —
    Spark plans one Window node pair, one exchange).  Interpolation
    inputs are pre-rounded to 6 so both engines interpolate identical
    anchors; the grid's first/last day are always observed, so no
    edge-extrapolation branch exists."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.avg("value") + F.lit(1e-9), 6).alias("v"))
    )
    gate = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("@"),
                               F.col("day").cast("string"))), 1, 15),
            16, 10,
        ).cast("long"),
        F.lit(10),
    ) < 6
    kept = daily.filter(gate)
    grid = (
        kept.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    j = grid.join(kept, ["user_id", "day"], "left")
    w_prev = (
        Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    j = j.select(
        "user_id", "day", "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff("day", "pd") / F.datediff("nd", "pd")
    )
    return j.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.when(F.col("v").isNotNull(), 1).otherwise(0).alias("observed"),
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp) + F.lit(1e-9), 4
        ).alias("value_filled"),
    )


# --- gravity-decayed trending ranking (prepped) ------------------------------

_TREND_REF = "2024-02-01"  # fixed reference date just past the fixture range
_TREND_RECENT_DAYS = 7


def gravity_trending_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 event sources by GRAVITY-DECAYED activity: each event
    contributes 1/(Δdays+2)² toward its user's score, Δdays measured to
    a fixed reference date — the Hacker-News-shaped recency ranking a
    crawl/feed pipeline uses to allocate budget toward sources that are
    active NOW rather than historically (a stale source with many old
    events ranks below a smaller recently-active one), alongside a
    plain count and a recent-window count so the divergence is visible.
    Reference analog: the temporal-supervision shape,
    big_data_project/trainer/flax_model.py.

    Registered r10 as `b7_gravity_trending` (with `_TREND_ORACLE`)
    once the window opened.

    Parity: Δdays is an exact integer datediff on both engines and the
    decay 1/(Δdays+2)² is one rational division — deliberately NOT
    pow(0.5, Δt/τ), whose transcendental evaluation may differ in the
    last ulp between engines; the per-user sum rounds to 6 with the
    +1e-9 nudge (§4.3.1).  The reference date is a fixed literal so the
    query is deterministic (no now()).

    Scale design: one narrow map computes the per-event weight, then a
    single partial-aggregated shuffle keyed on user_id (the b-family
    contract) carrying (user, double, int, int); the top-20 is a
    TakeOrderedAndProject.  No window functions, no self-joins."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    # clamp at 0: an event dated past the reference (impossible in the
    # fixture, possible after a regeneration) would otherwise hit
    # ddays = -2 → a 1/0 pole where Spark yields NULL but DuckDB +inf —
    # the engines would diverge exactly when the fixture moves
    ddays = F.greatest(
        F.datediff(F.lit(_TREND_REF).cast("date"), F.to_date("ts")), F.lit(0)
    )
    return (
        e.select(
            "user_id",
            (F.lit(1.0) / ((ddays + F.lit(2)) * (ddays + F.lit(2)))).alias("wt"),
            F.when(ddays <= _TREND_RECENT_DAYS, 1).otherwise(0).alias("recent"),
        )
        .groupBy("user_id")
        .agg(
            F.round(F.sum("wt") + F.lit(1e-9), 6).alias("gravity_score"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("recent").cast("bigint").alias("n_recent"),
        )
        .orderBy(F.col("gravity_score").desc(), "user_id")
        .limit(20)
    )


_TREND_ORACLE = f"""
    WITH w AS (
      SELECT user_id,
             greatest(datediff('day', CAST(ts AS DATE), DATE '{_TREND_REF}'),
                      0) AS dd
      FROM events)
    SELECT user_id,
           round(sum(1.0 / ((dd + 2) * (dd + 2))) + 1e-9, 6) AS gravity_score,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN dd <= {_TREND_RECENT_DAYS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_recent
    FROM w
    GROUP BY user_id
    ORDER BY gravity_score DESC, user_id
    LIMIT 20
"""

query("b7_gravity_trending", oracle=_TREND_ORACLE)(gravity_trending_users)
