"""Scalar function families (SURVEY.md §2.8, F1-F9).

Reference grounding: squared error / normalization arithmetic
(``trainer/flax_model.py:210``; ``flax_inference.ipynb`` cells 7/17 min-max
rescale), ``np.interp`` palette interpolation (cell 8), hex-color parsing
``int(c[0:2], 16)`` (cell 8), path concat (``flax_model.py:280``), the
6-month forecast horizon (``README.md:6``), npz/config dict access
(``flax_model.py:62-64, 393-399``), label routing conditionals
(``:245-251``), and the driver's ``events.props`` JSON column.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
WholeStageCodegen; no Python UDFs anywhere on these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

# --- F1: math --------------------------------------------------------------


@query(
    "f1_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_quantity - 25.0), 4)          AS abs_dev,
           round(sqrt(l_extendedprice), 4)           AS sqrt_price,
           round(pow(l_discount, 2), 4)              AS disc_sq,
           round(exp(l_discount), 4)                 AS exp_disc,
           round(ln(l_extendedprice), 4)             AS ln_price,
           CAST(floor(l_quantity / 10) AS BIGINT)    AS qty_decile,
           CAST(ceil(l_tax * 100) AS BIGINT)         AS tax_pct_ceil,
           round(greatest(l_quantity - 25.0, 0.0), 4) AS relu_qty
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
)
def f1_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_quantity") - 25.0), 4).alias("abs_dev"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sqrt_price"),
        F.round(F.pow("l_discount", 2), 4).alias("disc_sq"),
        F.round(F.exp("l_discount"), 4).alias("exp_disc"),
        F.round(F.log("l_extendedprice"), 4).alias("ln_price"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        # relu (flax_model.py:174: "No negative temperatures")
        F.round(F.greatest(F.col("l_quantity") - 25.0, F.lit(0.0)), 4).alias("relu_qty"),
    )


# --- F2: linear interpolation / min-max rescale (np.interp, cell 8) --------


@query(
    "f2_minmax_rescale",
    oracle="""
    WITH bounds AS (
      SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer
    )
    SELECT c_custkey,
           round((c_acctbal - lo) / (hi - lo) + 1e-9, 4) AS acctbal_norm,
           round(lo + ((c_acctbal - lo) / (hi - lo)) * 255.0 + 1e-9, 4) AS acctbal_0_255
    FROM customer, bounds
    """,
)
def f2_minmax_rescale(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bounds = c.agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
    norm = (F.col("c_acctbal") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    return c.crossJoin(F.broadcast(bounds)).select(
        "c_custkey",
        F.round(norm + 1e-9, 4).alias("acctbal_norm"),
        F.round(F.col("lo") + norm * 255.0 + 1e-9, 4).alias("acctbal_0_255"),
    )


# --- F3: strings (incl. hex parse, int(c[0:2], 16) ≈ conv) -----------------


@query(
    "f3_string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                                   AS name_lower,
           upper(p_brand)                                  AS brand_upper,
           substr(p_type, 1, 5)                            AS type_prefix,
           trim(concat(p_brand, ' ', p_type))              AS brand_type,
           length(p_name)                                  AS name_len,
           CAST(p_name LIKE '%a%' AS INT)                  AS has_a,
           regexp_extract(p_brand, '([0-9]+)', 1)          AS brand_num,
           CAST(substr(lpad(regexp_extract(p_brand, '([0-9]+)', 1), 2, '0'), 1, 1) AS INT) * 16
             + CAST(substr(lpad(regexp_extract(p_brand, '([0-9]+)', 1), 2, '0'), 2, 1) AS INT) AS brand_hex_val,
           split_part(p_type, ' ', 1)                      AS type_word1
    FROM part
    """,
)
def f3_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    brand_num = F.regexp_extract("p_brand", r"([0-9]+)", 1)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.trim(F.concat(F.col("p_brand"), F.lit(" "), F.col("p_type"))).alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").like("%a%").cast("int").alias("has_a"),
        brand_num.alias("brand_num"),
        # hex parse: int(c[0:2], 16) (flax_inference.ipynb cell 8)
        F.conv(F.lpad(brand_num, 2, "0"), 16, 10).cast("int").alias("brand_hex_val"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_word1"),
    )


# --- F4: date/time (6-month horizon, README.md:6) --------------------------


@query(
    "f4_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(year(o_orderdate) AS INT)    AS order_year,
           CAST(month(o_orderdate) AS INT)   AS order_month_num,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow, -- DuckDB 0=Sun, Spark 1=Sun
           o_orderdate + INTERVAL 6 MONTH    AS label_date,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def f4_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month_num"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        # the t → t+6 months supervision pairing
        F.timestamp_add("MONTH", F.lit(6), F.col("o_orderdate")).alias("label_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
    )


# --- F5: arrays (channel select / argmax / one-hot, flax_model.py:83,
#     184, 195) over the 64-dim embedding vectors --------------------------


@query(
    "f5_array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding)                                   AS dim,
           round(embedding[1] + 1e-9, 4)                    AS first_component,
           round(list_max(embedding) + 1e-9, 4)             AS max_component,
           CAST(list_position(embedding, list_max(embedding)) AS INT) AS argmax_idx,
           round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))) + 1e-9, 4) AS head_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
)
def f5_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return em.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1) + 1e-9, 4).alias("first_component"),
        F.round(F.array_max(emb) + 1e-9, 4).alias("max_component"),
        F.array_position(emb, F.array_max(emb)).cast("int").alias("argmax_idx"),
        F.round(
            F.aggregate(
                F.slice(emb, 1, 8), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            )
            + 1e-9,
            4,
        ).alias("head_sum"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
    )


# --- F6: struct / map access (npz dict & config dict, flax_model.py:62-64,
#     393-399). The struct/map work happens Spark-side; the oracle checks
#     the flattened values. -------------------------------------------------


@query(
    "f6_struct_map_access",
    oracle="""
    SELECT n_nationkey AS nation_key,
           n_name      AS cfg_name,
           n_regionkey AS cfg_region,
           2           AS n_keys
    FROM nation
    """,
)
def f6_struct_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    packed = n.select(
        F.col("n_nationkey").alias("nation_key"),
        F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region")).alias("cfg"),
        F.create_map(
            F.lit("name"), F.col("n_name"),
            F.lit("region"), F.col("n_regionkey").cast("string"),
        ).alias("cfg_map"),
    )
    return packed.select(
        "nation_key",
        F.col("cfg.name").alias("cfg_name"),
        F.element_at("cfg_map", "region").cast("int").alias("cfg_region"),
        F.size(F.map_keys("cfg_map")).alias("n_keys"),
    )


# --- F7: JSON extraction (events.props) ------------------------------------


@query(
    "f7_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           CAST(json_extract_string(props, '$.missing') AS INT) AS missing_value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def f7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.get_json_object("props", "$.missing").cast("int").alias("missing_value"),
    )


# --- F8: conditionals (label routing, flax_model.py:245-251) ---------------


@query(
    "f8_conditionals",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 35 THEN 'medium'
                ELSE 'large' END AS qty_band,
           coalesce(nullif(l_returnflag, 'N'), 'NONE') AS return_kind,
           CASE l_linestatus WHEN 'F' THEN 1 ELSE 0 END AS is_finished
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
)
def f8_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 35, "medium")
        .otherwise("large")
        .alias("qty_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")).alias("return_kind"),
        F.when(F.col("l_linestatus") == "F", 1).otherwise(0).alias("is_finished"),
    )


# --- F9: hash / checksum (value-hash verification; exact-dedup keys) -------


@query(
    "f9_hash_functions",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256
    FROM documents
    """,
)
def f9_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
    )


@query("f9_xxhash64", oracle=None)
def f9_xxhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 seeds differ across engines (SURVEY §4.3.6) → rows-only.
    This is the hash used for shuffle-free dedup keys at scale (8-byte key
    vs md5's 32-char string halves shuffle width)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.xxhash64("text").alias("text_xxh64"))


# --- F7b: VARIANT semi-structured path (Spark 4) ----------------------------


@query(
    "f7b_variant_json",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
    GROUP BY event_type
    """,
)
def f7b_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured columns: parse once to a
    binary variant, then typed `variant_get` extractions — the
    shredding-friendly encoding for JSON at scale (vs re-parsing the
    string per extraction as get_json_object does in f7)."""
    e = load_table(spark, sf_dir, "events")
    v = e.withColumn("pv", F.parse_json("props"))
    k = F.expr("variant_get(pv, '$.k', 'int')")
    return (
        v.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("k_sum"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- F4b: calendar breadth (quarter/week truncation, month ends, ISO dow) ---


@query(
    "f4b_calendar_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS order_quarter,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS order_week,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS iso_dow,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
                AS BIGINT) AS days_to_2002
    FROM orders
    WHERE o_orderkey < 200
    """,
)
def f4b_calendar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar breadth beyond f4's day/month basics: quarter and
    ISO-week truncation (both engines truncate weeks to Monday), month
    ends, ISO day-of-week (Spark's weekday() is Monday=0, so weekday+1 ≡
    DuckDB isodow — Spark's dayofweek() is Sunday=1 and would NOT match),
    and day arithmetic against a fixed horizon. All codegen'd scan-side
    expressions."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("quarter", d).alias("order_quarter"),
        F.date_trunc("week", d).alias("order_week"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        (F.weekday(d) + 1).cast("int").alias("iso_dow"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date"))
        .cast("bigint")
        .alias("days_to_2002"),
    )


# --- F10: bitwise functions + bit aggregates --------------------------------


@query(
    "f10_bitwise",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_linenumber) AS BIGINT) AS and_ln,
           CAST(bit_or(l_linenumber) AS BIGINT) AS or_ln,
           CAST(bit_xor(l_orderkey) AS BIGINT) AS xor_ok,
           CAST(max(xor(l_orderkey * 8, l_linenumber)) AS BIGINT) AS max_shifted_xor
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def f10_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar ops (shift, xor) and the bit_and/bit_or/bit_xor
    aggregate family — associative/commutative bit-reductions that
    partial-aggregate map-side like sums.  shiftleft(k, 3) is stated as
    k*8 in the oracle (DuckDB's << needs BIT casts; the arithmetic
    identity keeps both sides in plain bigint)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").cast("bigint").alias("and_ln"),
        F.bit_or("l_linenumber").cast("bigint").alias("or_ln"),
        F.bit_xor("l_orderkey").cast("bigint").alias("xor_ok"),
        F.max(F.shiftleft("l_orderkey", 3).bitwiseXOR(F.col("l_linenumber")))
        .cast("bigint")
        .alias("max_shifted_xor"),
    )


# --- F11: higher-order map functions ----------------------------------------


@query(
    "f11_map_higher_order",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus AS status,
           CAST(count(*) * 2 AS BIGINT) AS scaled
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    HAVING count(*) * 2 >= 10
    """,
)
def f11_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order MAP function surface (F6's structural ops
    completed): per priority, a status→count map is built with
    map_from_entries, rescaled with transform_values, thresholded with
    map_filter, and exploded back to rows — all JVM lambda expressions
    inside codegen, no Python.  The oracle states the equivalent
    relational form (group counts + HAVING), so the value check proves
    the whole map pipeline is lossless."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = (
        counts.groupBy("o_orderpriority")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("o_orderstatus", "n")))
            ).alias("m")
        )
        .withColumn("m", F.transform_values("m", lambda k, v: v * 2))
        .withColumn("m", F.map_filter("m", lambda k, v: v >= 10))
    )
    return mapped.select(
        "o_orderpriority", F.explode("m").alias("status", "scaled")
    ).select("o_orderpriority", "status", F.col("scaled").cast("bigint").alias("scaled"))
