"""Sorts / limits / top-k / splits / batching (SURVEY.md §2.6, O1-O6).

Reference grounding: deterministic file order from ``glob`` + sequential
train/test split ``inputs[:train_size]`` (``trainer/flax_model.py:102,
125-131``), head-n slices ``input[:10]`` (``flax_inference.ipynb`` cell 10),
seeded permutation ``jax.random.permutation`` (``flax_model.py:234``),
fixed-size batching with dropped remainder (``:235-236``), checkpoint
retention keep-last-3 (``:377``).

Determinism rule (§4.3.2): every LIMIT/top-k carries a total order with a
unique tie-break key on both engines. At scale, Spark's TakeOrderedAndProject
computes per-partition top-k then merges k·P rows on the driver — no global
sort of the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

# --- O1/O2: global sort + limit (head-n under total order) -----------------


@query(
    "o2_order_limit",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def o2_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 4).alias("total_price"))
        .limit(25)
    )


# --- O3: offset split (sequential 90/10 train/test, flax_model.py:125-131) -
# Exact formulation: row_number over a stable total order, filter ≤ cutoff.


@query(
    "o3_sequential_split",
    oracle="""
    WITH numbered AS (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) AS rn,
             count(*) OVER () AS n_total
      FROM orders
    )
    SELECT CASE WHEN rn <= CAST(floor(n_total * 0.9) AS BIGINT) THEN 'train' ELSE 'test' END AS split,
           count(*) AS n,
           round(avg(o_totalprice), 4) AS avg_total
    FROM numbered
    GROUP BY 1
    """,
)
def o3_sequential_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    numbered = o.select(
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_total"),
    )
    split = F.when(
        F.col("rn") <= F.floor(F.col("n_total") * 0.9).cast("bigint"), "train"
    ).otherwise("test")
    return numbered.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_total"),
    )


# --- O4: top-k per group (keep-last-3 checkpoints, flax_model.py:377) ------


@query(
    "o4_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, round(c_acctbal, 4) AS acctbal
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer
    )
    WHERE rk <= 3
    """,
)
def o4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 4).alias("acctbal"))
    )


# --- O5: seeded random shuffle (jax.random.permutation, flax_model.py:234) -
# Seed semantics are engine-specific → rows-only. Invariants tested in
# pytest: same seed ⇒ same order; it is a permutation (count + key set
# preserved).


@query("o5_seeded_shuffle", oracle=None)
def o5_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return (
        n.withColumn("shuffle_key", F.rand(seed=42))
        .orderBy("shuffle_key", "n_nationkey")
        .select("n_nationkey", "n_name")
    )


# --- O6: fixed-size batching, drop remainder (flax_model.py:235-236) -------


@query(
    "o6_fixed_batches",
    oracle="""
    WITH numbered AS (
      SELECT l_quantity,
             row_number() OVER (ORDER BY l_orderkey, l_linenumber,
                                l_quantity, l_extendedprice) - 1 AS rn
      FROM lineitem
    )
    SELECT CAST(rn // 16 AS BIGINT) AS batch_id,
           count(*) AS batch_size,
           round(sum(l_quantity), 4) AS batch_qty
    FROM numbered
    GROUP BY 1
    HAVING count(*) = 16
    """,
)
def o6_fixed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (l_orderkey, l_linenumber) is NOT unique in the fixtures — the summed
    # value columns join the ORDER BY so batch membership is
    # value-deterministic under duplicate keys (§4.3.2)
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    return (
        li.select("l_quantity", (F.row_number().over(w) - 1).alias("rn"))
        .groupBy((F.col("rn") / 16).cast("bigint").alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("batch_size"),
            F.round(F.sum("l_quantity"), 4).alias("batch_qty"),
        )
        .filter(F.col("batch_size") == 16)
    )


# --- O1: global total-order sort -------------------------------------------


@query(
    "o1_global_sort",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 500
    """,
)
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global total-order sort (range-partitioned exchange + per-
    partition sort; Spark turns sort+limit into TakeOrderedAndProject —
    a distributed top-k that never materializes the full sort). Unique
    tie-break key makes the limit deterministic (SURVEY §4.3.2)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(500)
    )


# --- O7: sampling (uniform + stratified) ------------------------------------


@query("o7_stratified_sample", oracle=None)
def o7_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded uniform + stratified sampling (sampleBy with per-class
    fractions) — the training-data curation primitive for class
    rebalancing. Bernoulli sampling distributes trivially (per-row coin
    flip, no shuffle); seed semantics are engine-specific → rows-only,
    with same-seed determinism and fraction tolerances asserted in
    tests/test_pipeline.py. Returns per-class sampled counts."""
    d = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.1}
    sampled = d.sampleBy("lang", fractions=fractions, seed=42)
    return (
        sampled.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


_STRATA = (("en", 5000), ("de", 2500), ("fr", 2500), ("es", 2500), ("zh", 1000))


@query(
    "o7_hash_stratified_sample",
    oracle=f"""
    WITH h AS (
      SELECT lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 10000 AS frac
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled
    FROM h
    WHERE frac < CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA)}
                 ELSE 0 END
    GROUP BY lang
    """,
)
def o7_hash_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-stratified sampling: keep a row iff
    md5(doc_id) mod 10000 falls under its class's per-mille threshold.
    Unlike seeded-RNG sampleBy (o7), the selection is REPRODUCIBLE across
    engines, re-runs, and cluster sizes — the property a training-data
    pipeline needs for lineage (re-running the curation job must pick the
    exact same rows).  Per-row narrow map + pushdown-able filter: no
    shuffle except the tiny count aggregate, identical cost profile at
    100 TB.  Fully mirrored in the DuckDB oracle via the cross-engine
    md5-prefix hash."""
    d = load_table(spark, sf_dir, "documents")
    frac = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"),
        F.lit(10000),
    )
    thresh = F.lit(0)
    for k, v in reversed(_STRATA):
        thresh = F.when(F.col("lang") == k, v).otherwise(thresh)
    return (
        d.filter(frac < thresh)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


_CLASS_CAP = 50


@query(
    "o11_class_capped_sample",
    oracle=f"""
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    WHERE rk <= {_CLASS_CAP}
    """,
)
def o11_class_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-capped downsampling: keep at most N documents per class,
    chosen by md5(doc_id) rank — the deterministic 'cap every
    source/language at N examples' rebalancing step of a training-data
    mixture.  Hash-rank selection is reproducible across engines,
    re-runs, and cluster sizes (same property as o7_hash_stratified_
    sample, but with an exact per-class quota instead of a rate).  The
    shuffle carries only (doc_id, lang, 32-byte digest); a skewed class
    distribution concentrates one reducer per class — for very hot
    classes the two-phase form (per-partition local top-N, then final
    top-N per class) bounds that, at the cost of a second pass."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _CLASS_CAP)
    )


# --- O9: TABLESAMPLE surface (SQL sampling syntax) ---------------------------


@query("o9_tablesample", oracle=None)
def o9_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLESAMPLE surface: `TABLESAMPLE (10 PERCENT) REPEATABLE (seed)`
    — Bernoulli row sampling pushed into the scan (SampleExec directly over
    the file source, no shuffle, trivially distributed).  Seed semantics
    are engine-specific (Spark's XORShiftRandom vs DuckDB's RNG) → rows-only;
    same-seed determinism, the binomial count bound, and subset-of-source
    are asserted in tests/test_pipeline.py.  Returns per-flag sampled
    counts so the result is small and stable-schema'd."""
    from big_data_project_spark.io import load_all

    load_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n_sampled
        FROM lineitem TABLESAMPLE (10 PERCENT) REPEATABLE (42)
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


# --- O8: scalable global row numbering (no single-task window) ---------------


def ranged_prefix_offsets(
    spark: SparkSession, df: DataFrame, sort_cols, measure=None
):
    """The two-pass global-order primitive: range-partition ``df`` on
    ``sort_cols``, then compute per partition the total of ``measure``
    (row count when None) over all EARLIER partitions. Returns
    ``(ranged_df_with_pid, offset_df[pid, offset])`` — join the broadcast
    offsets back and add them to any per-partition rank/cumsum to get the
    global value. Driver sees O(#partitions) scalars, never rows, which
    is what makes global row numbering / prefix sums viable at 100 TB
    (an un-partitioned window serializes the table through one task).

    persist() BEFORE the counts action: range boundaries come from a
    sampling pass, so the counts job and the final job must read the same
    materialized partitioning, not re-sample their own."""
    n_parts = spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *sort_cols)
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    agg = F.count(F.lit(1)) if measure is None else F.sum(measure)
    per = {
        r.pid: r.m
        for r in ranged.groupBy("pid").agg(agg.cast("long").alias("m")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(per):
        offsets[pid] = acc
        acc += per[pid]
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "pid int, offset long"
    )
    return ranged, offset_df


@query(
    "o8_global_row_number",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    """,
)
def o8_global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row_number over a total order WITHOUT the un-partitioned
    window's one-task bottleneck: range-partition on the sort key, rank
    within each partition in parallel, then add per-partition offsets
    from a driver-side prefix sum over the partition counts — O(#parts)
    driver data, never O(rows). This is how a 100 TB global ranking
    actually runs; `row_number() OVER (ORDER BY …)` un-partitioned would
    serialize the table through a single task. Correct for any range
    boundaries because the composite sort key is unique, so inter- and
    intra-partition order compose to the same total order the oracle
    uses."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranged, offset_df = ranged_prefix_offsets(
        spark, o, [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    )
    w = Window.partitionBy("pid").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        ranged.join(F.broadcast(offset_df), "pid")
        .withColumn("rn", F.row_number().over(w) + F.col("offset"))
        .select("o_orderkey", "rn")
    )


# --- O10: deterministic hash shuffle (reproducible training-data order) -----


@query(
    "o10_hash_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS shuffle_key
      FROM documents
    )
    SELECT doc_id, shuffle_key,
           row_number() OVER (ORDER BY shuffle_key, doc_id) AS pos
    FROM keyed
    """,
)
def o10_hash_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: sort by a
    seeded content hash md5(id || ':' || seed). Unlike RNG-seeded
    permutation (o5, engine-specific seed semantics → rows-only), the
    hash order is reproducible across engines, cluster sizes, and
    retries — the property a resumable 100 TB data-loader shuffle
    needs; bumping the seed literal re-deals the epoch. Positions come
    from the o8 two-pass range-partition prefix machinery, so there is
    no single-task global window anywhere in the plan."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = d.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))),
    )
    ranged, offset_df = ranged_prefix_offsets(
        spark, keyed, [F.col("shuffle_key"), F.col("doc_id")]
    )
    w = Window.partitionBy("pid").orderBy("shuffle_key", "doc_id")
    return (
        ranged.join(F.broadcast(offset_df), "pid")
        .withColumn("pos", F.row_number().over(w) + F.col("offset"))
        .select("doc_id", "shuffle_key", "pos")
    )


# --- O12: weighted sampling (deterministic, integer-exact) ------------------

_WS_EXPECT = 200  # expected sample size


@query(
    "o12_weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1000000 AS h
      FROM documents WHERE n_chars > 0
    ),
    tot AS (SELECT sum(n_chars) AS W FROM w)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight
    FROM w, tot
    WHERE h * W < {_WS_EXPECT} * n_chars * 1000000
    ORDER BY doc_id
    """,
)
def o12_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sampling with expected size k: row i is kept
    with probability k·wᵢ/ΣW (here wᵢ = n_chars — 'sample documents
    proportional to length', the token-budget-aware subsampling a
    pretraining mixture uses).  The inclusion test is the pure-INTEGER
    comparison  h·ΣW < k·wᵢ·10⁶  with h = md5(doc_id) mod 10⁶ — no
    float division, so selection is bit-reproducible across engines,
    re-runs, and cluster sizes (same lineage property as
    o7_hash_stratified_sample; an Efraimidis-Spirakis exp-key top-k
    would hinge on libm ulps at the boundary).  Both products run in
    decimal(38,0): h·ΣW reaches ~10²⁰ at a 100 TB corpus (ΣW ≈ 10¹⁴),
    past BIGINT under ANSI — DuckDB is safe only because its sum()
    already returns HUGEINT.

    Shape at 100 TB: ΣW is one scalar aggregate broadcast back; the
    filter is a narrow map over the scan.  No shuffle at all in the
    selection itself."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    tot = d.agg(F.sum("n_chars").cast("decimal(38,0)").alias("W"))
    h = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"),
        F.lit(1000000),
    ).cast("decimal(38,0)")
    # each factor cast BEFORE multiplying so the product itself runs in
    # decimal(38,0) — a bigint product only-then-cast would overflow first
    # at the 100 TB ΣW the docstring budgets for
    rhs = (
        F.lit(_WS_EXPECT).cast("decimal(38,0)")
        * F.col("n_chars").cast("decimal(38,0)")
        * F.lit(1000000).cast("decimal(38,0)")
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .filter(h * F.col("W") < rhs)
        .select("doc_id", F.col("n_chars").cast("bigint").alias("weight"))
        .orderBy("doc_id")
    )


# --- O13: curriculum interleave (difficulty deciles, round-robin) -----------

_CURR_TAKE = 200


def _curriculum_oracle() -> str:
    qs = "[" + ", ".join(str((i + 1) / 10.0) for i in range(9)) + "]"
    cases = " ".join(
        f"WHEN n_chars <= q[{i + 1}] THEN {i}" for i in range(9)
    )
    return f"""
    WITH th AS (SELECT quantile_cont(n_chars, {qs}) AS q FROM documents),
    b AS (
      SELECT doc_id, CASE {cases} ELSE 9 END AS bucket
      FROM documents, th
    ),
    r AS (
      SELECT doc_id, bucket,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM b
    )
    SELECT (rn - 1) * 10 + bucket AS pos, doc_id, bucket
    FROM r
    WHERE (rn - 1) * 10 + bucket < {_CURR_TAKE}
    ORDER BY pos
    """


@query("o13_curriculum_interleave", oracle=_curriculum_oracle())
def o13_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: documents are binned into 10 difficulty
    deciles (difficulty = n_chars) and the training order round-robins
    across deciles — every consecutive window of 10 examples spans the
    full difficulty spectrum (anti-curriculum clumping), with a
    deterministic md5 shuffle inside each decile.

    Shape at 100 TB: decile boundaries come from ONE exact-percentile
    aggregate collected as 9 scalars (the o8 two-pass trick — a global
    ntile/percent_rank window would serialize the corpus through one
    task); bucket assignment is then a narrow map, and the only shuffle
    is the per-bucket rank window (10 partitions of n/10 each).  The
    interleaved position is pure arithmetic on (rank, bucket) — no final
    global sort is needed to MATERIALIZE the order, only to display it."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    probs = ", ".join(str((i + 1) / 10.0) for i in range(9))
    th = d.agg(F.expr(f"percentile(n_chars, array({probs}))").alias("q")).collect()[0]["q"]
    bucket = F.lit(9)
    for i in reversed(range(9)):
        bucket = F.when(F.col("n_chars") <= th[i], i).otherwise(bucket)
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    b = d.select("doc_id", bucket.alias("bucket"))
    pos = (F.col("rn") - 1) * 10 + F.col("bucket")
    return (
        b.withColumn("rn", F.row_number().over(w))
        .select(pos.alias("pos"), "doc_id", "bucket")
        .filter(F.col("pos") < _CURR_TAKE)
        .orderBy("pos")
    )


# --- O14: deterministic Poisson bootstrap (eval-pipeline resampling) --------

_BOOT_REPS = 20
# Poisson(1) inverse-CDF thresholds scaled to the md5-mod-10^6 uniform:
# cumulative P(X<=k)*1e6 for k = 0..3; the >=4 tail (~1.9%) collapses to 4
_BOOT_CDF = (367879, 735758, 919698, 981011)


def _boot_weight_sql(h: str) -> str:
    cases = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_BOOT_CDF)
    )
    return f"CASE {cases} ELSE 4 END"


@query(
    "o14_poisson_bootstrap",
    oracle=f"""
    WITH w AS (
      SELECT d.doc_id, d.n_chars, r.b,
             {_boot_weight_sql("CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r.b AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000")} AS w
      FROM documents d
      CROSS JOIN (SELECT unnest(range({_BOOT_REPS})) AS b) r
    )
    SELECT CAST(b AS INT) AS replicate,
           CAST(sum(w) AS BIGINT) AS n_eff,
           round(sum(w * n_chars) / sum(w) + 1e-9, 4) AS est_mean_chars
    FROM w
    GROUP BY b
    """,
)
def o14_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al. 2012 — the resampling scheme
    that works in one streaming pass): each of {reps} replicates gives
    every row an i.i.d.-Poisson(1) multiplicity, and the per-replicate
    weighted means form the bootstrap distribution of the corpus-mean
    statistic (here mean n_chars) — the standard error bars an eval
    pipeline puts on quality metrics without materializing resamples.

    The multiplicity is DETERMINISTIC: u = md5(doc_id # replicate) mod
    10⁶ through the Poisson(1) inverse CDF (≥4 tail collapsed) — the
    same integer-hash reproducibility contract as o7/o12, so both
    engines and any cluster size agree bit-for-bit.  Shape at 100 TB:
    the replicate fan-out is a broadcast crossJoin (×{reps} narrow map
    rows, never stored), and the only exchange is the partial-aggregated
    {reps}-group sum — bootstrap CIs at corpus scale for one extra scan,
    no shuffles of data rows."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    reps = spark.range(_BOOT_REPS).select(F.col("id").cast("int").alias("b"))
    h = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#"),
                               F.col("b").cast("string"))), 1, 15),
            16, 10,
        ).cast("long"),
        F.lit(1000000),
    )
    w = F.lit(4)
    for k, t in reversed(list(enumerate(_BOOT_CDF))):
        w = F.when(h < t, F.lit(k)).otherwise(w)
    return (
        d.crossJoin(F.broadcast(reps))
        .select(F.col("b"), w.alias("w"), "n_chars")
        .groupBy(F.col("b").alias("replicate"))
        .agg(
            F.sum("w").cast("bigint").alias("n_eff"),
            F.round(
                F.sum(F.col("w") * F.col("n_chars")) / F.sum("w") + F.lit(1e-9), 4
            ).alias("est_mean_chars"),
        )
    )
