"""Deduplication operators (SURVEY.md §2.10: X6 exact, X7 MinHash-LSH,
SimHash, X11 shingles) over the ``documents`` table.

All hot paths are built-in JVM expressions (split / transform / xxhash64 /
array_min / explode) — no Python UDFs. The MinHash pipeline is the 100 TB
design: per-doc sketches are fixed-size (64 minhashes → 16 band keys), the
only wide shuffle is on band keys (bounded-size buckets), and candidate
verification touches only docs that share a bucket — never the n² pair
space. The DuckDB oracle CAN afford n² at sf0.01, which is exactly what
makes the LSH result checkable: the fixture's shingle-Jaccard distribution
is bimodal (planted near-dups ≥ 0.9, background < 0.1), so LSH recall at
θ=0.5 is ~1 and the candidate-verified output equals the exact answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_project_spark.io import load_table
from big_data_project_spark.pipeline.digest import md5_prefix_digest
from big_data_project_spark.registry import query

# MinHash parameters: 64 hash functions in 16 bands × 4 rows.
_M = 2_147_483_647  # 2^31 - 1 (prime); keeps a*h+b < 2^62 (no ANSI overflow)
_N_HASHES = 64
_BANDS = 16
_ROWS = 4
# Deterministic permutation constants (Knuth multiplicative steps, fixed —
# reproducible across runs/sessions, SURVEY §4.3.6).
_AS = [(2_654_435_761 * (i + 1)) % _M or 1 for i in range(_N_HASHES)]
_BS = [(40_503 * (i + 7)) % _M for i in range(_N_HASHES)]

JACCARD_THRESHOLD = 0.5


def _spread(df: DataFrame, key: str = "doc_id", already_wide: bool = False) -> DataFrame:
    """Spread a small-file scan across the cluster before a compute-bound
    stage. A single small parquet file arrives as ONE partition, which
    would serialize hashing/shingling on one core; only the raw rows move,
    once.  r18: the repartition is GUARDED — a real multi-file 100 TB
    corpus already yields thousands of scan splits, and there the frame
    is returned untouched, so at scale no corpus-payload exchange is added
    at all (guide §2.3: shuffle fewer bytes); the exchange only exists
    where it buys parallelism.

    r19: the guard probes the ANALYZED plan's size statistics instead of
    ``df.rdd.getNumPartitions()`` — the RDD probe compiled the physical
    plan and built the RDD DAG driver-side on every call (measured 759 ms
    cold at sf0.001 vs 37 ms for the stats read; on a deep 100 TB input
    plan the planning cost only grows), in the very helper meant to
    remove driver work.  Analysis is already done eagerly when the
    DataFrame is constructed, so reading its statistics plans nothing and
    runs no job.  Decision rule: the scan splits an input into
    ~``maxPartitionBytes`` partitions, so ``sizeInBytes >=
    defaultParallelism * maxPartitionBytes`` is exactly "the scan already
    carries at least cluster-width partitions" for the splittable-parquet
    inputs every caller feeds (tiny-file corpora where packing would beat
    the estimate still take the repartition, which only ever costs one
    pass of rows that were about to be rehashed anyway).

    ``already_wide=True`` is the caller-knowledge escape hatch (VERDICT
    r18 #5): a caller that has just repartitioned its frame to cluster
    width skips both the probe and the exchange."""
    if already_wide:
        return df
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    size = int(str(df._jdf.queryExecution().analyzed().stats().sizeInBytes()))
    max_pb = int(
        df.sparkSession._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
    )
    if size >= n_parts * max_pb:
        return df
    return df.repartition(n_parts, key)


def _tokens(col):
    return F.split(col, " ")


def _shingles(tok_col):
    """Distinct 3-word shingles: transform over a 0..n-3 index sequence —
    one pass, JVM-side (the reference's patch-extraction analog of
    windowing a sequence)."""
    n = F.size(tok_col)
    idx = F.sequence(F.lit(0), n - F.lit(3))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at(tok_col, i + 1),
                F.element_at(tok_col, i + 2),
                F.element_at(tok_col, i + 3),
            ),
        )
    )


def shingled_docs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None,
    docs_wide: bool = False,
) -> DataFrame:
    """Shingle the corpus — or, when ``docs`` is given (doc_id + text), an
    already-filtered subset (the curation funnel passes its gated pool so
    near-dup work scales with the survivors, not the raw corpus).
    ``docs_wide=True`` asserts the caller already spread ``docs`` to
    cluster width (see `_spread`)."""
    d = _spread(
        docs if docs is not None else load_table(spark, sf_dir, "documents"),
        already_wide=docs_wide,
    )
    return (
        d.filter(F.size(_tokens(F.col("text"))) >= 3)
        .select("doc_id", _shingles(_tokens(F.col("text"))).alias("shingles"))
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """64 minhashes per doc from xxhash64(shingle) under fixed affine
    permutations mod 2^31-1, folded in a SINGLE aggregate pass: for each
    shingle hash h, zip_with maps the 64 (a,b) constant arrays to
    (a·h+b) mod M and a second zip_with takes the element-wise min into
    the accumulator. Measured at sf0.1 against two alternatives (same
    output, bit-identical): 64 separate array_min(transform(...)) passes
    are ~3.7× slower (1.3s vs 0.35s — each interpreted pass re-walks the
    shingle array and allocates an intermediate), and an Arrow/numpy
    kernel is ~2× slower than even the 64-pass form (per-batch Arrow
    transfer of the hash arrays dominates). The cosine kernel in
    similarity.py lands the other way; measure, don't guess."""
    hashed = docs.select(
        "doc_id",
        F.transform(F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(_M))).alias(
            "shingle_hashes"
        ),
    )
    # ONE F.expr string instead of building the 64-wide constant arrays
    # and nested lambdas Column-by-Column: the Column form cost ~1500 py4j
    # round-trips (~0.2 s of the measured 0.74 s x7 plan-build wall) per
    # invocation; the string parses JVM-side in one call into the SAME
    # logical plan (same functions, same literals, same `%` remainder on
    # the same bigint promotion), so results are bit-identical.
    sig = F.expr(
        "aggregate(shingle_hashes, "
        f"cast(array({', '.join(str(_M) for _ in range(_N_HASHES))}) as array<bigint>), "
        "(acc, h) -> zip_with(acc, "
        f"zip_with(array({', '.join(map(str, _AS))}), array({', '.join(map(str, _BS))}), "
        f"(a, b) -> (a * h + b) % {_M}), "
        "(cur, cand) -> least(cur, cand)))"
    )
    return hashed.select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Band the signature, bucket-join within (band_id, band_hash)."""
    # one F.expr for the 16-struct band array (same plan as the Column
    # form, ~350 fewer py4j round-trips per build — see minhash_signatures)
    bands = F.expr(
        "array("
        + ", ".join(
            f"named_struct('band_id', {j}, "
            f"'band_hash', xxhash64(slice(sig, {j * _ROWS + 1}, {_ROWS})))"
            for j in range(_BANDS)
        )
        + ")"
    )
    # persist: both sides of the bucket self-join read this frame — without
    # it the (Python-stage) signature computation runs twice
    exploded = sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash")
    ).persist()
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def verified_neardup_pairs(spark: SparkSession, sf_dir: str,
                           threshold: float = JACCARD_THRESHOLD,
                           docs: DataFrame | None = None,
                           docs_wide: bool = False) -> DataFrame:
    """Candidates → exact shingle-Jaccard verification ≥ threshold.
    ``docs`` (doc_id + text) restricts the search to a subset — see
    shingled_docs (``docs_wide`` passes through)."""
    # persist: the shingle table feeds three branches (signatures + both
    # sides of the verify join); without it Spark re-tokenizes the corpus
    # three times. At 100 TB this is a materialized intermediate table.
    docs = shingled_docs(spark, sf_dir, docs=docs, docs_wide=docs_wide).persist()
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("double")
    jac = inter / union
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= threshold)
        .select(
            "doc_a", "doc_b", F.round(F.col("jaccard_raw") + 1e-9, 4).alias("jaccard")
        )
    )


def oracle_pairs_cte_body(source: str = "documents") -> str:
    """The exact n² Jaccard pair CTEs (toks → sh → pairs) over ``source``
    — composable after other CTEs (no leading WITH).  The curation funnel
    instantiates it over its gated pool; the x7 queries over the corpus."""
    return f"""toks AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM {source}
  WHERE len(string_split(text, ' ')) >= 3
), sh AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in generate_series(1, len(w) - 2)]) AS t
  FROM toks
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.t, b.t)) * 1.0
           / len(list_distinct(list_concat(a.t, b.t))) AS jac
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)"""


_ORACLE_PAIRS_CTE = "\nWITH " + oracle_pairs_cte_body("documents") + "\n"


# --- X6: exact dedup by content hash ---------------------------------------


@query(
    "x6_exact_dedup",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def x6_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-groupBy exact dedup with whitespace/case normalization; keeps
    the smallest doc_id deterministically (dropDuplicates keeps an
    arbitrary row — SURVEY §2.7 caveat). No _spread here: md5 is cheap
    enough that the extra exchange costs more than single-core hashing
    saves (measured 0.53s vs 0.38s at sf0.1); on a real multi-file corpus
    the scan is already parallel, and the groupBy exchange carries only
    (hash, doc_id) — the text never moves either way."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        d.withColumn("content_hash", F.md5(norm))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --- X7: MinHash-LSH fuzzy dedup -------------------------------------------


@query(
    "x7_minhash_neardup_pairs",
    oracle=_ORACLE_PAIRS_CTE + """
    SELECT doc_a, doc_b, round(jac + 1e-9, 4) AS jaccard
    FROM pairs WHERE jac >= 0.5
    """,
)
def x7_minhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) → LSH(16×4) candidates → exact Jaccard ≥ 0.5. The
    oracle computes the exact n² answer; bimodal fixture similarity makes
    LSH recall ≈ 1, so the outputs coincide (recall asserted separately in
    tests/test_pipeline.py)."""
    return verified_neardup_pairs(spark, sf_dir)


@query(
    "x7_minhash_dedup_keep",
    oracle=_ORACLE_PAIRS_CTE + """
    SELECT doc_id AS keep_doc_id
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM pairs WHERE jac >= 0.5)
    """,
)
def x7_minhash_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-by-id survivor set: drop any doc that has a near-dup with a
    smaller id (deterministic in both engines; a union-find pass over the
    pair graph is the iterative alternative for transitive clusters)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = verified_neardup_pairs(spark, sf_dir)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return d.join(losers, "doc_id", "left_anti").select(
        F.col("doc_id").alias("keep_doc_id")
    )


# --- X7c: exact n-gram Jaccard via inverted-index join ---------------------


@query(
    "x7_ngram_jaccard_pairs",
    oracle=_ORACLE_PAIRS_CTE + """
    SELECT doc_a, doc_b, round(jac + 1e-9, 4) AS jaccard
    FROM pairs WHERE jac >= 0.3
    """,
)
def x7_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard pairs (≥ 0.3) via an inverted-index join — the
    third fuzzy-dedup algorithm next to MinHash-LSH (probabilistic) and
    SimHash (bit sketch). Explode distinct shingles into postings, self-join
    on the shingle (only docs sharing ≥1 shingle ever meet — never the n²
    pair space), count common shingles per pair, and Jaccard follows from
    |A∩B| and the per-doc set sizes carried on the posting rows (no extra
    join back to the corpus).

    Jaccard here is a ratio of exact integers: IEEE division is correctly
    rounded, so both engines compute bit-identical values and the ≥ 0.3
    filter needs no float slack. At 100 TB the scale lever is a
    document-frequency cap on postings (drop stop-shingles before the
    join — they generate quadratic bucket blowup but no signal) plus
    prefix filtering; kept exact here so the oracle is the definition."""
    sized = shingled_docs(spark, sf_dir).select(
        "doc_id", "shingles", F.size("shingles").alias("n_sh")
    )
    postings = sized.select("doc_id", "n_sh", F.explode("shingles").alias("shingle"))
    a = postings.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"), "shingle"
    )
    b = postings.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"), "shingle"
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.min("n_a").alias("n_a"),
            F.min("n_b").alias("n_b"),
        )
    )
    jac = F.col("common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("common")
    )
    return (
        pairs.withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= 0.3)
        .select("doc_a", "doc_b", F.round(F.col("jaccard_raw") + 1e-9, 4).alias("jaccard"))
    )


# --- SimHash near-dup (cross-engine md5-based bit sketch) -------------------


@query(
    "x7_simhash_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), th AS (
      SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
      FROM toks
    ), votes AS (
      SELECT doc_id, i,
             sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i)
      GROUP BY doc_id, i
    ), sh AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    ), ch AS (
      SELECT doc_id, simhash,
             (simhash >> 0)  & 32767 AS c0, (simhash >> 15) & 32767 AS c1,
             (simhash >> 30) & 32767 AS c2, (simhash >> 45) & 32767 AS c3
      FROM sh
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM ch a JOIN ch b
      ON a.doc_id < b.doc_id
     AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
)
def x7_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash over md5-prefix token hashes; Hamming-≤6 candidate
    pairs via 4×15-bit chunk blocking, then exact Hamming filter.  The
    chunk-block condition guarantees recall only for hamming ≤ 3
    (pigeonhole over 4 chunks); it is mirrored VERBATIM in the oracle so
    both engines emit the identical candidate-then-filter set.  The token
    hash is the cross-engine md5 trick (hex prefix → 60-bit int): Spark
    ``conv(substr(md5(t),1,15),16,10)`` ≡ DuckDB
    ``CAST('0x'||substr(md5(t),1,15) AS BIGINT)`` — deterministic on both
    sides, unlike xxhash64 whose seed/impl is engine-specific."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    d = _spread(load_table(spark, sf_dir, "documents"))
    # token hashes JVM-side, bit-vote in numpy: signatures are computed in
    # a single NARROW stage — no shuffle at all until the chunk-blocking
    # join. (The pure-SQL alternative — explode + 60 conditional SUMs —
    # shuffles every token row and evaluates 120 branch expressions per
    # token.)
    hashed = d.select(
        "doc_id",
        F.transform(
            F.split("text", " "),
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
        ).alias("token_hashes"),
    )

    def simhash_batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(60, dtype=np.uint64)
        for pdf in pdf_iter:
            out = []
            for doc_id, hs in zip(pdf["doc_id"], pdf["token_hashes"]):
                h = np.asarray(hs, dtype=np.uint64)
                votes = (((h[:, None] >> shifts) & 1).astype(np.int32) * 2 - 1).sum(axis=0)
                sh = int(((votes > 0).astype(np.uint64) << shifts).sum())
                out.append({"doc_id": int(doc_id), "simhash": sh})
            yield pd.DataFrame(out)

    sim = hashed.mapInPandas(simhash_batch, schema="doc_id long, simhash long")
    # persist: the 4 chunk-blocking self-joins each reference this frame
    # twice — without it the whole token→simhash pipeline recomputes 8×.
    chunks = sim.select(
        "doc_id",
        "simhash",
        *[
            F.shiftright(F.col("simhash"), 15 * c).bitwiseAND(F.lit(0x7FFF)).alias(f"c{c}")
            for c in range(4)
        ],
    ).persist()
    pairs = None
    for c in range(4):
        a, b = chunks.alias("a"), chunks.alias("b")
        p = a.join(
            b,
            (F.col(f"a.c{c}") == F.col(f"b.c{c}")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
    )


# --- X11: n-gram / shingle generation (feeds X7) ---------------------------


@query(
    "x11_top_shingles",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ), sh AS (
      SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             for i in generate_series(1, len(w) - 2)]) AS shingle
      FROM toks
    )
    SELECT shingle, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM sh
    GROUP BY shingle
    ORDER BY n DESC, shingle
    LIMIT 50
    """,
)
def x11_top_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(load_table(spark, sf_dir, "documents"))
    toks = _tokens(F.col("text"))
    # non-distinct shingles here (frequency counting)
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(0), n - F.lit(3)),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    return (
        d.filter(F.size(toks) >= 3)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("n").desc(), "shingle")
        .limit(50)
    )


# --- transitive near-dup clusters (iterative min-label propagation) --------


def neardup_clusters(spark: SparkSession, sf_dir: str, max_iters: int = 10) -> DataFrame:
    """Connected components over the verified near-dup pair graph by
    min-label propagation: every doc starts labeled with its own id; each
    round, a doc adopts the minimum label in its neighborhood; stop at
    fixpoint. The reference has nothing iterative but the epoch loop
    (flax_model.py:349) — same driver-coordinated loop shape, with each
    step a pure DataFrame job. Pair graphs after LSH are tiny relative to
    the corpus, so labels.persist() per round is cheap; at 100 TB the
    pair set still fits comfortably (it is near-dup pairs, not all
    pairs)."""
    pairs = verified_neardup_pairs(spark, sf_dir).select("doc_a", "doc_b").persist()
    # undirected edges, both directions
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    members = edges.select(F.col("doc_a").alias("doc_id")).distinct()
    labels = members.withColumn("cluster", F.col("doc_id")).persist()
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("cluster").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.doc_a, "left")
            .select(
                "doc_id",
                F.least(F.col("cluster"), F.coalesce("nbr_min", F.col("cluster"))).alias(
                    "cluster"
                ),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels


# The unrolled propagation references the pair graph once per step —
# without MATERIALIZED DuckDB re-evaluates the n² Jaccard CTE each time
# (measured 93s → 10.5s at sf0.01).
_ORACLE_PAIRS_CTE_MAT = _ORACLE_PAIRS_CTE.replace(
    "sh AS (", "sh AS MATERIALIZED ("
).replace("pairs AS (", "pairs AS MATERIALIZED (")

_ORACLE_CLUSTERS = _ORACLE_PAIRS_CTE_MAT + """,
edges AS MATERIALIZED (
  SELECT doc_a AS u, doc_b AS v FROM pairs WHERE jac >= 0.5
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs WHERE jac >= 0.5
),
l0 AS (SELECT DISTINCT u AS doc_id, u AS cluster FROM edges),
l1 AS (SELECT l.doc_id, min(least(l.cluster, coalesce(n.cluster, l.cluster))) AS cluster
       FROM l0 l LEFT JOIN edges e ON e.u = l.doc_id LEFT JOIN l0 n ON n.doc_id = e.v
       GROUP BY l.doc_id),
l2 AS (SELECT l.doc_id, min(least(l.cluster, coalesce(n.cluster, l.cluster))) AS cluster
       FROM l1 l LEFT JOIN edges e ON e.u = l.doc_id LEFT JOIN l1 n ON n.doc_id = e.v
       GROUP BY l.doc_id),
l3 AS (SELECT l.doc_id, min(least(l.cluster, coalesce(n.cluster, l.cluster))) AS cluster
       FROM l2 l LEFT JOIN edges e ON e.u = l.doc_id LEFT JOIN l2 n ON n.doc_id = e.v
       GROUP BY l.doc_id),
l4 AS (SELECT l.doc_id, min(least(l.cluster, coalesce(n.cluster, l.cluster))) AS cluster
       FROM l3 l LEFT JOIN edges e ON e.u = l.doc_id LEFT JOIN l3 n ON n.doc_id = e.v
       GROUP BY l.doc_id),
l5 AS (SELECT l.doc_id, min(least(l.cluster, coalesce(n.cluster, l.cluster))) AS cluster
       FROM l4 l LEFT JOIN edges e ON e.u = l.doc_id LEFT JOIN l4 n ON n.doc_id = e.v
       GROUP BY l.doc_id)
SELECT doc_id, cluster FROM l5
"""


@query("x7_neardup_clusters", oracle=_ORACLE_CLUSTERS)
def x7_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment for every doc that has at least one near-dup
    (cluster id = smallest doc_id in the component). The oracle unrolls
    the same min-label propagation five steps over the exact n² pair
    graph — enough for any component of diameter ≤ 5 (fixture components
    are planted pairs/triples; the every-edge-within-one-cluster
    invariant in tests/test_pipeline.py guards the general case)."""
    return neardup_clusters(spark, sf_dir).orderBy("doc_id")


# --- X23: incremental dedup (new batch vs existing corpus) ------------------

_OLD_SOURCES = ("src0", "src1", "src2")


@query(
    "x23_incremental_dedup",
    oracle="""
    WITH norm AS (
      SELECT doc_id, source,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
      FROM documents
    ),
    newdocs AS (SELECT doc_id, h FROM norm WHERE source NOT IN ('src0','src1','src2')),
    olddocs AS (SELECT h FROM norm WHERE source IN ('src0','src1','src2')),
    exact_hit AS (SELECT DISTINCT n.doc_id FROM newdocs n JOIN olddocs o USING (h)),
    toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT doc_id, source,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in generate_series(1, len(w) - 2)]) AS t
      FROM toks
    ),
    near_hit AS (
      SELECT DISTINCT a.doc_id
      FROM sh a JOIN sh b
        ON a.source NOT IN ('src0','src1','src2')
       AND b.source IN ('src0','src1','src2')
       AND len(list_intersect(a.t, b.t)) * 1.0
             / len(list_distinct(list_concat(a.t, b.t))) >= 0.5
    )
    SELECT n.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
                WHEN nh.doc_id IS NOT NULL THEN 'near'
                ELSE 'accepted' END AS status
    FROM newdocs n
    LEFT JOIN exact_hit e ON n.doc_id = e.doc_id
    LEFT JOIN near_hit nh ON n.doc_id = nh.doc_id
    """,
)
def x23_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the operation a 100 TB corpus actually runs:
    a NEW batch (sources beyond src0-2) is admitted against the EXISTING
    corpus (src0-2) without re-deduplicating the whole corpus.  Each new
    doc is rejected 'exact' (normalized content hash already present),
    'near' (exact Jaccard >= 0.5 with any existing doc, discovered via
    the MinHash-LSH band join), else 'accepted'.  In production the
    existing side's signatures/band keys are a precomputed index that the
    new batch joins against — the plan shape here (band join restricted
    to new x old, verification only on candidates, hashes carried
    without text) is exactly that incremental form; only the signature
    recompute is fixture convenience.  Oracle recall argument is x7's:
    bimodal fixture similarity makes LSH recall ~ 1."""
    d = load_table(spark, sf_dir, "documents")
    is_old = F.col("source").isin(*_OLD_SOURCES)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    docs = d.select("doc_id", is_old.alias("is_old"), F.md5(norm).alias("h"))
    new = docs.filter(~F.col("is_old"))
    old = docs.filter(F.col("is_old"))
    exact_hits = new.join(old.select("h").distinct(), "h", "left_semi").select("doc_id")
    flags = docs.select("doc_id", "is_old")
    pairs = verified_neardup_pairs(spark, sf_dir)
    pa = pairs.join(
        flags.select(F.col("doc_id").alias("doc_a"), F.col("is_old").alias("old_a")),
        "doc_a",
    ).join(
        flags.select(F.col("doc_id").alias("doc_b"), F.col("is_old").alias("old_b")),
        "doc_b",
    )
    near_hits = (
        pa.filter(F.col("old_a") != F.col("old_b"))
        .select(
            F.when(F.col("old_a"), F.col("doc_b")).otherwise(F.col("doc_a")).alias("doc_id")
        )
        .distinct()
    )
    return (
        new.select("doc_id")
        .join(exact_hits.withColumn("e", F.lit(1)), "doc_id", "left")
        .join(near_hits.withColumn("nh", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("e").isNotNull(), F.lit("exact"))
            .when(F.col("nh").isNotNull(), F.lit("near"))
            .otherwise(F.lit("accepted"))
            .alias("status"),
        )
    )


# --- X32: corpus-wide line-level dedup (C4-style, keep first occurrence) ----

_SEG_WORDS = 8


@query(
    "x32_line_dedup",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    segs AS (
      SELECT doc_id, lang, i AS seg_idx,
             array_to_string(w[i*{_SEG_WORDS}+1 : i*{_SEG_WORDS}+{_SEG_WORDS}], ' ') AS seg
      FROM words,
           unnest(generate_series(0, CAST(ceil(len(w)/{_SEG_WORDS}.0) AS INT) - 1)) AS t(i)
    ),
    surv AS (
      SELECT doc_id, lang, seg_idx, seg,
             row_number() OVER (PARTITION BY md5(seg)
                                ORDER BY doc_id, seg_idx) AS rn
      FROM segs
    ),
    rebuilt AS (
      SELECT doc_id, lang,
             md5(string_agg(seg, ' ' ORDER BY seg_idx)) AS h
      FROM surv WHERE rn = 1
      GROUP BY doc_id, lang
    ),
    stats AS (
      SELECT lang,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_in,
             CAST(count(*) AS BIGINT) AS total_segs,
             CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS kept_segs,
             CAST(count(DISTINCT doc_id) FILTER (WHERE rn = 1) AS BIGINT) AS docs_out
      FROM surv GROUP BY lang
    ),
    digests AS (
      SELECT lang,
             CAST(sum(CAST('0x' || substr(h, 1, 15) AS BIGINT) % 1000000007)
                  AS BIGINT) AS digest
      FROM rebuilt GROUP BY lang
    )
    SELECT s.lang, s.n_docs_in, s.total_segs, s.kept_segs, s.docs_out, d.digest
    FROM stats s JOIN digests d USING (lang)
    """,
)
def x32_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line-level deduplication (the C4 / Lee-et-al. stage that
    doc-level dedup misses): every document is segmented, each distinct
    segment keeps its FIRST occurrence ((doc_id, seg_idx) order) across
    the whole corpus, and documents are rebuilt from their surviving
    segments.  The fixture text has no newline structure, so 'lines' are
    fixed 8-word windows — same machinery, declared granularity.

    Shape at 100 TB: ONE linear pipeline — explode is narrow, the dedup
    is one shuffle keyed on the segment hash (uniform keys, group size =
    the duplication factor), the rebuild one shuffle keyed on (doc_id,
    lang), the report one tiny per-lang aggregate.  Stats and rebuild
    digest come out of the SAME per-doc aggregate, so the corpus is
    scanned and window-shuffled exactly once (a stats+rebuilt branch pair
    would recompute both; plan-pinned in tests/test_plans.py).  Text
    transits each exchange once — the volume of a corpus repartition; a
    stats-only variant would carry (md5, doc_id, seg_idx) ≈ 40 B/row
    instead.  The digest (60-bit md5 prefix mod 1e9+7, summed per lang)
    proves both engines rebuilt byte-identical documents."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_segs = F.ceil(F.size(words) / F.lit(_SEG_WORDS)).cast("int")
    segs = d.select(
        "doc_id", "lang",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_segs - 1),
                lambda i: F.array_join(
                    F.slice(words, i * _SEG_WORDS + 1, _SEG_WORDS), " "
                ),
            )
        ).alias("seg_idx", "seg"),
    )
    w = Window.partitionBy(F.md5("seg")).orderBy("doc_id", "seg_idx")
    surv = segs.withColumn("rn", F.row_number().over(w))
    first = F.col("rn") == 1
    perdoc = surv.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(first, 1)).alias("kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.when(first, F.struct("seg_idx", "seg")))),
                    lambda p: p.getField("seg"),
                ),
                " ",
            )
        ).alias("h"),
    )
    return perdoc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_in"),
        F.sum("total").cast("bigint").alias("total_segs"),
        F.sum("kept").cast("bigint").alias("kept_segs"),
        F.count(F.when(F.col("kept") > 0, 1)).alias("docs_out"),
        F.sum(
            F.when(F.col("kept") > 0, md5_prefix_digest("h"))
        ).cast("bigint").alias("digest"),
    ).select("lang", "n_docs_in", "total_segs", "kept_segs", "docs_out", "digest")


# --- Scale demonstrator: MinHash throughput under corpus replication --------


def replicated_neardup_pairs(
    spark: SparkSession, sf_dir: str, factor: int = 4
) -> DataFrame:
    """The full MinHash pipeline over the corpus synthetically replicated
    ``factor``× with DISTINCT doc_ids — the throughput-scaling bench row
    (VERDICT r04 #7) behind the 100 TB claim: band-join work should grow
    ~linearly with corpus size, never quadratically.

    Replica r > 0 salts every token with an ``r{r}~`` prefix, so replicas
    share NO shingles with the original or each other — the replicated
    corpus is ``factor`` structurally independent copies, each reproducing
    the original's near-dup pair set under remapped ids.  (Replicating
    verbatim would make each doc an exact dup of its replicas: every LSH
    bucket gains factor× members and candidate pairs grow factor²× — that
    benches output explosion, not engine throughput.)  Expected output:
    ~factor × |pairs(original)| rows (exact up to LSH recall on
    borderline-jaccard pairs, whose band collisions vary per salting);
    bench tracks wall-time vs the 1× x7 row — measured at sf0.1: 4× data
    in 2.0× wall (1.39 s → 2.77 s), the fixed signature/band costs
    amortizing.  Not registry-registered: the oracle would be an n²
    self-join over factor× documents, and the scaling property itself is
    asserted cheaply in tests (pair count ≈ factor × base, ±5%)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    replicas = spark.range(factor).select(F.col("id").cast("int").alias("r"))
    # r19 (guide §2.5): spread BEFORE the salting transform, not after.
    # The replica ids are computable from (doc_id, r) alone, so the
    # spread exchange keys on them while carrying the UNSALTED text —
    # same bytes moved — and the per-token salting (real CPU at 4×
    # corpus) lands in the 32-way post-exchange stage next to shingling
    # instead of serializing on the single-partition scan (UI
    # attribution: a 1-task 584 ms stage ahead of everything else).
    pre = _spread(
        d.crossJoin(replicas).select(
            (F.col("doc_id") * factor + F.col("r")).alias("doc_id"), "r", "text"
        )
    )
    salted = pre.select(
        "doc_id",
        F.when(F.col("r") == 0, F.col("text"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(
                        F.lit("r"), F.col("r").cast("string"), F.lit("~"), w
                    ),
                ),
                " ",
            )
        )
        .alias("text"),
    )
    return verified_neardup_pairs(spark, sf_dir, docs=salted, docs_wide=True)


# --- X43: connected components via large-star/small-star --------------------
#
# The O(log n)-round connected-components algorithm (Kiveris et al.,
# "Connected Components in MapReduce and Beyond", SoCC 2014) — the scale
# path for near-dup cluster assignment.  `neardup_clusters` above is
# min-label propagation, which needs O(diameter) rounds: fine for the
# planted pair/triple fixture components, but a 100 TB crawl's dup graph
# contains long chains (A~B~C~... via sliding boilerplate) where diameter
# grows with corpus size.  Large-star/small-star contracts every component
# to a star around its minimum id in O(log n) alternations regardless of
# diameter, with each half-round a single groupBy-join over the edge list.


def _canonical_edges(e: DataFrame) -> DataFrame:
    """Undirected edge set as canonical (hi, lo) pairs, self-loops dropped."""
    return (
        e.select(
            F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: attach every strictly-larger neighbor to
    min(Γ(u) ∪ {u}).  Emitted as canonical pairs."""
    nbrs = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    mins = nbrs.groupBy("u").agg(F.min("v").alias("nbr_min"))
    m = F.least(F.col("u"), F.col("nbr_min"))
    return _canonical_edges(
        nbrs.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Process every edge at its larger endpoint u: attach u and all its
    smaller neighbors to the minimum of that set."""
    mins = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    withm = edges.join(mins, "hi")
    child_edges = withm.select(F.col("lo").alias("u"), F.col("m").alias("v"))
    center_edges = withm.select(F.col("hi").alias("u"), F.col("m").alias("v")).distinct()
    return _canonical_edges(child_edges.unionByName(center_edges))


def star_contract(pairs: DataFrame, max_rounds: int = 12) -> tuple[DataFrame, int]:
    """Alternate large-star / small-star over an undirected edge list
    (columns u, v; PRECONDITION: loop-free, u != v — ENFORCED below with
    a raise, because self-loop-only nodes would otherwise be silently
    absent from the output labels since r08's membership read-out, see
    the members note below) until the canonical
    edge set reaches fixpoint; return (labels, rounds_used).  At fixpoint the graph is a union of stars
    centered on component minima, so the label read-out is one
    projection: children label with their (unique) neighbor, centers
    with themselves.  Raises if max_rounds is exhausted before fixpoint —
    the read-out is only valid on a star graph, so returning would emit
    silently corrupted labels.  Superseded per-round checkpoint blocks
    are released by the ContextCleaner as each round's frame goes out of
    scope; only the final edge set stays referenced."""
    # localCheckpoint (not just persist) each round: persist truncates
    # recomputation but NOT lineage, so after k rounds Catalyst re-plans a
    # 2^k-deep nested tree (the exceptAll doubles it) — measured minutes of
    # pure planning by round 6 on a 64-node chain.  Checkpointing resets
    # the plan to a leaf every round; on a real cluster use
    # df.checkpoint() to reliable storage so executor loss can't orphan
    # the iteration.
    def _checksum(df: DataFrame) -> tuple:
        # order-insensitive fingerprint of the canonical edge SET: count +
        # xor + sum of per-edge hashes.  One narrow scan over the already-
        # checkpointed frame — exceptAll both ways would cost two full
        # shuffles per round just to detect convergence.
        h = F.xxhash64("hi", "lo")
        row = df.agg(
            F.count(F.lit(1)),
            F.expr("bit_xor(xxhash64(hi, lo))"),
            F.sum(h.cast("decimal(38,0)")),  # decimal: long sum overflows under ANSI
        ).collect()[0]
        return tuple(row)

    # Canonicalize WITHOUT the loop filter so the precondition is
    # checkable on the checkpointed leaf itself: checking `pairs` directly
    # would re-execute the caller's whole pair pipeline (for x43, LSH
    # generation) just to validate, where this costs one narrow isEmpty
    # job over the already-materialized leaf.
    raw = (
        pairs.select(
            F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if not raw.filter(F.col("hi") == F.col("lo")).isEmpty():
        raise ValueError(
            "star_contract requires a loop-free pair list (u != v): "
            "self-loop-only nodes cannot be labeled by the star read-out "
            "and would be silently dropped from the output"
        )
    edges = raw.filter(F.col("hi") != F.col("lo"))
    # Drop the extra name so `edges` is the only reference to the round-0
    # leaf and its blocks release on rebinding, as the docstring promises.
    del raw
    # Node membership from the CHECKPOINTED canonical leaf, not from
    # `pairs`: a pairs.unionByName(pairs.swap) would re-plan the caller's
    # whole pair pipeline as two more subtrees executed at the read-out
    # action — the eager checkpoint above is the only execution of it now
    # (r08 self-union finding).  Equivalent because canonicalization
    # preserves endpoints, and the loop guard above makes the loop-free
    # precondition fail loudly instead of corrupting the label set.
    # Eager checkpoint on members too: left lazy, it would keep a lineage
    # reference to the round-0 edge blocks until the read-out action,
    # defeating the docstring's promise that superseded per-round
    # checkpoints are released as the loop advances.  It is one tiny job
    # over node ids, off the already-materialized leaf.
    members = (
        edges.select(F.col("hi").alias("doc_id"))
        .unionByName(edges.select(F.col("lo").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sum = _checksum(edges)
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        rounds += 1
        nxt_sum = _checksum(nxt)
        edges = nxt
        if nxt_sum == prev_sum:
            converged = True
            break
        prev_sum = nxt_sum
    if not converged:
        raise RuntimeError(
            f"star contraction did not reach fixpoint in {max_rounds} rounds; "
            "the star read-out would produce corrupt labels — raise max_rounds "
            "(rounds needed grow with log2 of the largest component)"
        )
    # star read-out: every child appears as `hi` exactly once (star), the
    # center only as `lo`; centers label themselves
    child = edges.select(F.col("hi").alias("doc_id"), F.col("lo").alias("cluster"))
    labels = (
        members.join(child, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster", "doc_id").alias("cluster"))
    )
    return labels, rounds


def largestar_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment (component-min label) for every node of the
    verified near-dup pair graph via star contraction."""
    pairs = verified_neardup_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    labels, _ = star_contract(pairs)
    return labels


@query("x43_largestar_components", oracle=_ORACLE_CLUSTERS)
def x43_largestar_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as x7_neardup_clusters (and the same unrolled-
    propagation oracle — the two algorithms must agree exactly), computed
    by the O(log n)-round star-contraction algorithm instead of
    O(diameter)-round label propagation.  This is the variant that holds
    at 100 TB, where dup-graph diameter is unbounded."""
    return largestar_components(spark, sf_dir).orderBy("doc_id")


# --- Edit-distance verification of LSH candidates (prepped) -----------------

_LEV_CAP = 120
_LEV_SIM_THRESHOLD = 0.8


def levenshtein_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs verified by exact EDIT similarity: MinHash(64)
    → LSH(16×4) candidates → unit-cost Levenshtein over the first
    ``_LEV_CAP`` characters, keeping pairs with
    1 − lev/max(len) ≥ ``_LEV_SIM_THRESHOLD`` — the character-level
    verification stage a production dedup funnel runs where shingle
    Jaccard misreads (short texts, heavy token reordering, CJK-style
    unsegmented scripts), completing the signature → candidates →
    verify triad next to the Jaccard verifier
    (`verified_neardup_pairs`).  Reference analog: the corpus-curation
    shape, big_data_project/trainer/flax_model.py.

    Registered r10 as `x72_edit_distance_dedup` (with `_LEV_ORACLE`)
    once the window opened.

    Parity: the oracle computes the exact length-pruned n² answer; the
    fixture's bimodal similarity makes LSH recall 1 (asserted in
    tests/test_pipeline.py), so the outputs coincide — the established
    x7 pattern.  Everything compared across engines is integer
    (levenshtein, lengths) or a single integer division (rounded to 4);
    the length-window prune is PURE INTEGER — 5·|Δlen| ≤ max(len)
    encodes the necessary condition |Δlen| ≤ (1−0.8)·max(len) exactly,
    no float boundary — and is applied identically on both engines.

    Scale design: candidates come from the bounded LSH band join (never
    n² — the oracle's n² is oracle-only); the prefix cap bounds each
    Levenshtein cell count by _LEV_CAP² regardless of document length
    (the standard production cap — extend-on-match only for survivors);
    the integer length prune runs BEFORE the quadratic Levenshtein so
    obviously-far pairs never pay it; the verify join moves only capped
    prefixes, never full texts."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 1)
    # persisted: BOTH verify-join sides read this frame (the
    # verified_neardup_pairs convention) — without the cache the
    # documents scan + substring projection plans twice
    dd = (
        docs.select("doc_id", F.substring("text", 1, _LEV_CAP).alias("t"))
        .withColumn("ln", F.length("t"))
        .persist()
    )
    pairs = lsh_candidate_pairs(minhash_signatures(shingled_docs(spark, sf_dir)))
    a = dd.select(
        F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"), F.col("ln").alias("la")
    )
    b = dd.select(
        F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"), F.col("ln").alias("lb")
    )
    mx = F.greatest("la", "lb")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.lit(5) * F.abs(F.col("la") - F.col("lb")) <= mx)
        .withColumn("lev", F.levenshtein("ta", "tb"))
        .withColumn("mx", mx)
        .filter(F.lit(1.0) - F.col("lev") / F.col("mx") >= F.lit(_LEV_SIM_THRESHOLD))
        .select(
            "doc_a",
            "doc_b",
            F.col("lev").cast("bigint").alias("edit_distance"),
            F.round(F.lit(1.0) - F.col("lev") / F.col("mx") + F.lit(1e-9), 4).alias(
                "edit_sim"
            ),
        )
    )


_LEV_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, substr(text, 1, {_LEV_CAP}) AS t,
             length(substr(text, 1, {_LEV_CAP})) AS ln
      FROM documents WHERE length(text) >= 1),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             levenshtein(a.t, b.t) AS lev, greatest(a.ln, b.ln) AS mx
      FROM d a JOIN d b ON a.doc_id < b.doc_id
       AND 5 * abs(a.ln - b.ln) <= greatest(a.ln, b.ln))
    SELECT doc_a, doc_b, CAST(lev AS BIGINT) AS edit_distance,
           round(1.0 - lev * 1.0 / mx + 1e-9, 4) AS edit_sim
    FROM cand
    WHERE 1.0 - lev * 1.0 / mx >= {_LEV_SIM_THRESHOLD}
"""

query("x72_edit_distance_dedup", oracle=_LEV_ORACLE)(levenshtein_verified_pairs)


# --- Winnowing fingerprints (prepped) ---------------------------------------

_WIN_W = 4  # winnowing window (in k-grams); k itself is the shingle K = 3
_WIN_SHARED_MIN = 10
_WIN_MAX_DF = 100


def _positional_kgram_hashes(toks):
    """Hash stream of every POSITIONAL 3-gram of a token-array column
    under the md5-prefix digest contract (pipeline/digest.py) — the
    shared front half of winnowing (window minima over this stream) and
    CDC (cutpoints where this stream is 0 mod D).  Positional, NOT the
    distinct `_shingles` set: both consumers depend on stream order."""
    n = F.size(toks)
    kg = F.transform(
        F.sequence(F.lit(0), n - F.lit(3)),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    return F.transform(kg, lambda g: md5_prefix_digest(F.md5(g)))


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al. 2003 — the MOSS
    algorithm): per document, hash every POSITIONAL 3-gram (the
    md5-prefix digest contract, pipeline/digest.py), slide a window of
    ``_WIN_W`` consecutive k-gram hashes, keep each window's minimum,
    and emit the DISTINCT selected values as (doc_id, fp) rows.
    Winnowing's guarantee: any shared substring of at least
    w + k − 1 = 6 tokens yields at least one shared fingerprint, while
    only ~2/(w+1) of all k-grams are ever selected — the
    position-robust, density-bounded sketch that whole-doc hashing
    (x10) and random-permutation MinHash (x7) both aren't.  Documents
    with fewer than w + k − 1 tokens have no full window and are
    excluded (the classic boundary; fixture docs are all ≥ 25 tokens).
    Selection is one narrow per-row array pass (sequence → slice →
    array_min → array_distinct), no shuffle at all; only the ~n/w
    selected (doc_id, fp) int pairs ever leave the row."""
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    hs = _positional_kgram_hashes(toks)
    sel = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("h") - F.lit(_WIN_W - 1)),
            lambda i: F.array_min(F.slice(F.col("h"), i, _WIN_W)),
        )
    )
    return (
        docs.filter(n >= F.lit(3 + _WIN_W - 1))
        .select("doc_id", hs.alias("h"))
        .select("doc_id", F.explode(sel).alias("fp"))
    )


def winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 document pairs by shared winnowing fingerprints (≥
    ``_WIN_SHARED_MIN``, ties by ids), with each side's total
    fingerprint count — the MOSS-style containment/plagiarism report:
    robust to insertions and reordering that break whole-doc hashes,
    cheaper and guarantee-backed where MinHash is probabilistic.
    All-integer output.  Reference analog: the corpus-curation shape,
    big_data_project/trainer/flax_model.py.

    Registered r10 as `x74_winnowing_fingerprints` (with
    `_WINNOW_ORACLE`) once the window opened.

    Scale design: selection is shuffle-free (see winnow_fingerprints)
    and winnowing keeps only ~2/(w+1) of k-grams, so the postings
    exchange carries a density-bounded (doc_id, fp) int stream; the
    pair join is postings-bucketed on fp — bucket sizes are fingerprint
    document frequencies, and fingerprints with df > ``_WIN_MAX_DF``
    are dropped BEFORE the join (the BM25 term-filter pattern — at
    100 TB boilerplate fingerprints are exactly the hot keys; the cap
    never engages on the fixture, max df 9, and the synthetic-hot-key
    test pins that it works); per-doc totals count the PRE-cap
    fingerprint set (the doc's true sketch cardinality).  The top-20
    is a TakeOrderedAndProject.  The fingerprint frame is persisted —
    it feeds the df census, both join sides, and the per-doc totals."""
    fp = winnow_fingerprints(load_table(spark, sf_dir, "documents")).persist()
    totals = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    keep = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _WIN_MAX_DF)
        .select("fp")
    )
    cold = fp.join(keep, "fp", "left_semi")
    a, b = cold.alias("a"), cold.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fp"))
        .filter(F.col("shared_fp") >= _WIN_SHARED_MIN)
    )
    ta = totals.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("fp_a"))
    tb = totals.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("fp_b"))
    return (
        shared.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", "shared_fp", "fp_a", "fp_b")
        .orderBy(F.col("shared_fp").desc(), "doc_a", "doc_b")
        .limit(20)
    )


_WINNOW_ORACLE = f"""
    WITH toksw AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= {3 + _WIN_W - 1}),
    kh AS (
      SELECT doc_id,
             [CAST('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
                                  1, 15) AS BIGINT) % 1000000007
              for i in generate_series(1, len(w) - 2)] AS h
      FROM toksw),
    fp AS (
      SELECT doc_id,
             unnest(list_distinct(
               [list_min(list_slice(h, i, i + {_WIN_W - 1}))
                for i in generate_series(1, len(h) - {_WIN_W - 1})])) AS fp
      FROM kh),
    totals AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp FROM fp GROUP BY doc_id),
    keep AS (
      SELECT fp FROM fp GROUP BY fp HAVING count(*) <= {_WIN_MAX_DF}),
    cold AS (
      SELECT f.doc_id, f.fp FROM fp f JOIN keep k ON k.fp = f.fp),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS shared_fp
      FROM cold a JOIN cold b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= {_WIN_SHARED_MIN})
    SELECT s.doc_a, s.doc_b, s.shared_fp, ta.n_fp AS fp_a, tb.n_fp AS fp_b
    FROM shared s
    JOIN totals ta ON ta.doc_id = s.doc_a
    JOIN totals tb ON tb.doc_id = s.doc_b
    ORDER BY s.shared_fp DESC, s.doc_a, s.doc_b
    LIMIT 20
"""

query("x74_winnowing_fingerprints", oracle=_WINNOW_ORACLE)(winnow_overlap_pairs)


# --- Content-defined chunking dedup census (prepped) -------------------------

_CDC_D = 8  # cut when kgram_hash % D == 0 → expected chunk length ~D tokens
_CDC_MIN_REPORT = 4  # census reports chunks of at least this many tokens


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """Content-defined chunking (the LBFS/rsync mechanism): hash every
    positional 3-gram (the md5-prefix digest contract), cut AFTER
    token i+1 wherever the k-gram hash starting at token i is ≡ 0
    (mod ``_CDC_D``), and emit one (doc_id, chunk, tok_len) row per
    variable-size chunk.  Because boundaries depend only on LOCAL
    content, an insertion re-chunks only its neighbourhood and every
    chunk at distance ≥ k re-aligns — the boundary-shift robustness
    fixed-size blocking lacks (pinned by the prepended-token test);
    the storage-dedup primitive, and in an LLM pipeline the long-
    document sub-chunk deduper.  Documents shorter than k = 3 tokens
    have no k-gram and form a single chunk.  Production CDC adds
    min/max chunk bounds to box the geometric length distribution;
    the unbounded classic keeps the oracle exact here.  One narrow
    per-row array pass (filter → boundary concat → slice per segment),
    no shuffle; only (doc_id, chunk-hash-sized) rows leave the row
    after the caller hashes the chunk text away."""
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    hs = _positional_kgram_hashes(toks)
    short = docs.filter(n < 3).select(
        "doc_id", F.col("text").alias("chunk"), n.alias("tok_len")
    )
    cuts = F.filter(
        F.sequence(F.lit(1), F.size("h")),
        lambda i: F.element_at(F.col("h"), i) % _CDC_D == 0,
    )
    bpos = F.concat(
        F.array(F.lit(1)),
        F.transform(cuts, lambda i: i + 1),
        F.array(F.size("w") + 1),
    )
    # adjacent (start, next_start) pairs via two slices zip_with'd —
    # NOT element_at(bpos, j)/element_at(bpos, j+1) inside a transform
    # over sequence: a lambda-embedded outer expression re-evaluates
    # per element, so the O(n)-to-build bpos would be recomputed per
    # CHUNK, O(n²/D) per doc (the x88 norm-fold lesson, r12).  The two
    # slice arguments evaluate bpos once per row each; values are
    # identical (chunk j spans [bpos[j], bpos[j+1])).
    seg = F.zip_with(
        F.slice(bpos, 1, F.size(bpos) - 1),
        F.slice(bpos, 2, F.size(bpos) - 1),
        lambda s, t: F.struct(
            F.concat_ws(" ", F.slice(F.col("w"), s, t - s)).alias("chunk"),
            (t - s).alias("tok_len"),
        ),
    )
    long = (
        docs.filter(n >= 3)
        .select("doc_id", toks.alias("w"), hs.alias("h"))
        .select("doc_id", F.explode(seg).alias("s"))
        .select("doc_id", F.col("s.chunk").alias("chunk"),
                F.col("s.tok_len").cast("int").alias("tok_len"))
    )
    return long.unionByName(
        short.select("doc_id", "chunk", F.col("tok_len").cast("int").alias("tok_len"))
    )


def cdc_dedup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most duplicated CDC chunks corpus-wide (by occurrence
    count, ties by chunk digest) with distinct-document reach and token
    length — the storage-dedup savings report: how much of the corpus
    is REDUNDANT at sub-document granularity, and which segments
    (templates, boilerplate, copied passages) carry the redundancy.
    Reported chunks are bounded below at ``_CDC_MIN_REPORT`` tokens —
    the reporting face of production CDC's min-chunk bound (the
    fixture's 31-word vocabulary makes single-token chunks trivially
    duplicated; ≥ 4-token duplicates are real shared segments).
    Chunks are compared by their md5-prefix digest, never by text,
    after the per-row chunking pass.  All-integer output.  Reference
    analog: the corpus-curation shape,
    big_data_project/trainer/flax_model.py.

    Registered r10 as `x75_cdc_chunk_dedup` (with `_CDC_ORACLE`)
    once the window opened.

    Scale design: chunking is shuffle-free (see cdc_chunks) and the
    census exchange carries (digest, int) pairs that partial-aggregate
    map-side — chunk TEXT is hashed away before the exchange, so the
    shuffle moves ~n_tokens/D fixed-width rows regardless of document
    length; the top-20 is a TakeOrderedAndProject.  min(tok_len) in
    the aggregate is pure defense — equal digests imply equal chunks
    (mod md5-prefix collisions), so min = the chunk's length."""
    ch = cdc_chunks(load_table(spark, sf_dir, "documents"))
    return (
        ch.filter(F.col("tok_len") >= _CDC_MIN_REPORT)
        .select(
            "doc_id",
            md5_prefix_digest(F.md5("chunk")).alias("chash"),
            "tok_len",
        )
        .groupBy("chash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("tok_len").alias("tok_len"),
        )
        .orderBy(F.col("n_occurrences").desc(), "chash")
        .limit(20)
    )


_CDC_ORACLE = f"""
    WITH toksc AS (
      SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
    kh AS (
      SELECT doc_id, w,
             [CAST('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
                                  1, 15) AS BIGINT) % 1000000007
              for i in generate_series(1, len(w) - 2)] AS h
      FROM toksc WHERE len(w) >= 3),
    bp AS (
      SELECT doc_id, w,
             list_concat(list_concat([1],
               [i + 1 for i in generate_series(1, len(h)) if h[i] % {_CDC_D} = 0]),
               [len(w) + 1]) AS b
      FROM kh),
    segs AS (
      SELECT doc_id,
             unnest([{{'chunk': array_to_string(list_slice(w, b[j], b[j+1] - 1), ' '),
                       'tok_len': b[j+1] - b[j]}}
                     for j in generate_series(1, len(b) - 1)]) AS s
      FROM bp),
    chunks AS (
      SELECT doc_id, s.chunk AS chunk, s.tok_len AS tok_len FROM segs
      UNION ALL
      SELECT doc_id, text AS chunk, len(w) AS tok_len
      FROM toksc WHERE len(w) < 3)
    SELECT CAST('0x' || substr(md5(chunk), 1, 15) AS BIGINT) % 1000000007
             AS chash,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(tok_len) AS tok_len
    FROM chunks
    WHERE tok_len >= {_CDC_MIN_REPORT}
    GROUP BY 1
    ORDER BY n_occurrences DESC, chash
    LIMIT 20
"""

query("x75_cdc_chunk_dedup", oracle=_CDC_ORACLE)(cdc_dedup_census)
