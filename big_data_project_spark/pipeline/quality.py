"""Corpus-quality and decontamination operators over `documents`
(SURVEY §2.10 north-star family, extending X9/X11: the screening passes a
training-data pipeline runs between raw ingest and dedup).

Reference grounding: the reference's data pipeline filters invalid inputs
before training (validity mask + impute, trainer/flax_model.py:70-95) and
holds out an evaluation split the training set must not leak into
(sequential 90/10 split, flax_model.py:125-131) [REF-analog]; the
text-corpus forms here are mandated by the driver's LLM-pipeline north
star [DRV].

Scale notes (100 TB):
- repetition stats explode to (doc, token) then aggregate twice on the
  same doc_id key — the first groupBy partial-aggregates map-side, so the
  shuffle carries ~|vocab| rows per doc, not |tokens|.
- vocabulary document frequency is ~|vocab| rows — broadcast back to the
  corpus, never a shuffle join against the fact.
- contamination joins the training corpus's distinct shingles against the
  EVAL set's shingles: the eval side is the small side by construction
  (benchmarks are MBs, corpora are TBs) — broadcast it; the train side
  never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

_NGRAM = 8  # contamination shingle width: 8-gram overlap ⇒ near-verbatim leak


def _tokens(col):
    return F.split(col, " ")


def _shingles(toks, n: int):
    """All n-token shingles of a token array as space-joined strings."""
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(k + 1)) for k in range(n)]
        ),
    )


# --- X9g: repetition / diversity stats per document -------------------------


@query(
    "x9_repetition_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS n FROM tok GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(count(*) / CAST(sum(n) AS DOUBLE) + 1e-9, 4) AS distinct_ratio,
           round(max(n) / CAST(sum(n) AS DOUBLE) + 1e-9, 4) AS top_token_ratio
    FROM tf
    GROUP BY doc_id
    """,
)
def x9_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity quality signal: distinct-token ratio and the mass
    of the single most repeated token. Low distinct_ratio / high
    top_token_ratio flags degenerate repetition (boilerplate, keyword
    stuffing) — a standard pre-training quality gate alongside
    x9_quality_scores' length/stopword checks."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n")
    return tf.groupBy("doc_id").agg(
        total.cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.count(F.lit(1)) / total.cast("double") + F.lit(1e-9), 4).alias(
            "distinct_ratio"
        ),
        F.round(F.max("n") / total.cast("double") + F.lit(1e-9), 4).alias(
            "top_token_ratio"
        ),
    )


# --- X9h: vocabulary pruning by document-frequency band ---------------------


@query(
    "x9_vocab_prune",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), dfreq AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
    )
    SELECT t.doc_id,
           CAST(count(*) FILTER (WHERE d.df BETWEEN 100 AND 350) AS BIGINT)
             AS n_kept,
           CAST(count(*) FILTER (WHERE d.df < 100 OR d.df > 350) AS BIGINT)
             AS n_dropped
    FROM tok t JOIN dfreq d ON t.token = d.token
    GROUP BY t.doc_id
    """,
)
def x9_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-learned vocabulary filter: tokens are scored by document
    frequency and a doc keeps only tokens inside a df band — too-rare
    tokens are noise/typos, too-common ones are the corpus's own
    stopwords (learned, not from a fixed list). Two passes: the df table
    is ~|vocab| rows and broadcasts back onto the token stream."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    keep = F.col("df").between(100, 350)
    return (
        tok.join(F.broadcast(dfreq), "token")
        .groupBy("doc_id")
        .agg(
            F.sum(keep.cast("long")).alias("n_kept"),
            F.sum((~keep).cast("long")).alias("n_dropped"),
        )
    )


# --- X12: benchmark-contamination screening ---------------------------------


def _shingle_sets(spark: SparkSession, sf_dir: str):
    """(train_shingles, eval_shingles): DISTINCT (doc_id, 8-gram) rows on
    either side of the eval split (source = 'src0' stands in for the
    benchmark set)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    sh = (
        d.filter(F.size(toks) >= _NGRAM)
        .select("doc_id", "source", F.explode(_shingles(toks, _NGRAM)).alias("g"))
        .distinct()
    )
    return (
        sh.filter(F.col("source") != "src0").drop("source"),
        sh.filter(F.col("source") == "src0").drop("source"),
    )


@query(
    "x12_contamination_hits",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= {_NGRAM}
    ), sh AS (
      SELECT DISTINCT doc_id, source,
             unnest([array_to_string(w[i:i+{_NGRAM - 1}], ' ')
                     for i in generate_series(1, len(w) - {_NGRAM - 1})]) AS g
      FROM toks
    )
    SELECT t.doc_id,
           CAST(count(DISTINCT t.g) AS BIGINT) AS n_shared_shingles,
           CAST(count(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs
    FROM (SELECT doc_id, g FROM sh WHERE source <> 'src0') t
    JOIN (SELECT doc_id, g FROM sh WHERE source = 'src0') e ON t.g = e.g
    GROUP BY t.doc_id
    """,
)
def x12_contamination_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination report: training docs sharing ≥1 verbatim
    8-gram with the eval split, with how many shingles leak and into how
    many eval docs. The eval side broadcasts (benchmarks ≪ corpus); the
    train side's shingle stream is filtered by the hash join probe
    without ever shuffling — the decontamination analog of the
    reference's train/test split hygiene (flax_model.py:125-131)."""
    train, ev = _shingle_sets(spark, sf_dir)
    return (
        train.join(F.broadcast(ev.withColumnRenamed("doc_id", "eval_doc")), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_shared_shingles"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
    )


@query(
    "x12_decontaminated_keep",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, source,
             unnest([array_to_string(w[i:i+{_NGRAM - 1}], ' ')
                     for i in generate_series(1, len(w) - {_NGRAM - 1})]) AS g
      FROM toks WHERE len(w) >= {_NGRAM}
    )
    SELECT d.doc_id FROM documents d
    WHERE d.source <> 'src0' AND NOT EXISTS (
      SELECT 1
      FROM (SELECT doc_id, g FROM sh WHERE source <> 'src0') t
      JOIN (SELECT g FROM sh WHERE source = 'src0') e ON t.g = e.g
      WHERE t.doc_id = d.doc_id
    )
    """,
)
def x12_decontaminated_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination filter itself: training doc_ids with ZERO
    8-gram overlap with the eval split (complement of
    x12_contamination_hits, so hits ∪ keep = all training docs — the
    partition invariant a curation funnel needs before training)."""
    train, ev = _shingle_sets(spark, sf_dir)
    contaminated = train.join(F.broadcast(ev.select("g")), "g").select("doc_id")
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("source") != "src0")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id")
    )


# --- X17: training-data mixture weighting (fractional epochs per source) ----


@query(
    "x17_data_mixture",
    oracle="""
    WITH weighted AS (
      SELECT doc_id, source,
             CASE WHEN source = 'src0' THEN 0.0
                  WHEN source IN ('src1', 'src2') THEN 2.5
                  ELSE 1.0 END AS w,
             (doc_id * 2654435761) % 4294967296 AS h
      FROM documents
    ), counted AS (
      SELECT doc_id, source,
             CAST(floor(w) + CASE WHEN h / 4294967296.0 < (w - floor(w))
                                  THEN 1 ELSE 0 END AS INT) AS n_copies
      FROM weighted
    )
    SELECT doc_id, source,
           CAST(unnest(generate_series(1, n_copies)) AS INT) AS copy_id
    FROM counted WHERE n_copies > 0
    """,
)
def x17_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting — the 'epochs per source' knob of a pre-training
    data recipe: each source carries a weight w; every doc is emitted
    floor(w) times plus one more with probability frac(w), decided by a
    DETERMINISTIC per-doc hash fraction (Knuth multiplicative, portable
    arithmetic — no RNG), so the materialized mixture is reproducible
    and oracle-checkable. src0 (the eval split) gets w=0 and vanishes;
    upweighted sources repeat. At 100 TB this is a narrow fan-out (no
    shuffle): the mixture is a view you re-materialize per recipe, and
    the expected output size is Σ w_s·|s| by linearity."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        F.when(F.col("source") == "src0", F.lit(0.0))
        .when(F.col("source").isin("src1", "src2"), F.lit(2.5))
        .otherwise(F.lit(1.0))
    )
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    n_copies = (
        F.floor(w) + F.when(h / F.lit(4294967296.0) < (w - F.floor(w)), 1).otherwise(0)
    ).cast("int")
    return (
        d.select("doc_id", "source", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_id"),
        )
    )


# --- X21: leakage-safe group split (split by SOURCE, not by document) -------

_SPLIT_TRAIN_FRAC = 0.8


def _source_hash_sql() -> str:
    """Portable deterministic string hash: ascii-weighted sum of the first
    8 hex chars of md5(source) — identical arithmetic in both engines
    (neither shares a native string→int hash with the other)."""
    terms = " + ".join(
        f"CAST(ascii(substr(md5(source), {k + 1}, 1)) AS BIGINT) * {31 ** k}"
        for k in range(8)
    )
    return f"({terms})"


def _source_hash_col():
    hx = F.md5(F.col("source"))
    h = F.lit(0).cast("long")
    for k in range(8):
        h = h + F.ascii(F.substring(hx, k + 1, 1)).cast("long") * F.lit(31 ** k).cast("long")
    return h


@query(
    "x21_group_split",
    oracle=f"""
    WITH tagged AS (
      SELECT source,
             CASE WHEN ({_source_hash_sql()} % 1000) / 1000.0 < {_SPLIT_TRAIN_FRAC}
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    )
    SELECT source, split, count(*) AS n_docs
    FROM tagged
    GROUP BY source, split
    """,
)
def x21_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: the split is a deterministic hash of
    the GROUP key (source), not the document id, so all documents from
    one source land in the same split — near-duplicates and templated
    text within a source can never straddle the boundary and leak eval
    content into training.  Complements o3 (sequential split) and x17
    (mixture weighting).  Pure map + one groupBy; the assignment needs
    no coordination, so resharding or re-running at 100 TB reproduces
    the identical split."""
    d = load_table(spark, sf_dir, "documents")
    frac = (_source_hash_col() % F.lit(1000)) / F.lit(1000.0)
    return (
        d.select(
            "source",
            F.when(frac < _SPLIT_TRAIN_FRAC, F.lit("train")).otherwise(F.lit("val")).alias("split"),
        )
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- X25: token-budget corpus selection (data selection under a budget) -----

_BUDGET_FRAC = 0.5  # select the best docs until 50% of corpus tokens are used


@query(
    "x25_token_budget_select",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             round(n_chars * 1.0 / len(string_split(text, ' ')) + 1e-9, 6)
               AS score
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens, score,
             sum(n_tokens) OVER (ORDER BY score DESC, doc_id) AS cum_tokens
      FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           score,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c
    WHERE cum_tokens <= (SELECT CAST(floor({_BUDGET_FRAC} * sum(n_tokens)) AS BIGINT)
                         FROM t)
    """,
)
def x25_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection under a token budget — the curation decision a
    pretraining run actually makes: rank documents by a quality score
    (here mean word length, a stand-in for any model- or heuristic-based
    scorer) and keep the best until the cumulative token count reaches a
    fraction of the corpus. The global cumulative sum uses the o8
    two-pass primitive (range-partition on the rank key, per-partition
    cumsum, driver-side prefix over per-partition token TOTALS — O(#parts)
    scalars), so there is no single-task window; at 100 TB this costs one
    range exchange, same as any global sort. The budget itself is one
    tiny aggregate broadcast as a scalar."""
    from pyspark.sql.window import Window

    from big_data_project_spark.operators.sorts import ranged_prefix_offsets

    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    t = d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(F.col("n_chars") / n_tok + F.lit(1e-9), 6).alias("score"),
    )
    ranged, offset_df = ranged_prefix_offsets(
        spark, t, [F.col("score").desc(), F.col("doc_id")], measure="n_tokens"
    )
    budget = int(_BUDGET_FRAC * ranged.agg(F.sum("n_tokens")).collect()[0][0])
    w = (
        Window.partitionBy("pid")
        .orderBy(F.col("score").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(F.broadcast(offset_df), "pid")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w) + F.col("offset"))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "n_tokens", "score", "cum_tokens")
    )


# --- X27: LM-score quality filter (unigram logprob proxy) -------------------

# Engine-embedded unigram language model: logprobs over the corpus's
# frequent terms, OOV penalty for everything else. Generated into the
# oracle as a CASE expression, so both engines score with the SAME model
# (the x9_lang_id embedded-scoring-table pattern). In production the
# table is a real LM's vocab logprobs (or a fastText/KenLM scorer behind
# a Pandas UDF); the operator shape — per-token lookup, per-doc mean,
# threshold gate — is identical.
_LM_LOGPROBS = {
    "the": -1.2, "a": -1.4, "value": -1.8, "table": -2.0, "row": -2.2,
    "data": -2.4, "part": -2.6, "join": -2.8, "window": -3.0, "hash": -3.2,
    "batch": -3.4, "query": -3.6,
}
_LM_OOV = -6.0
_LM_THRESHOLD = -4.25  # kept when rounded mean logprob >= threshold

_LM_CASE_SQL = (
    "CASE t "
    + " ".join(f"WHEN '{w}' THEN CAST({lp} AS DOUBLE)" for w, lp in _LM_LOGPROBS.items())
    + f" ELSE CAST({_LM_OOV} AS DOUBLE) END"
)


@query(
    "x27_lm_quality_filter",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    s AS (
      SELECT doc_id,
             round(list_sum(list_transform(ws, t -> {_LM_CASE_SQL}))
                   / len(ws) + 1e-9, 4) AS avg_logprob
      FROM w
    )
    SELECT doc_id, avg_logprob, avg_logprob >= {_LM_THRESHOLD} AS kept
    FROM s
    """,
)
def x27_lm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality gate: mean unigram logprob per document
    against an embedded LM table, thresholded into keep/drop — the
    model-based quality filter (CCNet/Gopher-style) next to x9's
    heuristic scores. Zero-shuffle: the lookup is a map literal folded
    over the token array per row (no explode, no join), so at 100 TB
    this is a pure scan-side map stage; the gate compares the ROUNDED
    score so both engines agree at the boundary."""
    d = load_table(spark, sf_dir, "documents")
    lm = F.create_map(
        *[F.lit(x) for pair in _LM_LOGPROBS.items() for x in pair]
    )
    ws = F.split("text", " ")
    total = F.aggregate(
        F.transform(ws, lambda t: F.coalesce(F.element_at(lm, t), F.lit(_LM_OOV))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    score = F.round(total / F.size(ws) + F.lit(1e-9), 4)
    return d.select(
        "doc_id",
        score.alias("avg_logprob"),
        (score >= F.lit(_LM_THRESHOLD)).alias("kept"),
    )


# --- X28: robust outlier gate (median/MAD length filter) --------------------

_MAD_K = 3.0  # flag docs more than K scaled-MADs from the per-source median


@query(
    "x28_robust_outliers",
    oracle=f"""
    WITH med AS (
      SELECT source, median(n_chars) AS med
      FROM documents GROUP BY source
    ),
    dev AS (
      SELECT d.source, d.doc_id, abs(d.n_chars - m.med) AS adev, m.med
      FROM documents d JOIN med m USING (source)
    ),
    mad AS (
      SELECT source, median(adev) AS mad FROM dev GROUP BY source
    )
    SELECT v.source,
           count(*) AS n_docs,
           CAST(count(*) FILTER (WHERE v.adev > {_MAD_K} * greatest(a.mad, 0.5))
                AS BIGINT) AS n_outliers,
           round(max(v.med) + 1e-9, 4) AS med_chars,
           round(max(a.mad) + 1e-9, 4) AS mad_chars
    FROM dev v JOIN mad a USING (source)
    GROUP BY v.source
    """,
)
def x28_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust length-outlier gate: per-source median and MAD of document
    length, flagging docs beyond K scaled MADs — the outlier filter that
    survives heavy-tailed corpora where mean/stddev gates break. Two
    grouped medians (Spark's exact `median` aggregate) on the same
    source key plus one broadcast join back; integer inputs make the
    medians exact halves, so both engines compute identical doubles.
    MAD floors at 0.5 so a zero-deviation source flags nothing."""
    d = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    med = d.groupBy("source").agg(F.median("n_chars").alias("med"))
    dev = d.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("source").agg(F.median("adev").alias("mad"))
    out = dev.join(F.broadcast(mad), "source")
    is_out = F.col("adev") > _MAD_K * F.greatest(F.col("mad"), F.lit(0.5))
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(is_out.cast("long")).alias("n_outliers"),
        F.round(F.max("med") + F.lit(1e-9), 4).alias("med_chars"),
        F.round(F.max("mad") + F.lit(1e-9), 4).alias("mad_chars"),
    )


# --- X34: temperature-based mixture reweighting -----------------------------

_MIX_TEMP_ALPHA = 0.7


@query(
    "x34_temperature_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    shares AS (
      SELECT source, n_docs, n_docs * 1.0 / sum(n_docs) OVER () AS p
      FROM counts
    ),
    probs AS (
      SELECT source, n_docs, p,
             pow(p, {_MIX_TEMP_ALPHA})
               / sum(pow(p, {_MIX_TEMP_ALPHA})) OVER () AS q
      FROM shares
    )
    SELECT source, n_docs,
           round(p + 1e-9, 6) AS p,
           round(q + 1e-9, 6) AS q,
           round(q / p + 1e-9, 6) AS epochs,
           CAST(round(q / p * n_docs + 1e-9, 4) AS DOUBLE) AS expected_docs
    FROM probs
    """,
)
def x34_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting (the mT5/XLM-R recipe): the
    per-source sampling distribution is DERIVED from corpus statistics —
    q_s ∝ p_s^alpha with alpha = 0.7 — instead of hand-set weights
    (x17's knob).  Flattening the natural distribution upweights small
    sources (epochs = q/p > 1) and downweights dominant ones, the
    standard fix for low-resource starvation in multilingual /
    multi-domain pre-training.  Output is the recipe table a mixture
    materializer (x17's fan-out leg) would consume: share p, sampling
    share q, epochs-per-doc, expected doc count.

    Shape at 100 TB: one per-source count aggregate (k rows), then
    window sums over the k-row table — the corpus is scanned once and
    nothing wider than (source, count) ever moves."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    wall = Window.partitionBy()
    p = F.col("n_docs") / F.sum("n_docs").over(wall)
    q = F.pow(p, F.lit(_MIX_TEMP_ALPHA)) / F.sum(F.pow(p, F.lit(_MIX_TEMP_ALPHA))).over(wall)
    return counts.select(
        "source",
        "n_docs",
        F.round(p + F.lit(1e-9), 6).alias("p"),
        F.round(q + F.lit(1e-9), 6).alias("q"),
        F.round(q / p + F.lit(1e-9), 6).alias("epochs"),
        F.round(q / p * F.col("n_docs") + F.lit(1e-9), 4).alias("expected_docs"),
    )


# --- X36: Gopher-style rule-based quality gate -------------------------------

_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 20, 80
_GOPHER_MIN_MWL, _GOPHER_MAX_MWL = 3.0, 10.0
_GOPHER_MAX_SYMBOL_RATIO = 0.1
_GOPHER_MIN_ALPHA_FRAC = 0.8
_GOPHER_MIN_STOPWORDS = 2
_GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "be", "that", "with")


@query(
    "x36_gopher_quality_rules",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS words, len(text) AS n_chars
      FROM documents
    ),
    feats AS (
      SELECT doc_id, lang,
             CAST(len(words) AS BIGINT) AS n_words,
             round((n_chars - (len(words) - 1)) * 1.0 / len(words) + 1e-9, 4)
               AS mean_word_len,
             CAST(len(list_intersect(list_distinct(words),
                     [{", ".join(f"'{s}'" for s in _GOPHER_STOPWORDS)}])) AS BIGINT)
               AS n_stop,
             round(len(list_filter(words, x -> regexp_matches(x, '^[A-Za-z]')))
                     * 1.0 / len(words) + 1e-9, 4) AS alpha_frac,
             round((len(words) - len(list_filter(words,
                     x -> NOT (x LIKE '%#%' OR x LIKE '%...%'))))
                     * 1.0 / len(words) + 1e-9, 4) AS symbol_ratio
      FROM w
    )
    SELECT doc_id, lang, n_words, mean_word_len, n_stop, alpha_frac, symbol_ratio,
           (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}) AS r_words,
           (mean_word_len BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL}) AS r_mean_len,
           (symbol_ratio <= {_GOPHER_MAX_SYMBOL_RATIO}) AS r_symbol,
           (alpha_frac >= {_GOPHER_MIN_ALPHA_FRAC}) AS r_alpha,
           (n_stop >= {_GOPHER_MIN_STOPWORDS}) AS r_stop,
           ((n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
             AND (mean_word_len BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL})
             AND (symbol_ratio <= {_GOPHER_MAX_SYMBOL_RATIO})
             AND (alpha_frac >= {_GOPHER_MIN_ALPHA_FRAC})
             AND (n_stop >= {_GOPHER_MIN_STOPWORDS})) AS keep
    FROM feats
    """,
)
def x36_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021, App. A —
    the public heuristic battery MassiveText/Dolma/RefinedWeb variants all
    run): per-doc word-count bounds, mean-word-length band, symbol-to-word
    ratio, alphabetic-word fraction, and a minimum distinct-stopword count,
    each emitted as its own flag (pipelines track per-rule rejection rates)
    plus the conjunctive keep.

    Shape at 100 TB: a pure per-row map — every feature comes from the
    doc's own token array, no explode, no shuffle, no Python; the gate
    composes with the curation funnel as one more scan filter.  Mean word
    length is (n_chars - (n_words-1)) / n_words — exact for single-space
    text on both engines without unnesting."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    mwl = F.round(
        (F.length("text") - (n_words - F.lit(1))) / n_words.cast("double")
        + F.lit(1e-9), 4,
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    ).cast("bigint")
    alpha = F.round(
        F.size(F.filter(words, lambda w: w.rlike("^[A-Za-z]")))
        / n_words.cast("double") + F.lit(1e-9), 4,
    )
    symbol = F.round(
        (n_words - F.size(F.filter(
            words,
            lambda w: ~(w.contains("#") | w.contains("...")),
        ))) / n_words.cast("double") + F.lit(1e-9), 4,
    )
    feats = d.select(
        "doc_id", "lang",
        n_words.cast("bigint").alias("n_words"),
        mwl.alias("mean_word_len"),
        n_stop.alias("n_stop"),
        alpha.alias("alpha_frac"),
        symbol.alias("symbol_ratio"),
    )
    r_words = F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    r_mwl = F.col("mean_word_len").between(_GOPHER_MIN_MWL, _GOPHER_MAX_MWL)
    r_symbol = F.col("symbol_ratio") <= _GOPHER_MAX_SYMBOL_RATIO
    r_alpha = F.col("alpha_frac") >= _GOPHER_MIN_ALPHA_FRAC
    r_stop = F.col("n_stop") >= _GOPHER_MIN_STOPWORDS
    return feats.select(
        "*",
        r_words.alias("r_words"),
        r_mwl.alias("r_mean_len"),
        r_symbol.alias("r_symbol"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stop"),
        (r_words & r_mwl & r_symbol & r_alpha & r_stop).alias("keep"),
    )


# --- X37: DSIR importance-resampling data selection --------------------------

_DSIR_BUCKETS = 512
_DSIR_TARGET_LANG = "en"
_DSIR_TOP_N = 100


@query(
    "x37_dsir_selection",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    hb AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % {_DSIR_BUCKETS} AS b
      FROM tok
    ),
    raw AS (SELECT b, CAST(count(*) AS BIGINT) AS n_raw FROM hb GROUP BY b),
    tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS n_tgt
            FROM hb WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b),
    lr AS (
      SELECT r.b,
             ln((coalesce(t.n_tgt, 0) + 1.0)
                  / (sum(coalesce(t.n_tgt, 0)) OVER () + {_DSIR_BUCKETS}))
               - ln((r.n_raw + 1.0)
                  / (sum(r.n_raw) OVER () + {_DSIR_BUCKETS})) AS lr
      FROM raw r LEFT JOIN tgt t USING (b)
    ),
    docscore AS (
      SELECT hb.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             round(sum(lr.lr) + 1e-9, 4) AS dsir_score
      FROM hb JOIN lr USING (b)
      GROUP BY hb.doc_id
    )
    SELECT doc_id, n_tokens, dsir_score, rk
    FROM (SELECT *, row_number() OVER (ORDER BY dsir_score DESC, doc_id) AS rk
          FROM docscore)
    WHERE rk <= {_DSIR_TOP_N}
    """,
)
def x37_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): fit hashed-unigram bag-of-words
    models for the TARGET distribution (here: lang='en' docs, the
    in-domain stand-in) and the RAW corpus, score every document by its
    importance log-ratio sum over token buckets (Laplace-smoothed), and
    keep the top-N — the deterministic variant of the paper's
    Gumbel-noise resampling, rank-stable across engines (rounded score +
    doc_id tie-break, SURVEY §4.3.1).

    Shape at 100 TB: the (doc_id, bucket) frame is the only exploded
    intermediate and it is persisted and reused three ways (raw counts,
    target counts, doc scoring); both model tables collapse to <=B
    buckets, so the log-ratio table is a broadcast — the scoring join
    ships 512 doubles to every executor and the per-doc aggregate
    partial-combines map-side.  Token hashing is the repo's cross-engine
    md5-prefix convention (the a20 count-min hash)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("bigint"),
        F.lit(_DSIR_BUCKETS),
    )
    hb = tok.select("doc_id", "lang", bucket.alias("b")).persist()
    raw = hb.groupBy("b").agg(F.count(F.lit(1)).alias("n_raw"))
    tgt = (
        hb.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_tgt"))
    )
    wall = Window.partitionBy()
    n_tgt = F.coalesce(F.col("n_tgt"), F.lit(0))
    lr = (
        raw.join(tgt, "b", "left")
        .select(
            "b",
            (
                F.log((n_tgt + F.lit(1.0))
                      / (F.sum(n_tgt).over(wall) + F.lit(float(_DSIR_BUCKETS))))
                - F.log((F.col("n_raw") + F.lit(1.0))
                        / (F.sum("n_raw").over(wall) + F.lit(float(_DSIR_BUCKETS))))
            ).alias("lr"),
        )
    )
    docscore = (
        hb.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lr") + F.lit(1e-9), 4).alias("dsir_score"),
        )
    )
    # global top-N via orderBy().limit() → TakeOrderedAndProject (each task
    # keeps a local top-N heap, driver merges N·tasks rows) — NOT a
    # row_number window, which Spark plans as a single-task global sort
    # (no WindowGroupLimit without a partition spec); the rank window then
    # runs over only the N survivors
    top = docscore.orderBy(F.col("dsir_score").desc(), "doc_id").limit(_DSIR_TOP_N)
    w = Window.orderBy(F.col("dsir_score").desc(), "doc_id")
    return top.withColumn("rk", F.row_number().over(w)).select(
        "doc_id", "n_tokens", "dsir_score", "rk"
    )


# --- X41: CCNet-style perplexity bucketing ------------------------------------

_CCNET_BUCKETS = 3  # head / middle / tail terciles, per language


@query(
    "x41_ccnet_buckets",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
             round(list_sum(list_transform(ws, t -> {_LM_CASE_SQL}))
                   / len(ws) + 1e-9, 4) AS avg_logprob
      FROM w
    ),
    t AS (
      SELECT doc_id, lang, avg_logprob,
             ntile({_CCNET_BUCKETS}) OVER (PARTITION BY lang
                                           ORDER BY avg_logprob DESC, doc_id) AS nt
      FROM s
    )
    SELECT doc_id, lang, avg_logprob,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM t
    """,
)
def x41_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    LANGUAGE, split documents into head/middle/tail terciles of the LM
    quality score (x27's mean unigram logprob — higher = more fluent) —
    the public recipe behind "train on head+middle, drop tail" corpus
    tiering, kept per-language so low-resource languages are tiered
    against themselves rather than drowned by the dominant one.

    Shape at 100 TB: scoring is x27's zero-shuffle map-literal fold; the
    tiering is ONE rank exchange carrying (doc_id, lang, score) scalars.
    Exact ntile needs a per-language total ordering — a single sort task
    per language is the honest cost of exact terciles (CCNet itself
    computes them from a sampled histogram; the o8 two-pass prefix-sum is
    the sampled-quantile alternative if a language outgrows one task).
    Ordering is (rounded score DESC, doc_id), so both engines assign
    identical tercile boundaries."""
    d = load_table(spark, sf_dir, "documents")
    lm = F.create_map(
        *[F.lit(x) for pair in _LM_LOGPROBS.items() for x in pair]
    )
    ws = F.split("text", " ")
    total = F.aggregate(
        F.transform(ws, lambda t: F.coalesce(F.element_at(lm, t), F.lit(_LM_OOV))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    score = F.round(total / F.size(ws) + F.lit(1e-9), 4)
    scored = d.select("doc_id", "lang", score.alias("avg_logprob"))
    w = Window.partitionBy("lang").orderBy(F.col("avg_logprob").desc(), "doc_id")
    nt = F.ntile(_CCNET_BUCKETS).over(w)
    return scored.select(
        "doc_id", "lang", "avg_logprob",
        F.when(nt == 1, "head").when(nt == 2, "middle").otherwise("tail").alias("bucket"),
    )


# --- X42: duplicate-n-gram repetition gate ------------------------------------

_DUP_2GRAM_MAX = 0.05
_DUP_3GRAM_MAX = 0.02


@query(
    "x42_duplicate_ngrams",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id,
             [ws[i] || ' ' || ws[i+1]
              for i in generate_series(1, len(ws) - 1)] AS g2,
             [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
              for i in generate_series(1, len(ws) - 2)] AS g3
      FROM w WHERE len(ws) >= 3
    )
    SELECT doc_id,
           CAST(len(g2) AS BIGINT) AS n_2grams,
           round((len(g2) - len(list_distinct(g2))) * 1.0 / len(g2) + 1e-9, 4)
             AS dup_2gram_frac,
           round((len(g3) - len(list_distinct(g3))) * 1.0 / len(g3) + 1e-9, 4)
             AS dup_3gram_frac,
           ((len(g2) - len(list_distinct(g2))) * 1.0 / len(g2) + 1e-9 <= {_DUP_2GRAM_MAX}
             AND (len(g3) - len(list_distinct(g3))) * 1.0 / len(g3) + 1e-9 <= {_DUP_3GRAM_MAX})
             AS keep
    FROM g
    """,
)
def x42_duplicate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's duplicate-n-gram repetition rules (Rae et al. 2021, App.
    A1.2 — the family x9_repetition_stats' top-token ratio doesn't
    catch): the fraction of 2-gram and 3-gram OCCURRENCES that are
    repeats of an earlier n-gram in the same doc.  High values flag
    looping/boilerplate text that per-token stats miss (every token can
    be common while the phrase structure is degenerate).

    Shape at 100 TB: zero shuffle — both n-gram arrays and their distinct
    counts are computed per row from the doc's own token array (no
    explode); the gate is one more scan filter for the curation funnel."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    g2 = _shingles(ws, 2)
    g3 = _shingles(ws, 3)
    dup2 = (F.size(g2) - F.size(F.array_distinct(g2))) / F.size(g2).cast("double")
    dup3 = (F.size(g3) - F.size(F.array_distinct(g3))) / F.size(g3).cast("double")
    return (
        d.filter(F.size(ws) >= 3)
        .select(
            "doc_id",
            F.size(g2).cast("bigint").alias("n_2grams"),
            F.round(dup2 + F.lit(1e-9), 4).alias("dup_2gram_frac"),
            F.round(dup3 + F.lit(1e-9), 4).alias("dup_3gram_frac"),
            ((dup2 + F.lit(1e-9) <= _DUP_2GRAM_MAX)
             & (dup3 + F.lit(1e-9) <= _DUP_3GRAM_MAX)).alias("keep"),
        )
    )


# --- X55: temporal train/test split (leakage-safe holdout) ------------------

_TSPLIT_FRAC = 0.8  # train fraction of the [min_ts, max_ts] span


@query(
    "x55_temporal_split",
    oracle=f"""
    WITH bounds AS (
      SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM events
    ),
    thr AS (
      SELECT CAST(lo + CAST(floor((hi - lo) * {_TSPLIT_FRAC}) AS BIGINT) AS BIGINT) AS t
      FROM bounds
    ),
    tagged AS (
      SELECT CASE WHEN epoch_us(ts) < (SELECT t FROM thr)
                  THEN 'train' ELSE 'test' END AS split,
             user_id, ts
      FROM events
    ),
    leaked AS (
      SELECT count(*) AS n FROM (
        SELECT user_id FROM tagged GROUP BY user_id
        HAVING count(DISTINCT split) = 2)
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(min(ts) AS TIMESTAMP) AS t_lo,
           CAST(max(ts) AS TIMESTAMP) AS t_hi,
           CAST((SELECT n FROM leaked) AS BIGINT) AS n_leaked_users
    FROM tagged
    GROUP BY split
    """,
)
def x55_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe temporal holdout: events split at the 80% point of
    the [min, max] time span (integer-µs threshold — exact in both
    engines, unlike an interpolated timestamp percentile), with the
    cross-split user-overlap count reported as the leakage signal a
    user-level split would have to resolve.

    Scale design: the threshold is two scalar aggregates broadcast back
    (no sort, no window); tagging is a pure scan map; the only
    exchanges are the split/user aggregates.  This is the split
    protocol for forecasting data — the reference's own task trains on
    the past and predicts 6 months ahead (flax_model.py README), where
    a random row split would leak future pixels into training."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.unix_micros(F.min("ts")).alias("lo"), F.unix_micros(F.max("ts")).alias("hi")
    )
    thr = bounds.select(
        (F.col("lo") + F.floor((F.col("hi") - F.col("lo")) * _TSPLIT_FRAC).cast("bigint"))
        .alias("t")
    )
    tagged = e.crossJoin(F.broadcast(thr)).select(
        F.when(F.unix_micros("ts") < F.col("t"), F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
        "user_id",
        "ts",
    )
    leaked = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") == 2)
        .agg(F.count(F.lit(1)).alias("n_leaked"))
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("ts").alias("t_lo"),
            F.max("ts").alias("t_hi"),
        )
        .crossJoin(F.broadcast(leaked))
        .select(
            "split", "n_events", "n_users", "t_lo", "t_hi",
            F.col("n_leaked").cast("bigint").alias("n_leaked_users"),
        )
    )


# --------------------------------------------------------------------------
# Domain routing (prepped for the next verification window)
# --------------------------------------------------------------------------

# Domain -> keyword list: the topic-mixing taxonomy public LLM-data
# pipelines route on (Dolma / RedPajama domain buckets); keywords drawn
# from the fixture vocabulary so every domain has real mass at all tiers.
_DOMAINS: dict[str, tuple[str, ...]] = {
    "aggregation": ("agg", "group", "key"),
    "joins": ("join", "merge", "hash"),
    "ordering": ("sort", "order", "window"),
    "retrieval": ("query", "filter", "vector"),
    "scan_io": ("scan", "table", "column", "line"),
    "streaming": ("stream", "batch", "spark"),
}


def domain_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route every document to the domain whose keywords OCCUR most often
    in it (ties → alphabetically first domain), then report per-domain
    corpus composition: (domain, n_docs, total_hits), total_hits summing
    each routed doc's WINNING-domain occurrence count — the domain-mixing
    census a pretraining pipeline runs before setting sampling weights
    (each public mixture recipe starts from exactly this table).
    Occurrence counts, not distinct-keyword hits: on short docs over a
    small vocabulary distinct-hit scores saturate and the argmax
    degenerates into the tie-break.  All-integer output.  Documents with
    ZERO keyword occurrences land in an explicit 'unrouted' bucket (left
    join from the corpus), so the census partitions the corpus BY
    CONSTRUCTION — a silently dropped doc cannot under-report the total.

    Registered as `x66_domain_router` at module bottom (the oracle is
    generated from the same _DOMAINS map); held out of the packed r08
    window, registered r09 per VERDICT r08 #2.  Reference
    analog: the validity-gated input routing ahead of training
    (big_data_project/trainer/flax_model.py:70-95) — same
    classify-then-partition shape over a corpus.

    Scale design: explode to (doc_id, token), broadcast-join the ~20-row
    keyword→domain map (never a shuffle against the fact side), then two
    partial-aggregated exchanges — (doc_id, domain) hit counts bounded by
    |docs|×|domains|, and the final |domains|-row census.  The argmax is
    a min_by aggregation, not a window — no per-doc sort; the unrouted
    backfill is one id-keyed join of two |docs|-row integer frames."""
    kw_rows = [
        (kw, dom) for dom, kws in sorted(_DOMAINS.items()) for kw in kws
    ]
    kw = F.broadcast(
        spark.createDataFrame(kw_rows, "token string, domain string")
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    hits = (
        toks.join(kw, "token")
        .groupBy("doc_id", "domain")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = hits.groupBy("doc_id").agg(
        F.expr("min_by(domain, struct(-c, domain))").alias("domain"),
        F.expr("min_by(c, struct(-c, domain))").alias("doc_hits"),
    )
    routed = docs.select("doc_id").join(scored, "doc_id", "left").select(
        F.coalesce("domain", F.lit("unrouted")).alias("domain"),
        F.coalesce("doc_hits", F.lit(0).cast("long")).alias("doc_hits"),
    )
    return (
        routed.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_hits").alias("total_hits"),
        )
        .orderBy("domain")
    )


def _domain_oracle() -> str:
    vals = ", ".join(
        f"('{kw}', '{dom}')"
        for dom, kws in sorted(_DOMAINS.items())
        for kw in kws
    )
    return f"""
    WITH kw(token, domain) AS (VALUES {vals}),
    toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    hits AS (
      SELECT t.doc_id, k.domain, count(*) AS c
      FROM toks t JOIN kw k ON k.token = t.token
      GROUP BY t.doc_id, k.domain),
    scored AS (
      SELECT doc_id, domain, CAST(c AS BIGINT) AS doc_hits FROM (
        SELECT doc_id, domain, c,
               row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, domain) AS rn
        FROM hits) WHERE rn = 1),
    routed AS (
      SELECT COALESCE(s.domain, 'unrouted') AS domain,
             COALESCE(s.doc_hits, 0) AS doc_hits
      FROM documents d LEFT JOIN scored s USING (doc_id))
    SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_hits) AS BIGINT) AS total_hits
    FROM routed
    GROUP BY domain
    ORDER BY domain
    """


_DOMAIN_ORACLE = _domain_oracle()

# Registered here (not via decorator) because the oracle is generated
# from the same _DOMAINS map the function broadcasts.
query("x66_domain_router", oracle=_DOMAIN_ORACLE)(domain_route_counts)


# --- Deterministic hash-stratified sampling (prepped) ------------------------

_STRAT_BUDGET = 50


def hash_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportionally allocated, HASH-DETERMINISTIC stratified sample of
    the corpus: each language stratum gets quota = (budget · n_lang)
    div N docs (pure integer arithmetic — flooring may leave a few
    budget slots unused, the standard largest-remainder trade-off), and
    WITHIN a stratum the selected docs are the first `quota` by
    ascending md5(doc_id) — a reproducible pseudo-random order that is
    identical across engines, reruns, partitionings, and cluster
    sizes, which RNG-based sampling (o9 TABLESAMPLE, o11-o14) can never
    give: the property a training-data pipeline needs so a re-run of
    the same recipe ships the same corpus.  Output: every selected
    (lang, doc_id) with its in-stratum sample rank and the stratum
    quota.  All-deterministic, all-integer-plus-strings.  Reference
    analog: the corpus-curation shape,
    big_data_project/trainer/flax_model.py.

    Registered r10 as `x78_hash_stratified_sample` (with
    `_STRAT_ORACLE`) once the window opened.

    Scale design: stratum counts are one partial-agg exchange
    broadcast back onto the scan (strata-bounded); the per-stratum
    top-quota is rank-over-window ≤ k, which Spark executes as
    WindowGroupLimit — the map-side group-limit prune (pinned), so the
    sort never sees more than ~quota rows per stratum per partition;
    doc text never enters the plan (column pruning to lang + doc_id,
    pinned via ReadSchema in the plan test)."""
    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    quotas = counts.crossJoin(F.broadcast(total)).select(
        "lang",
        F.expr(f"({_STRAT_BUDGET} * n_lang) div n_total").alias("quota"),
    )
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select(
        "lang", "doc_id", F.row_number().over(w).cast("int").alias("sample_rank")
    ).filter(
        # literal pre-filter: every quota is ≤ the total budget, and a
        # CONSTANT rank bound is what lets Spark rewrite the window into
        # a WindowGroupLimit (map-side per-stratum top-k prune) — the
        # quota comparison below is column-vs-column and cannot
        # trigger the WindowGroupLimit rewrite.
        F.col("sample_rank") <= F.lit(_STRAT_BUDGET)
    )
    return (
        ranked.join(F.broadcast(quotas), "lang")
        .filter(F.col("sample_rank") <= F.col("quota"))
        .select("lang", "doc_id", "sample_rank", F.col("quota").cast("bigint"))
        .orderBy("lang", "sample_rank")
    )


_STRAT_ORACLE = f"""
    WITH base AS (
      SELECT lang, doc_id FROM documents),
    quotas AS (
      SELECT lang,
             ({_STRAT_BUDGET} * count(*)) // (SELECT count(*) FROM base)
               AS quota
      FROM base GROUP BY lang),
    ranked AS (
      SELECT lang, doc_id,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
               AS sample_rank
      FROM base)
    SELECT r.lang, r.doc_id, r.sample_rank, CAST(q.quota AS BIGINT) AS quota
    FROM ranked r JOIN quotas q ON q.lang = r.lang
    WHERE r.sample_rank <= q.quota
    ORDER BY r.lang, r.sample_rank
"""

query("x78_hash_stratified_sample", oracle=_STRAT_ORACLE)(hash_stratified_sample)
