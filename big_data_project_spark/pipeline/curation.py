"""End-to-end training-data curation pipeline: the composite operator a
100 TB LLM-data run actually executes, as ONE declarative plan.

    documents
      → quality gate   (length + word count + digit ratio; X9 metrics)
      → language gate  (allow-list on lang; P5)
      → exact dedup    (normalized-hash, keep smallest doc_id; X6)
      → near-dup gate  (MinHash-LSH → verified Jaccard ≥ 0.5, drop the
                        larger doc_id of each pair; X7)
      → corpus stats   (per-lang survivor counts + token totals; A4)

Every stage is SQL-expressible, so the WHOLE pipeline is oracle-checked
end-to-end against DuckDB (the n² Jaccard CTE stands in for LSH at
oracle scale) — not just its stages in isolation. One scan feeds the
quality/language gates; the only shuffles are the two dedup groupings
and the LSH band join, all on bounded keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_project_spark.io import load_table
from big_data_project_spark.pipeline.dedup import (
    oracle_pairs_cte_body, verified_neardup_pairs,
)
from big_data_project_spark.pipeline.similarity import x8_cosine_pairs_threshold
from big_data_project_spark.registry import query

MIN_CHARS = 20
MIN_WORDS = 5
MAX_DIGIT_RATIO = 0.3
LANGS = ("en", "de", "fr")

# Built from the SAME constants the Spark funnel filters on — a threshold
# change cannot desync the oracle from the engine.
_GATED_SQL = f"""
      SELECT doc_id, lang, text
      FROM documents
      WHERE len(text) >= {MIN_CHARS}
        AND len(string_split(text, ' ')) >= {MIN_WORDS}
        AND len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text) <= {MAX_DIGIT_RATIO}
        AND lang IN ({", ".join(f"'{lg}'" for lg in LANGS)})
"""


def _gated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality + language gates — pure scan filters, zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    digits = F.length(F.regexp_replace("text", r"[^0-9]", ""))
    return d.filter(
        (F.length("text") >= MIN_CHARS)
        & (F.size(words) >= MIN_WORDS)
        & (digits / F.length("text") <= MAX_DIGIT_RATIO)
        & F.col("lang").isin(*LANGS)
    )


def curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor set after quality, language, exact-dedup, and near-dup
    gates. Returned with per-doc token counts for downstream stats.

    Funnel semantics: the near-dup search runs over the GATED pool only —
    each stage shrinks the set the next stage pays for (and a surviving
    doc is never dropped for matching a doc the quality/language gates
    already rejected).  The gates are scan filters, so the restriction
    costs no shuffle; near-dup work now scales with the survivors, not
    the raw corpus.

    Exact dedup is min(doc_id) OVER (PARTITION BY content_hash): ONE
    shuffle keyed on the hash, versus the groupBy+semi-join form's two
    (agg exchange + join exchange of the full rows). The projection to
    (doc_id, lang, n_tokens, h) happens BEFORE that shuffle so document
    text never moves — at 100 TB the exchange carries ~40 bytes/row, not
    the corpus. Content hashes are uniform, so the window partitioning
    has no skew and each hash-group is tiny (the dup set). Exact-dup
    losers are NOT excluded from the near-dup pool (that would shuffle
    text through an anti-join); tokenizing the few duplicates is cheaper,
    and their keeper has identical shingles, so pair results agree."""
    gated = _gated_docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    # exact dedup: keep smallest doc_id per normalized content hash
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    narrow = gated.select(
        "doc_id",
        "lang",
        F.size(words).alias("n_tokens"),
        F.md5(norm).alias("h"),
    )
    exact = (
        narrow.withColumn("keep", F.min("doc_id").over(Window.partitionBy("h")))
        .filter(F.col("doc_id") == F.col("keep"))
    )
    # near-dup gate over the gated pool: drop the larger id of every pair
    losers = (
        verified_neardup_pairs(spark, sf_dir, docs=gated.select("doc_id", "text"))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = exact.join(losers, "doc_id", "left_anti")
    return survivors.select("doc_id", "lang", "n_tokens")


@query(
    "pipeline_curation_end2end",
    oracle="WITH gated AS (" + _GATED_SQL + "),\n"
    + oracle_pairs_cte_body("gated")
    + """,
    keep_exact AS (
      SELECT min(doc_id) AS doc_id
      FROM gated
      GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    ),
    losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE jac >= 0.5),
    survivors AS (
      SELECT g.doc_id, g.lang, len(string_split(g.text, ' ')) AS n_tokens
      FROM gated g
      JOIN keep_exact k ON g.doc_id = k.doc_id
      WHERE g.doc_id NOT IN (SELECT doc_id FROM losers)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens) + 1e-9, 4) AS avg_tokens
    FROM survivors
    GROUP BY lang
    """,
)
def pipeline_curation_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics of the curated survivor set — the whole pipeline
    verified as one unit."""
    return (
        curated_docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_tokens") + 1e-9, 4).alias("avg_tokens"),
        )
    )


# --- lexical + semantic curation (adds the embedding-dedup stage) ----------


@query(
    "pipeline_semantic_curation",
    oracle="WITH gated AS (" + _GATED_SQL + "),\n"
    + oracle_pairs_cte_body("gated")
    + """,
    keep_exact AS (
      SELECT min(doc_id) AS doc_id
      FROM gated
      GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    ),
    lex_losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE jac >= 0.5),
    survivors AS (
      SELECT g.doc_id, g.lang, len(string_split(g.text, ' ')) AS n_tokens
      FROM gated g
      JOIN keep_exact k ON g.doc_id = k.doc_id
      WHERE g.doc_id NOT IN (SELECT doc_id FROM lex_losers)
    ),
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sem_pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM emb a JOIN emb b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v) + 1e-9, 4) >= 0.4
        AND a.vec_id IN (SELECT doc_id FROM survivors)
        AND b.vec_id IN (SELECT doc_id FROM survivors)
    ),
    final AS (
      SELECT * FROM survivors WHERE doc_id NOT IN (SELECT vb FROM sem_pairs)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens) + 1e-9, 4) AS avg_tokens
    FROM final
    GROUP BY lang
    """,
)
def pipeline_semantic_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full modern curation funnel: the lexical pipeline above PLUS a
    semantic (embedding-cosine ≥ 0.4) dedup stage over the lexical
    survivors — documents and embeddings share the id space (doc_id =
    vec_id), as a production corpus would carry its embedding column
    alongside the text. Stage semantics are sequential: semantic pairs
    are evaluated only between docs still alive after the lexical gates,
    then the greedy-by-id keep rule drops the larger member. Pair
    discovery reuses the block-matrix cosine kernel; the stage adds two
    semi-joins and one anti-join on bare ids — at 100 TB the text and
    the embedding vectors both stay where they were scanned."""
    surv = curated_docs(spark, sf_dir).persist()
    ids_a = surv.select(F.col("doc_id").alias("vec_a"))
    ids_b = surv.select(F.col("doc_id").alias("vec_b"))
    sem_losers = (
        x8_cosine_pairs_threshold(spark, sf_dir)
        .join(ids_a, "vec_a", "left_semi")
        .join(ids_b, "vec_b", "left_semi")
        .select(F.col("vec_b").alias("doc_id"))
        .distinct()
    )
    return (
        surv.join(sem_losers, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_tokens") + 1e-9, 4).alias("avg_tokens"),
        )
    )
