"""Physical-plan contracts (SURVEY.md §4.2).

The 100 TB claims in this repo are properties of the *plan*, not the
output: filters must reach the parquet scan, projections must prune the
read schema, small dims must broadcast, aggregates must have a partial
(map-side) phase, and an operator must not shuffle more than its
semantics require. These helpers turn each claim into an assertable
predicate over `df.explain()` text, and tests/test_plans.py pins them so
a regression that silently de-optimizes a query fails CI even though its
rows still hash-match the oracle.

(The reference has no analog — its only "plan" is an XLA trace,
flax_model.py:180 — so this layer is where the Spark-first architecture
earns its keep.)
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode)`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_str(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    out: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def count_ops(df: DataFrame, op: str) -> int:
    """Occurrences of a physical operator name (e.g. 'Exchange',
    'BroadcastHashJoin', 'SortMergeJoin') in the plan tree. Uses simple
    mode — formatted mode repeats each operator in its detail section,
    which would double-count."""
    text = plan_str(df, mode="simple")
    return len(re.findall(rf"\b{re.escape(op)}\b", text))


def has_broadcast_join(df: DataFrame) -> bool:
    return count_ops(df, "BroadcastHashJoin") > 0 or count_ops(df, "BroadcastNestedLoopJoin") > 0


def has_partial_agg(df: DataFrame) -> bool:
    """Two-phase (map-side partial + final) hash aggregation present."""
    return "partial_" in plan_str(df)


# The one shuffle-counting regex, shared by num_shuffles and
# num_shuffles_steady so the two counters cannot drift (ADVICE r14).
# \b-anchoring already excludes Broadcast/ReusedExchange (no word
# boundary inside either token), so the bare count IS the shuffle
# count — the previous `- count_ops("BroadcastExchange")` subtracted
# broadcasts a second time and undercounted every plan containing one.
_EXCHANGE_RE = re.compile(r"\bExchange\b")


def _count_exchanges(text: str) -> int:
    return len(_EXCHANGE_RE.findall(text))


def num_shuffles(df: DataFrame) -> int:
    """Shuffle exchanges only (see _EXCHANGE_RE)."""
    return _count_exchanges(plan_str(df, mode="simple"))


_TREE_PREFIX = re.compile(r"^[\s:+|-]*")


def prune_cached_subtrees(text: str) -> str:
    """Drop every InMemoryRelation's re-printed child plan from an
    explain string.  Spark's plan printer reprints each cached frame's
    FULL upstream lineage under its InMemoryRelation node (once per
    cache reference, and the executed-plan printer nests AQE sub-plans
    on top), so operator counts over the raw text over-count wildly on
    persisted-lineage queries — x90's optimized plan prints 105
    "Exchange"s for ~a dozen in the steady-state query.  The reprinted
    subtree is strictly deeper-indented than its InMemoryRelation line;
    pruning by indentation keeps the query's own operators (including
    the InMemoryTableScan leaves) and drops only the cache-build
    lineage, which belongs to the one-time fill, not the steady-state
    shuffle budget."""
    kept: list[str] = []
    skip_depth: int | None = None
    for line in text.splitlines():
        depth = _TREE_PREFIX.match(line).end()
        if skip_depth is not None:
            # Blank/whitespace-only lines carry no depth signal: drop
            # them WITHOUT ending the skip, else a blank line inside a
            # reprinted lineage would leak the rest of the cache-build
            # subtree back into the steady-state count (ADVICE r14).
            # Only a non-blank line at depth <= skip_depth ends it.
            if not line.strip():
                continue
            if depth > skip_depth:
                continue
            skip_depth = None
        kept.append(line)
        if "InMemoryRelation" in line:
            skip_depth = depth
    return "\n".join(kept)


def num_shuffles_steady(df: DataFrame) -> int:
    """Shuffle exchanges in the STEADY-STATE plan: `num_shuffles` with
    every cached subtree's reprinted lineage pruned first.  This is the
    count to pin on persisted/localCheckpoint-lineage queries (x90,
    x91, the iterative-graph family), where the raw text count includes
    each cache's one-time build lineage once per reference."""
    text = prune_cached_subtrees(plan_str(df, mode="simple"))
    return _count_exchanges(text)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans — wider/fewer is better.
    EXECUTES the frame: under AQE, codegen stage ids only exist in the
    final executed plan (`*(n)` markers), never in the pre-execution
    formatted explain."""
    df.collect()
    text = df._jdf.queryExecution().executedPlan().toString()
    ids = set(re.findall(r"\*\((\d+)\)", text))
    return len(ids)
