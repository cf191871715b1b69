"""Property-based algebraic identities (SURVEY §5.2, hypothesis-driven).

Each property is an engine-level invariant that must hold for ANY input,
not just the fixtures: these are the laws Catalyst's rewrites (predicate
reordering, semi-join conversion, partial aggregation) rely on. Examples
are kept small and few — every example is a real Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

rows = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=0,
    max_size=25,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, data):
    return spark.createDataFrame(data, schema="x int, y int, k string")


@_SETTINGS
@given(data=rows)
def test_filter_commutes_and_conjoins(spark, data):
    df = _df(spark, data)
    p, q = F.col("x") > 0, F.col("y") < 2
    a = df.filter(p).filter(q).count()
    b = df.filter(q).filter(p).count()
    c = df.filter(p & q).count()
    assert a == b == c


@_SETTINGS
@given(data=rows, other=rows)
def test_union_counts_add(spark, data, other):
    d1, d2 = _df(spark, data), _df(spark, other)
    assert d1.unionByName(d2).count() == d1.count() + d2.count()


@_SETTINGS
@given(data=rows, other=rows)
def test_semi_join_equals_inner_distinct_project(spark, data, other):
    d1, d2 = _df(spark, data), _df(spark, other)
    semi = d1.join(d2, "k", "left_semi")
    inner = d1.join(d2.select("k").distinct(), "k", "inner")
    assert sorted(map(tuple, semi.collect())) == sorted(map(tuple, inner.collect()))


@_SETTINGS
@given(data=rows, other=rows)
def test_semi_anti_partition_input(spark, data, other):
    d1, d2 = _df(spark, data), _df(spark, other)
    semi = d1.join(d2, "k", "left_semi").count()
    anti = d1.join(d2, "k", "left_anti").count()
    assert semi + anti == d1.count()


@_SETTINGS
@given(data=rows)
def test_distinct_is_idempotent(spark, data):
    df = _df(spark, data)
    once = df.distinct()
    assert once.count() == once.distinct().count()


@_SETTINGS
@given(data=rows)
def test_grouped_counts_sum_to_total(spark, data):
    # partial→final aggregation correctness (A12): group counts sum to n
    df = _df(spark, data)
    grouped = df.groupBy("k").count()
    total = grouped.agg(F.coalesce(F.sum("count"), F.lit(0)).alias("s")).collect()[0]["s"]
    assert total == df.count()


@_SETTINGS
@given(data=rows)
def test_exceptall_inverts_unionall(spark, data):
    df = _df(spark, data)
    assert df.unionByName(df).exceptAll(df).count() == df.count()


@_SETTINGS
@given(data=rows)
def test_rollup_total_row_equals_global_agg(spark, data):
    """The rollup's grand-total row (all group keys NULL) must equal the
    plain global aggregate — partial-agg merging and the grouping-set
    expansion cannot disagree."""
    df = _df(spark, data)
    rolled = df.rollup("k").agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
    total = rolled.filter(F.col("k").isNull()).collect()
    direct = df.agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    if direct.n == 0:
        assert total == [] or all((r.n or 0) == 0 for r in total)
    else:
        # exactly one grand-total row (no NULL k values in the fixture)
        assert len(total) == 1
        assert total[0].s == direct.s and total[0].n == direct.n


@_SETTINGS
@given(data=rows)
def test_running_sum_final_value_is_group_sum(spark, data):
    """The last value of an unbounded-preceding running sum within each
    group must equal that group's total — window frames and grouped
    aggregation are two routes to the same number."""
    from pyspark.sql.window import Window

    df = _df(spark, data)
    w = Window.partitionBy("k").orderBy("y", "x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    last_run = (
        df.withColumn("run", F.sum("x").over(w))
        .groupBy("k")
        .agg(F.max_by("run", F.struct("y", "x")).alias("final_run"))
    )
    totals = df.groupBy("k").agg(F.sum("x").alias("total"))
    joined = last_run.join(totals, "k").collect()
    for r in joined:
        assert r.final_run == r.total, r


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=15),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_star_contraction_matches_union_find(spark, edges):
    """x43's star contraction must agree with a reference union-find on
    ANY loop-free graph — multi-edges, multiple components, cycles —
    not just the fixture's planted pairs and the chain test's path.
    Self-loops are pre-filtered here because they are OUTSIDE
    star_contract's documented contract (u != v): a self-loop-only node
    would be absent from its labels output."""
    from big_data_project_spark.pipeline.dedup import star_contract

    real = [(u, v) for u, v in edges if u != v]
    if not real:
        return
    # reference: union-find with min-id roots
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in real:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(real, schema="u long, v long")
    labels, _ = star_contract(df, max_rounds=10)
    got = {r.doc_id: r.cluster for r in labels.collect()}
    assert got == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy, n_seeds=st.integers(min_value=1, max_value=3))
def test_bfs_layers_match_python_bfs(spark, edges, n_seeds):
    """The delta-frontier BFS core must agree with a reference Python
    BFS on ANY symmetric graph — multi-edges, cycles, disconnected
    components — for every layer up to the round budget: same reached
    set, same first-reach distance for each node, unreached nodes
    absent.  Seeds are the smallest n node ids, so every example is
    deterministic."""
    from big_data_project_spark.pipeline.graph import bfs_layers

    real = [(u, v) for u, v in edges if u != v]
    if not real:
        return
    sym = real + [(v, u) for u, v in real]
    adj: dict[int, set[int]] = {}
    for u, v in sym:
        adj.setdefault(u, set()).add(v)
    nodes = sorted(adj)
    seed_nodes = nodes[:n_seeds]
    rounds = 3
    expected = {n: 0 for n in seed_nodes}
    frontier = set(seed_nodes)
    for k in range(1, rounds + 1):
        nxt = {v for u in frontier for v in adj[u]} - expected.keys()
        for v in nxt:
            expected[v] = k
        frontier = nxt
    edges_df = spark.createDataFrame(sym, schema="u long, v long")
    seeds_df = spark.createDataFrame([(n,) for n in seed_nodes], schema="node long")
    try:
        got = {r.node: r.dist for r in bfs_layers(edges_df, seeds_df, rounds).collect()}
        assert got == expected
    finally:
        spark.catalog.clearCache()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy, k=st.integers(min_value=1, max_value=4))
def test_kcore_peel_matches_python_peel(spark, edges, k):
    """The synchronous k-core peel core must agree with a reference
    Python peel on ANY symmetric graph — multi-edges collapse to simple
    edges, cycles, disconnected components — for every sweep up to the
    round budget: same peel round for every removed node, 0 for
    survivors, and alive-but-isolated nodes removed the sweep their
    last neighbour goes (degree 0 < k)."""
    from big_data_project_spark.pipeline.graph import kcore_peel

    real = {(u, v) for u, v in edges if u != v}
    if not real:
        return
    sym = sorted(real | {(v, u) for u, v in real})
    adj: dict[int, set[int]] = {}
    for u, v in sym:
        adj.setdefault(u, set()).add(v)
    rounds = 3
    alive = set(adj)
    expected = {}
    for r in range(1, rounds + 1):
        nxt = {u for u in alive if len(adj[u] & alive) >= k}
        for u in alive - nxt:
            expected[u] = r
        alive = nxt
    expected.update({u: 0 for u in alive})
    edges_df = spark.createDataFrame(sym, schema="u long, v long")
    kk_df = spark.createDataFrame([(k,)], schema="kk long")
    try:
        got = {
            r.node: r.peel_round
            for r in kcore_peel(edges_df, kk_df, rounds).collect()
        }
        assert got == expected
    finally:
        spark.catalog.clearCache()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy, rounds=st.integers(min_value=1, max_value=3))
def test_lpa_step_matches_python_sync_lpa(spark, edges, rounds):
    """x65's synchronous label-propagation step must agree with a
    reference Python implementation on ANY symmetric simple graph for
    every round: each node adopts the most frequent label among its
    neighbours with the (max count, min label) tie-break — the
    determinism that makes sync LPA oracle-mirrorable.  Multi-edges
    are collapsed first (the weight-pruned builder emits simple
    edges); every node has degree ≥ 1 by construction, so labels
    cover all nodes every round."""
    from big_data_project_spark.pipeline.graph import _lpa_step

    real = {(u, v) for u, v in edges if u != v}
    if not real:
        return
    sym = sorted(real | {(v, u) for u, v in real})
    adj: dict[int, set[int]] = {}
    for u, v in sym:
        adj.setdefault(u, set()).add(v)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n in adj:
            votes: dict[int, int] = {}
            for nb in adj[n]:
                votes[labels[nb]] = votes.get(labels[nb], 0) + 1
            nxt[n] = min(votes, key=lambda l: (-votes[l], l))
        labels = nxt
    edges_df = spark.createDataFrame(sym, schema="u long, v long")
    lab_df = edges_df.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    try:
        for _ in range(rounds):
            lab_df = _lpa_step(edges_df, lab_df)
        got = {r.node: r.lbl for r in lab_df.collect()}
        assert got == labels
    finally:
        spark.catalog.clearCache()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=20),
    min_size=1, max_size=6,
))
def test_winnow_fingerprints_match_python_winnow(spark, docs):
    """Winnowing selection must agree with a reference Python winnow on
    ANY token stream: same distinct window-minima set per document,
    and documents shorter than w + k − 1 tokens absent."""
    import hashlib

    from big_data_project_spark.pipeline.dedup import (
        _WIN_W, winnow_fingerprints,
    )

    K, P = 3, 1_000_000_007
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    expected: dict[int, set[int]] = {}
    for i, text in rows:
        w = text.split(" ")
        if len(w) < K + _WIN_W - 1:
            continue
        kg = [" ".join(w[j:j + K]) for j in range(len(w) - K + 1)]
        h = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % P for g in kg]
        expected[i] = {min(h[j:j + _WIN_W]) for j in range(len(h) - _WIN_W + 1)}
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    try:
        got: dict[int, set[int]] = {}
        for r in winnow_fingerprints(df).collect():
            got.setdefault(r.doc_id, set()).add(r.fp)
        assert got == expected
    finally:
        spark.catalog.clearCache()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=24),
    min_size=1, max_size=6,
))
def test_cdc_chunks_match_python_and_reconstruct(spark, docs):
    """CDC chunking must agree with a reference Python chunker on ANY
    token stream, and the chunks must PARTITION the document: joining
    each doc's chunks back with single spaces reproduces its text
    exactly (no token lost, duplicated, or reordered)."""
    import hashlib

    from big_data_project_spark.pipeline.dedup import _CDC_D, cdc_chunks

    K, P = 3, 1_000_000_007
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]

    def py_chunks(text: str) -> list:
        w = text.split(" ")
        if len(w) < K:
            return [text]
        h = [int(hashlib.md5(" ".join(w[j:j + K]).encode()).hexdigest()[:15],
                 16) % P for j in range(len(w) - K + 1)]
        bounds = [1] + [j + 2 for j, v in enumerate(h) if v % _CDC_D == 0] \
            + [len(w) + 1]
        return [" ".join(w[s - 1:e - 1]) for s, e in zip(bounds, bounds[1:])]

    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    try:
        got: dict[int, list] = {}
        for r in cdc_chunks(df).collect():
            got.setdefault(r.doc_id, []).append((r.chunk, r.tok_len))
        for i, text in rows:
            expected = py_chunks(text)
            # Spark's explode preserves array order within a doc's rows,
            # but collect() interleaves docs — compare as multisets plus
            # the reconstruction invariant, which pins order indirectly
            assert sorted(c for c, _ in got[i]) == sorted(expected)
            assert all(ln == len(c.split(" ")) for c, ln in got[i])
            assert " ".join(expected) == text
    finally:
        spark.catalog.clearCache()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy, weights=st.lists(
    st.integers(min_value=1, max_value=5), min_size=20, max_size=20))
def test_n2v_census_matches_python_bias_walk(spark, edges, weights):
    """x85's per-bias-class census must agree with a pure-Python
    second-order bias computation on ANY symmetric weighted simple
    graph — arbitrary degree skew, triangles, and weights, not just
    the co-purchase fixture.  Also pins the structural invariant that
    every (t, mid) context contributes exactly one 'return'
    transition (the u→t back-edge always exists in a symmetric
    graph)."""
    from big_data_project_spark.pipeline.graph import (
        _N2V_INV_P, _N2V_INV_Q, n2v_census_of_edges,
    )

    simple = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    if not simple:
        return
    wmap = {e: weights[i % len(weights)] for i, e in enumerate(simple)}
    sym = {}
    for (u, v), w in wmap.items():
        sym[(u, v)] = w
        sym[(v, u)] = w
    adj: dict[int, dict[int, int]] = {}
    for (u, v), w in sym.items():
        adj.setdefault(u, {})[v] = w
    agg: dict[str, tuple[int, int, float]] = {}
    for t, nbrs in adj.items():
        for mid in nbrs:
            raw = []
            for nv, w_uv in adj[mid].items():
                if nv == t:
                    cls, alpha = "return", _N2V_INV_P
                elif (t, nv) in sym:
                    cls, alpha = "triangle", 1.0
                else:
                    cls, alpha = "explore", _N2V_INV_Q
                raw.append((cls, w_uv, w_uv * alpha))
            denom = sum(x for _, _, x in raw)
            for cls, w_uv, x in raw:
                n, sw, ps = agg.get(cls, (0, 0, 0.0))
                agg[cls] = (n + 1, sw + w_uv, ps + x / denom)
    edges_df = spark.createDataFrame(
        [(u, v, w) for (u, v), w in sym.items()], schema="u long, v long, w long"
    ).persist()
    try:
        got = {
            r.bias_class: (r.n_transitions, r.sum_weight, r.mean_prob)
            for r in n2v_census_of_edges(edges_df).collect()
        }
        assert set(got) == set(agg)
        for cls, (n, sw, ps) in agg.items():
            gn, gsw, gmp = got[cls]
            assert (gn, gsw) == (n, sw), cls
            assert abs(gmp - ps / n) < 1e-5, cls
        n_contexts = sum(len(nbrs) for nbrs in adj.values())
        assert got["return"][0] == n_contexts
    finally:
        spark.catalog.clearCache()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy, steps=st.integers(min_value=1, max_value=3))
def test_dw_step_matches_python_argmin_walk(spark, edges, steps):
    """x86's hash-deterministic walk step must agree with a hashlib
    replay on ANY symmetric simple graph for every hop: from each
    walker's node, the next node is the neighbour minimizing
    (md5('wid:k:v'), v) — including single-neighbour nodes (forced
    backtracking) and two-node cycles, shapes the fixture graph barely
    exercises."""
    import hashlib

    from big_data_project_spark.pipeline.graph import _dw_step

    real = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    if not real:
        return
    sym = sorted({(u, v) for a, b in real for u, v in ((a, b), (b, a))})
    adj: dict[int, list[int]] = {}
    for u, v in sym:
        adj.setdefault(u, []).append(v)
    expected = {}
    for wid in adj:
        node = wid
        for k in range(1, steps + 1):
            node = min(
                adj[node],
                key=lambda v: (
                    hashlib.md5(f"{wid}:{k}:{v}".encode()).hexdigest(), v
                ),
            )
        expected[wid] = node
    edges_df = spark.createDataFrame(sym, schema="u long, v long").persist()
    cur = edges_df.select(F.col("u").alias("wid")).distinct().select(
        "wid", F.col("wid").alias("node")
    )
    try:
        for k in range(1, steps + 1):
            cur = _dw_step(cur, edges_df, k).persist()
        got = {r.wid: r.node for r in cur.collect()}
        assert got == expected
    finally:
        spark.catalog.clearCache()


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_dw_walk_pair_census_matches_python(spark, edges):
    """The FULL walk miner (`_dw_walk_pair_census`: per-node walks →
    visit union → within-window pair census) must agree with a hashlib
    replay on ANY symmetric simple graph — not just the per-step pick
    the test above covers.  Both x86 (co-purchase graph) and x89 (the
    NN-descent k-NN graph) call this exact helper, so the property
    protects both ends of the factoring; tiny graphs force heavy
    walk-path collisions (two-node cycles visit the same unordered
    pair from several positions) that the fixtures barely exercise."""
    from big_data_project_spark.pipeline.graph import _dw_walk_pair_census
    from tests.test_pipeline import _replay_walk_census

    real = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    if not real:
        return
    sym = sorted({(u, v) for a, b in real for u, v in ((a, b), (b, a))})
    adj: dict[int, list[int]] = {}
    for u, v in sym:
        adj.setdefault(u, []).append(v)
    census = _replay_walk_census(adj)
    edges_df = spark.createDataFrame(sym, schema="u long, v long").persist()
    try:
        got = {
            (r.node_a, r.node_b): r.n_cooc
            for r in _dw_walk_pair_census(edges_df).collect()
        }
        assert got == dict(census)
    finally:
        spark.catalog.clearCache()


_nnd_vectors = st.lists(
    st.tuples(
        st.integers(min_value=-3, max_value=3),
        st.integers(min_value=-3, max_value=3),
        st.integers(min_value=-3, max_value=3),
    ).filter(lambda t: any(t)),  # zero vectors have no cosine direction
    min_size=3,
    max_size=12,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=_nnd_vectors)
def test_nnd_step_matches_python_on_any_vectors(spark, vecs):
    """x88's ranking + candidate-expansion core must agree with a pure
    numpy replay on ANY small vector corpus — duplicate and antipodal
    vectors force rounded-sim ties (the smallest-id tie-break under
    stress), and tiny corpora force per-node neighbor lists shorter
    than k, shapes the embedding fixture never exercises.  One full
    NN-descent step: top-k over all pairs, expand, re-rank."""
    import numpy as np

    from big_data_project_spark.pipeline.similarity import (
        _NND_K, _nnd_expand, _nnd_topk,
    )

    mat = np.array(vecs, dtype=float)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(mat @ mat.T + 1e-9, 4)
    n = len(vecs)

    def py_topk(pairs):
        by_a = {}
        for a, b in pairs:
            by_a.setdefault(a, []).append((-sims[a, b], b))
        return {
            a: [(b, -ns) for ns, b in sorted(lst)[:_NND_K]]
            for a, lst in by_a.items()
        }

    all_pairs = {(a, b) for a in range(n) for b in range(n) if a != b}
    knn_py = py_topk(all_pairs)
    cur_py = {(a, b) for a, lst in knn_py.items() for b, _ in lst}
    sym = cur_py | {(b, a) for a, b in cur_py}
    by_src = {}
    for a, b in sym:
        by_src.setdefault(a, set()).add(b)
    expand_py = {
        (a, c) for a, m in sym for c in by_src.get(m, ()) if c != a
    } | cur_py
    next_py = py_topk(expand_py)

    e = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        schema="vec_id long, v array<double>",
    )
    pairs_df = spark.createDataFrame(
        sorted(all_pairs), schema="a long, b long"
    )
    try:
        knn_df = _nnd_topk(pairs_df, e).persist()
        got = {}
        for r in knn_df.collect():
            got.setdefault(r.a, []).append((r.b, r.sim))
        assert {a: sorted(v) for a, v in got.items()} == {
            a: sorted(v) for a, v in knn_py.items()
        }
        # r19: _nnd_expand returns a multiset (dedup lives in
        # _nnd_topk(dedup=True) on the scoring layout) — the SET of
        # pairs must still match the python model exactly
        expand_df = _nnd_expand(knn_df)
        assert {(r.a, r.b) for r in expand_df.collect()} == expand_py
        got2 = {}
        for r in _nnd_topk(expand_df, e, dedup=True).collect():
            got2.setdefault(r.a, []).append((r.b, r.sim))
        assert {a: sorted(v) for a, v in got2.items()} == {
            a: sorted(v) for a, v in next_py.items()
        }
    finally:
        spark.catalog.clearCache()


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=100_000),
        min_size=1,
        max_size=64,
    ),
    draws=st.lists(
        st.floats(min_value=0.0, max_value=0.999999, allow_nan=False),
        min_size=1,
        max_size=8,
    ),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_neg_interval_table_tiles_unit_interval(spark, counts, draws):
    """x91's negative-sampling intervals on ARBITRARY positive counts
    (not just the fixture's): cum_lo/cum_hi must tile [0,1)
    contiguously — first lo 0, last hi exactly 1.0 after the nudged
    6-dp round, each lo equal to the previous ROUNDED hi — so that any
    uniform draw in [0,1) matches exactly one row of the broadcast
    table (the invariant the BroadcastNestedLoopJoin's correctness
    rests on), even when rounding collapses a tiny interval to zero
    width."""
    from big_data_project_spark.pipeline.graph import _neg_interval_table

    freq = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], schema="node long, n long"
    )
    rows = sorted(
        _neg_interval_table(freq).collect(), key=lambda r: (r.cum_lo, r.cum_hi)
    )
    spark.catalog.clearCache()
    assert rows[0].cum_lo == 0.0
    assert rows[-1].cum_hi == 1.0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.cum_lo == prev.cum_hi  # contiguous tiling, no gap/overlap
    for r in rows:
        assert r.cum_lo <= r.cum_hi
    for u in draws:
        hits = [r.neg for r in rows if r.cum_lo <= u < r.cum_hi]
        assert len(hits) == 1, (u, hits)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_walk_visits_match_python_walks(spark, edges):
    """The deterministic walk corpus on ANY symmetrized graph — not just
    the fixture co-purchase/ANN graphs the x86/x89/x91 replays use:
    every (wid, pos) must name exactly the node the pure-Python
    argmin-md5 walk visits.  This is the partition-independence claim
    at the heart of reproducible training data (SURVEY §4.3): the
    Spark walk picks its next hop with a rank-1 window over a
    hash-exchanged candidate frame, and ANY dependence on partition
    layout, row order, or tie handling (md5 ties broken by neighbor
    id) would surface here as a diverging pick on some random graph."""
    import hashlib

    from big_data_project_spark.pipeline.graph import _DW_STEPS, _dw_walk_visits

    real = {(u, v) for u, v in edges if u != v}
    if not real:
        return
    sym = sorted(real | {(v, u) for u, v in real})
    adj: dict[int, list[int]] = {}
    for u, v in sym:
        adj.setdefault(u, []).append(v)
    expected = {}
    for wid in adj:
        node = wid
        expected[(wid, 0)] = node
        for k in range(1, _DW_STEPS + 1):
            node = min(
                adj[node],
                key=lambda nb: (
                    hashlib.md5(f"{wid}:{k}:{nb}".encode()).hexdigest(), nb
                ),
            )
            expected[(wid, k)] = node

    df = spark.createDataFrame(sym, schema="u long, v long").persist()
    try:
        got = {
            (r.wid, r.pos): r.node for r in _dw_walk_visits(df).collect()
        }
        assert got == expected
    finally:
        spark.catalog.clearCache()


# --- r15: attribution-simulator conservation laws (pure Python, no Spark) ---

_sim_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),      # pass index
        st.booleans(),                              # view side?
        st.integers(min_value=1, max_value=6),      # user
        st.integers(min_value=0, max_value=7200),   # ts offset (s)
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(events=_sim_events)
def test_attribution_sim_conservation(events):
    """The t12/t13 event-time simulator's conservation laws on ANY
    scripted arrival sequence (the simulator is load-bearing as the
    third implementation of the outer-join watermark semantics, so its
    own internals get hypothesis coverage): every view is accounted
    for EXACTLY once across {matched-at-least-once, emitted-orphan,
    still-buffered}; no view emits both matched and orphan rows; no
    duplicate orphan; matched emission is monotone under passes; and
    under how='left' no purchase-orphan rows exist while how='full'
    emits each unmatched expired purchase exactly once."""
    from tests.test_streaming import _AttributionSim

    for how in ("left", "full"):
        sim = _AttributionSim(how)
        views, purchases = [], []
        vid, pid = 100, 200
        batches: dict[int, tuple[list, list]] = {
            i: ([], []) for i in range(5)
        }
        for pi, is_view, user, off in events:
            ts = 1_700_000_000.0 + off
            if is_view:
                batches[pi][0].append((vid, user, ts))
                views.append(vid)
                vid += 1
            else:
                batches[pi][1].append((pid, user, ts))
                purchases.append(pid)
                pid += 1
        for i in range(5):
            sim.run_pass(*batches[i])

        matched_v = [e[0] for e in sim.emitted if e[0] is not None and e[1] is not None]
        orphan_v = [e[0] for e in sim.emitted if e[0] is not None and e[1] is None]
        orphan_p = [e[1] for e in sim.emitted if e[0] is None]
        buffered_v = [v[0] for v in sim.vstate]

        # views: matched xor orphan xor buffered-unmatched, never both
        assert set(matched_v).isdisjoint(orphan_v)
        assert len(orphan_v) == len(set(orphan_v))  # no duplicate orphan
        for v in views:
            states = (
                (v in set(matched_v))
                + (v in set(orphan_v))
                + (v in set(buffered_v) and v not in set(matched_v))
            )
            assert states <= 1 or v in set(matched_v), v
        # every emitted or buffered view id is a real input
        assert set(matched_v) | set(orphan_v) | set(buffered_v) <= set(views)

        if how == "left":
            assert not orphan_p
        else:
            assert len(orphan_p) == len(set(orphan_p))
            matched_p = {
                e[1] for e in sim.emitted if e[0] is not None and e[1] is not None
            }
            assert set(orphan_p).isdisjoint(matched_p)
            assert set(orphan_p) <= set(purchases)

        # matches carry non-negative gaps within the window
        for e in sim.emitted:
            if e[0] is not None and e[1] is not None:
                assert e[3] is not None and 0 <= e[3] <= sim.window


# --- r15: the SGNS epoch optimizes its objective (replay-tier, no Spark) ---


def _sgns_batch_loss(ex, vin, vout):
    """The SGNS objective the step's gradient is the derivative of:
    -sum cnt*[label*log(sigma) + (1-label)*log(1-sigma)] over the
    6-dp-rounded clamped dots — computed from the SAME replay state the
    step function consumes."""
    import math

    from big_data_project_spark.pipeline.graph import _SG_CLAMP, _SG_DIM

    loss = 0.0
    for (c, x, label), cnt in ex.items():
        dot = round(
            sum(vin[c, k] * vout[x, k] for k in range(_SG_DIM)) + 1e-9, 6
        )
        dc = max(min(dot, _SG_CLAMP), -_SG_CLAMP)
        sig = 1.0 / (1.0 + math.exp(-dc))
        loss -= cnt * (
            label * math.log(sig) + (1.0 - label) * math.log(1.0 - sig)
        )
    return loss


def test_sgns_epoch_decreases_loss(spark):
    """Training semantics, not just parity: each replayed SGD step over
    the fixture batch must strictly DECREASE the SGNS objective — the
    property that makes x92/x93 a training step rather than an
    arbitrary deterministic transform.  (Full-batch descent at lr=0.05
    on a smooth bounded-gradient objective; a failure here means a sign
    error or a gradient/update mismatch that value-parity alone cannot
    catch, since the oracle mirrors the same formula.)"""
    from tests.test_pipeline import _replay_sgns_setup, _replay_sgns_step

    ex, _nodes, vin, vout = _replay_sgns_setup(spark)
    l0 = _sgns_batch_loss(ex, vin, vout)
    _, _, vin1, vout1 = _replay_sgns_step(ex, vin, vout)
    l1 = _sgns_batch_loss(ex, vin1, vout1)
    _, _, vin2, vout2 = _replay_sgns_step(ex, vin1, vout1)
    l2 = _sgns_batch_loss(ex, vin2, vout2)
    assert l1 < l0, (l0, l1)
    assert l2 < l1, (l1, l2)
    # and the descent is material, not rounding noise
    assert (l0 - l2) > 1e-3 * l0

    # bind the x94 engine metric (6-dp-rounded recipe) to this
    # mathematical objective: the two definitions are different tiers
    # on purpose, but they must agree to per-example rounding error —
    # a sign/label error in the metric would pass oracle parity (the
    # SQL mirrors the same formula) yet diverge here.
    from tests.test_pipeline import _replay_sgns_metrics

    n = sum(ex.values())
    for mats, l_math in (((vin, vout), l0), ((vin1, vout1), l1), ((vin2, vout2), l2)):
        _tot, l_engine, _acc = _replay_sgns_metrics(ex, *mats)
        assert abs(l_engine - l_math / n) < 1e-5, (l_engine, l_math / n)


def test_sgns_adam_epoch_decreases_loss(spark):
    """x95's training semantics: each replayed Adam step must strictly
    DECREASE the SGNS objective — same bar as the SGD epoch, under the
    reference's actual optimizer (optax.adam, flax_model.py:272).  A
    sign error in the moment recipe or a bias-correction mix-up would
    pass oracle parity (the SQL mirrors the same formula) but ascend
    or stall here."""
    from tests.test_pipeline import (
        _replay_sgns_adam_epoch, _replay_sgns_setup,
    )

    ex, _nodes, vin, vout = _replay_sgns_setup(spark)
    (ti, _mi, _si), (to, _mo, _so) = _replay_sgns_adam_epoch(ex, vin, vout)
    losses = [
        _sgns_batch_loss(
            ex,
            {key: ws[step] for key, ws in ti.items()},
            {key: ws[step] for key, ws in to.items()},
        )
        for step in range(3)
    ]
    assert losses[1] < losses[0], losses
    assert losses[2] < losses[1], losses
    # and the descent is material, not rounding noise
    assert (losses[0] - losses[2]) > 1e-3 * losses[0]
