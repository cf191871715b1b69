"""Independent pure-Python replays for oracle-backed queries whose only
value evidence was the DuckDB diff (w9, b6, b7, o14, j13, x56, x58 —
all in the r12 driver window — plus x20, x32, x33, x36, x37, x44,
x47, x78, and — r13 — x41 CCNet terciles, x52 hybrid RRF (covering
x50's BM25 formula), x53 PMI, x63 KL drift, x71 Zipf least-squares,
o13 curriculum interleave, x46 vocab encode, x42 duplicate-ngram
fractions, x60 Matryoshka recall, b1 ordered funnel, t3 session
windows, and the x61/x62 PCA pair replayed at both the recurrence and
the eigen-definition level; r14 — the iterative-graph recurrences x51
global PageRank, x67 weighted personalized PageRank, and x76 TextRank
via ONE shared pure-Python power iteration parameterized on (edges,
base term), x65 synchronous LPA vote rounds, union-find components
covering the x43/x7_neardup_clusters pair, the curation-recipe
rows x17 hash fan-out, x25 token-budget greedy, x28 median/MAD gate,
x34 temperature mixture, x35 hard negatives, x48 score gate, the x9
quality-ratio and TF-IDF text rows, the x23 incremental-admission
classifier, the behavior trio b2 calendar cohorts, b3 adjacent
purchase→error runs (at sf0.01 — sf0.001 is vacuous), b4 day-grid
forward fill, the a17/a25 bivariate-statistics pair from their
closed forms, w5's SQL-standard rank formulas, and the x13 mapInArrow
L2 kernel vs a per-row math.sqrt fold).

The oracle gate cannot catch MIRRORED bugs: both engines implementing
the same wrong mental model hash-match each other.  The defense is a
third implementation written from the operator's DEFINITION (numpy /
hashlib / math / pandas / numpy), the x86/x88 replay-test convention —
these were the intricate-semantics rows still lacking one
(trailing-frame interpolated median, calendar-window distinct,
bracketing-anchor interpolation, inverse-CDF bootstrap weights, as-of
nearest, add-one bigram NLL, greedy BPE merges, T5 span corruption,
urllib-validated URL canonicalization, token-placement-simulated
sequence packing, keep-first segment dedup).

All replays run at sf0.001 and follow the repo rounding convention:
``round(x + 1e-9, d)`` then exact equality.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from tests.conftest import SF_DIR


def _md5_mod(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def test_w9_moving_median_matches_numpy(spark):
    """Trailing-4 interpolated median: numpy's linear-interpolation
    percentile over each (ts, event_id)-sorted per-user prefix window
    is the definition both engines claim to share (the a16 contract) —
    a mirrored frame error (3 PRECEDING vs 4, or excluded current row)
    or a nearest-rank median would pass the oracle and fail here."""
    import numpy as np

    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.windows import w9_moving_median

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, float(r.value)))
    expected = {}
    for uid, evs in by_user.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        for i, (_, eid, _v) in enumerate(evs):
            window = [v for *_, v in evs[max(0, i - 3) : i + 1]]
            med = float(np.percentile(window, 50, method="linear"))
            expected[(uid, eid)] = round(med + 1e-9, 4)
    got = {
        (r.user_id, r.event_id): r.med4
        for r in w9_moving_median(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_b6_rolling_active_users_matches_python(spark):
    """Trailing-7-day distinct actives from the DEFINITION (a user is
    active on grid day d if they have any event in [d-6, d]) — a
    mirrored off-by-one on the window edge or a sequence direction bug
    in the explode fan-out would agree across engines and fail here."""
    import datetime

    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.behavior import b6_rolling_active_users

    rows = load_table(spark, SF_DIR, "events").select("ts", "user_id").collect()
    du = {(r.ts.date(), r.user_id) for r in rows}
    days = sorted({d for d, _ in du})
    expected = {}
    for d in days:
        lo = d - datetime.timedelta(days=6)
        expected[str(d)] = len({u for dd, u in du if lo <= dd <= d})
    got = {
        r.day: r.active_7d
        for r in b6_rolling_active_users(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_b7_gap_fill_matches_python(spark):
    """Gap fill from the definition: per-user daily means, the md5 keep
    gate, a dense lo..hi calendar grid, and linear interpolation
    between the nearest observed anchors.  A mirrored anchor choice
    (nearest vs bracketing), an inverted interpolation fraction, or a
    gate-polarity flip would pass the oracle and fail here."""
    import datetime

    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.behavior import b7_gap_fill_interpolate

    rows = load_table(spark, SF_DIR, "events").select("user_id", "ts", "value").collect()
    acc: dict = defaultdict(list)
    for r in rows:
        acc[(r.user_id, r.ts.date())].append(float(r.value))
    daily = {k: round(sum(v) / len(v) + 1e-9, 6) for k, v in acc.items()}
    kept = {
        (u, d): v
        for (u, d), v in daily.items()
        if _md5_mod(f"{u}@{d}", 10) < 6
    }
    expected = {}
    by_user = defaultdict(dict)
    for (u, d), v in kept.items():
        by_user[u][d] = v
    for u, obs in by_user.items():
        lo, hi = min(obs), max(obs)
        d = lo
        while d <= hi:
            if d in obs:
                expected[(u, str(d))] = (1, round(obs[d] + 1e-9, 4))
            else:
                pd_ = max(dd for dd in obs if dd < d)
                nd = min(dd for dd in obs if dd > d)
                frac = (d - pd_).days / (nd - pd_).days
                v = obs[pd_] + (obs[nd] - obs[pd_]) * frac
                expected[(u, str(d))] = (0, round(v + 1e-9, 4))
            d += datetime.timedelta(days=1)
    got = {
        (r.user_id, r.day): (r.observed, r.value_filled)
        for r in b7_gap_fill_interpolate(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_o14_poisson_bootstrap_matches_python_and_true_cdf(spark):
    """Poisson bootstrap replicates from the definition — and the
    multiplicity table itself re-derived from the Poisson(1) CDF with
    math.exp/factorial, so a mirrored typo in the shared _BOOT_CDF
    constants (both engines consume the same tuple) cannot hide."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.sorts import (
        _BOOT_CDF, _BOOT_REPS, o14_poisson_bootstrap,
    )

    # independent CDF: floor(1e6 · P[Poisson(1) ≤ k]) for k = 0..3
    cdf = []
    acc = 0.0
    for k in range(4):
        acc += math.exp(-1.0) / math.factorial(k)
        cdf.append(math.floor(1_000_000 * acc))
    assert tuple(cdf) == _BOOT_CDF

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars").collect()
    expected = {}
    for b in range(_BOOT_REPS):
        n_eff, wsum = 0, 0.0
        for r in docs:
            h = _md5_mod(f"{r.doc_id}#{b}", 1_000_000)
            w = 4
            for k, t in enumerate(_BOOT_CDF):
                if h < t:
                    w = k
                    break
            n_eff += w
            wsum += w * r.n_chars
        expected[b] = (n_eff, round(wsum / n_eff + 1e-9, 4))
    got = {
        r.replicate: (r.n_eff, r.est_mean_chars)
        for r in o14_poisson_bootstrap(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_j13_asof_nearest_matches_pandas_merge_asof(spark):
    """j13 claims pandas merge_asof direction='nearest' semantics (ties
    backward).  Its DuckDB oracle mirrors the same dual-window
    formulation, so a mirrored tie/edge error would hash-match across
    engines; pandas' own merge_asof is the independent reference the
    docstring names — run it and compare match, direction, and the
    floored integer-second gap."""
    import pandas as pd

    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.joins import j13_asof_nearest_join

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_type", "event_id")
        .collect()
    )
    views = pd.DataFrame(
        [(r.user_id, r.ts) for r in rows if r.event_type == "view"],
        columns=["user_id", "view_ts"],
    ).sort_values("view_ts", kind="stable")
    purchases = pd.DataFrame(
        [(r.user_id, r.ts, r.event_id) for r in rows if r.event_type == "purchase"],
        columns=["user_id", "ts", "event_id"],
    ).sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        purchases,
        views,
        left_on="ts",
        right_on="view_ts",
        by="user_id",
        direction="nearest",
    )
    expected = {}
    for r in merged.itertuples():
        if pd.isna(r.view_ts):
            expected[r.event_id] = (None, None, None)
        else:
            gap_us = abs((r.ts - r.view_ts).value // 1000)
            direction = "backward" if r.view_ts <= r.ts else "forward"
            expected[r.event_id] = (
                r.view_ts.to_pydatetime(), direction, gap_us // 1_000_000
            )
    got = {
        r.purchase_id: (r.nearest_view_ts, r.direction, r.gap_s)
        for r in j13_asof_nearest_join(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x56_bigram_perplexity_matches_python(spark):
    """Per-doc mean NLL under the add-one bigram model, recomputed from
    the textbook formula (counts, V = distinct continuations,
    -ln((n12+1)/(n1+V))) — a mirrored smoothing error (vocab from w1,
    off-by-one, or a model built per-doc instead of corpus-wide) would
    hash-match across engines and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import x56_bigram_perplexity

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    by_doc = defaultdict(list)
    n12: dict = defaultdict(int)
    n1: dict = defaultdict(int)
    w2s = set()
    for r in docs:
        toks = r.text.lower().split(" ")
        for a, b in zip(toks, toks[1:]):
            if a != "" and b != "":
                by_doc[r.doc_id].append((a, b))
                n12[(a, b)] += 1
                n1[a] += 1
                w2s.add(b)
    v = len(w2s)
    expected = {}
    for doc_id, pairs in by_doc.items():
        nll = [
            -math.log((n12[p] + 1.0) / (n1[p[0]] + v)) for p in pairs
        ]
        expected[doc_id] = (len(pairs), round(sum(nll) / len(nll) + 1e-9, 6))
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in x56_bigram_perplexity(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x58_bpe_train_matches_list_based_bpe(spark):
    """The delimited-string replace trick must train the SAME merge
    table as canonical list-based BPE (Sennrich 2016: count all
    adjacent symbol pairs weighted by word frequency, fuse the argmax
    greedily left-to-right non-overlapping).  Both engines share the
    string trick, so a delimiter bug that merges inside previously
    fused symbols — or an overlap-handling difference ('aaa' under an
    (a,a) merge) — would be invisible to the oracle and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import _BPE_STEPS, x58_bpe_train

    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    freqs: dict = defaultdict(int)
    for r in docs:
        for w in r.text.lower().split(" "):
            if w and all("a" <= c <= "z" for c in w):
                freqs[w] += 1
    state = {tuple(w): f for w, f in freqs.items()}
    expected = []
    for step in range(1, _BPE_STEPS + 1):
        counts: dict = defaultdict(int)
        for syms, f in state.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((step, a, b, cnt))
        new_state: dict = defaultdict(int)
        for syms, f in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tuple(out)] += f
        state = new_state
    got = sorted(
        (r.merge_step, r.left_tok, r.right_tok, r.pair_count)
        for r in x58_bpe_train(spark, SF_DIR).collect()
    )
    spark.catalog.clearCache()
    assert got == expected


def test_x47_span_corruption_matches_python(spark):
    """T5 span-corruption example construction replayed from the
    schedule definition (length-_SPAN_LEN spans at every _SPAN_EVERY-th
    token, numbered sentinels, target = sentinel + originals): a
    mirrored off-by-one in the offset arithmetic or a sentinel
    numbering bug would produce identical wrong digests on both
    engines and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import (
        _SPAN_EVERY, _SPAN_LEN, x47_span_corruption,
    )

    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    agg: dict = defaultdict(lambda: [0, 0.0, 0, 0])
    mod = 1_000_000_007
    for r in docs:
        w = r.text.split(" ")
        inp, tgt, n_masked = [], [], 0
        for i in range(1, len(w) + 1):
            off = (i - 1) % _SPAN_EVERY
            if off == 0:
                s = f"<x_{(i - 1) // _SPAN_EVERY}>"
                inp.append(s)
                tgt.extend([s, w[i - 1]])
                n_masked += 1
            elif off < _SPAN_LEN:
                tgt.append(w[i - 1])
                n_masked += 1
            else:
                inp.append(w[i - 1])
        a = agg[r.source]
        a[0] += 1
        a[1] += n_masked / len(w)
        a[2] = (a[2] + _md5_mod(" ".join(inp), mod))
        a[3] = (a[3] + _md5_mod(" ".join(tgt), mod))
    expected = {
        src: (n, round(frac / n + 1e-9, 6), di, dt)
        for src, (n, frac, di, dt) in agg.items()
    }
    got = {
        r.source: (r.n_examples, r.avg_masked_frac, r.input_digest, r.target_digest)
        for r in x47_span_corruption(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x33_url_canonical_dedup_matches_urllib(spark):
    """URL canonicalization replayed through urllib.parse — a genuinely
    independent URL parser — applying the documented rules (lowercase
    scheme+host only, strip default port / www. / fragment / one
    trailing slash, keep only the whitelisted id param).  Both engines
    share the regex chain, so a mirrored regex bug (e.g. lowercasing
    the case-sensitive path, or an anchor that eats part of the host)
    would hash-match and fail here."""
    from urllib.parse import parse_qsl, urlsplit

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import x33_url_canonical_dedup

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    canon: dict = defaultdict(list)
    for r in docs:
        url = (
            f"HTTPS://WWW.{r.source}.Example.COM:443/Articles/{r.doc_id % 50}"
            f"?utm_source=feed&utm_campaign=c{r.doc_id % 3}"
            f"&id={r.doc_id % 7}#sec{r.doc_id % 4}"
        )
        sp = urlsplit(url)
        host = sp.netloc.lower()
        if sp.scheme.lower() == "https" and host.endswith(":443"):
            host = host[: -len(":443")]
        if host.startswith("www."):
            host = host[len("www.") :]
        path = sp.path[:-1] if sp.path.endswith("/") else sp.path
        idv = dict(parse_qsl(sp.query)).get("id", "")
        curl = f"{sp.scheme.lower()}://{host}{path}?id={idv}"
        canon[(r.source, curl)].append(r.doc_id)
    per_source: dict = defaultdict(lambda: [0, 0, 0, None])
    for (src, curl), ids in canon.items():
        a = per_source[src]
        a[0] += len(ids)
        a[1] += 1
        a[2] += min(ids)
        a[3] = curl if a[3] is None else min(a[3], curl)
    expected = {s: tuple(a) for s, a in per_source.items()}
    got = {
        r.source: (r.n_urls, r.n_canonical, r.keeper_id_sum, r.sample_canonical)
        for r in x33_url_canonical_dedup(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x20_sequence_packing_matches_token_simulation(spark):
    """Concat-then-chunk packing verified by literally placing every
    token: docs concatenate per source in doc_id order, token t lands
    in chunk t // _PACK_CAP, and each doc's (seq_first, n_seqs_spanned)
    is read off the set of chunks its tokens touch — independent of the
    prefix-sum/floor arithmetic both engines mirror (whose off-by-one
    at exact chunk boundaries the oracle could never catch)."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import (
        _PACK_CAP, x20_sequence_packing,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    by_source = defaultdict(list)
    for r in docs:
        by_source[r.source].append((r.doc_id, len(r.text.split(" "))))
    expected = {}
    for src, lst in by_source.items():
        lst.sort()
        pos = 0
        for doc_id, n in lst:
            chunks = {t // _PACK_CAP for t in range(pos, pos + n)}
            expected[doc_id] = (src, n, min(chunks), len(chunks))
            pos += n
    got = {
        r.doc_id: (r.source, r.n_tok, r.seq_first, r.n_seqs_spanned)
        for r in x20_sequence_packing(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    # docs span CONTIGUOUS chunks, so len == last-first+1 must hold in
    # the simulation too (guards the simulation itself)
    for src, lst in by_source.items():
        pos = 0
        for _, n in lst:
            chunks = sorted({t // _PACK_CAP for t in range(pos, pos + n)})
            assert chunks == list(range(chunks[0], chunks[-1] + 1))
            pos += n


def test_x32_line_dedup_matches_python(spark):
    """C4-style corpus-wide keep-first segment dedup replayed from the
    definition: 8-word windows, global first occurrence by
    (doc_id, seg_idx), documents rebuilt from survivors — a mirrored
    segmentation off-by-one (last partial window), a keep-order bug, or
    an all-segments-duplicate doc leaking into the digest would
    hash-match across engines and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.dedup import _SEG_WORDS, x32_line_dedup

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    segs = []  # (doc_id, lang, seg_idx, seg)
    for r in docs:
        w = r.text.split(" ")
        n_segs = -(-len(w) // _SEG_WORDS)
        for i in range(n_segs):
            segs.append(
                (r.doc_id, r.lang, i,
                 " ".join(w[i * _SEG_WORDS : (i + 1) * _SEG_WORDS]))
            )
    first_of = {}
    for doc_id, _, idx, seg in sorted(segs, key=lambda t: (t[0], t[2])):
        first_of.setdefault(seg, (doc_id, idx))
    agg: dict = defaultdict(lambda: [set(), 0, 0, set(), 0])
    rebuilt: dict = defaultdict(list)
    for doc_id, lang, idx, seg in segs:
        a = agg[lang]
        a[0].add(doc_id)
        a[1] += 1
        if first_of[seg] == (doc_id, idx):
            a[2] += 1
            a[3].add(doc_id)
            rebuilt[(doc_id, lang)].append((idx, seg))
    mod = 1_000_000_007
    for (doc_id, lang), kept in rebuilt.items():
        h = " ".join(s for _, s in sorted(kept))
        agg[lang][4] += _md5_mod(h, mod)
    expected = {
        lang: (len(a[0]), a[1], a[2], len(a[3]), a[4])
        for lang, a in agg.items()
    }
    got = {
        r.lang: (r.n_docs_in, r.total_segs, r.kept_segs, r.docs_out, r.digest)
        for r in x32_line_dedup(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x44_boilerplate_lines_matches_python(spark):
    """Corpus-frequency boilerplate removal replayed from the
    definition: a segment in >= _BP_MIN_DOCS DISTINCT documents is
    stripped EVERYWHERE (including its first occurrence — the exact
    point where x44 differs from x32's keep-first, a distinction a
    mirrored bug could erase), documents rebuilt from survivors, same
    digest contract."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import (
        _BP_MIN_DOCS, _BP_SEG_WORDS, x44_boilerplate_lines,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    segs = []
    seg_docs: dict = defaultdict(set)
    for r in docs:
        w = r.text.split(" ")
        for i in range(-(-len(w) // _BP_SEG_WORDS)):
            seg = " ".join(w[i * _BP_SEG_WORDS : (i + 1) * _BP_SEG_WORDS])
            segs.append((r.doc_id, r.lang, i, seg))
            seg_docs[seg].add(r.doc_id)
    boiler = {s for s, ds in seg_docs.items() if len(ds) >= _BP_MIN_DOCS}
    mod = 1_000_000_007
    perdoc: dict = defaultdict(lambda: [None, 0, []])
    for doc_id, lang, idx, seg in segs:
        a = perdoc[doc_id]
        a[0] = lang
        a[1] += 1
        if seg not in boiler:
            a[2].append((idx, seg))
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])
    for doc_id, (lang, total, kept) in perdoc.items():
        a = agg[lang]
        a[0] += 1
        a[1] += total - len(kept)
        if kept:
            a[2] += 1
            a[3] += _md5_mod(" ".join(s for _, s in sorted(kept)), mod)
    expected = {lang: tuple(a) for lang, a in agg.items()}
    got = {
        r.lang: (r.n_docs_in, r.removed_segs, r.docs_out, r.digest)
        for r in x44_boilerplate_lines(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x36_gopher_rules_match_python(spark):
    """The Gopher rule battery replayed from the documented heuristics
    (word-count bounds, mean-word-length band via the exact
    single-space identity, symbol ratio over #/... carriers, alphabetic
    fraction, distinct-stopword floor) — a mirrored threshold or a
    feature defined subtly differently from the docstring would
    hash-match across engines and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.quality import (
        _GOPHER_MAX_MWL, _GOPHER_MAX_SYMBOL_RATIO, _GOPHER_MAX_WORDS,
        _GOPHER_MIN_ALPHA_FRAC, _GOPHER_MIN_MWL, _GOPHER_MIN_STOPWORDS,
        _GOPHER_MIN_WORDS, _GOPHER_STOPWORDS, x36_gopher_quality_rules,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    expected = {}
    for r in docs:
        words = r.text.split(" ")
        n = len(words)
        mwl = round((len(r.text) - (n - 1)) / n + 1e-9, 4)
        n_stop = len(set(words) & set(_GOPHER_STOPWORDS))
        alpha = round(
            sum(1 for w in words if w[:1].isascii() and w[:1].isalpha()) / n
            + 1e-9, 4,
        )
        symbol = round(
            sum(1 for w in words if "#" in w or "..." in w) / n + 1e-9, 4
        )
        rw = _GOPHER_MIN_WORDS <= n <= _GOPHER_MAX_WORDS
        rm = _GOPHER_MIN_MWL <= mwl <= _GOPHER_MAX_MWL
        rs = symbol <= _GOPHER_MAX_SYMBOL_RATIO
        ra = alpha >= _GOPHER_MIN_ALPHA_FRAC
        rt = n_stop >= _GOPHER_MIN_STOPWORDS
        expected[r.doc_id] = (
            r.lang, n, mwl, n_stop, alpha, symbol,
            rw, rm, rs, ra, rt, rw and rm and rs and ra and rt,
        )
    got = {
        r.doc_id: (
            r.lang, r.n_words, r.mean_word_len, r.n_stop, r.alpha_frac,
            r.symbol_ratio, r.r_words, r.r_mean_len, r.r_symbol, r.r_alpha,
            r.r_stop, r.keep,
        )
        for r in x36_gopher_quality_rules(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x37_dsir_selection_matches_python(spark):
    """DSIR importance scoring replayed from the paper's definition:
    hashed-unigram bucket models for target (lang='en') and raw,
    Laplace-smoothed log-ratio per bucket, per-doc sum, deterministic
    top-N.  A mirrored smoothing denominator (R+B vs R+1), a
    ratio-direction flip, or a bucket-hash mismatch would hash-match
    across engines and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.quality import (
        _DSIR_BUCKETS, _DSIR_TARGET_LANG, _DSIR_TOP_N, x37_dsir_selection,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    raw: dict = defaultdict(int)
    tgt: dict = defaultdict(int)
    doc_buckets = {}
    for r in docs:
        bs = [_md5_mod(t, _DSIR_BUCKETS) for t in r.text.split(" ")]
        doc_buckets[r.doc_id] = bs
        for b in bs:
            raw[b] += 1
            if r.lang == _DSIR_TARGET_LANG:
                tgt[b] += 1
    R, T = sum(raw.values()), sum(tgt.values())
    lr = {
        b: (
            math.log((tgt.get(b, 0) + 1.0) / (T + float(_DSIR_BUCKETS)))
            - math.log((n + 1.0) / (R + float(_DSIR_BUCKETS)))
        )
        for b, n in raw.items()
    }
    scores = [
        (doc_id, len(bs), round(sum(lr[b] for b in bs) + 1e-9, 4))
        for doc_id, bs in doc_buckets.items()
    ]
    scores.sort(key=lambda t: (-t[2], t[0]))
    expected = [
        (doc_id, n, s, rk + 1)
        for rk, (doc_id, n, s) in enumerate(scores[:_DSIR_TOP_N])
    ]
    got = [
        (r.doc_id, r.n_tokens, r.dsir_score, r.rk)
        for r in sorted(
            x37_dsir_selection(spark, SF_DIR).collect(), key=lambda r: r.rk
        )
    ]
    spark.catalog.clearCache()
    assert got == expected


def test_x78_stratified_sample_matches_python(spark):
    """Hash-stratified sampling replayed from the definition:
    floor-proportional quota per language stratum, first quota docs by
    ascending (md5(doc_id), doc_id) — a mirrored quota rounding
    (round vs floor) or rank ordering bug would hash-match across
    engines and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.quality import (
        _STRAT_BUDGET, hash_stratified_sample,
    )

    docs = load_table(spark, SF_DIR, "documents").select("lang", "doc_id").collect()
    by_lang = defaultdict(list)
    for r in docs:
        by_lang[r.lang].append(r.doc_id)
    n_total = len(docs)
    expected = []
    for lang, ids in by_lang.items():
        quota = (_STRAT_BUDGET * len(ids)) // n_total
        ranked = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )
        expected.extend(
            (lang, doc_id, rk + 1, quota)
            for rk, doc_id in enumerate(ranked[:quota])
        )
    expected.sort()
    got = sorted(
        (r.lang, r.doc_id, r.sample_rank, r.quota)
        for r in hash_stratified_sample(spark, SF_DIR).collect()
    )
    spark.catalog.clearCache()
    assert got == expected


def test_x63_kl_drift_matches_python_math(spark):
    """Token-distribution KL drift replayed from the definition: Laplace
    smoothing with the (total + |V|) denominator, the KL(A‖B) direction,
    and natural log via math.log — a mirrored smoothing denominator
    (|V|·α), a flipped KL direction, or a log-base drift would
    hash-match across engines and fail here."""
    from collections import Counter

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import x63_token_kl_drift

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in docs:
        half = ca if r.doc_id % 2 == 0 else cb
        for t in r.text.lower().split(" "):
            half[t] += 1
    vocab = sorted(set(ca) | set(cb))
    ta, tb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    expected = {}
    for tok in vocab:
        pa = (ca[tok] + 1.0) / (ta + v)
        pb = (cb[tok] + 1.0) / (tb + v)
        expected[tok] = (
            ca[tok], cb[tok],
            round(pa + 1e-9, 6), round(pb + 1e-9, 6),
            round(pa * math.log(pa / pb) + 1e-9, 6),
        )
    got = {
        r.token: (r.cnt_a, r.cnt_b, r.p_a, r.p_b, r.kl_term)
        for r in x63_token_kl_drift(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    # the drift scalar the monitor alerts on must be a real KL: Σ ≥ 0
    assert sum(t[4] for t in expected.values()) >= 0.0


def test_x41_ccnet_terciles_match_python_ntile(spark):
    """CCNet head/middle/tail tiering replayed from the definition: the
    x27 map-literal score (OOV fallback, EMPTY tokens from consecutive
    spaces score as OOV, division by the raw split length) and SQL
    ntile's exact bucket-size rule (first n%3 buckets get the extra
    row) — a mirrored ntile convention (ceil-everywhere, or percentile
    boundaries) or an empty-token handling drift would hash-match and
    fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.quality import (
        _CCNET_BUCKETS, _LM_LOGPROBS, _LM_OOV, x41_ccnet_buckets,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text").collect()
    scored = defaultdict(list)
    score_of = {}
    for r in docs:
        toks = r.text.split(" ")
        s = round(
            sum(_LM_LOGPROBS.get(t, _LM_OOV) for t in toks) / len(toks) + 1e-9, 4
        )
        scored[r.lang].append((-s, r.doc_id))
        score_of[r.doc_id] = s
    expected = {}
    names = {1: "head", 2: "middle"}
    for lang, rows in scored.items():
        rows.sort()
        n = len(rows)
        base, extra = divmod(n, _CCNET_BUCKETS)
        pos = 0
        for b in range(1, _CCNET_BUCKETS + 1):
            size = base + (1 if b <= extra else 0)
            for _, doc_id in rows[pos:pos + size]:
                expected[doc_id] = (lang, score_of[doc_id], names.get(b, "tail"))
            pos += size
    got = {
        r.doc_id: (r.lang, r.avg_logprob, r.bucket)
        for r in x41_ccnet_buckets(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x52_hybrid_rrf_matches_python_formulas(spark):
    """The hybrid-retrieval chain replayed formula-by-formula: Okapi
    BM25 with the +0.5-smoothed ln(1 + (N−df+0.5)/(df+0.5)) idf and the
    k1/b length normalization (covers x50's scorer — one definition),
    the dense cosine leg, both leg rank-truncations, and reciprocal-rank
    fusion 1/(k+rank) with k=60 over a FULL OUTER leg join — a mirrored
    idf variant (no +1, log10), a swapped k1/b, or an inner-join fusion
    that drops single-leg docs would hash-match and fail here."""
    import numpy as np

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import (
        _BM25_B, _BM25_K1, _BM25_TERMS, _RRF_K, _RRF_LEG_N, _RRF_QVEC,
        x52_hybrid_rrf,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    dl = {}
    tf = defaultdict(lambda: defaultdict(int))
    for r in docs:
        toks = [w for w in r.text.lower().split(" ") if w != ""]
        dl[r.doc_id] = len(toks)
        for t in toks:
            if t in _BM25_TERMS:
                tf[r.doc_id][t] += 1
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    df = defaultdict(int)
    for terms in tf.values():
        for t in terms:
            df[t] += 1
    bm25 = {}
    for doc_id, terms in tf.items():
        s = 0.0
        for t, f in terms.items():
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * f * (_BM25_K1 + 1) / (
                f + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl[doc_id] / avgdl)
            )
        bm25[doc_id] = round(s + 1e-9, 4)
    rank_lex = {
        doc_id: rk + 1
        for rk, (_, doc_id) in enumerate(
            sorted(((-s, d) for d, s in bm25.items()))[:_RRF_LEG_N]
        )
    }

    erows = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in erows}
    q = vecs[_RRF_QVEC]
    sims = {
        vid: round(
            float(q @ v) / (np.linalg.norm(q) * np.linalg.norm(v)) + 1e-9, 4
        )
        for vid, v in vecs.items()
    }
    rank_dense = {
        vid: rk + 1
        for rk, (_, vid) in enumerate(
            sorted(((-s, d) for d, s in sims.items()))[:_RRF_LEG_N]
        )
    }

    fused = []
    for doc_id in set(rank_lex) | set(rank_dense):
        rl, rd = rank_lex.get(doc_id), rank_dense.get(doc_id)
        rrf = round(
            (1.0 / (_RRF_K + rl) if rl else 0.0)
            + (1.0 / (_RRF_K + rd) if rd else 0.0)
            + 1e-9,
            6,
        )
        fused.append((-rrf, doc_id, rl, rd))
    expected = [
        (doc_id, rl, rd, -neg) for neg, doc_id, rl, rd in sorted(fused)[:20]
    ]
    got = [
        (r.doc_id, r.rank_lex, r.rank_dense, r.rrf)
        for r in x52_hybrid_rrf(spark, SF_DIR).collect()
    ]
    spark.catalog.clearCache()
    assert got == expected
    assert got, "fusion produced no candidates"


def test_x53_pmi_matches_python_math(spark):
    """PMI collocations replayed from the definition: DOCUMENT-level
    events (distinct nonempty tokens per doc), pair counts under the
    wa < wb canonical order and the min-co-occurrence floor, and
    PMI = ln(n_ab·N / (n_a·n_b)) in NATURAL log — a mirrored log2
    convention (the textbook PMI base), token-level instead of
    document-level probabilities, or a dropped distinct would
    hash-match across engines and fail here."""
    from collections import Counter

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import (
        _PMI_MIN_COOC, x53_pmi_cooccurrence,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    doc_words = [
        sorted({w for w in r.text.lower().split(" ") if w != ""}) for r in docs
    ]
    n_docs = sum(1 for ws in doc_words if ws)  # count(DISTINCT doc_id) in postings
    wc: Counter = Counter()
    cooc: Counter = Counter()
    for ws in doc_words:
        wc.update(ws)
        for i, wa in enumerate(ws):
            for wb in ws[i + 1:]:
                cooc[(wa, wb)] += 1
    scored = []
    for (wa, wb), nab in cooc.items():
        if nab < _PMI_MIN_COOC:
            continue
        pmi = round(math.log(nab * 1.0 * n_docs / (wc[wa] * wc[wb])) + 1e-9, 4)
        scored.append((-pmi, wa, wb, nab))
    expected = [
        (wa, wb, nab, -neg) for neg, wa, wb, nab in sorted(scored)[:50]
    ]
    got = [
        (r.wa, r.wb, r.n_cooc, r.pmi)
        for r in x53_pmi_cooccurrence(spark, SF_DIR).collect()
    ]
    spark.catalog.clearCache()
    assert got == expected
    assert got, "fixtures should produce collocations"


def test_x71_zipf_fit_matches_python_least_squares(spark):
    """The Zipf power-law fit replayed from the definition: the bigram
    census (adjacent nonempty pairs), top-500 by (count DESC, gram),
    and ordinary least squares of ln(freq) ~ ln(rank) — slope
    Σ(x−x̄)(y−ȳ)/Σ(x−x̄)², intercept ȳ−slope·x̄, R² the squared Pearson
    correlation — re-derived with explicit sums.  A mirrored regr_*
    misuse (swapped y/x argument order, R² as 1−SSE/SST of a different
    model, log10 axes) would hash-match across engines and fail
    here."""
    from collections import Counter

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import (
        _ZIPF_MAX_RANK, zipf_slope_fit,
    )

    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    grams: Counter = Counter()
    for r in docs:
        ws = r.text.lower().split(" ")
        for w1, w2 in zip(ws, ws[1:]):
            if w1 != "" and w2 != "":
                grams[f"{w1} {w2}"] += 1
    n_vocab = len(grams)
    top = sorted(((-n, g) for g, n in grams.items()))[:_ZIPF_MAX_RANK]
    xs = [math.log(rk + 1) for rk in range(len(top))]
    ys = [math.log(-neg) for neg, _ in top]
    n = len(top)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    slope = sxy / sxx
    intercept = my - slope * mx
    r2 = sxy * sxy / (sxx * syy)
    row = zipf_slope_fit(spark, SF_DIR).collect()[0]
    spark.catalog.clearCache()
    assert row.n_vocab == n_vocab and row.n_fit == n
    assert row.zipf_slope == round(slope + 1e-9, 4)
    assert row.zipf_intercept == round(intercept + 1e-9, 4)
    assert row.fit_r2 == round(r2 + 1e-9, 4)
    # the law itself: natural-ish text slopes negative with a real fit
    assert slope < 0 and 0 < r2 <= 1


def test_o13_curriculum_interleave_matches_python(spark):
    """Curriculum interleaving replayed from the definition: exact
    linear-interpolation decile thresholds (numpy's 'linear' percentile
    — the rule Spark's exact `percentile` implements), first-match
    `<=`-threshold bucket assignment, per-bucket (md5(doc_id), doc_id)
    shuffle rank, and pos = (rank−1)·10 + bucket — a mirrored
    percentile method (nearest-rank), a `<` boundary, or a
    bucket-major instead of rank-major interleave would hash-match
    across engines and fail here."""
    import numpy as np

    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.sorts import (
        _CURR_TAKE, o13_curriculum_interleave,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "n_chars").collect()
    chars = np.array([r.n_chars for r in docs], dtype=np.float64)
    th = np.percentile(chars, [10 * (i + 1) for i in range(9)], method="linear")
    buckets = defaultdict(list)
    for r in docs:
        b = next((i for i in range(9) if r.n_chars <= th[i]), 9)
        buckets[b].append(r.doc_id)
    expected = []
    for b, ids in buckets.items():
        ranked = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )
        for rn, doc_id in enumerate(ranked, start=1):
            pos = (rn - 1) * 10 + b
            if pos < _CURR_TAKE:
                expected.append((pos, doc_id, b))
    expected.sort()
    got = [
        (r.pos, r.doc_id, r.bucket)
        for r in o13_curriculum_interleave(spark, SF_DIR).collect()
    ]
    spark.catalog.clearCache()
    assert got == expected
    # the property the operator exists for: each full window of 10
    # consecutive positions spans 10 distinct difficulty deciles
    window = [b for _, _, b in got[:10]]
    assert len(set(window)) == len(window)


def test_x46_vocab_encode_matches_python(spark):
    """The tokenizer-application report replayed from the definition:
    top-K vocabulary under the (count DESC, word ASC) tie-break over
    the RAW split (empty tokens from consecutive spaces compete for
    vocab slots and count toward n_tok), −1 OOV encoding, the
    md5-of-joined-ids document digest folded through the 60-bit-prefix
    mod-1e9+7 residue, and per-source aggregate rates — a mirrored
    tie-break, a nonempty-filtered vocabulary, or a digest computed on
    the token strings instead of ids would hash-match and fail here."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.digest import DIGEST_MOD
    from big_data_project_spark.pipeline.text import _VOCAB_K, x46_vocab_encode

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text").collect()
    wc: Counter = Counter()
    for r in docs:
        wc.update(r.text.lower().split(" "))
    top = sorted(((-n, w) for w, n in wc.items()))[:_VOCAB_K]
    vid = {w: i for i, (_, w) in enumerate(top)}
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, toks, oov, digest
    for r in docs:
        toks = r.text.lower().split(" ")
        ids = [vid.get(t, -1) for t in toks]
        h = hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()
        a = agg[r.source]
        a[0] += 1
        a[1] += len(toks)
        a[2] += sum(1 for i in ids if i == -1)
        a[3] += int(h[:15], 16) % DIGEST_MOD
    expected = {
        src: (
            n_docs, n_tok, n_oov,
            float(  # Spark F.round is HALF_UP; python round is half-even
                Decimal(n_oov / n_tok).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            ),
            dig,
        )
        for src, (n_docs, n_tok, n_oov, dig) in agg.items()
    }
    got = {
        r.source: (r.n_docs, r.total_tokens, r.oov_tokens, r.oov_rate, r.digest)
        for r in x46_vocab_encode(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x42_duplicate_ngram_fractions_match_python(spark):
    """Gopher's duplicate-n-gram fractions replayed from the definition:
    the fraction of n-gram OCCURRENCES that repeat an earlier same-doc
    n-gram — (count − distinct) / count over the RAW split (empty
    tokens participate in shingles), with the ≥3-token eligibility
    floor and the nudged ≤-threshold keep conjunction.  A mirrored
    definition drift (fraction of TOKENS covered by duplicated grams —
    Rae et al.'s other variant — or a strict < gate) would hash-match
    across engines and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.quality import (
        _DUP_2GRAM_MAX, _DUP_3GRAM_MAX, x42_duplicate_ngrams,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    expected = {}
    for r in docs:
        toks = r.text.split(" ")
        if len(toks) < 3:
            continue
        fracs = []
        for n in (2, 3):
            grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            fracs.append((len(grams) - len(set(grams))) / len(grams))
        d2, d3 = fracs
        expected[r.doc_id] = (
            len(toks) - 1,
            round(d2 + 1e-9, 4),
            round(d3 + 1e-9, 4),
            d2 + 1e-9 <= _DUP_2GRAM_MAX and d3 + 1e-9 <= _DUP_3GRAM_MAX,
        )
    got = {
        r.doc_id: (r.n_2grams, r.dup_2gram_frac, r.dup_3gram_frac, r.keep)
        for r in x42_duplicate_ngrams(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    assert any(not k for *_, k in expected.values()) or all(
        k for *_, k in expected.values()
    )


def test_x60_matryoshka_recall_matches_python(spark):
    """Matryoshka truncation recall replayed from the definition: both
    legs' top-10 under (rounded cosine DESC, neighbor ASC) — the full
    64 dims vs the FIRST-16-dims prefix slice renormalized by the
    PREFIX norm — then per-query overlap / k.  A mirrored slice origin
    (last-16, 0- vs 1-based slice), a prefix dot over the full-vector
    norm, or recall against the wrong leg would hash-match across
    engines and fail here."""
    import numpy as np

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.similarity import (
        _MRL_PREFIX, _MRL_TOPK, x60_matryoshka_recall,
    )

    erows = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in erows}

    def topk(prefix):
        out = {}
        for q in range(10):
            qv = vecs[q][:prefix] if prefix else vecs[q]
            scored = []
            for vid, v in vecs.items():
                if vid == q:
                    continue
                c = v[:prefix] if prefix else v
                sim = round(
                    float(qv @ c) / (np.linalg.norm(qv) * np.linalg.norm(c))
                    + 1e-9, 4,
                )
                scored.append((-sim, vid))
            out[q] = {vid for _, vid in sorted(scored)[:_MRL_TOPK]}
        return out

    full, trunc = topk(None), topk(_MRL_PREFIX)
    expected = {
        q: (
            len(full[q] & trunc[q]),
            round(len(full[q] & trunc[q]) / float(_MRL_TOPK) + 1e-9, 4),
        )
        for q in full
    }
    got = {
        r.query_id: (r.n_overlap, r.recall)
        for r in x60_matryoshka_recall(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    # truncation must lose SOMETHING on near-random fixtures (recall < 1
    # somewhere), else the prefix leg probably read all 64 dims
    assert any(n < _MRL_TOPK for n, _ in expected.values())


def test_b1_funnel_matches_python(spark):
    """The conversion funnel replayed from the ordered-progression
    definition: per-user FIRST timestamp of each stage, then
    strictly-later comparisons (click after first view, purchase after
    a click that itself followed a view).  A mirrored `>=` boundary,
    an unordered any-stage count, or a last-instead-of-first stage
    timestamp would hash-match across engines and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.behavior import b1_funnel

    rows = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts").collect()
    first = defaultdict(dict)
    for r in rows:
        cur = first[r.user_id].get(r.event_type)
        if cur is None or r.ts < cur:
            first[r.user_id][r.event_type] = r.ts
    n_users = len(first)
    viewed = clicked = purchased = 0
    for stages in first.values():
        tv, tc, tp = (stages.get(k) for k in ("view", "click", "purchase"))
        if tv is not None:
            viewed += 1
        ordered_click = tc is not None and tv is not None and tc > tv
        if ordered_click:
            clicked += 1
            if tp is not None and tp > tc:
                purchased += 1
    row = b1_funnel(spark, SF_DIR).collect()[0]
    spark.catalog.clearCache()
    assert (row.n_users, row.viewed, row.clicked_after_view,
            row.purchased_after_click) == (n_users, viewed, clicked, purchased)
    # a funnel must narrow monotonically
    assert n_users >= viewed >= clicked >= purchased


def test_t3_session_window_matches_python(spark):
    """Native session_window sessionization replayed from the
    gaps-and-islands definition: per user, events sorted by ts start a
    new session when the inactivity gap is ≥ 30 minutes (the half-open
    [start, last+gap) boundary — an event at exactly last+30min opens
    a NEW session), session_end = last event + gap.  A mirrored `>`
    boundary or an end = last-event timestamp would hash-match the
    CTE oracle and fail here."""
    import datetime
    from decimal import ROUND_HALF_UP, Decimal

    from big_data_project_spark.io import load_table
    from big_data_project_spark.streaming.windows import t3_session_window

    gap = datetime.timedelta(minutes=30)
    rows = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "value").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, float(r.value)))
    expected = {}
    for uid, evs in by_user.items():
        evs.sort(key=lambda t: t[0])
        sessions = []
        for ts, v in evs:
            if sessions and ts - sessions[-1][-1][0] < gap:
                sessions[-1].append((ts, v))
            else:
                sessions.append([(ts, v)])
        for s in sessions:
            total = sum(v for _, v in s)
            expected[(uid, s[0][0])] = (
                s[-1][0] + gap,
                len(s),
                float(
                    Decimal(repr(total)).quantize(  # Spark round = HALF_UP
                        Decimal("0.0001"), rounding=ROUND_HALF_UP
                    )
                ),
            )
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.session_value)
        for r in t3_session_window(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    # the fixture must actually exercise multi-event sessions AND splits
    assert any(n > 1 for _, n, _ in expected.values())
    assert len(expected) > len(by_user)


def test_x61_x62_pca_match_numpy_recurrence_and_eigendefinition(spark):
    """The PCA pair, replayed at BOTH levels a CTE mirror cannot give:

    (1) RECURRENCE replay — the exact rounded pipeline (mean-scaled
    round-4 Gram, four matvec+clamped-normalize steps from the 0.125
    constant start, Rayleigh λ, rank-1 deflation, second chain, two
    projections) re-derived in numpy must match x61 and x62
    value-for-value.  A mirrored recurrence bug (wrong matrix, missed
    rounding step, deflating with the unrounded λ) hash-matches the
    oracle and fails here.

    (2) EIGEN-DEFINITION check — on the near-random fixtures the Gram
    spectrum is almost flat (λ2/λ1 ≈ 0.93 at sf0.001) so four
    iterations CANNOT converge there (determinism, not convergence, is
    the registered contract); the definition is instead checked where
    it is checkable: on a synthetic d=8 Gram with a 5× spectral gap,
    `_power_direction` must align with numpy.linalg.eigh's leading
    eigenvector (|cos| > 0.99) with Rayleigh quotient within 1e-3 of
    λ₁ — proving the operator computes what PCA means, not merely what
    both engines happen to encode."""
    import numpy as np

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.similarity import (
        _PCA_ITERS, _dense_from_cells, _power_direction, x61_pca_project,
        x62_pca_top2,
    )

    rows = sorted(
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    ids = [r.vec_id for r in rows]
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    n, d = mat.shape

    def rnd(x, k=4):
        return np.round(x + 1e-9, k)

    def sym_round(raw):
        """Round the upper triangle, mirror — the engines' cell shape
        (BLAS matmuls are not bitwise symmetric)."""
        out = np.empty_like(raw)
        iu = np.triu_indices(raw.shape[0])
        out[iu] = rnd(raw[iu])
        out.T[iu] = out[iu]
        return out

    def power(gm):
        v = np.full(gm.shape[0], 0.125)
        for _ in range(_PCA_ITERS):
            y = rnd(gm @ v)
            nrm = max(float(rnd(np.sqrt((y * y).sum()))), 1e-4)
            v = rnd(y / nrm)
        return v

    gram = sym_round(mat.T @ mat / n)
    v = power(gram)
    proj1 = rnd(mat @ v)
    lam = float(rnd((v[None, :] @ gram @ v[:, None]).item()))
    gram2 = sym_round(gram - lam * np.outer(v, v))
    u = power(gram2)
    proj2 = rnd(mat @ u)

    got61 = {r.vec_id: r.proj for r in x61_pca_project(spark, SF_DIR).collect()}
    spark.catalog.clearCache()
    got62 = {
        r.vec_id: (r.proj1, r.proj2)
        for r in x62_pca_top2(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got61 == {vid: proj1[i] for i, vid in enumerate(ids)}
    assert got62 == {vid: (proj1[i], proj2[i]) for i, vid in enumerate(ids)}

    # --- eigen-definition check on a gapped synthetic Gram -------------
    ds = 8
    rng = np.random.default_rng(seed=42)
    q, _ = np.linalg.qr(rng.standard_normal((ds, ds)))
    a = sym_round((q * np.array([10.0, 2.0, 1.5, 1.2, 1.0, 0.8, 0.5, 0.2])) @ q.T)
    gsym = spark.createDataFrame(
        [(int(i), int(j), float(a[i, j])) for i in range(ds) for j in range(ds)],
        "i long, j long, g double",
    )
    # the r18 dense contract: fold the cell frame into the 1-row (d, G)
    # form, read the direction back as the array column `x`
    vd = np.array(
        _power_direction(_dense_from_cells(gsym)).collect()[0].x
    )
    spark.catalog.clearCache()
    w, vecs = np.linalg.eigh(a)
    vn = vd / np.linalg.norm(vd)
    assert abs(vn @ vecs[:, -1]) > 0.99, "power direction missed the eigenvector"
    assert abs(float(vn @ a @ vn) - w[-1]) < 1e-3 * w[-1], "Rayleigh far from lam1"


def _replay_power_iteration(edges, base, r0, damp, iters):
    """Power iteration from the DEFINITION, shared by the x51/x67
    replays: r' (v) = base(v) + d·Σ_{u→v} r(u)·w(u,v)/W(u), each generation
    quantized round(x + 1e-12, 10) — the §4.3.1 convention both engines
    implement.  ``edges``: [(u, v, w)]; ``base``: dict node → the exact
    per-step affine term the engine adds ((1-d)/N for global PageRank,
    (1-d)·tp(v) for personalized); ``r0``: the seed vector (already
    quantized).  Mass stays on REACHED nodes only (both engines
    inner-join ranks to edges), so the returned dict's key set shrinks/
    grows exactly as theirs does."""
    wout = defaultdict(int)
    for u, _, w in edges:
        wout[u] += w
    r = dict(r0)
    for _ in range(iters):
        contrib = defaultdict(float)
        for u, v, w in edges:
            if u in r:
                contrib[v] += r[u] * w / wout[u]
        r = {
            v: round(base.get(v, 0.0) + damp * c + 1e-12, 10)
            for v, c in contrib.items()
        }
    return r, wout


def test_x51_pagerank_matches_python_power_iteration(spark):
    """Global PageRank replayed from the definition (uniform 1/N seed,
    r' = (1-d)/N + d·Σ r/outdeg, 3 iterations) over a pure-Python join
    of orders→lineitem — a mirrored damping/teleport error, a degree
    folded one generation late, or a missed symmetrization would
    hash-match the unrolled CTE and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.graph import (
        _PR_DAMP, _PR_ITERS, x51_pagerank,
    )

    cust_of = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    pairs = {
        (f"c{cust_of[r.l_orderkey]}", f"s{r.l_suppkey}")
        for r in load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .collect()
        if r.l_orderkey in cust_of
    }
    edges = [(u, v, 1) for c, s in pairs for u, v in ((c, s), (s, c))]
    nodes = {u for u, _, _ in edges}
    n = len(nodes)
    r0 = {v: round(1.0 / n + 1e-12, 10) for v in nodes}
    base = {v: (1.0 - _PR_DAMP) / n for v in nodes}
    ranks, wout = _replay_power_iteration(edges, base, r0, _PR_DAMP, _PR_ITERS)
    expected = sorted(
        ((round(r + 1e-9, 6), v) for v, r in ranks.items()),
        key=lambda t: (-t[0], t[1]),
    )[:25]
    got = [
        (r.pagerank, r.node_id, r.degree)
        for r in x51_pagerank(spark, SF_DIR).collect()
    ]
    spark.catalog.clearCache()
    assert [(p, v) for p, v, _ in got] == expected
    assert all(d == wout[v] for _, v, d in got)


def test_x67_personalized_pagerank_matches_python_power_iteration(spark):
    """Weighted personalized PageRank replayed from the definition
    (teleport uniform over one brand's parts, contributions weighted by
    co-purchase count over total out-weight) — the same
    _replay_power_iteration core as x51 with a seed-restricted base
    term, so the pair covers both recurrences VERDICT r13 #5 named.  A
    mirrored teleport-mass error (re-adding (1-d)/N globally instead of
    (1-d)·tp on seeds) or an unpruned/unweighted edge set would pass
    the CTE oracle and fail here."""
    from collections import Counter

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.graph import (
        _LPA_MIN_WEIGHT, _PPR_DAMP, _PPR_ITERS, _PPR_SEED_BRAND,
        x67_personalized_pagerank,
    )

    by_order = defaultdict(set)
    for r in (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        by_order[r.l_orderkey].add(r.l_partkey)
    w: Counter = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                w[(ps[i], ps[j])] += 1
    edges = [
        (a, b, c)
        for (u, v), c in w.items()
        if c >= _LPA_MIN_WEIGHT
        for a, b in ((u, v), (v, u))
    ]
    nodes = {u for u, _, _ in edges}
    brand = {
        r.p_partkey
        for r in load_table(spark, SF_DIR, "part")
        .select("p_partkey", "p_brand")
        .collect()
        if r.p_brand == _PPR_SEED_BRAND
    }
    seeds = nodes & brand
    assert seeds, "fixture brand must seed the graph"
    tp = {v: round(1.0 / len(seeds) + 1e-12, 10) for v in seeds}
    base = {v: (1.0 - _PPR_DAMP) * p for v, p in tp.items()}
    ranks, wout = _replay_power_iteration(edges, base, tp, _PPR_DAMP, _PPR_ITERS)
    expected = sorted(
        (
            (round(r + 1e-9, 6), v, wout[v], int(v in seeds))
            for v, r in ranks.items()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:25]
    got = [
        (r.ppr, r.part_key, r.wdeg, r.is_seed)
        for r in x67_personalized_pagerank(spark, SF_DIR).collect()
    ]
    spark.catalog.clearCache()
    assert got == expected


def test_x65_lpa_matches_python_sync_propagation(spark):
    """Synchronous LPA replayed from the definition (Raghavan 2007 with
    the deterministic (max vote count, min label) tie-break): 3 rounds
    where every node simultaneously adopts its neighbourhood's most
    frequent label, over the SAME weight-pruned co-purchase graph the
    x67 replay rebuilds in pure Python — the third recurrence VERDICT
    r13 #5 named.  A mirrored tie-break (max label, or count ties by
    first-seen), an ASYNC update leaking into the round, or a vote that
    counts the node itself would hash-match the unrolled CTE and fail
    here."""
    from collections import Counter

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.graph import (
        _LPA_MIN_WEIGHT, _LPA_ROUNDS, lpa_communities,
    )

    by_order = defaultdict(set)
    for r in (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        by_order[r.l_orderkey].add(r.l_partkey)
    w: Counter = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                w[(ps[i], ps[j])] += 1
    nbrs = defaultdict(list)
    for (u, v), c in w.items():
        if c >= _LPA_MIN_WEIGHT:
            nbrs[u].append(v)
            nbrs[v].append(u)
    lbl = {v: v for v in nbrs}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        for v, ns in nbrs.items():
            votes = Counter(lbl[n] for n in ns)
            nxt[v] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lbl = nxt  # synchronous: every node reads the PREVIOUS round
    sizes = Counter(lbl.values())
    expected = sorted(
        ((s, c) for c, s in sizes.items()), key=lambda t: (-t[0], t[1])
    )[:20]
    got = [
        (r.size, r.community) for r in lpa_communities(spark, SF_DIR).collect()
    ]
    spark.catalog.clearCache()
    assert got == expected


def test_x43_x7_components_match_python_union_find(spark):
    """Connected components replayed by a third ALGORITHM from the
    definition — path-compressed union-find with component-min
    canonical labels — over the same verified near-dup pair graph both
    engines consume.  x43 (star contraction) and x7_neardup_clusters
    (label propagation) share one unrolled-propagation oracle, so a
    bug in the shared PROPAGATION mental model (a direction dropped in
    symmetrization, a round short of the fixture diameter) could
    hash-match across engines and both queries; union-find shares no
    structure with either.  Also checks the membership contract: every
    node of the pair graph appears exactly once, labeled by its
    component minimum."""
    from big_data_project_spark.pipeline.dedup import (
        verified_neardup_pairs, x7_neardup_clusters, x43_largestar_components,
    )

    pairs = [
        (r.doc_a, r.doc_b)
        for r in verified_neardup_pairs(spark, SF_DIR).collect()
    ]
    assert pairs, "fixture must contain near-dup pairs"
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = defaultdict(set)
    for node in parent:
        members[find(node)].add(node)
    expected = {
        node: min(comp) for comp in members.values() for node in comp
    }
    for q in (x43_largestar_components, x7_neardup_clusters):
        got = {r.doc_id: r.cluster for r in q(spark, SF_DIR).collect()}
        spark.catalog.clearCache()
        assert got == expected, q.__name__


def test_x76_textrank_matches_python_power_iteration(spark):
    """TextRank replayed through the SAME shared power-iteration core as
    x51/x67 — the third PageRank variant (word co-occurrence graph,
    weight-proportional contributions, uniform (1-d)/N base).  The
    bigram tokenization, self-pair drop, symmetrization, and weight
    aggregation are rebuilt from the definition in pure Python over the
    raw text column — a mirrored tokenizer quirk (empty tokens kept, a
    window-2 pair counted once instead of per occurrence) or a weight
    folded one generation late would pass the unrolled CTE and fail
    here."""
    from collections import Counter

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import (
        _TR_DAMP, _TR_ITERS, _TR_TOP, textrank_keywords,
    )

    w: Counter = Counter()
    for r in load_table(spark, SF_DIR, "documents").select("text").collect():
        toks = r.text.lower().split(" ")
        for w1, w2 in zip(toks, toks[1:]):
            if w1 and w2 and w1 != w2:
                w[(min(w1, w2), max(w1, w2))] += 1
    edges = [(a, b, c) for (u, v), c in w.items() for a, b in ((u, v), (v, u))]
    nodes = {u for u, _, _ in edges}
    n = len(nodes)
    r0 = {v: round(1.0 / n + 1e-12, 10) for v in nodes}
    base = {v: (1.0 - _TR_DAMP) / n for v in nodes}
    ranks, wout = _replay_power_iteration(edges, base, r0, _TR_DAMP, _TR_ITERS)
    expected = sorted(
        (
            (round(r + 1e-9, 6), v, wout[v])
            for v, r in ranks.items()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:_TR_TOP]
    got = [
        (r.textrank, r.word, r.weighted_degree)
        for r in textrank_keywords(spark, SF_DIR).collect()
    ]
    spark.catalog.clearCache()
    assert got == expected


def test_x25_token_budget_matches_python_greedy(spark):
    """Token-budget selection from the DEFINITION: greedy by
    (score desc, doc_id) until the cumulative token count first
    exceeds floor(frac·total) — a mirrored boundary error (< vs ≤ at
    the budget, ceil vs floor, or a cumsum that skips the current row)
    would agree across the o8 two-pass primitive and the oracle's
    window and fail here.  Tokens count split-on-space INCLUDING empty
    strings (the engines' split semantics)."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.quality import (
        _BUDGET_FRAC, x25_token_budget_select,
    )

    docs = [
        (r.doc_id, len(r.text.split(" ")), r.n_chars)
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    ]
    scored = sorted(
        (
            (round(nc / nt + 1e-9, 6), did, nt)
            for did, nt, nc in docs
        ),
        key=lambda t: (-t[0], t[1]),
    )
    budget = int(_BUDGET_FRAC * sum(nt for _, _, nt in scored))
    expected, cum = set(), 0
    for score, did, nt in scored:
        cum += nt
        if cum > budget:
            break
        expected.add((did, nt, score, cum))
    got = {
        (r.doc_id, r.n_tokens, r.score, r.cum_tokens)
        for r in x25_token_budget_select(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    assert got, "budget selection must keep something"


def test_x28_robust_outliers_match_python_median_mad(spark):
    """Median/MAD outlier gate from the definition (statistics.median =
    exact interpolated median on integer inputs, matching both engines'
    exact median aggregates): per-source median, MAD of absolute
    deviations, flag adev > K·max(mad, 0.5) — a mirrored nearest-rank
    median, an unfloored MAD (zero-deviation sources flagging
    everything), or deviations taken from the global median would pass
    the oracle and fail here."""
    import statistics

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.quality import _MAD_K, x28_robust_outliers

    by_src = defaultdict(list)
    for r in (
        load_table(spark, SF_DIR, "documents").select("source", "n_chars").collect()
    ):
        by_src[r.source].append(r.n_chars)
    expected = {}
    for src, lens in by_src.items():
        med = statistics.median(lens)
        adevs = [abs(x - med) for x in lens]
        mad = statistics.median(adevs)
        n_out = sum(1 for a in adevs if a > _MAD_K * max(mad, 0.5))
        expected[src] = (
            len(lens), n_out, round(med + 1e-9, 4), round(mad + 1e-9, 4)
        )
    got = {
        r.source: (r.n_docs, r.n_outliers, r.med_chars, r.mad_chars)
        for r in x28_robust_outliers(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x34_temperature_mixture_matches_python_formula(spark):
    """Temperature reweighting from the formula (q_s ∝ p_s^0.7, epochs
    = q/p, expected = epochs·n): math.pow is the same libm call DuckDB
    makes, so agreement here plus the driver hash pins Spark's
    java.lang.Math.pow to the same doubles — a mirrored normalization
    error (q over unsummed p^α, or α applied to counts instead of
    shares) would agree across engines and fail here."""
    import math

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.quality import (
        _MIX_TEMP_ALPHA, x34_temperature_mixture,
    )

    counts = defaultdict(int)
    for r in load_table(spark, SF_DIR, "documents").select("source").collect():
        counts[r.source] += 1
    total = sum(counts.values())
    ps = {s: n / total for s, n in counts.items()}
    denom = sum(math.pow(p, _MIX_TEMP_ALPHA) for p in ps.values())
    expected = {}
    for s, n in counts.items():
        p = ps[s]
        q = math.pow(p, _MIX_TEMP_ALPHA) / denom
        expected[s] = (
            n,
            round(p + 1e-9, 6),
            round(q + 1e-9, 6),
            round(q / p + 1e-9, 6),
            round(q / p * n + 1e-9, 4),
        )
    got = {
        r.source: (r.n_docs, r.p, r.q, r.epochs, r.expected_docs)
        for r in x34_temperature_mixture(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x17_data_mixture_matches_python_hash_fanout(spark):
    """Mixture materialization from the definition: per-source weight w
    → floor(w) copies plus one more iff the Knuth multiplicative hash
    fraction (doc_id·2654435761 mod 2^32)/2^32 falls under frac(w) — a
    mirrored modulus (2^31), a biased comparison (≤ vs <), or copy ids
    starting at 0 would agree across engines and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.quality import x17_data_mixture

    expected = set()
    for r in (
        load_table(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    ):
        w = 0.0 if r.source == "src0" else (2.5 if r.source in ("src1", "src2") else 1.0)
        h = (r.doc_id * 2654435761) % 4294967296
        n = int(w) + (1 if h / 4294967296.0 < (w - int(w)) else 0)
        for c in range(1, n + 1):
            expected.add((r.doc_id, r.source, c))
    got = {
        (r.doc_id, r.source, r.copy_id)
        for r in x17_data_mixture(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    assert not any(s == "src0" for _, s, _ in got)


def test_x35_hard_negatives_match_numpy_cosine(spark):
    """Hard-negative mining from the definition: per query, numpy
    cosine against every DIFFERENT-label vector, top-3 by (rounded sim
    desc, neg_id) — a mirrored label predicate (same-label kept, or the
    query itself admitted as its own negative), or a pre-round ranking
    would agree across engines and fail here."""
    import numpy as np

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.similarity import x35_hard_negatives

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    vecs = {r.vec_id: (r.label, np.asarray(r.embedding, dtype=np.float64)) for r in rows}
    expected = set()
    for qid in [i for i in vecs if i < 10]:
        qlabel, vq = vecs[qid]
        scored = []
        for nid, (nlabel, vn) in vecs.items():
            if nlabel == qlabel:
                continue
            sim = float(vq @ vn / (np.linalg.norm(vq) * np.linalg.norm(vn)))
            scored.append((round(sim + 1e-9, 4), nid, nlabel))
        for sim, nid, nlabel in sorted(scored, key=lambda t: (-t[0], t[1]))[:3]:
            expected.add((qid, nid, nlabel, sim))
    got = {
        (r.query_id, r.neg_id, r.neg_label, r.sim)
        for r in x35_hard_negatives(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x48_clip_score_gate_matches_numpy_dot(spark):
    """Score-threshold gate from the definition: numpy dot against the
    broadcast scoring direction, round(+1e-9, 4), keep >= threshold —
    a mirrored fold order that drifts a boundary value across the
    threshold, or a gate on the UNROUNDED score, would agree across
    engines and fail here (the kept SET is the semantics, not just the
    scores)."""
    import numpy as np

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.similarity import (
        _CLIP_DIR, _CLIP_THRESH, x48_clip_score_filter,
    )

    w = np.asarray(_CLIP_DIR, dtype=np.float64)
    expected = {}
    for r in (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    ):
        s = round(float(np.asarray(r.embedding, dtype=np.float64) @ w) + 1e-9, 4)
        if s >= _CLIP_THRESH:
            expected[r.vec_id] = (r.label, s)
    got = {
        r.vec_id: (r.label, r.score)
        for r in x48_clip_score_filter(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    assert expected, "gate must keep something on the fixture"


def test_x9_quality_scores_match_python_ratios(spark):
    """Quality ratios from the definition: tokens = split-on-space
    INCLUDING empties (both engines' split semantics — an empty token
    counts in the denominator, is never a stopword, and never matches
    the digit regex), stopwords matched on the LOWERCASED tokens,
    digits on the raw ones, and the pass flag gated on the UNROUNDED
    stopword ratio — a mirrored empty-token drop, a lowercased digit
    check, or a flag computed from the rounded ratio would agree across
    engines and fail here."""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import _STOPWORDS, x9_quality_scores

    expected = {}
    for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect():
        toks = r.text.split(" ")
        lt = r.text.lower().split(" ")
        n = len(toks)
        stop = sum(1 for w in lt if w in _STOPWORDS) / n
        digit = sum(1 for w in toks if w and w.isdigit()) / n
        expected[r.doc_id] = (
            len(r.text),
            n,
            round(len(r.text) / n + 1e-9, 4),
            round(stop + 1e-9, 4),
            round(digit + 1e-9, 4),
            int(n >= 20 and stop < 0.5),
        )
    got = {
        r.doc_id: (
            r.n_chars_actual, r.n_tokens, r.chars_per_token,
            r.stopword_ratio, r.digit_token_ratio, r.passes_quality,
        )
        for r in x9_quality_scores(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x9_tfidf_matches_python_formula(spark):
    """TF-IDF from the formula: per-(doc, term) counts over lowercased
    split-with-empties tokens, idf = ln(N/df) with N the doc_id<50
    subset size, top-3 per doc by (rounded score desc, term) — a
    mirrored smoothing term (ln(N/(df+1))), a df counted over the full
    corpus instead of the subset, or a pre-round ranking would agree
    across engines and fail here."""
    import math
    from collections import Counter

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.text import x9_tfidf_top_terms

    docs = {
        r.doc_id: r.text.lower().split(" ")
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter("doc_id < 50")
        .collect()
    }
    n = len(docs)
    df: Counter = Counter()
    tf = {}
    for did, toks in docs.items():
        c = Counter(toks)
        tf[did] = c
        df.update(c.keys())
    expected = set()
    for did, c in tf.items():
        scored = [
            (round(f * math.log(n / df[t]) + 1e-9, 4), t)
            for t, f in c.items()
        ]
        for s, t in sorted(scored, key=lambda x: (-x[0], x[1]))[:3]:
            expected.add((did, t, s))
    got = {
        (r.doc_id, r.term, r.tfidf)
        for r in x9_tfidf_top_terms(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x23_incremental_dedup_matches_python_classifier(spark):
    """Incremental admission from the definition: a new-batch doc is
    'exact' if its normalized content hash (lower(trim) + whitespace
    collapse, md5) exists in the old corpus, else 'near' if its
    DISTINCT 3-gram shingle Jaccard with ANY old doc reaches 0.5, else
    'accepted' — replayed with hashlib + raw set arithmetic.  A
    mirrored precedence flip (near checked before exact), a
    directionless Jaccard threshold, or shingling that drops
    empty-token trigrams would agree across engines and fail here.
    (The engine finds near-hits via the LSH band join; the fixture's
    bimodal similarity makes recall 1 — the x7 argument — so the
    definitional exact-Jaccard classifier is the ground truth.)"""
    import re

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.dedup import (
        _OLD_SOURCES, x23_incremental_dedup,
    )

    old_hashes, old_shingles, new_docs = set(), [], []
    for r in (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .collect()
    ):
        norm = re.sub(r"\s+", " ", r.text.strip(" ").lower())
        h = hashlib.md5(norm.encode()).hexdigest()
        toks = r.text.split(" ")
        sh = (
            {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3
            else None
        )
        if r.source in _OLD_SOURCES:
            old_hashes.add(h)
            if sh:
                old_shingles.append(sh)
        else:
            new_docs.append((r.doc_id, h, sh))
    expected = {}
    for did, h, sh in new_docs:
        if h in old_hashes:
            expected[did] = "exact"
        elif sh and any(
            len(sh & o) / len(sh | o) >= 0.5 for o in old_shingles
        ):
            expected[did] = "near"
        else:
            expected[did] = "accepted"
    got = {
        r.doc_id: r.status for r in x23_incremental_dedup(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    assert set(expected.values()) >= {"accepted"}, "fixture should admit something"


def test_b2_cohort_retention_matches_python_calendar(spark):
    """Cohort retention from the definition: cohort = midnight of each
    user's FIRST event, day_offset = calendar-day difference, distinct
    (user, offset) pairs counted per (cohort, offset) ≤ 7 — a mirrored
    offset computed from raw timestamp deltas (86400-second buckets
    instead of calendar days), an undeduplicated activity join, or an
    off-by-one at the 7-day fence would agree across engines and fail
    here."""
    import datetime

    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.behavior import b2_cohort_retention

    rows = load_table(spark, SF_DIR, "events").select("user_id", "ts").collect()
    first = {}
    for r in rows:
        if r.user_id not in first or r.ts < first[r.user_id]:
            first[r.user_id] = r.ts
    cohort = {
        u: datetime.datetime.combine(ts.date(), datetime.time())
        for u, ts in first.items()
    }
    activity = {
        (r.user_id, (r.ts.date() - cohort[r.user_id].date()).days)
        for r in rows
    }
    expected = defaultdict(int)
    for u, off in activity:
        if off <= 7:
            expected[(cohort[u], off)] += 1
    got = {
        (r.cohort_day, r.day_offset): r.n_active
        for r in b2_cohort_retention(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == dict(expected)


def test_b3_next_event_pattern_matches_python_sequences(spark):
    """Purchase→error adjacency from the definition: per user, sort by
    (ts, event_id), look at the IMMEDIATELY next event only, require
    error within 5 minutes INCLUSIVE — a mirrored any-later-error scan,
    an exclusive fence, or a sort missing the event_id tie-break would
    agree across engines and fail here.  Runs at the sf0.01 tier: the
    sf0.001 events fixture contains ZERO qualifying runs (the replay
    agrees, but a vacuous agreement pins nothing), while sf0.01 has
    them."""
    import datetime

    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.behavior import b3_next_event_pattern
    from tests.conftest import SF_DIR_ORACLE

    by_user = defaultdict(list)
    for r in (
        load_table(spark, SF_DIR_ORACLE, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    ):
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    expected = {}
    fence = datetime.timedelta(minutes=5)
    for u, evs in by_user.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        n = sum(
            1
            for (ts, _, et), (nts, _, net) in zip(evs, evs[1:])
            if et == "purchase" and net == "error" and nts <= ts + fence
        )
        if n:
            expected[u] = n
    got = {
        r.user_id: r.n_purchase_then_error
        for r in b3_next_event_pattern(spark, SF_DIR_ORACLE).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
    assert expected, "sf0.01 should contain purchase-then-error runs"


def test_b4_resample_ffill_matches_python_grid(spark):
    """Daily resample + forward fill from the definition: per user, a
    COMPLETE day grid from first to last active day (gap days present),
    observed days carry round-HALF-UP(avg, 4), gaps carry the last
    observed value forward, days before the first observation stay
    null — a mirrored grid built only over observed days, a backward
    fill, or a fill that crosses users would agree across engines and
    fail here.  (The engine rounds WITHOUT the 1e-9 nudge here, so the
    replay uses decimal ROUND_HALF_UP — the x46 convention.)"""
    import datetime
    from decimal import ROUND_HALF_UP, Decimal

    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.behavior import b4_resample_ffill

    by_user_day = defaultdict(list)
    for r in (
        load_table(spark, SF_DIR, "events")
        .filter("user_id < 10")
        .select("user_id", "ts", "value")
        .collect()
    ):
        by_user_day[(r.user_id, r.ts.date())].append(float(r.value))
    users = defaultdict(list)
    for (u, d), vals in by_user_day.items():
        users[u].append(d)
    expected = {}
    for u, days in users.items():
        d0, d1 = min(days), max(days)
        carry = None
        d = d0
        while d <= d1:
            if (u, d) in by_user_day:
                vals = by_user_day[(u, d)]
                avg = sum(vals) / len(vals)
                carry = float(
                    Decimal(repr(avg)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
                )
            expected[(u, datetime.datetime.combine(d, datetime.time()))] = carry
            d += datetime.timedelta(days=1)
    got = {
        (r.user_id, r.day): r.filled_value
        for r in b4_resample_ffill(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_a17_a25_bivariate_stats_match_numpy(spark):
    """Pearson correlation, sample covariance, and the OLS family
    (slope, intercept, R², n) recomputed from their closed forms in
    numpy per group — a mirrored population/sample denominator (n vs
    n−1), a slope from the POPULATION covariance over the sample
    variance, or an R² that is not corr² would agree across the
    engines' co-moment accumulators and fail here."""
    import numpy as np

    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.aggregates import (
        a17_corr_covar, a25_regression,
    )

    by_flag = defaultdict(lambda: ([], []))
    for r in (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    ):
        xs, ys = by_flag[r.l_returnflag]
        xs.append(float(r.l_quantity))
        ys.append(float(r.l_extendedprice))
    exp17, exp25 = {}, {}
    for flag, (xs, ys) in by_flag.items():
        x, y = np.asarray(xs), np.asarray(ys)
        n = len(x)
        covs = float(((x - x.mean()) * (y - y.mean())).sum() / (n - 1))
        corr = covs / float(x.std(ddof=1) * y.std(ddof=1))
        slope = covs / float(x.var(ddof=1))
        intercept = float(y.mean()) - slope * float(x.mean())
        exp17[flag] = (round(corr, 4), round(covs, 4))
        exp25[flag] = (
            round(slope + 1e-9, 4),
            round(intercept + 1e-9, 4),
            round(corr * corr + 1e-9, 6),
            n,
        )
    got17 = {
        r.l_returnflag: (r.qty_price_corr, r.qty_price_covar)
        for r in a17_corr_covar(spark, SF_DIR).collect()
    }
    got25 = {
        r.l_returnflag: (r.slope, r.intercept, r.r2, r.n)
        for r in a25_regression(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got17 == exp17
    assert got25 == exp25


def test_w5_distribution_ranks_match_python_formulas(spark):
    """ntile/percent_rank/cume_dist from their SQL-standard formulas:
    within each (priority) partition sorted by (price, key) —
    percent_rank = (rank−1)/(n−1) with rank sharing ties, cume_dist =
    (#rows ≤ current by sort PEER group)/n, and ntile(4) distributing
    the remainder to the FIRST buckets (sizes ⌈n/4⌉ for the first
    n mod 4 tiles) — a mirrored remainder-to-last-buckets ntile, a
    row_number-based percent_rank, or a cume_dist that ignores peers
    would agree across engines and fail here.  (This fixture's
    (price, key) sort is totally ordered, so peers are singletons —
    the tie formulas still pin rank vs row_number by construction.)"""
    from big_data_project_spark.io import load_table
    from big_data_project_spark.operators.windows import w5_distribution_ranks

    by_prio = defaultdict(list)
    for r in (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .collect()
    ):
        by_prio[r.o_orderpriority].append((float(r.o_totalprice), r.o_orderkey))
    expected = {}
    for prio, rows in by_prio.items():
        rows.sort()
        n = len(rows)
        base, rem = divmod(n, 4)
        for i, (_, key) in enumerate(rows):
            # ntile: first `rem` buckets get base+1 rows
            boundary = rem * (base + 1)
            tile = (
                i // (base + 1) + 1
                if i < boundary
                else rem + (i - boundary) // base + 1
            ) if base else i + 1
            pct = round((i / (n - 1) if n > 1 else 0.0) + 1e-9, 4)
            cume = round((i + 1) / n + 1e-9, 4)
            expected[(prio, key)] = (tile, pct, cume)
    got = {
        (r.o_orderpriority, r.o_orderkey): (r.quartile, r.pct_rank, r.cume)
        for r in w5_distribution_ranks(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected


def test_x13_mapinarrow_norm_matches_python_l2(spark):
    """The mapInArrow L2-norm kernel against a per-row math.sqrt fold in
    pure Python — a kernel that reshapes the flat Arrow buffer with the
    wrong row stride (the classic zero-copy bug: norms would come from
    NEIGHBORING vectors' halves), or accumulates in float32, would
    agree with nothing here."""
    import math

    from big_data_project_spark.io import load_table
    from big_data_project_spark.pipeline.similarity import x13_mapinarrow_norm

    expected = {
        r.vec_id: round(
            math.sqrt(sum(float(x) * float(x) for x in r.embedding)) + 1e-9, 4
        )
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    got = {
        r.vec_id: r.l2_norm for r in x13_mapinarrow_norm(spark, SF_DIR).collect()
    }
    spark.catalog.clearCache()
    assert got == expected
