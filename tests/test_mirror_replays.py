"""Independent pure-Python replays for oracle-backed queries whose only
value evidence was the DuckDB diff (w9, b6, b7, o14, j13 — all in the
r12 driver window).

The oracle gate cannot catch MIRRORED bugs: both engines implementing
the same wrong mental model hash-match each other.  The defense is a
third implementation written from the operator's DEFINITION (numpy /
hashlib / math), the x86/x88 replay-test convention — these four were
the intricate-semantics rows still lacking one (trailing-frame
interpolated median, calendar-window distinct, bracketing-anchor
interpolation, inverse-CDF bootstrap weights).

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
