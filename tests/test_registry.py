"""Unit tests for the verification-window ordering in registry._ordered.

The driver checks only the first ~50 entries of all_queries() per round,
so this ordering IS the verification budget — a silent regression here
wastes a whole round of driver bandwidth (r02 lost 8 slots to a stale
pinned-front list).  These tests pin the rules:

  1. flagship first;
  2. _FRONT names pinned ONLY while they lack a green driver row;
  3. _REVERIFY names pinned even when green (stale-green re-check);
  4. never-green oracle-backed queries before rows-only-never-seen;
  5. everything green goes to the back.
"""

from __future__ import annotations

from big_data_project_spark import registry

registry.load()
ALL = list(registry.QUERIES)


def order_with(monkeypatch, green=frozenset(), seen=frozenset(), last_round=None):
    monkeypatch.setattr(
        registry,
        "_driver_verified",
        lambda: (set(green), set(green) | set(seen), dict(last_round or {})),
    )
    return registry._ordered(ALL)


REVERIFY_NAMES = [n for n, _ in registry._REVERIFY]


def test_flagship_always_first(monkeypatch):
    assert order_with(monkeypatch)[0] == "flagship_pricing_summary"
    assert order_with(monkeypatch, green={"flagship_pricing_summary"})[0] == (
        "flagship_pricing_summary"
    )


def test_front_pinned_while_unverified(monkeypatch):
    names = order_with(monkeypatch)
    head = names[1 : 1 + len(registry._FRONT) + len(registry._REVERIFY)]
    for n in registry._FRONT:
        assert n in head, f"{n} should be pinned while it has no green row"


def test_front_demotes_once_green(monkeypatch):
    green = set(registry._FRONT)
    names = order_with(monkeypatch, green=green)
    window = names[:50]
    for n in registry._FRONT:
        assert n not in window, f"{n} is green — it must not burn a window slot"


def test_reverify_pinned_while_row_is_stale(monkeypatch):
    # green row from r01 only (<= stale_through_round) -> still pinned
    names = order_with(
        monkeypatch, green=set(REVERIFY_NAMES),
        last_round={n: 1 for n in REVERIFY_NAMES},
    )
    head = names[: 1 + len(registry._FRONT) + len(registry._REVERIFY)]
    for n in REVERIFY_NAMES:
        assert n in head, f"{n} has a STALE green row — it must be re-checked"


def test_reverify_dissolves_after_fresh_row(monkeypatch):
    # any row in a round AFTER stale_through_round -> pin dissolves
    names = order_with(
        monkeypatch, green=set(REVERIFY_NAMES),
        last_round={n: 3 for n in REVERIFY_NAMES},
    )
    window = names[:50]
    for n in REVERIFY_NAMES:
        assert n not in window, f"{n} was re-checked in r03 — pin must dissolve"


def test_unverified_oracles_fill_window_before_green(monkeypatch):
    some_green = {n for i, n in enumerate(sorted(registry.ORACLES)) if i % 2 == 0}
    names = order_with(monkeypatch, green=some_green)
    window = set(names[:50])
    # no green query (outside flagship/_REVERIFY) may outrank an
    # unverified oracle-backed one
    unverified = [
        n for n in ALL
        if n in registry.ORACLES and n not in some_green
        and n != "flagship_pricing_summary"
    ]
    n_pinned = 1 + len([f for f in registry._FRONT if f not in some_green]) + len(
        [n for n in REVERIFY_NAMES]
    )
    expect_in_window = min(len(unverified), 50 - n_pinned)
    got = sum(1 for n in unverified if n in window)
    assert got >= expect_in_window, (
        f"only {got} of {expect_in_window} expected unverified oracle-backed "
        "queries made the 50-slot window"
    )


def test_rows_only_never_seen_before_green(monkeypatch):
    rows_only = [n for n in ALL if n not in registry.ORACLES]
    assert rows_only, "fixture expects some rows-only queries"
    green = set(registry.ORACLES)  # every oracle-backed query already green
    names = order_with(monkeypatch, green=green)
    first_green_pos = min(
        names.index(n)
        for n in green
        if n != "flagship_pricing_summary" and n not in REVERIFY_NAMES
    )
    for n in rows_only:
        assert names.index(n) < first_green_pos, (
            f"rows-only never-seen {n} must outrank already-green queries"
        )


def test_every_oracle_has_a_query():
    assert set(registry.ORACLES) <= set(registry.QUERIES)
