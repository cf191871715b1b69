"""Unit tests for bench.py's discard-flag semantics — no Spark needed.

The recorded-file-reproducibility property (BASELINE.md, ADVICE r15/r16):
`calib_flag` in any BENCH json must be recomputable from that file's own
rounded calib readings, so every discard decision can be audited after
the fact.  These tests pin the comparison semantics the adjudications
rely on."""

import json
from pathlib import Path

from bench import _CALIB_BANDS, calib_flag


def test_clean_readings_unflagged():
    assert calib_flag({k: b for k, b in _CALIB_BANDS.items()}) == []


def test_exceeding_any_band_flags_that_axis():
    for k, b in _CALIB_BANDS.items():
        readings = dict.fromkeys(_CALIB_BANDS, 0.0)
        readings[k] = b + 0.001
        assert calib_flag(readings) == [k]


def test_none_and_unknown_axes_never_flag():
    readings = dict.fromkeys(_CALIB_BANDS)
    readings["calib_stages_sec"] = 99.0
    readings["calib_jvm_end_sec"] = 99.0
    readings["calib_stages_end_sec"] = 99.0
    assert calib_flag(readings) == []


def test_recorded_driver_files_reproduce_their_own_flag():
    """Every committed BENCH_r*.json's flag must equal the flag
    recomputed from its own recorded readings — the audit property the
    discard rules depend on."""
    root = Path(__file__).resolve().parent.parent
    checked = 0
    for path in sorted(root.glob("BENCH_r*.json")):
        raw = json.loads(path.read_text())
        parsed = raw.get("parsed", raw)
        if not isinstance(parsed, dict) or "calib_flag" not in parsed:
            continue
        readings = {k: parsed.get(k) for k in _CALIB_BANDS}
        assert calib_flag(readings) == sorted(parsed["calib_flag"]), path.name
        checked += 1
    assert checked > 0
