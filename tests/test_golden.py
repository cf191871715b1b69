"""Golden-snapshot tests (SURVEY §5.2) — the Spark analog of the
reference's committed golden images (inference/*.png, README.md:20-31).

Snapshots were generated at sf0.001 and are committed; any change to
these query results is a semantic regression, not a refactor.
Regenerate deliberately with:  python tests/regen_golden.py
"""

from __future__ import annotations

import json
import os

import pytest

from big_data_project_spark.registry import all_queries

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SF = "/root/testdata/sf0.001"

GOLDEN = [f[: -len(".json")] for f in sorted(os.listdir(GOLDEN_DIR)) if f.endswith(".json")]


def _canon(rows, cols):
    out = [{c: str(r[c]) for c in cols} for r in rows]
    out.sort(key=lambda r: json.dumps(r, sort_keys=True))
    return out


@pytest.mark.parametrize("name", GOLDEN)
def test_golden(spark, name):
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        want = json.load(f)
    df = all_queries()[name](spark, SF)
    assert df.columns == want["columns"], "schema drift"
    got = _canon([r.asDict() for r in df.collect()], want["columns"])
    assert got == _canon(want["rows"], want["columns"]), f"value drift in {name}"
