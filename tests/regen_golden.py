"""Regenerate golden snapshots (run deliberately after an intended
semantic change): python tests/regen_golden.py"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_project_spark import registry
from big_data_project_spark.session import get_spark

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="golden", shuffle_partitions=8)
    qs = registry.all_queries()
    for f in sorted(os.listdir(GOLDEN_DIR)):
        if not f.endswith(".json"):
            continue
        name = f[: -len(".json")]
        df = qs[name](spark, SF)
        rows = [r.asDict() for r in df.collect()]
        cols = df.columns
        rows.sort(key=lambda r: json.dumps({c: str(r[c]) for c in cols}, sort_keys=True))
        with open(os.path.join(GOLDEN_DIR, f), "w") as out:
            json.dump({"columns": cols, "rows": rows}, out, indent=1, default=str)
        print(name, len(rows), "rows")


if __name__ == "__main__":
    main()
