"""Full-registry plan audit: count recompute-suspect nodes per entry.

Builds every registry plan (no execution) and reports, per entry, the
number of Generate / Python-boundary / parquet-scan / Exchange nodes and
how many DISTINCT parquet locations vs total scans (total >> distinct
suggests the same table is re-scanned by multiple consumers). Output is
one JSON line per entry, sorted findings to stderr-free stdout.

Usage: python scripts/plan_audit.py [out.jsonl]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketpipe_spark.plans import registry  # noqa: E402
from marketpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("mp-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.spark_queries()
    rows = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            locs = re.findall(r"InMemoryFileIndex[^\]]*\[([^\]]*)\]", plan)
            rows.append(
                {
                    "name": name,
                    "generate": plan.count("Generate"),
                    "python": len(re.findall(r"MapInPandas|ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInArrow", plan)),
                    "scans": len(locs),
                    "distinct_scans": len(set(locs)),
                    "rdd_scans": plan.count("Scan ExistingRDD"),
                    "exchanges": plan.count("Exchange"),
                    "smj": plan.count("SortMergeJoin"),
                }
            )
        except Exception as e:  # noqa: BLE001
            rows.append({"name": name, "err": str(e)[:160]})
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
