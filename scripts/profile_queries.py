"""Capture explain('formatted') + split build/exec timings for bench queries.

Usage: python scripts/profile_queries.py <outdir> [suffix] [names_csv]

For each query: writes <outdir>/<name>_<suffix>.txt with the formatted plan,
and prints one JSON line per query: {"name", "build_s", "exec_s", "n_exchange",
"n_python", "join_nodes"} so optimization targets separate driver-side plan
construction cost (build) from cluster execution (exec, via noop sink).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketpipe_spark.plans import registry  # noqa: E402
from marketpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("marketpipe-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.spark_queries()
    # Warm codegen once (same as bench.py).
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    todo = names if names else list(qs)
    for name in todo:
        if name not in qs:
            print(json.dumps({"name": name, "err": "unknown"}), flush=True)
            continue
        try:
            spark.sparkContext.setJobDescription(f"profile-build: {name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            build_s = time.time() - t0
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            spark.sparkContext.setJobDescription(f"profile-exec: {name}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            exec_s = time.time() - t0
            rec = {
                "name": name,
                "build_s": round(build_s, 3),
                "exec_s": round(exec_s, 3),
                "n_exchange": len(re.findall(r"\bExchange\b", plan)),
                "n_python": len(
                    re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
                ),
                "join_nodes": sorted(
                    set(re.findall(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan))
                ),
            }
            print(json.dumps(rec), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "err": str(e)[:200]}), flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
