"""A/B a set of session confs over a basket of registry queries.

Usage: python scripts/conf_ab.py "<k=v,k=v|label>" "<k=v|label>" ... -- name1,name2,...

Each arm builds a FRESH SparkSession JVM? No — local mode shares one JVM; all
arm confs here are runtime SQL confs, so one session is reused and confs are
set/unset per arm (plan caches keyed on conf fingerprint are bypassed by
building plans fresh each arm). Each arm runs the basket twice; the report
keeps both passes (pass1 includes plan build + codegen, pass2 is warm).
Prints one JSON line per (arm, pass).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketpipe_spark.plans import registry  # noqa: E402
from marketpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    sep = sys.argv.index("--")
    arms = sys.argv[1:sep]
    names = sys.argv[sep + 1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("AB_REPEATS", "2"))

    spark = get_spark("marketpipe-conf-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.spark_queries()
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for arm in arms:
        kvs, _, label = arm.partition("|")
        pairs = [kv.split("=", 1) for kv in kvs.split(",") if kv]
        old = {}
        for k, v in pairs:
            try:
                old[k] = spark.conf.get(k)
            except Exception:
                old[k] = None
            spark.conf.set(k, v)
        try:
            for p in range(repeats):
                per = {}
                t_all = time.time()
                for name in names:
                    t0 = time.time()
                    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                    per[name] = round(time.time() - t0, 3)
                print(
                    json.dumps(
                        {
                            "arm": label or kvs,
                            "pass": p,
                            "total": round(time.time() - t_all, 3),
                            "queries": per,
                        }
                    ),
                    flush=True,
                )
        finally:
            for k, v in old.items():
                if v is None:
                    try:
                        spark.conf.unset(k)
                    except Exception:
                        pass
                else:
                    spark.conf.set(k, v)


if __name__ == "__main__":
    main()
