#!/usr/bin/env python3
"""Decompose the per-query sequential floor at small SF.

For each headline query, separately time:
  build   — Python-side DataFrame construction (Py4J plan assembly)
  execute — noop-sink materialization (analysis + optimization + run)
and count the Spark jobs the action spawned (AQE runs one job per
materialized stage, so job count ~ scheduling rounds).

Then A/B the same basket under candidate runtime confs, in the SAME
process and order, to separate conf effects from JVM warmup.

Usage: python scripts/floor_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketpipe_spark.plans import registry
from marketpipe_spark.session import get_spark

BASKET = [
    "pricing_summary", "resample_5m", "vwap", "daily_summary",
    "availability_summary", "top_customers", "regional_revenue",
    "latest_event_per_user", "sma_20", "volatility_20",
    "exact_dedup", "validation_report", "embedding_near_dup",
]

CONF_VARIANTS = {
    "baseline": {},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "shuffle8": {"spark.sql.shuffle.partitions": "8"},
    "aqe_off_shuffle8": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    },
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("floor-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = registry.spark_queries()

    # Warm everything once.
    for name in BASKET:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def job_count() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    # Phase 1: build vs execute decomposition (baseline confs).
    decomp = {}
    for name in BASKET:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t_build = time.time() - t0
        sc.setJobGroup(f"fp-{name}", name)
        before = len(sc.statusTracker().getJobIdsForGroup(f"fp-{name}") or [])
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.time() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"fp-{name}") or []) - before
        sc.setJobGroup("", "")
        decomp[name] = {
            "build_s": round(t_build, 3),
            "exec_s": round(t_exec, 3),
            "jobs": jobs,
        }

    # Phase 2: conf A/B on total basket wall (2 passes each, min taken).
    saved = {k: spark.conf.get(k, None) for v in CONF_VARIANTS.values() for k in v}
    ab = {}
    for variant, confs in CONF_VARIANTS.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        walls = []
        for _ in range(2):
            t0 = time.time()
            for name in BASKET:
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        ab[variant] = {"walls": walls, "min": min(walls)}
        for k in confs:
            if saved.get(k) is not None:
                spark.conf.set(k, saved[k])

    out = {"sf_dir": sf_dir, "decomp": decomp, "conf_ab": ab}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
