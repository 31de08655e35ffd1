#!/usr/bin/env python3
"""Concurrent-query throughput: the multi-tenant serving dimension.

A cluster doesn't run one query at a time; this measures the headline
basket submitted through ONE SparkSession from N driver threads (Spark
sessions are thread-safe; each thread gets its own job group) under the
FAIR scheduler — the deployment shape a serving tier actually runs.

Round 9: the basket executes through the PREBUILT-PLAN cache
(plans.registry.prebuilt) — plans are built once at warm-up, then every
request executes a cached analyzed plan, exactly how a serving deployment
amortizes driver-side plan construction. FLOOR_EXPERIMENT.json measured
rebuild at ~15% of sequential wall and 8-thread prebuilt execution at
1.69 s for the 20-query basket. Reported walls:

- sequential_cold_wall_sec    fresh plan build + execute per query
- sequential_cached_wall_sec  same loop over prebuilt plans
- concurrent_wall_sec         N threads over prebuilt plans
- oracle_wall_sec             the same 20 oracle SQLs in DuckDB
  (threads=4, the reference's pragma), run in THIS session on THIS
  machine — the honest same-session comparator.

Prints one JSON line. Per-query concurrent latencies INCLUDE queue wait —
they are latencies under load, not isolated costs.

Usage: python scripts/concurrent_bench.py [--threads 8] [--round N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-oracle", action="store_true", help="skip the DuckDB comparator")
    ap.add_argument(
        "--repeats", type=int, default=5,
        help="repeat the concurrent basket N times and report per-repeat "
        "walls plus median/p95 — r9 saw ~20%% run-to-run variance on a "
        "single measurement, so the serving bar is now judged on the "
        "repeat distribution (p95), not one draw",
    )
    ap.add_argument(
        "--round", default=None,
        help="also write CONCURRENT_BENCH_r{N}.json at the repo root — the "
        "per-round artifact tracking the deployment-reality number next to "
        "the sequential BENCH_r{N}.json floor",
    )
    args = ap.parse_args()

    from marketpipe_spark.plans import registry
    from marketpipe_spark.session import get_spark

    spark = get_spark(
        "marketpipe-concurrent-bench", extra_conf={"spark.scheduler.mode": "FAIR"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.spark_queries()
    names = [n for n in HEADLINE if n in qs]

    def execute(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm the JVM/codegen path once.
    execute(qs["pricing_summary"](spark, args.sf_dir))

    # Cold: build + execute per query (the per-invocation floor).
    registry.clear_plan_cache()
    t0 = time.time()
    cold = {}
    for n in names:
        t1 = time.time()
        execute(registry.prebuilt(spark, n, args.sf_dir))
        cold[n] = round(time.time() - t1, 3)
    cold_wall = round(time.time() - t0, 3)

    # Cached sequential: every plan is now prebuilt.
    t0 = time.time()
    cached = {}
    for n in names:
        t1 = time.time()
        execute(registry.prebuilt(spark, n, args.sf_dir))
        cached[n] = round(time.time() - t1, 3)
    cached_wall = round(time.time() - t0, 3)

    # Concurrent over prebuilt plans — the serving-mode number.
    def run_one(name: str) -> float:
        t1 = time.time()
        execute(registry.prebuilt(spark, name, args.sf_dir))
        return round(time.time() - t1, 3)

    conc_walls = []
    conc = {}
    for _rep in range(max(1, args.repeats)):
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=args.threads) as ex:
            lat = dict(zip(names, ex.map(run_one, names)))
        conc_walls.append(round(time.time() - t0, 3))
        if not conc:
            conc = lat  # keep the first repeat's per-query latencies
    sw = sorted(conc_walls)
    conc_median = sw[len(sw) // 2] if len(sw) % 2 else round(
        (sw[len(sw) // 2 - 1] + sw[len(sw) // 2]) / 2, 3
    )
    # Nearest-rank p95: ceil(0.95 * n) - 1. At the default n=5 this IS the
    # sample maximum — deliberately conservative (the bar is judged on the
    # worst of 5 stable repeats, labeled as such in the artifact).
    import math as _math

    conc_p95 = sw[min(len(sw) - 1, _math.ceil(0.95 * len(sw)) - 1)]
    conc_wall = conc_median  # headline = median of repeats

    oracle_wall = None
    if not args.no_oracle:
        import duckdb

        sqls = registry.oracle_sqls()
        con = duckdb.connect()
        con.execute("PRAGMA threads=4")
        for tname in registry.TABLES:
            con.execute(
                f"CREATE VIEW {tname} AS SELECT * FROM "
                f"read_parquet('{args.sf_dir}/{tname}.parquet')"
            )
        # Warm once (buffer pool), then time the basket.
        con.execute(sqls["pricing_summary"]).fetchall()
        t0 = time.time()
        for n in names:
            if n in sqls:
                con.execute(sqls[n]).fetchall()
        oracle_wall = round(time.time() - t0, 3)

    payload = {
        "metric": "headline_concurrent_wall",
        "threads": args.threads,
        "sequential_cold_wall_sec": cold_wall,
        "sequential_cached_wall_sec": cached_wall,
        "concurrent_wall_sec": conc_wall,
        "concurrent_repeats_sec": conc_walls,
        "concurrent_median_sec": conc_median,
        "concurrent_p95_sec": conc_p95,
        "oracle_wall_sec": oracle_wall,
        "concurrent_vs_oracle": (
            round(conc_wall / oracle_wall, 2) if oracle_wall else None
        ),
        "concurrent_p95_vs_oracle": (
            round(conc_p95 / oracle_wall, 2) if oracle_wall else None
        ),
        "speedup_vs_cold": round(cold_wall / conc_wall, 2),
        "cold_latencies": cold,
        "cached_latencies": cached,
        "concurrent_latencies": conc,
        "sf_dir": args.sf_dir,
    }
    print(json.dumps(payload))
    if args.round is not None:
        path = os.path.join(REPO, f"CONCURRENT_BENCH_r{args.round}.json")
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"-> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
