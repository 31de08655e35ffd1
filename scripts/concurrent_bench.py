#!/usr/bin/env python3
"""Concurrent-query throughput: the multi-tenant serving dimension.

A cluster doesn't run one query at a time; this measures the headline
basket submitted through ONE SparkSession from N driver threads (Spark
sessions are thread-safe; each thread gets its own job group) under the
FAIR scheduler, against the same basket run sequentially. The interesting
number is the wall-clock speedup: tiny single-row-group queries leave most
of local[32] idle, so overlapping them recovers the per-query submit/
codegen floor that dominates the sf0.1 bench — the same effect a real
cluster gets from concurrent ETL jobs sharing executors.

Prints one JSON line: sequential wall, concurrent wall (N threads),
speedup, and per-query times from the concurrent run (these INCLUDE queue
wait — they are latencies under load, not isolated costs).

Usage: python scripts/concurrent_bench.py [--threads 4]
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
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
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

    def run_one(name: str) -> float:
        t0 = time.time()
        qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # Warm one plan family, then sequential baseline.
    run_one("pricing_summary")
    t0 = time.time()
    seq = {n: run_one(n) for n in names}
    seq_wall = round(time.time() - t0, 3)

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=args.threads) as ex:
        conc = dict(zip(names, ex.map(run_one, names)))
    conc_wall = round(time.time() - t0, 3)

    payload = {
        "metric": "headline_concurrent_wall",
        "threads": args.threads,
        "sequential_wall_sec": seq_wall,
        "concurrent_wall_sec": conc_wall,
        "speedup": round(seq_wall / conc_wall, 2),
        "sequential_latencies": seq,
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
