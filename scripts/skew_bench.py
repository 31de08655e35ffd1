#!/usr/bin/env python3
"""Hot-key skew cells for the per-symbol window family (VERDICT r6 #2).

SURVEY §7.4 flagged "watch skew for hot symbols": `validation_report`,
`sma_20`, `volatility_20` all run `Window.partitionBy(symbol)`, and
`user_sessions` runs per-user windows — one key holding half the rows means
one straggler task at 100×, no matter how many executors exist. This
script MEASURES that bound and the r7 mitigation instead of asserting:

- uniform ×F: events replicated F× with scale_bench's shifted keys
  (F× the symbols/users, balanced) — events only, the window family reads
  nothing else;
- skewed ×F: the SAME rows, but the top half of the replica range
  collapses onto ONE symbol (`hot`) and ONE user (id 0) — ~50 % of all
  rows in a single window partition for both families.

For each op it records wall seconds on both tables; `*_skewsafe` entries
run the r7 chunked-window mitigation (`skew.chunked_trailing_frame` —
bounded 20-row carries across 1-day chunks, bit-identical output, hot
partition split over symbol-days). wall(skew)/wall(uniform) is the pure
skew tax; skewsafe-vs-plain ON THE SKEWED table is the mitigation win.

Writes SKEW_BENCH.json at the repo root.

Usage: python scripts/skew_bench.py [--factor 64] [--ops a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TMP = os.path.join(REPO, ".scale_tmp")

DEFAULT_OPS = [
    "validation_report",
    "validation_report_skewsafe",
    "validation_report_skewauto",
    "sma_20",
    "sma_20_skewsafe",
    "volatility_20",
    "user_sessions",
    "user_sessions_skewsafe",
    # r9: join-family auto-dispatch (hot-key chunked as-of, salted slab join)
    "asof_trade_quote",
    "asof_trade_quote_skewauto",
    "interval_join_sessions",
    "interval_join_sessions_skewauto",
]


def build_events(
    spark, factor: int, out_dir: str, skewed: bool, unordered: bool = False
) -> None:
    """Events-only ×factor replication (scale_bench's shift model). When
    ``skewed``, replicas >= factor/2 collapse onto one symbol + one user.
    ``unordered`` scrambles PHYSICAL row order (sortWithinPartitions on a
    row hash) — same rows, ~0.5 monotonic-ts fraction instead of the
    near-sorted layout the source parquet has; the r10 sortedness guard
    dispatches the two layouts differently, so the bench needs both."""
    from pyspark.sql import functions as F

    from marketpipe_spark.session import tune

    tune(spark)
    os.makedirs(out_dir, exist_ok=True)
    rep = spark.range(factor).select(F.col("id").alias("_r"))
    r = F.col("_r")
    hot = r >= factor // 2
    ev = spark.read.parquet(f"{BASE}/events.parquet").crossJoin(F.broadcast(rep))
    sym = F.when(r == 0, F.col("event_type")).otherwise(
        F.concat_ws("_", "event_type", r)
    )
    uid = F.col("user_id") + r * F.lit(10**7)
    if skewed:
        sym = F.when(hot, F.lit("hot")).otherwise(sym)
        uid = F.when(hot, F.lit(0)).otherwise(uid)
    out = ev.select(
        (F.col("event_id") + r * F.lit(10**9)).alias("event_id"),
        "ts",
        uid.alias("user_id"),
        sym.alias("event_type"),
        "value",
        "props",
    )
    if unordered:
        out = out.sortWithinPartitions(F.pmod(F.xxhash64("event_id"), F.lit(1 << 20)))
    out.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=64)
    ap.add_argument("--ops", default=",".join(DEFAULT_OPS))
    ap.add_argument(
        "--order",
        choices=["sorted", "unordered"],
        default="sorted",
        help="physical row order of the built tables; unordered cells land "
        "under the x{factor}_unordered key",
    )
    args = ap.parse_args()
    ops = args.ops.split(",")

    from marketpipe_spark.plans import registry
    from marketpipe_spark.session import get_spark

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.spark_queries()

    unordered = args.order == "unordered"
    suffix = "_unordered" if unordered else ""
    dirs = {}
    for tag, skewed in (("uniform", False), ("skewed", True)):
        d = os.path.join(TMP, f"ev{args.factor}_{tag}{suffix}")
        if not os.path.exists(os.path.join(d, "_built")):
            build_events(spark, args.factor, d, skewed, unordered=unordered)
            open(os.path.join(d, "_built"), "w").close()
        dirs[tag] = d

    results: dict[str, dict[str, float]] = {}
    qs[ops[0]](spark, dirs["uniform"]).write.format("noop").mode("overwrite").save()  # warm
    for op in ops:
        for tag, d in dirs.items():
            t0 = time.time()
            qs[op](spark, d).write.format("noop").mode("overwrite").save()
            results.setdefault(op, {})[tag] = round(time.time() - t0, 2)
        u, s = results[op]["uniform"], results[op]["skewed"]
        results[op]["skew_tax"] = round(s / u, 2) if u else None
        print(f"  {op}: uniform {u}s skewed {s}s tax {results[op]['skew_tax']}x",
              file=sys.stderr)

    # Cumulative artifact: cells keyed by ×factor, ops merged per cell, so
    # partial re-runs (--ops a,b --factor F) never clobber other cells.
    path = os.path.join(REPO, "SKEW_BENCH.json")
    doc: dict = {"hot_share": 0.5, "cells": {}}
    if os.path.exists(path):
        try:
            prior = json.load(open(path))
            if "cells" in prior:
                doc = prior
            elif "ops" in prior:  # migrate the pre-cumulative layout
                doc["cells"][f"x{prior['factor']}"] = prior["ops"]
        except Exception:
            pass
    doc["cells"].setdefault(f"x{args.factor}{suffix}", {}).update(results)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({"factor": args.factor, "order": args.order, "ops": results}))


if __name__ == "__main__":
    main()
