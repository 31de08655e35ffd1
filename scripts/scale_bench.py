#!/usr/bin/env python3
"""Measured scale-up experiment.

Replicates the sf0.1 tables R× with shifted keys (R = 1, 4, 16), runs a
representative subset of registry queries at each factor through the noop
sink, and prints one JSON line with per-query wall times. The point is not
the absolute numbers (this sandbox CPU-throttles sustained load) but the
GROWTH CURVE: a query whose time scales ~linearly in rows here has a plan
with no super-linear term to blow up at 100 TB; one that bends quadratic is
flagged (and must have a documented scale path).

Replication model ("horizontal growth", what a bigger universe looks like):
- events: replica i gets new symbols (``<type>_i``), shifted event/user ids,
  SAME time range — more instruments, not a longer history. Window/group
  queries get more, equally-sized partitions (how they meet more data on a
  real cluster).
- customer/orders/lineitem: keys shifted per replica; dims (region, nation,
  supplier, part) stay fixed, so joins fan out to the same dimension tables
  with R× fact rows.
- documents: shifted doc_ids, replica-tagged text (keeps the intra-replica
  duplicate structure, avoids fake cross-replica near-dup explosion).
- embeddings: shifted vec_ids, vector rotated by i positions (decorrelates
  replicas; cosine structure within a replica preserved).

Usage: python scripts/scale_bench.py [--factors 1,4,16] [--ops op1,op2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TMP = os.path.join(REPO, ".scale_tmp")

# Representative ops: one per plan family. embedding_near_dup is included
# deliberately — its block-pair candidate stage is O(n²) by design (exact
# semantics; the LSH/IVF entries are the at-scale path) and the curve should
# SHOW that, not hide it.
DEFAULT_OPS = [
    "resample_5m",        # groupBy agg, map-side partial
    "sma_20",             # per-symbol window
    "validation_report",  # scan + per-symbol window, 13 rules
    "exact_dedup",        # hash groupBy on md5
    "minhash_lsh_near_dup",  # explode + banded equi-join
    "ngram_contamination",   # explode + distinct + shuffle hash join
    "top_customers",      # fact-fact join + broadcast dim
    "regional_revenue",   # star join
    "ann_topk",           # mapInPandas candidates + exact rescore
    "embedding_near_dup", # block-pair exact (quadratic BY DESIGN)
]


def build_scaled(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from marketpipe_spark.session import tune

    tune(spark)
    os.makedirs(out_dir, exist_ok=True)
    rep = spark.range(factor).select(F.col("id").alias("_r"))

    def src(name):
        return spark.read.parquet(f"{BASE}/{name}.parquet")

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    for name in ("region", "nation", "supplier", "part"):
        write(src(name), name)

    r = F.col("_r")
    ev = src("events").crossJoin(F.broadcast(rep))
    write(
        ev.select(
            (F.col("event_id") + r * F.lit(10**9)).alias("event_id"),
            "ts",
            (F.col("user_id") + r * F.lit(10**7)).alias("user_id"),
            F.when(r == 0, F.col("event_type"))
            .otherwise(F.concat_ws("_", "event_type", r))
            .alias("event_type"),
            "value",
            "props",
        ),
        "events",
    )

    cust = src("customer").crossJoin(F.broadcast(rep))
    write(
        cust.select(
            (F.col("c_custkey") + r * F.lit(10**7)).alias("c_custkey"),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        ),
        "customer",
    )
    orders = src("orders").crossJoin(F.broadcast(rep))
    write(
        orders.select(
            (F.col("o_orderkey") + r * F.lit(10**9)).alias("o_orderkey"),
            (F.col("o_custkey") + r * F.lit(10**7)).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        "orders",
    )
    li = src("lineitem").crossJoin(F.broadcast(rep))
    write(
        li.select(
            (F.col("l_orderkey") + r * F.lit(10**9)).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ),
        "lineitem",
    )

    docs = src("documents").crossJoin(F.broadcast(rep))
    write(
        docs.select(
            (F.col("doc_id") + r * F.lit(10**7)).alias("doc_id"),
            F.when(r == 0, F.col("text"))
            .otherwise(F.concat(F.lit("r"), r.cast("string"), F.lit(" "), F.col("text")))
            .alias("text"),
            "lang", "source", "n_chars",
        ),
        "documents",
    )

    emb = src("embeddings").crossJoin(F.broadcast(rep))
    size = F.size("embedding")
    rot = F.pmod(r, size)
    rotated = F.when(rot == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice("embedding", rot + 1, size - rot), F.slice("embedding", F.lit(1), rot)
        )
    )
    write(
        emb.select(
            (F.col("vec_id") + r * F.lit(10**7)).alias("vec_id"),
            rotated.alias("embedding"),
            "label",
        ),
        "embeddings",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--ops", default=",".join(DEFAULT_OPS))
    ap.add_argument(
        "--reuse", action="store_true",
        help="keep .scale_tmp across runs and skip rebuilding a factor whose "
        "directory already exists — lets each heavy op be measured in its own "
        "fresh process (early position, no accumulated throttle) without "
        "paying the data build every time",
    )
    ap.add_argument(
        "--record-rows", action="store_true",
        help="after each timed noop run, count the operator's output rows "
        "(untimed) so 'output-bound' growth is a recorded number, not an "
        "assertion",
    )
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]
    ops = args.ops.split(",")

    from marketpipe_spark.plans import registry
    from marketpipe_spark.session import get_spark

    spark = get_spark("marketpipe-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.spark_queries()

    results: dict[str, dict[str, float]] = {}
    rows: dict[str, dict[str, int]] = {}
    try:
        for factor in factors:
            d = os.path.join(TMP, f"x{factor}")
            if not (args.reuse and os.path.exists(os.path.join(d, "_built"))):
                build_scaled(spark, factor, d)
                open(os.path.join(d, "_built"), "w").close()
            # warm the JVM on the smallest query before the first timed run
            qs["resample_5m"](spark, d).write.format("noop").mode("overwrite").save()
            for op in ops:
                t0 = time.time()
                qs[op](spark, d).write.format("noop").mode("overwrite").save()
                results.setdefault(op, {})[f"x{factor}"] = round(time.time() - t0, 2)
                print(f"  x{factor} {op}: {results[op][f'x{factor}']}s", file=sys.stderr)
                if args.record_rows:
                    n = qs[op](spark, d).count()
                    rows.setdefault(op, {})[f"x{factor}"] = n
                    print(f"  x{factor} {op}: {n} output rows", file=sys.stderr)
    finally:
        if not args.reuse:
            shutil.rmtree(TMP, ignore_errors=True)

    out = {"base": BASE, "factors": factors, "ops": results}
    if args.record_rows:
        out["rows"] = rows
    print(json.dumps(out))


if __name__ == "__main__":
    main()
