#!/usr/bin/env python3
"""Snapshot-table scale cells: does COW stay output-bound as the table grows?

Builds a range-partitioned snapshot table from sf0.1 lineitem at ×1 and ×F
volume (same file-size discipline: ~64 files per ×1), then measures, per
cell:

- ``upsert_s``: a FIXED 2k-row batch touching a narrow key range — the
  claim is the rewrite cost is bounded by affected files (constant), with
  only the key-column probe scan growing with the table;
- ``files_rewritten`` / ``files_total``: the COW pruning ratio;
- ``changes_s``: the v1→v2 CDC diff (churn-bounded output);
- ``ivm_s`` vs ``recompute_s``: refreshing a grouped aggregate through
  :func:`incremental_agg` (base reuse + delta) against a full recompute
  at the new version — the materialized-view maintenance win.

Writes SNAPSHOT_BENCH.json at the repo root.

Usage: python scripts/snapshot_bench.py [--factor 8]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from marketpipe_spark.session import get_spark
    from marketpipe_spark.snapshots import (
        incremental_agg,
        read_table,
        table_changes,
        table_history,
        upsert_table,
        write_table,
    )

    spark = get_spark("snapshot-bench")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_returnflag"
    )
    cells: dict[str, dict] = {}
    for factor in (1, args.factor):
        tag = f"x{factor}"
        root = os.path.join(TMP, f"snaptbl_{tag}")
        shutil.rmtree(root, ignore_errors=True)
        rep = spark.range(factor).select(F.col("id").alias("_r"))
        big = (
            li.crossJoin(F.broadcast(rep))
            .select(
                (F.col("l_orderkey") + F.col("_r") * F.lit(10**9)).alias("k1"),
                F.col("l_linenumber").alias("k2"),
                "l_partkey",
                "l_quantity",
                "l_returnflag",
            )
            # The driver's synthetic lineitem is not PK-unique on
            # (orderkey, linenumber); a keyed snapshot table needs unique
            # keys, so dedup once at build.
            .dropDuplicates(["k1", "k2"])
            # Range layout on the key so a narrow-key batch touches few
            # files — the layout any keyed snapshot table would use.
            .repartitionByRange(64 * factor, "k1")
        )
        t0 = time.time()
        write_table(big, root, mode="overwrite", note="base")
        build_s = round(time.time() - t0, 2)
        n_files = table_history(root)[-1]["n_files"]

        batch = (
            read_table(spark, root)
            .where((F.col("k1") >= 100) & (F.col("k1") < 3000))
            .limit(2000)
            .withColumn("l_quantity", F.col("l_quantity") + 1)
        ).localCheckpoint()
        t0 = time.time()
        v2 = upsert_table(spark, batch, root, keys=["k1", "k2"])
        upsert_s = round(time.time() - t0, 2)
        hist = table_history(root)
        note = hist[-1]["note"]

        t0 = time.time()
        n_changes = table_changes(spark, root, ["k1", "k2"], 1, v2).count()
        changes_s = round(time.time() - t0, 2)

        # Steady-state refresh: the MV's stored rows are the base — only
        # the churn-bounded diff + delta aggregation run.
        mv = (
            read_table(spark, root, version=1)
            .groupBy("l_returnflag")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("sum_l_quantity"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .localCheckpoint()
        )
        t0 = time.time()
        n_ivm = incremental_agg(
            spark, root, ["k1", "k2"], ["l_returnflag"], ["l_quantity"], 1, v2,
            base=mv,
        ).count()
        ivm_s = round(time.time() - t0, 2)
        t0 = time.time()
        n_direct = (
            read_table(spark, root, version=v2)
            .groupBy("l_returnflag")
            .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")), F.count(F.lit(1)))
            .count()
        )
        recompute_s = round(time.time() - t0, 2)
        assert n_ivm == n_direct

        cells[tag] = {
            "rows": big.count(),
            "files_total": n_files,
            "build_s": build_s,
            "upsert_s": upsert_s,
            "upsert_note": note,
            "changes_rows": n_changes,
            "changes_s": changes_s,
            "ivm_s": ivm_s,
            "recompute_s": recompute_s,
        }
        print(f"  {tag}: {cells[tag]}", file=sys.stderr)
        shutil.rmtree(root, ignore_errors=True)

    with open(os.path.join(REPO, "SNAPSHOT_BENCH.json"), "w") as f:
        json.dump({"base": BASE, "cells": cells}, f, indent=1)
    print(json.dumps(cells))


if __name__ == "__main__":
    main()
