#!/usr/bin/env python3
"""Streaming state-store scale cell (VERDICT r6 #3).

Runs the session-window streaming pipeline (the repo's heaviest keyed-state
entry) over the ×1 and ×16 scaled events tables (scale_bench's replication
model — 16× the symbols/users, same time range, i.e. 16× concurrent open
sessions), under BOTH state store providers (default in-memory HDFS-backed
vs RocksDB), and records from the query's own progress metrics:

- wall seconds to drain (AvailableNow),
- peak state rows (``numRowsTotal``) and state bytes (``memoryUsedBytes``
  for the default provider; RocksDB reports SST+mem via its custom
  ``totalSSTFilesBytes``/memory metrics) per stateful operator,
- rows emitted.

The point at 100 TB: state growth is linear in key cardinality and the
in-memory provider carries it ALL in executor heap — the cell documents the
measured per-key state cost so "when to flip to RocksDB" is a number
(state bytes ≳ executor heap share), not folklore.

Writes STREAM_STATE_BENCH.json at the repo root.

Usage: python scripts/stream_state_bench.py [--factors 1,16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scale_bench import TMP, build_scaled  # noqa: E402

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def drain_with_progress(spark, stream_df, mode: str) -> dict:
    """Drain a bounded stream through a noop sink and return wall time +
    the max state rows/bytes observed across microbatch progress events."""
    ckpt = tempfile.mkdtemp(prefix="mp_state_bench_")
    t0 = time.time()
    q = (
        stream_df.writeStream.format("noop")
        .outputMode(mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    if not q.awaitTermination(1800):
        q.stop()
        raise TimeoutError("stream did not drain within 1800s")
    wall = time.time() - t0
    state_rows = state_bytes = out_rows = 0
    custom: dict[str, int] = {}
    for p in q.recentProgress:
        out_rows += int(p.get("sink", {}).get("numOutputRows", 0) or 0)
        for op in p.get("stateOperators", []) or []:
            state_rows = max(state_rows, int(op.get("numRowsTotal", 0) or 0))
            state_bytes = max(state_bytes, int(op.get("memoryUsedBytes", 0) or 0))
            for k, v in (op.get("customMetrics") or {}).items():
                if isinstance(v, (int, float)) and "Bytes" in k:
                    custom[k] = max(custom.get(k, 0), int(v))
    rec = {
        "wall_sec": round(wall, 2),
        "state_rows_peak": state_rows,
        "state_bytes_peak": state_bytes,
        "sink_rows": out_rows,
    }
    if custom:
        # provider-specific byte metrics (default emits
        # stateOnCurrentVersionSizeBytes; RocksDB emits rocksdb*-prefixed)
        rec["custom_bytes"] = dict(sorted(custom.items())[:3])
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,16")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    from marketpipe_spark.plans.queries_stream import (
        _bar_stream,
        dedup_minute_pipeline,
        sessions_pipeline,
    )
    from marketpipe_spark.session import get_spark

    spark = get_spark("stream-state-bench")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"pipelines": {}}
    for factor in factors:
        d = os.path.join(TMP, f"x{factor}")
        if not os.path.exists(os.path.join(d, "_built")):
            build_scaled(spark, factor, d)
            open(os.path.join(d, "_built"), "w").close()
        for provider in ("default", "rocksdb"):
            if provider == "rocksdb":
                spark.conf.set(PROVIDER_CONF, ROCKSDB)
            else:
                spark.conf.unset(PROVIDER_CONF)
            for name, pipe, mode in (
                ("stream_sessions", sessions_pipeline, "append"),
                ("stream_dedup_minute", dedup_minute_pipeline, "append"),
            ):
                rec = drain_with_progress(spark, pipe(_bar_stream(spark, d)), mode)
                out["pipelines"].setdefault(name, {})[f"x{factor}/{provider}"] = rec
                print(f"  x{factor} {name} [{provider}]: {rec}", file=sys.stderr)
    spark.conf.unset(PROVIDER_CONF)

    path = os.path.join(REPO, "STREAM_STATE_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
