#!/usr/bin/env python3
"""Snapshot the physical-plan SHAPE of every registry entry.

Correctness sweeps catch wrong answers; this catches quietly-worse plans:
an innocent refactor that adds a shuffle, drops a broadcast to a
sort-merge join, or loses a map-side partial aggregate changes the plan's
operator counts long before anyone notices wall-clock at scale. The
snapshot records, per entry: shuffle exchanges, broadcast exchanges,
sorts, hash/object aggregates, and joins by strategy — planning only,
nothing executes.

``tests/test_plan_shape.py`` compares the live plan against
PLAN_SNAPSHOT.json and fails on any entry whose SHUFFLE or SORT count
GROWS (new operators without a snapshot row are reported, not failed).
After an intentional plan change, regenerate with:

    python scripts/plan_snapshot.py          # rewrites PLAN_SNAPSHOT.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SNAPSHOT = os.path.join(REPO, "PLAN_SNAPSHOT.json")
SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")


def plan_shape(plan_text: str) -> dict[str, int]:
    """Count plan operators from the executedPlan tree text. Line-based so
    'BroadcastExchange' is not double-counted as a shuffle 'Exchange'."""
    shape = {
        "shuffle_exchanges": 0,
        "broadcast_exchanges": 0,
        "sorts": 0,
        "hash_aggregates": 0,
        "sort_merge_joins": 0,
        "broadcast_hash_joins": 0,
        "shuffled_hash_joins": 0,
    }
    for line in plan_text.splitlines():
        if "BroadcastExchange" in line:
            shape["broadcast_exchanges"] += 1
        elif "Exchange" in line and "Reused" not in line:
            shape["shuffle_exchanges"] += 1
        if "SortMergeJoin" in line:
            shape["sort_merge_joins"] += 1
        elif "+- Sort " in line or line.strip().startswith("Sort "):
            shape["sorts"] += 1
        if "HashAggregate" in line:
            shape["hash_aggregates"] += 1
        if "BroadcastHashJoin" in line:
            shape["broadcast_hash_joins"] += 1
        if "ShuffledHashJoin" in line:
            shape["shuffled_hash_joins"] += 1
    return shape


def current_shapes() -> dict[str, dict[str, int]]:
    import __spark_entry__ as entry_mod
    from marketpipe_spark.session import get_spark

    spark = get_spark("plan-snapshot", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, int]] = {}
    for name, fn in sorted(entry_mod.queries().items()):
        df = fn(spark, SF)
        out[name] = plan_shape(df._jdf.queryExecution().executedPlan().toString())
    return out


if __name__ == "__main__":
    shapes = current_shapes()
    with open(SNAPSHOT, "w") as f:
        json.dump(shapes, f, indent=1, sort_keys=True)
    totals = {
        k: sum(s[k] for s in shapes.values())
        for k in next(iter(shapes.values()))
    }
    print(f"{len(shapes)} entries -> {SNAPSHOT}")
    print(json.dumps(totals))
