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


from marketpipe_spark.plans.shape import plan_shape  # noqa: E402


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
