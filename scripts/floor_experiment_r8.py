#!/usr/bin/env python3
"""Round-8 sequential-floor experiment (VERDICT r7 item 6).

The sequential sf0.1 headline sits ~8-12× over the warm DuckDB oracle
while 8-thread concurrent mode sits at ~1.5×; r6's codegen A/B and r7's
build/exec decomposition attributed the gap to a ~0.05 s/query fixed
driver-analysis + AQE-scheduling + commit floor. This script quantifies
the remaining candidate knobs, one process, same order, min-of-2 walls:

- **plan_reuse**: the basket executed 3× REBUILDING each DataFrame vs 3×
  re-executing the SAME DataFrame objects — isolates the Py4J plan
  assembly + analysis share of a repeat invocation (what a plan cache
  would recover for repeated registry calls).
- **conf knobs** (runtime-settable, A/B against interleaved baseline):
  - aqe_off               — no adaptive re-plan at all
  - aqe_coalesce_only     — adaptive on, skew-join + local-shuffle-reader
                            re-opt off (pure partition coalescing)
  - no_constraint_prop    — skip the optimizer's constraint propagation
                            pass (quadratic on wide predicate queries)
  - shuffle8              — 8 shuffle partitions (fewer tiny tasks)
- **batched**: all queries submitted from 8 threads through the one
  session with prebuilt DataFrames — the shared-session overlap ceiling
  (concurrent_bench.py measures this with build included; here builds
  are hoisted so the number is pure scheduling overlap).

Writes FLOOR_EXPERIMENT.json at the repo root and prints it.

Usage: python scripts/floor_experiment_r8.py [--sf-dir DIR]
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

CONF_VARIANTS = {
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "aqe_coalesce_only": {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.adaptive.localShuffleReader.enabled": "false",
    },
    "no_constraint_prop": {"spark.sql.constraintPropagation.enabled": "false"},
    "shuffle8": {"spark.sql.shuffle.partitions": "8"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from marketpipe_spark.plans import registry
    from marketpipe_spark.session import get_spark

    spark = get_spark("floor-r8", extra_conf={"spark.scheduler.mode": "FAIR"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.spark_queries()
    basket = [n for n in HEADLINE if n in qs]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_rebuild() -> float:
        t0 = time.time()
        for n in basket:
            noop(qs[n](spark, args.sf_dir))
        return round(time.time() - t0, 3)

    # Warm: JVM, codegen cache, parquet footers, registry table cache.
    run_rebuild()

    out: dict = {"sf_dir": args.sf_dir, "n_queries": len(basket)}

    # Phase 1: rebuild-per-invocation vs reuse-the-DataFrame.
    rebuild_walls = [run_rebuild() for _ in range(3)]
    dfs = {n: qs[n](spark, args.sf_dir) for n in basket}
    reuse_walls = []
    for _ in range(3):
        t0 = time.time()
        for n in basket:
            noop(dfs[n])
        reuse_walls.append(round(time.time() - t0, 3))
    out["plan_reuse"] = {
        "rebuild_walls": rebuild_walls,
        "reuse_walls": reuse_walls,
        "rebuild_min": min(rebuild_walls),
        "reuse_min": min(reuse_walls),
        "py4j_build_share": round(
            (min(rebuild_walls) - min(reuse_walls)) / min(rebuild_walls), 3
        ),
    }

    # Phase 2: conf A/B, baseline re-measured adjacent to each variant so
    # machine drift can't masquerade as a knob effect.
    saved: dict[str, str | None] = {}
    for confs in CONF_VARIANTS.values():
        for k in confs:
            try:
                saved[k] = spark.conf.get(k)
            except Exception:
                saved[k] = None
    ab = {}
    for variant, confs in CONF_VARIANTS.items():
        base = min(run_rebuild() for _ in range(2))
        for k, v in confs.items():
            spark.conf.set(k, v)
        var = min(run_rebuild() for _ in range(2))
        for k in confs:
            if saved.get(k) is not None:
                spark.conf.set(k, saved[k])
        ab[variant] = {
            "baseline_min": base,
            "variant_min": var,
            "delta_pct": round(100.0 * (var - base) / base, 1),
        }
        print(f"  {variant}: base {base}s -> {var}s ({ab[variant]['delta_pct']:+}%)",
              file=sys.stderr)
    out["conf_ab"] = ab

    # Phase 3: shared-session batched submission, prebuilt plans.
    def batched(threads: int) -> float:
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(lambda n: noop(dfs[n]), basket))
        return round(time.time() - t0, 3)

    out["batched_prebuilt"] = {
        str(th): min(batched(th) for _ in range(2)) for th in (4, 8, 16)
    }
    out["sequential_prebuilt_min"] = out["plan_reuse"]["reuse_min"]

    with open(os.path.join(REPO, "FLOOR_EXPERIMENT.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
