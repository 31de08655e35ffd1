"""Interleaved A/B of MP_PIN_PARALLEL (overlapped vs sequential pin jobs).

Usage: python scripts/pin_parallel_ab.py name1,name2,... [rounds]

``_pin_parallel`` (operators/dedup.py) reads MP_PIN_PARALLEL at call time,
so both arms run in ONE JVM and alternate per round (immune to machine
drift, same as the round's pin A/B). Pin jobs run during plan BUILD (AQE
finalization of localCheckpoint), so the timed region is build+exec — the
same total a bench/serving caller pays. One warm-up pass per entry first;
prints one JSON line per (name, arm, round) plus a median summary.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketpipe_spark.plans import registry  # noqa: E402
from marketpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("marketpipe-pin-parallel-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.spark_queries()
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run(name: str, arm: str) -> float:
        os.environ["MP_PIN_PARALLEL"] = "1" if arm == "par" else "0"
        spark.sparkContext.setJobDescription(f"pin-ab {name} {arm}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)  # pin jobs fire here
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results: dict[tuple[str, str], list[float]] = {}
    for name in names:
        run(name, "seq")  # warm-up (codegen, FS cache) — discarded
        for r in range(rounds):
            for arm in ("seq", "par"):  # interleaved: A B A B ...
                dt = run(name, arm)
                results.setdefault((name, arm), []).append(dt)
                print(json.dumps({"name": name, "arm": arm, "round": r, "s": round(dt, 3)}), flush=True)

    for name in names:
        seq = statistics.median(results[(name, "seq")])
        par = statistics.median(results[(name, "par")])
        print(
            json.dumps(
                {
                    "name": name,
                    "median_seq_s": round(seq, 3),
                    "median_par_s": round(par, 3),
                    "ratio_par_over_seq": round(par / seq, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
