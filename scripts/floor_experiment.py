"""Fixed-floor experiment: what does whole-stage codegen cost a ONE-SHOT
tiny query, and what would turning it off do at real scale?

SCALING.md attributes the sequential sf0.1 headline gap to a 0.2-1 s
per-query floor dominated by single-shot Janino compilation of each plan
family. This measures that attribution directly: the headline basket with
`spark.sql.codegen.wholeStage` on vs off (fresh session per mode, same
order), and the same toggle at x16 scale for two heavy operators — the
half of the story that explains why the default stays ON: interpreted
mode wins the one-shot compile race and loses the actual data race.

Usage: python scripts/floor_experiment.py [--mode on|off] (one mode per
process; a session cannot flip the conf after plans have compiled).
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["on", "off"], required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from bench import HEADLINE

    from marketpipe_spark.plans import registry
    from marketpipe_spark.session import get_spark

    spark = get_spark(
        f"floor-{args.mode}",
        extra_conf={"spark.sql.codegen.wholeStage": str(args.mode == "on").lower()},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.spark_queries()

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    run("pricing_summary")  # session warmup (JVM + first scan), both modes
    times = {n: run(n) for n in HEADLINE if n in qs}
    print(
        json.dumps(
            {
                "mode": args.mode,
                "total_sec": round(sum(times.values()), 2),
                "queries": times,
                "sf_dir": args.sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
