"""Analytics tour: lake → resample → indicators → manifest skipping → sketch.

Companion to quickstart.py, driving the LIBRARY API (not the CLI): lands a
deterministic fake lake, then runs the technical-indicator set, file-stats
manifest data skipping, and the KLL quantile sketch against it. Everything
is offline and reproducible.

Run it:

    python examples/analytics_tour.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marketpipe_spark.lake import read_bars, write_bars  # noqa: E402
from marketpipe_spark.manifest import build_manifest, read_pruned, skipping_ratio  # noqa: E402
from marketpipe_spark.operators.resample import resample_intraday  # noqa: E402
from marketpipe_spark.operators.sketches import kll_partial_sketch, kll_quantiles  # noqa: E402
from marketpipe_spark.session import get_spark  # noqa: E402
from marketpipe_spark.sources.fake import fake_bars  # noqa: E402

DAY_NS = 86_400 * 10**9
START = 1_704_153_600_000_000_000  # 2024-01-02 00:00 UTC


def run(workdir: str, spark=None) -> None:
    spark = spark or get_spark("analytics-tour", master="local[4]", shuffle_partitions=4)
    root = os.path.join(workdir, "lake")

    print("\n=== 1. Land three days of fake minute bars")
    for day in range(3):
        write_bars(fake_bars(spark, ["AAPL", "MSFT"], START + day * DAY_NS, 390), root, "1m")
    raw = read_bars(spark, root, frame="1m")
    print(f"lake rows: {raw.count()}")

    print("\n=== 2. Resample to 5m and compute ATR(14)")
    five = resample_intraday(
        raw.select("symbol", "ts_ns", "open", "high", "low", "close", "volume"), 300
    )
    from pyspark.sql.window import Window as W

    wo = W.partitionBy("symbol").orderBy("ts_ns")
    pc = F.lag("close").over(wo)
    tr = F.greatest(
        F.col("high") - F.col("low"), F.abs(F.col("high") - pc), F.abs(F.col("low") - pc)
    )
    atr = (
        five.withColumn("tr", tr)
        .filter(F.col("tr").isNotNull())
        .withColumn("atr_14", F.avg("tr").over(wo.rowsBetween(-13, 0)))
    )
    atr.groupBy("symbol").agg(F.round(F.max("atr_14"), 4).alias("max_atr_14")).show()

    print("=== 3. Manifest: skip files outside a one-day window")
    m = build_manifest(spark, root).cache()
    stats = skipping_ratio(m, START + DAY_NS, START + 2 * DAY_NS - 1)
    print(f"skip stats: {stats}")
    day2 = read_pruned(spark, root, m, START + DAY_NS, START + 2 * DAY_NS - 1)
    print(f"day-2 rows via pruned read: {day2.count()}")

    print("\n=== 4. KLL sketch: approximate close-price quartiles, one pass")
    sk = kll_partial_sketch(raw.select("close"), "close", k=128)
    kll_quantiles(sk, [0.25, 0.5, 0.75]).show()

    print("analytics tour complete")


if __name__ == "__main__":
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mp_tour_")
    run(workdir)
