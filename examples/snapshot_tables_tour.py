"""Snapshot-table tour: commits → time travel → COW upsert → CDC → compaction.

Drives ``marketpipe_spark.snapshots`` end to end on a deterministic fake
lake: three commits (append, upsert, compaction), a pinned-version read of
every historical state, the change-data-feed between versions, and a
reference-counted expiry. Everything is offline and reproducible.

Run it:

    python examples/snapshot_tables_tour.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marketpipe_spark.session import get_spark  # noqa: E402
from marketpipe_spark.snapshots import (  # noqa: E402
    compact_table,
    expire_snapshots,
    read_table,
    table_changes,
    table_history,
    upsert_table,
    write_table,
)


def run(workdir: str, spark=None) -> None:
    root = os.path.join(workdir, "bars_table")
    own_session = spark is None
    if own_session:
        spark = get_spark("snapshot-tour", master="local[4]", shuffle_partitions=4)

    day1 = spark.createDataFrame(
        [("AAPL", 1, 100.0), ("AAPL", 2, 101.0), ("MSFT", 1, 300.0)],
        "symbol string, ts long, close double",
    )
    v1 = write_table(day1, root, note="day 1 load")
    print(f"v{v1}: initial load -> {read_table(spark, root).count()} rows")

    # Keep-last COW upsert: corrects one AAPL bar, adds one MSFT bar. Only
    # files containing matching keys are rewritten.
    fixes = spark.createDataFrame(
        [("AAPL", 2, 101.5), ("MSFT", 2, 301.0)],
        "symbol string, ts long, close double",
    )
    v2 = upsert_table(spark, fixes, root, keys=["symbol", "ts"], note="corrections")
    print(f"v{v2}: after upsert")
    read_table(spark, root).orderBy("symbol", "ts").show()

    print("time travel to v1 (the pre-correction image):")
    read_table(spark, root, version=v1).orderBy("symbol", "ts").show()

    print(f"change data feed v{v1} -> v{v2}:")
    table_changes(spark, root, ["symbol", "ts"], v_from=v1, v_to=v2).show(truncate=False)

    v3 = compact_table(spark, root, target_files=1, note="nightly optimize")
    print(f"v{v3}: compacted; history:")
    for h in table_history(root):
        print("  ", h)

    stats = expire_snapshots(root, keep_last=2, min_age_seconds=0)
    print("expiry:", stats)
    print("latest still reads:", read_table(spark, root).count(), "rows")
    print("snapshot tour complete")
    if own_session:
        spark.stop()


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mp_snap_")
    run(workdir)


if __name__ == "__main__":
    main()
