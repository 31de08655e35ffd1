"""File-stats manifest + data-skipping planner (marketpipe_spark/manifest.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marketpipe_spark.lake import list_lake_files, read_bars, write_bars
from marketpipe_spark.manifest import (
    build_manifest,
    prune_files,
    read_pruned,
    skipping_ratio,
)
from marketpipe_spark.sources.fake import fake_bars

DAY_NS = 86_400 * 10**9
START = 1_704_067_200_000_000_000  # 2024-01-01 00:00 UTC


@pytest.fixture(scope="module")
def stamped_lake(spark, tmp_path_factory):
    """Three days x two symbols of 1m bars -> six date-partition files."""
    root = str(tmp_path_factory.mktemp("manifest_lake"))
    for day in range(3):
        bars = fake_bars(spark, ["AAPL", "MSFT"], START + day * DAY_NS, 120)
        write_bars(bars, root, "1m")
    return root


def test_manifest_covers_every_file_and_row(spark, stamped_lake):
    m = build_manifest(spark, stamped_lake).cache()
    files = list_lake_files(spark, stamped_lake)
    rows = m.collect()
    assert len(rows) == len(files)
    total_rows = read_bars(spark, stamped_lake).count()
    assert sum(r["n_rows"] for r in rows) == total_rows
    # Stats envelopes exist (Spark writes column-chunk min/max for longs)
    # and are ordered.
    for r in rows:
        assert r["min_ts"] is not None and r["min_ts"] <= r["max_ts"]


def test_pruned_read_matches_full_filtered_read(spark, stamped_lake):
    m = build_manifest(spark, stamped_lake)
    start = START + DAY_NS  # exactly day 2
    end = START + DAY_NS + 119 * 60 * 10**9
    full = read_bars(spark, stamped_lake, start_ns=start, end_ns=end)
    pruned = read_pruned(spark, stamped_lake, m, start_ns=start, end_ns=end)
    cols = ["symbol", "ts_ns", "open", "high", "low", "close", "volume"]
    assert sorted(map(tuple, full.select(cols).collect())) == sorted(
        map(tuple, pruned.select(cols).collect())
    )
    # Partition columns survive the file-list read (basePath).
    assert {"frame", "symbol", "date"} <= set(pruned.columns)


def test_skipping_actually_skips(spark, stamped_lake):
    m = build_manifest(spark, stamped_lake).cache()
    stats = skipping_ratio(m, START + 2 * DAY_NS, None)  # only day 3
    assert stats["files_total"] == 6
    assert stats["files_skipped"] == 4  # days 1-2 dropped, both symbols
    assert stats["skip_ratio"] > 0.6
    # Open-ended and whole-range queries keep everything.
    assert skipping_ratio(m, None, None)["files_skipped"] == 0


def test_null_stats_never_skipped(spark):
    rows = [
        ("f1", 10, 5, 1, 100, 200),
        ("f2", 10, 5, 1, None, None),  # writer produced no stats
        ("f3", 10, 5, 1, 1000, 2000),
    ]
    m = spark.createDataFrame(
        rows, "path string, size long, n_rows long, n_row_groups int, min_ts long, max_ts long"
    )
    kept = prune_files(m, start_ns=150, end_ns=180)
    assert "f1" in kept  # envelope intersects
    assert "f2" in kept  # unknown envelope -> must survive
    assert "f3" not in kept  # provably disjoint


def test_prune_files_driver_list_is_bounded(spark):
    """A synthetic many-file manifest must refuse to collect past the cap —
    the 100 TB lake guard: the limit(cap+1) bounds what can ever reach the
    driver, and the error steers to directory-partition pruning."""
    m = spark.range(5000).select(
        F.concat(F.lit("f"), F.col("id")).alias("path"),
        F.lit(10).alias("size"),
        F.lit(5).alias("n_rows"),
        F.lit(1).cast("int").alias("n_row_groups"),
        F.col("id").alias("min_ts"),
        (F.col("id") + 1).alias("max_ts"),
    )
    with pytest.raises(ValueError, match="MP_MAX_PRUNED_FILES"):
        prune_files(m, start_ns=0, end_ns=10_000, max_files=100)
    # Under the cap: all survivors come back.
    assert len(prune_files(m, start_ns=0, end_ns=10_000, max_files=5001)) == 5000


def test_empty_range_returns_empty_frame_with_schema(spark, stamped_lake):
    m = build_manifest(spark, stamped_lake)
    out = read_pruned(spark, stamped_lake, m, start_ns=START + 100 * DAY_NS, end_ns=None)
    assert out.count() == 0
    assert "ts_ns" in out.columns
