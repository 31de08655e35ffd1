"""A11 storage stats + K6 table rendering."""

from __future__ import annotations

from marketpipe_spark.lake import render_table, storage_stats, write_bars

NS_MIN = 60_000_000_000
DAY1 = 1_704_153_600_000_000_000  # 2024-01-02


def _bars(spark, symbol, start_ns, n):
    rows = [(symbol, start_ns + i * NS_MIN, 1.0, 2.0, 0.5, 1.5, 10) for i in range(n)]
    return spark.createDataFrame(
        rows, "symbol string, ts_ns long, open double, high double, low double, close double, volume long"
    )


def test_storage_stats(spark, tmp_path):
    root = str(tmp_path / "lake")
    write_bars(_bars(spark, "AAPL", DAY1, 5), root, "1m")
    write_bars(_bars(spark, "MSFT", DAY1, 5), root, "1m")
    write_bars(_bars(spark, "AAPL", DAY1, 2), root, "5m")
    s = storage_stats(spark, root)
    assert s["frames"] == 2 and s["symbols"] == 2 and s["days"] == 1
    assert s["file_count"] >= 3 and s["total_bytes"] > 0


def test_render_table(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, name string")
    csv = render_table(df.orderBy("id"), limit=2)
    assert csv.splitlines()[0] == "id,name" and len(csv.splitlines()) == 3
    md = render_table(df.orderBy("id"), limit=3, fmt="markdown")
    assert md.splitlines()[0] == "| id | name |" and "| 2 | b |" in md


def test_compact_partitions(spark, tmp_path):
    from marketpipe_spark.lake import compact_partitions, list_lake_files, read_bars, write_bars
    from marketpipe_spark.sources.fake import fake_bars

    root = str(tmp_path / "lake")
    start = 1_704_153_600_000_000_000
    # two appends -> two files in the same (frame, symbol, date) partition
    write_bars(fake_bars(spark, ["AAPL"], start, 30), root, "1m")
    write_bars(fake_bars(spark, ["AAPL"], start + 30 * 60_000_000_000, 30, seed=9), root, "1m")
    before = read_bars(spark, root, frame="1m")
    n_before = before.count()
    files_before = len(list_lake_files(spark, root))
    assert files_before >= 2

    rewritten = compact_partitions(spark, root, "1m", max_files=1)
    assert len(rewritten) == 1
    after = read_bars(spark, root, frame="1m")
    assert after.count() == n_before  # data unchanged
    assert len(list_lake_files(spark, root)) == 1  # one file per partition now
    assert compact_partitions(spark, root, "1m", max_files=1) == []  # idempotent
