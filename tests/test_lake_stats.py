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
