"""As-of and interval join operators (operators/asof.py) — hand-built cases
plus an equivalence check against the naive range-predicate join."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketpipe_spark.operators.asof import asof_join, interval_join


def _trades(spark):
    return spark.createDataFrame(
        [("A", 10, 1.0), ("A", 20, 2.0), ("A", 5, 0.5), ("B", 7, 3.0), ("C", 50, 9.0)],
        "symbol string, ts_ns long, trade_value double",
    )


def _quotes(spark):
    return spark.createDataFrame(
        [("A", 10, 99.0), ("A", 15, 88.0), ("A", 6, 77.0), ("B", 99, 66.0)],
        "symbol string, ts_ns long, quote_value double",
    )


def test_asof_backward_inclusive(spark):
    out = {
        (r.symbol, r.ts_ns): (r.ts_ns_right, r.quote_value_right)
        for r in asof_join(_trades(spark), _quotes(spark)).collect()
    }
    assert out[("A", 10)] == (10, 99.0)   # exact-ts quote wins (inclusive)
    assert out[("A", 20)] == (15, 88.0)   # latest at/before
    assert out[("A", 5)] == (None, None)  # no quote yet
    assert out[("B", 7)] == (None, None)  # only future quotes
    assert out[("C", 50)] == (None, None)  # symbol with no quotes at all


def test_asof_tolerance(spark):
    out = {
        (r.symbol, r.ts_ns): r.quote_value_right
        for r in asof_join(_trades(spark), _quotes(spark), tolerance=4).collect()
    }
    assert out[("A", 10)] == 99.0   # age 0 <= 4
    assert out[("A", 20)] is None   # age 5 > 4 -> stale, nulled
    assert out[("A", 5)] is None


def test_interval_join_matches_naive(spark):
    pts = spark.createDataFrame(
        [("A", i, float(i)) for i in range(0, 200, 7)] + [("B", i, float(i)) for i in range(0, 200, 11)],
        "symbol string, ts_ns long, v double",
    )
    iv = spark.createDataFrame(
        [("A", 0, 50), ("A", 40, 120), ("B", 10, 30), ("B", 150, 500)],
        "symbol string, start_ns long, end_ns long",
    )
    fast = interval_join(pts, iv, slab=16)
    naive = pts.join(iv, "symbol").filter(
        (F.col("ts_ns") >= F.col("start_ns")) & (F.col("ts_ns") < F.col("end_ns"))
    )
    k = lambda r: (r.symbol, r.ts_ns, r.start_ns)
    assert sorted(map(k, fast.collect())) == sorted(map(k, naive.collect()))
    # overlapping intervals: a point inside both appears twice
    assert fast.filter((F.col("symbol") == "A") & (F.col("ts_ns") == 49)).count() == 2


def test_sessionize_gaps(spark):
    from marketpipe_spark.operators.sessions import session_stats, sessionize

    m = 60_000_000_000
    rows = [("u1", i * m) for i in (0, 1, 2, 60, 61, 200)] + [("u2", 5 * m)]
    df = spark.createDataFrame(rows, "user_id string, ts_ns long")
    tagged = {(r.user_id, r.ts_ns): r.session_seq for r in sessionize(df, gap=30 * m).collect()}
    assert [tagged[("u1", i * m)] for i in (0, 1, 2, 60, 61, 200)] == [1, 1, 1, 2, 2, 3]
    assert tagged[("u2", 5 * m)] == 1

    stats = {(r.user_id, r.session_seq): r for r in session_stats(df, gap=30 * m).collect()}
    s = stats[("u1", 2)]
    assert s.n_events == 2 and s.duration_ns == m and s.start_ns == 60 * m


def test_resize_media_shape(spark):
    from marketpipe_spark.operators.multimodal import attach_payload, resize_media

    docs = spark.createDataFrame(
        [(1, "x" * 500), (2, "hello world"), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in resize_media(attach_payload(docs), 16, 16).collect()}
    assert all(len(r.resized) == 256 and r.width == 16 and r.height == 16 for r in out.values())
    # deterministic: same payload -> same resized bytes
    again = {r.doc_id: r for r in resize_media(attach_payload(docs), 16, 16).collect()}
    assert all(bytes(out[d].resized) == bytes(again[d].resized) for d in out)


def test_salted_join_matches_plain(spark):
    from marketpipe_spark.operators.asof import salted_join

    # pathologically skewed left: one key holds 90% of rows
    left = spark.createDataFrame(
        [("HOT", i) for i in range(900)] + [("COLD", i) for i in range(100)],
        "k string, v long",
    )
    right = spark.createDataFrame([("HOT", 1.5), ("COLD", 2.5), ("MISSING", 9.9)], "k string, w double")
    salted = salted_join(left, right, "k", salt_factor=4)
    plain = left.join(right, "k")
    key = lambda r: (r.k, r.v, r.w)
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))
    # salt actually spreads the hot key across partitions of the join output
    assert salted.count() == 1000


def test_asof_null_payload_fields_stay_atomic(spark):
    """A NULL field in the matched right row must come through as NULL —
    not backfilled from an OLDER right row (regression: per-column
    last(ignorenulls) stitched composite rows that never existed)."""
    trades = spark.createDataFrame(
        [("A", 30, 1.0)], "symbol string, ts_ns long, trade_value double"
    )
    quotes = spark.createDataFrame(
        [("A", 10, 10.0, 11.0), ("A", 20, None, 12.0)],
        "symbol string, ts_ns long, bid double, ask double",
    )
    row = asof_join(trades, quotes).collect()[0]
    assert row["ts_ns_right"] == 20
    assert row["bid_right"] is None  # the t=20 row's bid IS null
    assert row["ask_right"] == 12.0

    # Tolerance must gate the WHOLE carried row on the matched ts.
    row = asof_join(trades, quotes, tolerance=5).collect()[0]
    assert row["ts_ns_right"] is None and row["bid_right"] is None and row["ask_right"] is None


def test_salted_join_rejects_right_outer():
    import pytest as _pytest

    from marketpipe_spark.operators.asof import salted_join

    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(None, None, "k", how="full")
