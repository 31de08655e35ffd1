"""Skew mitigation: salted_join semantics + plan shape, hot_key_profile."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _skewed_frames(spark):
    # 90% of fact rows share one key — the hot-task shape.
    facts = spark.range(2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dim = spark.range(0, 2000, 1).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("dim_val")
    )
    return facts, dim


def test_salted_join_matches_plain_join_inner_and_left(spark):
    from marketpipe_spark.operators.skew import salted_join

    facts, dim = _skewed_frames(spark)
    plain = facts.join(dim, "k").select("row_id", "k", "payload", "dim_val")
    salted = salted_join(facts, dim, "k", salt=8).select("row_id", "k", "payload", "dim_val")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    # Left join: unmatched left rows must survive exactly once.
    dim_partial = dim.filter(F.col("k") % 2 == 0)
    plain_l = facts.join(dim_partial, "k", "left").select("row_id", "dim_val")
    salted_l = salted_join(facts, dim_partial, "k", how="left", salt=8).select(
        "row_id", "dim_val"
    )
    assert sorted(
        map(tuple, plain_l.collect()), key=repr
    ) == sorted(map(tuple, salted_l.collect()), key=repr)


def test_salted_join_spreads_hot_key_and_keeps_equi_plan(spark):
    from marketpipe_spark.operators.skew import salted_join

    facts, dim = _skewed_frames(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(facts, dim, "k", salt=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # Still an equi-join (hash-partitionable on key+salt) — never a
        # nested loop / cartesian fallback.
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan
        # The hot key's rows really are spread: distinct salts on the hot
        # key's partition keys > 1 (deterministic xxhash64 row salt).
        salts = (
            facts.withColumn(
                "_salt",
                F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in facts.columns])), F.lit(8)),
            )
            .filter(F.col("k") == 7)
            .select("_salt")
            .distinct()
            .count()
        )
        assert salts == 8
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_rejects_bad_args(spark):
    from marketpipe_spark.operators.skew import salted_join

    facts, dim = _skewed_frames(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(facts, dim, "k", how="right")
    with pytest.raises(ValueError, match="salt"):
        salted_join(facts, dim, "k", salt=1)


def test_hot_key_profile_finds_planted_skew(spark):
    from marketpipe_spark.operators.skew import hot_key_profile

    facts, _ = _skewed_frames(spark)
    prof = hot_key_profile(facts, "k", top=5).collect()
    assert prof[0].rank == 1 and prof[0].key == 7
    assert prof[0].n == 1800
    assert prof[0].share_ppm == 900_000  # exact: 1800/2000
    assert [r.rank for r in prof] == [1, 2, 3, 4, 5]
    # Everything else is uniform → rank 2+ counts are 1, ties key-ordered.
    assert [r.n for r in prof[1:]] == [1, 1, 1, 1]
    assert [r.key for r in prof[1:]] == sorted(r.key for r in prof[1:])


# ---------------------------------------------------------------------------
# r8: hot-key-targeted chunking + skew auto-dispatch


def _bars(spark, hot_rows=300, cold_rows=40):
    """Minute bars: one hot symbol with hot_rows bars, three cold symbols."""
    ns_min = 60_000_000_000
    rows = [("HOT", i * ns_min, 100.0 + (i % 7), 10 + i % 3) for i in range(hot_rows)]
    for s in ("C1", "C2", "C3"):
        rows += [(s, i * ns_min, 50.0 + (i % 5), 5) for i in range(cold_rows)]
    return spark.createDataFrame(rows, "symbol string, ts_ns long, close double, volume long").select(
        "symbol",
        "ts_ns",
        F.col("close").alias("open"),
        (F.col("close") + 1).alias("high"),
        (F.col("close") - 1).alias("low"),
        "close",
        "volume",
    )


def test_chunked_frame_hot_keys_bit_identical(spark):
    """hot_keys chunking (only the hot symbol is chunked; cold symbols keep
    one task) must reproduce the plain per-key window bit-for-bit."""
    from marketpipe_spark.operators.analytics import sma

    bars = _bars(spark)
    ns_hour = 3_600_000_000_000
    plain = sma(bars, n=20)
    all_chunked = sma(bars, n=20, skew_span=ns_hour)
    # hot-targeted: go through chunked_trailing_frame directly
    from pyspark.sql.window import Window as W

    from marketpipe_spark.operators.skew import chunked_trailing_frame

    src = chunked_trailing_frame(bars, "symbol", "ts_ns", 19, ns_hour, hot_keys=["HOT"])
    w = W.partitionBy("symbol", "_chunk").orderBy("ts_ns").rowsBetween(-19, 0)
    hot_targeted = (
        src.withColumn("sma_20", F.when(F.count(F.lit(1)).over(w) >= 20, F.avg("close").over(w)))
        .filter(F.col("_carry") == 0)
        .drop("_chunk", "_carry")
    )
    want = sorted(map(tuple, plain.collect()), key=repr)
    assert sorted(map(tuple, all_chunked.collect()), key=repr) == want
    assert sorted(map(tuple, hot_targeted.collect()), key=repr) == want
    # hot_keys=[] degenerates to the plain frame: no carries at all.
    none_hot = chunked_trailing_frame(bars, "symbol", "ts_ns", 19, ns_hour, hot_keys=[])
    assert none_hot.where("_carry = 1").count() == 0
    assert none_hot.select(F.countDistinct("_chunk")).collect()[0][0] == 1


def test_plan_trailing_skew_threshold(spark):
    """Uniform data -> None (plain plan); a dominant key -> (span, [key])
    regardless of physical order by default; the OPT-IN sortedness guard
    (as-of's setting) keeps the plain plan for a dominant key over
    time-sorted rows but still chunks unordered ones."""
    from marketpipe_spark.operators.skew import plan_trailing_skew

    uniform = spark.range(4000).select(
        (F.col("id") % 100).cast("string").alias("symbol"),
        (F.col("id") * 60_000_000_000).alias("ts_ns"),
    )
    assert plan_trailing_skew(uniform, "symbol", "ts_ns", shuffle_partitions=4) is None

    n = 5000
    ns_min = 60_000_000_000
    # Scrambled ts order: i -> (i*7919 mod n) is a permutation, so the hot
    # key has the same SET of timestamps as the sorted variant but a low
    # physical monotonic fraction.
    rows = [("HOT", ((i * 7919) % n) * ns_min) for i in range(n)]
    rows += [(s, i * ns_min) for s in ("C1", "C2", "C3") for i in range(20)]
    unordered = spark.createDataFrame(rows, "symbol string, ts_ns long")
    plan = plan_trailing_skew(
        unordered, "symbol", "ts_ns", shuffle_partitions=4, min_hot_rows=0
    )
    assert plan is not None
    span, hot = plan
    assert hot == ["HOT"] and span >= 1
    # Unordered + guard on: still chunks (the guard never fires at ~0.5).
    plan_g = plan_trailing_skew(
        unordered, "symbol", "ts_ns", shuffle_partitions=4, sorted_threshold=0.95,
        min_hot_rows=0,
    )
    assert plan_g is not None and plan_g[1] == ["HOT"]

    srows = [("HOT", i * ns_min) for i in range(n)]
    srows += [(s, i * ns_min) for s in ("C1", "C2", "C3") for i in range(20)]
    sorted_df = spark.createDataFrame(srows, "symbol string, ts_ns long")
    # Default (heavy window stacks): chunk the hot key even when sorted —
    # their straggler is per-row compute, measured to win chunked.
    plan2 = plan_trailing_skew(
        sorted_df, "symbol", "ts_ns", shuffle_partitions=4, min_hot_rows=0
    )
    assert plan2 is not None and plan2[1] == ["HOT"]
    # As-of's opt-in guard: sorted + hot -> keep the plain plan.
    assert (
        plan_trailing_skew(
            sorted_df, "symbol", "ts_ns", shuffle_partitions=4, sorted_threshold=0.95,
            min_hot_rows=0,
        )
        is None
    )


def test_physical_sortedness_probe(spark):
    """~1.0 on sorted input, ~0.5 on a scrambled permutation, None when too
    few pairs to judge."""
    from marketpipe_spark.operators.skew import physical_sortedness

    n = 4000
    asc = spark.range(n).select((F.col("id") * 10).alias("ts_ns"))
    mono = physical_sortedness(asc, "ts_ns", min_pairs=100)
    assert mono is not None and mono >= 0.99

    # xxhash64 ordering is pseudo-random: expect ~0.5 monotonic pairs.
    scrambled = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("ts_ns")
    )
    mono2 = physical_sortedness(scrambled, "ts_ns", min_pairs=100)
    assert mono2 is not None and 0.3 <= mono2 <= 0.7

    tiny = spark.range(10).select(F.col("id").alias("ts_ns"))
    assert physical_sortedness(tiny, "ts_ns", min_pairs=100) is None


def test_validate_bars_auto_matches_plain_both_regimes(spark):
    """skew_span='auto' output == plain output on skewed AND uniform data
    (dispatch changes the plan, never the rows)."""
    from marketpipe_spark.operators.validation import validate_bars

    for bars in (_bars(spark), _bars(spark, hot_rows=40, cold_rows=40)):
        plain = sorted(map(repr, validate_bars(bars, market_hours=False).collect()))
        auto = sorted(
            map(repr, validate_bars(bars, market_hours=False, skew_span="auto").collect())
        )
        assert auto == plain


def test_sma_and_volatility_auto_match_plain(spark):
    from marketpipe_spark.operators.analytics import rolling_volatility, sma

    bars = _bars(spark)
    assert sorted(map(repr, sma(bars, skew_span="auto").collect())) == sorted(
        map(repr, sma(bars).collect())
    )
    assert sorted(
        map(repr, rolling_volatility(bars, skew_span="auto").collect())
    ) == sorted(map(repr, rolling_volatility(bars).collect()))


def test_sessionize_hot_keys_and_auto_bit_identical(spark):
    """Hot-user-targeted two-phase sessionization == plain sessionization,
    including the cold-key fast path (no offset join) and auto dispatch."""
    from marketpipe_spark.operators.sessions import (
        _sessionize_chunked,
        sessionize,
    )

    ns_min = 60_000_000_000
    rows = [("HOT", i * 7 * ns_min, i) for i in range(400)]  # gaps > 30min between some
    rows += [("HOT", (i * 7 + 1) * ns_min, 1000 + i) for i in range(0, 400, 3)]
    for u in ("c1", "c2"):
        rows += [(u, i * 40 * ns_min, hash(u) % 97 + i) for i in range(30)]
    ev = spark.createDataFrame(rows, "user_id string, ts_ns long, event_id long")
    gap = 1_800_000_000_000
    plain = sorted(
        map(tuple, sessionize(ev, gap=gap, order_cols=["event_id"]).collect())
    )
    span = 86_400 * 10**9
    all_chunked = sorted(
        map(
            tuple,
            _sessionize_chunked(ev, "user_id", "ts_ns", gap, ["event_id"], span).collect(),
        )
    )
    hot_targeted = sorted(
        map(
            tuple,
            _sessionize_chunked(
                ev, "user_id", "ts_ns", gap, ["event_id"], span, hot_keys=["HOT"]
            ).collect(),
        )
    )
    none_hot = sorted(
        map(
            tuple,
            _sessionize_chunked(
                ev, "user_id", "ts_ns", gap, ["event_id"], span, hot_keys=[]
            ).collect(),
        )
    )
    auto = sorted(
        map(
            tuple,
            sessionize(ev, gap=gap, order_cols=["event_id"], skew_span="auto").collect(),
        )
    )
    assert all_chunked == plain
    assert hot_targeted == plain
    assert none_hot == plain
    assert auto == plain


def test_asof_chunked_and_auto_bit_identical(spark):
    """Hot-key time-chunked as-of == plain as-of, with and without
    tolerance; auto dispatch profiles and picks the chunked plan for the
    planted 80%-hot key, the plain plan for uniform keys."""
    import random

    from marketpipe_spark.operators.asof import asof_join

    random.seed(11)
    rows_l, seen, rows_r = [], set(), []
    for i in range(3000):
        sym = "HOT" if i % 5 != 4 else f"C{i % 7}"
        rows_l.append((sym, random.randint(0, 90000), float(i)))
    for i in range(1500):
        sym = "HOT" if i % 5 != 4 else f"C{i % 7}"
        t = random.randint(0, 90000)
        while (sym, t) in seen:
            t += 1
        seen.add((sym, t))
        rows_r.append((sym, t, i * 0.5))
    left = spark.createDataFrame(rows_l, "symbol string, ts_ns long, lv double")
    right = spark.createDataFrame(rows_r, "symbol string, ts_ns long, rv double")

    def rowset(df):
        return sorted(tuple(r) for r in df.collect())

    plain = rowset(asof_join(left, right, right_cols=["rv"]))
    assert rowset(asof_join(left, right, right_cols=["rv"], skew_span=9000)) == plain
    assert rowset(asof_join(left, right, right_cols=["rv"], skew_span="auto:4")) == plain
    tol = rowset(asof_join(left, right, right_cols=["rv"], tolerance=4000))
    assert (
        rowset(asof_join(left, right, right_cols=["rv"], tolerance=4000, skew_span="auto:4"))
        == tol
    )


def test_interval_join_salted_and_auto_bit_identical(spark):
    from pyspark.sql import functions as F

    from marketpipe_spark.operators.asof import interval_join

    import random

    random.seed(13)
    pts_rows = [
        ("HOT" if i % 4 else f"C{i % 5}", random.randint(0, 50000), float(i))
        for i in range(2000)
    ]
    pts = spark.createDataFrame(pts_rows, "symbol string, ts_ns long, v double")
    iv = (
        pts.select("symbol", (F.col("ts_ns") - 1500).alias("start_ns"), (F.col("ts_ns") + 2500).alias("end_ns"))
        .limit(300)
    )

    def rowset(df):
        return sorted(tuple(r) for r in df.collect())

    plain = rowset(interval_join(pts, iv, slab=4000))
    assert rowset(interval_join(pts, iv, slab=4000, skew_salt=8)) == plain
    assert rowset(interval_join(pts, iv, slab=4000, skew_salt="auto:4")) == plain


def test_plan_join_skew_threshold(spark):
    from pyspark.sql import functions as F

    from marketpipe_spark.operators.skew import plan_join_skew

    uniform = spark.range(0, 20000).select(
        (F.col("id") % 997).alias("k"), (F.col("id") % 31).alias("s")
    )
    assert plan_join_skew(uniform, ["k", "s"], shuffle_partitions=4) is None
    hot = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 8, F.lit("HOT")).otherwise(F.lit("C")).alias("k"),
        F.lit(1).alias("s"),
    )
    salt = plan_join_skew(hot, ["k", "s"], shuffle_partitions=4)
    # ~80% share on 4 partitions -> ceil(0.8 * 4) = 4 sub-keys
    assert salt is not None and 2 <= salt <= 32
