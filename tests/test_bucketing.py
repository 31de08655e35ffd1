"""Bucketed co-located joins: the write pays one shuffle, the join pays
none. Asserts the physical plan has ZERO exchanges on the bucketed join."""

from __future__ import annotations

import pytest

from marketpipe_spark.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is a static conf — managed tables land in the session's
    # default spark-warehouse and are dropped (files removed) on teardown
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "lineitem_b", "l_orderkey", n_buckets=8)
    write_bucketed(o, "orders_b", "l_orderkey", n_buckets=8)
    yield "lineitem_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # at this toy scale the planner would broadcast (and skip bucketed
    # reads); force the sort-merge path the tables are bucketed FOR —
    # at 100 TB neither side is broadcastable and this is the plan that runs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    # and it is still a correct join
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    naive = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined.count() == naive


def test_unbucketed_join_has_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    plain = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    # disable broadcast so the comparison shows the shuffle a non-bucketed
    # side pays (AQE would broadcast this tiny table otherwise)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(lt).join(plain, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan  # the non-bucketed side must shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


# ---------------------------------------------------------------------------
# Z-order layout key

def test_zorder_key_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from marketpipe_spark.bucketing import zorder_key

    def morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 0), (0, 65535), (12345, 54321)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()}
    for x, y in pairs:
        assert got[(x, y)] == morton(x, y)


def test_zorder_ranges_are_local(spark):
    """Splitting the Morton space into ranges bounds BOTH dims per range:
    each 1/64th z-range of a full 256x256 grid covers at most a 32x32 box
    (the file-skipping guarantee a z-sorted writer relies on)."""
    from pyspark.sql import functions as F

    from marketpipe_spark.bucketing import zorder_key

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    z = grid.select("x", "y", zorder_key(F.col("x"), F.col("y"), bits=8).alias("z"))
    prof = (
        z.groupBy(F.expr("z div 1024").alias("zrange"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .agg(F.max("dx").alias("dx"), F.max("dy").alias("dy"))
        .collect()[0]
    )
    assert prof["dx"] <= 31 and prof["dy"] <= 31


def test_write_zordered_improves_row_group_skipping(spark, tmp_path):
    from pyspark.sql import functions as F

    from marketpipe_spark.bucketing import row_group_skip_stats, write_zordered

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(F.col("value")).cast("long").alias("vbucket"),
        "event_type",
    )
    box = {"x_col": "user_id", "y_col": "vbucket"}
    lo_u, hi_u = 10, 40
    lo_v, hi_v = 10, 30

    plain = str(tmp_path / "plain")
    ev.repartition(16).write.mode("overwrite").parquet(plain)
    zed = str(tmp_path / "zed")
    write_zordered(ev, zed, "user_id", "vbucket", bits=12, n_files=16)

    sp = row_group_skip_stats(plain, x_range=(lo_u, hi_u), y_range=(lo_v, hi_v), **box)
    sz = row_group_skip_stats(zed, x_range=(lo_u, hi_u), y_range=(lo_v, hi_v), **box)
    # Hash-partitioned layout: every row group spans the full key ranges ->
    # nothing skippable. Z-order: most row groups miss the box entirely.
    assert sz["n_skippable"] > sp["n_skippable"]
    assert sz["skip_ppm"] >= 500_000, sz  # >= half the row groups prune away

    # Layout must not change content: the box query returns identical rows.
    pred = (
        (F.col("user_id").between(lo_u, hi_u)) & (F.col("vbucket").between(lo_v, hi_v))
    )
    a = sorted(r.event_id for r in spark.read.parquet(plain).filter(pred).collect())
    b = sorted(r.event_id for r in spark.read.parquet(zed).filter(pred).collect())
    assert a == b and len(a) > 0


def test_zorder_key_n_reduces_to_two_col_and_clusters_three(spark, tmp_path):
    from pyspark.sql import functions as F

    from marketpipe_spark.bucketing import (
        row_group_skip_stats,
        write_zordered_n,
        zorder_key,
        zorder_key_n,
    )

    df = spark.range(512).select(
        (F.col("id") % 23).alias("a"),
        (F.col("id") % 19).alias("b"),
        (F.col("id") % 17).alias("c"),
    )
    # 2-column zorder_key_n == zorder_key exactly.
    two = df.select(
        zorder_key(F.col("a"), F.col("b"), bits=8).alias("z1"),
        zorder_key_n([F.col("a"), F.col("b")], bits=8).alias("z2"),
    )
    assert two.filter(F.col("z1") != F.col("z2")).count() == 0

    import pytest

    with pytest.raises(ValueError, match="63"):
        zorder_key_n([F.col("a")] * 5, bits=16)

    # 3-column layout prunes row groups on the THIRD dimension too.
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id",
        F.col("user_id").cast("long").alias("u"),
        F.floor("value").cast("long").alias("v"),
        (F.col("event_id") % 64).alias("w"),
    )
    out = str(tmp_path / "z3")
    write_zordered_n(ev, out, ["u", "v", "w"], bits=12, n_files=16)
    s = row_group_skip_stats(out, "w", "w", (0, 7), (0, 7))
    assert s["n_skippable"] > 0  # min/max stats on the 3rd dim prune
