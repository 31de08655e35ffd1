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
