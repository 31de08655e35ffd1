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
