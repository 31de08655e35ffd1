"""Golden-value and invariance tests for the 2-D skyline operator."""

from marketpipe_spark.operators.skyline import skyline2d


def test_skyline_basic_dominance(spark):
    # (5,1) (3,3) (1,5) mutually non-dominated; (2,2) dominated by (3,3);
    # (5,0) dominated by (5,1) (equal x, strictly smaller y).
    rows = [(1, 5, 1), (2, 3, 3), (3, 1, 5), (4, 2, 2), (5, 5, 0)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["id"] for r in skyline2d(df, "x", "y").collect()}
    assert got == {1, 2, 3}


def test_skyline_duplicates_and_ties_all_survive(spark):
    # two rows share the frontier point (4,4): both kept (neither dominates
    # the other under the one-strict rule); a third id at dominated (4,3) dies.
    rows = [(1, 4, 4), (2, 4, 4), (3, 4, 3)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["id"] for r in skyline2d(df, "x", "y").collect()}
    assert got == {1, 2}


def test_skyline_grouped_is_per_group(spark):
    # group a: (5,1) and (1,5) both frontier; group b: single point frontier,
    # (0,0) in b dominated by (2,2).
    rows = [("a", 1, 5, 1), ("a", 2, 1, 5), ("b", 3, 2, 2), ("b", 4, 0, 0)]
    df = spark.createDataFrame(rows, "g string, id long, x long, y long")
    got = {r["id"] for r in skyline2d(df, "x", "y", by=["g"]).collect()}
    assert got == {1, 2, 3}


def test_skyline_partition_invariance_and_bucket_count(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(100), rng.randrange(100)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    a = sorted(r["id"] for r in skyline2d(df, "x", "y", buckets=32).collect())
    b = sorted(
        r["id"]
        for r in skyline2d(df.repartition(11, "y"), "x", "y", buckets=3).collect()
    )
    assert a == b and len(a) >= 1
    # brute-force reference
    pts = {(x, y) for _, x, y in rows}
    front = {
        i
        for i, x, y in rows
        if not any(
            (qx >= x and qy >= y and (qx, qy) != (x, y)) for qx, qy in pts
        )
    }
    assert set(a) == front
