"""Bucketed tables — shuffle-free co-located joins for the lake's big×big
join pairs.

Broadcast handles small dims; when BOTH join sides are huge (lineitem ×
orders at 100 TB, bars × bars self-joins), the win is to pre-shuffle ONCE at
write time: bucket both tables by the join key into the same bucket count,
and every subsequent equi-join on that key runs with zero exchanges — each
task reads bucket i of both sides. The write pays one shuffle; every later
join is free. This is the 100 TB answer to "this join shuffles 100 TB every
night".

Spark specifics: bucketing requires the session catalog (``saveAsTable``);
``sortBy`` within buckets additionally removes the join's sort step
(sort-merge join reads pre-sorted buckets). Both sides must agree on bucket
count and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import tune


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table keyed
    for future co-located joins on ``bucket_col``."""
    tune(df.sparkSession)
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the plan contains NO exchange on either side (verified in
    tests via the physical plan)."""
    tune(spark)
    return spark.table(left_table).join(spark.table(right_table), on)
