"""Count-min sketch: mergeable frequency estimation for heavy hitters.

The 100 TB frequent-items story, complementing the HLL distinct-count path
(tests/test_plan_hygiene.py::test_hll_sketch_error_bound): an exact
``groupBy(token).count()`` over a 100 TB corpus shuffles every distinct key;
a count-min sketch is a fixed ``depth x width`` grid of counters that each
executor fills locally and the reduce step merges by cell addition — the
whole aggregation is one map-side-combined shuffle of at most
``depth*width`` cells per partition, independent of key cardinality.
Point estimates only ever OVER-count (collisions add), so
``cm_est >= true_count`` always, with
``P[cm_est > true + e*N] <= (1/2)^depth`` at ``width = 2/e``.

Everything here is deterministic given the hash family, so the full
pipeline (sketch build -> point estimates -> ranking) is reproduced
value-for-value by the DuckDB oracle under the ``md5_60`` family
(see plans/queries_docs.py::cm_top_tokens). Production default stays
``xxhash64`` (JVM codegen, ~3x cheaper).

Reference parity: the reference has no sketch module; this extends its
aggregation surface (SURVEY §2.5) with the approximate path a
training-data pipeline needs at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _hash64

__all__ = ["cm_bucket_cols", "cm_sketch", "cm_estimate"]


def cm_bucket_cols(col: Column, depth: int, width: int, hash_family: str = "xxhash64") -> Column:
    """Array of ``depth`` bucket indices for one key: ``h_i(key) % width``.

    Seeds are compile-time literals (``key || ':' || i`` under ``md5_60``),
    so the whole array is one codegen'd projection — no per-row Python and
    no shuffle. ``pmod`` keeps xxhash64's signed output non-negative.
    """
    return F.array(
        *[F.pmod(_hash64(col, i, hash_family), F.lit(width)) for i in range(depth)]
    )


def cm_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    hash_family: str = "xxhash64",
    weight: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``df[col]`` → ``(d, bucket, cnt)`` rows.

    The posexplode inflates rows by ``depth`` (a small constant, default 4 —
    unlike a per-dimension explode this does not scale with data width), and
    the groupBy's map-side combine collapses each partition to at most
    ``depth*width`` cells before the shuffle, so the exchange moves
    O(partitions * depth * width) rows regardless of corpus size. Sketches
    built on disjoint slices merge by summing cell counts (mergeable), which
    is exactly what the partial aggregate already does.
    """
    w = F.col(weight).cast("long") if weight is not None else F.lit(1).cast("long")
    return (
        df.select(
            F.posexplode(cm_bucket_cols(F.col(col), depth, width, hash_family)).alias(
                "d", "bucket"
            ),
            w.alias("w"),
        )
        .groupBy("d", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def cm_estimate(
    keys: DataFrame,
    col: str,
    sketch: DataFrame,
    depth: int,
    width: int,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Point-estimate each key's frequency: ``min_d sketch[d][h_d(key)]``.

    The sketch is at most ``depth*width`` rows → broadcast to every executor,
    so the estimate pass is a map-only broadcast join + one hash-agg on the
    key — no large-side shuffle beyond the final per-key min. Keys whose
    bucket row is absent (cell never touched) estimate to 0, which under CM
    semantics proves a true count of 0.
    """
    b = keys.select(
        F.col(col),
        F.posexplode(cm_bucket_cols(F.col(col), depth, width, hash_family)).alias(
            "d", "bucket"
        ),
    )
    return (
        b.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cm_est"))
    )
