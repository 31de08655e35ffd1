"""2-D skyline (Pareto frontier) — bucket-pruned sort-filter-skyline.

MarketPipe's ``query`` surface is arbitrary analytical SQL over the lake
(reference: src/marketpipe/cli/query.py:11-40); multi-objective "best
trade-off" queries (largest AND most recent orders, cheapest AND freshest
suppliers) are the skyline operator of the OLAP literature. For two
criteria the frontier admits an exact O(n log n) algorithm: sort by the
first criterion descending, keep every point whose second criterion beats
the running maximum of everything sorted before it.

A naive Spark translation of that algorithm is an un-partitioned window —
a GLOBAL sort collapsing into ONE task, the classic single-reducer trap.
The implementation here is the standard two-phase distributed skyline:

1. **Local prune** — points are hash-bucketed and the sort-filter pass
   runs per bucket (a parallel window). A point dominated within its
   bucket is dominated globally, so the filter is safe; for typical data
   each bucket keeps only its local frontier (~log of bucket size).
2. **Global pass** — the same sort-filter over the pruned survivors. This
   IS a single-partition window, but over the union of local frontiers —
   expected O(buckets x log n), thousands of rows at 100 TB, not the
   input. (Worst case — perfectly anti-correlated criteria — the frontier
   is the whole input and no exact skyline algorithm distributes better;
   callers with such data should pre-bin one criterion.)

With ``by`` keys the skyline is computed independently per group and every
window is partitioned by the group — fully parallel, no global pass
needed beyond the per-group one (groups are the parallelism unit, the
Spark-natural form of the operator).

Both criteria are MAXIMIZED; negate a column to minimize it. Dominance is
the standard weak-dominance-with-one-strict rule: q dominates p iff
qx >= px and qy >= py and (qx, qy) != (px, py). Exact duplicate points are
therefore kept together (neither dominates), and every id sharing a
frontier point is returned. All comparisons are on caller-supplied
integer-quantized columns, so cross-engine parity is exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame,
    x: str,
    y: str,
    by: Sequence[str] = (),
    buckets: int = 32,
) -> DataFrame:
    """Rows of ``df`` on the (max ``x``, max ``y``) Pareto frontier,
    independently per ``by`` group when given.

    ``x`` / ``y`` must be integer columns (quantize floats upstream —
    exactness of the comparisons is what makes results engine- and
    partition-independent). Returns the input rows (all columns) whose
    (x, y) point is non-dominated in its group; ties on a frontier point
    all survive.
    """
    by = list(by)
    keys = by + [x, y]
    dp = df.select(*keys).distinct()

    def sort_filter(pts: DataFrame, part_cols: list) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col(x).desc(), F.col(y).desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            pts.withColumn("_ymax", F.max(y).over(w))
            .where(F.col("_ymax").isNull() | (F.col(y) > F.col("_ymax")))
            .select(*keys)
        )

    bkt = F.pmod(F.xxhash64(F.col(x), F.col(y)), F.lit(buckets))
    local = sort_filter(dp.withColumn("_bkt", bkt), by + ["_bkt"])
    # survivors are tiny (union of per-bucket frontiers) — the final
    # window runs over this pruned set only.
    frontier = sort_filter(local, by)
    return df.join(frontier, keys, "left_semi")


def skyline2d_sql(src_sql: str, x: str, y: str, by: Sequence[str] = ()) -> str:
    """CTE list reproducing :func:`skyline2d` over ``src_sql`` (which must
    expose integer columns ``x``/``y`` and any ``by`` keys); exposes
    ``sky`` = the frontier rows of ``src``. The oracle runs the single
    sort-filter pass directly (the bucket prune is a pure optimization
    with identical output)."""
    by = list(by)
    keys = ", ".join(by + [x, y])
    part = f"PARTITION BY {', '.join(by)} " if by else ""
    return f"""src AS MATERIALIZED ({src_sql}),
sdp AS (SELECT DISTINCT {keys} FROM src),
sflt AS (
  SELECT {keys},
         MAX({y}) OVER ({part}ORDER BY {x} DESC, {y} DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ymax
  FROM sdp
),
sfront AS (SELECT {keys} FROM sflt WHERE ymax IS NULL OR {y} > ymax),
sky AS (SELECT src.* FROM src JOIN sfront USING ({keys}))"""
