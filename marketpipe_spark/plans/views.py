"""SQL query surface — per-frame views + ``query(sql)``.

Reference: src/marketpipe/aggregation/infrastructure/duckdb_views.py —
``bars_{5m,15m,1h,1d}`` views over the aggregated lake, an empty typed
fallback when a frame has no data (:44-51), ``query(sql)`` passthrough
(:98-125) and the availability summary (:128-162); CLI rendering
src/marketpipe/cli/query.py:42-65 (K6/O4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import tune

VIEW_FRAMES = ("5m", "15m", "1h", "4h", "1d")

#: Empty-view fallback schema (duckdb_views.py:45-51).
_EMPTY_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("ts_ns", T.LongType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("date", T.StringType()),
    ]
)


def ensure_views(spark: SparkSession, agg_root: str, frames=VIEW_FRAMES) -> list[str]:
    """Register ``bars_<frame>`` temp views over the aggregated lake; a frame
    with no partitions gets an empty typed view (duckdb_views.py:65-72)."""
    tune(spark)
    created = []
    for frame in frames:
        name = f"bars_{frame}"
        try:
            df = (
                spark.read.parquet(agg_root)
                .filter(F.col("frame") == frame)
                .select("symbol", "ts_ns", "open", "high", "low", "close", "volume",
                        F.col("date").cast("string").alias("date"))
            )
            df.head(1)
        except Exception:
            df = spark.createDataFrame([], _EMPTY_SCHEMA)
        df.createOrReplaceTempView(name)
        created.append(name)
    return created


def query(spark: SparkSession, sql: str) -> DataFrame:
    """Ad-hoc SQL over the registered views (duckdb_views.py:98-125)."""
    if not sql or not sql.strip():
        raise ValueError("empty SQL")
    return tune(spark).sql(sql)


def render(df: DataFrame, limit: int = 50, fmt: str = "markdown") -> str:
    """K6/O4 — CSV or grid-table rendering of the first ``limit`` rows
    (cli/query.py:42-65). Delegates to :func:`marketpipe_spark.lake.render_table`."""
    from ..lake import render_table

    return render_table(df, limit=limit, fmt=fmt)
