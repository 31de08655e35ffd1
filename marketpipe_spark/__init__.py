"""marketpipe_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of joeyda3rd/MarketPipe.

The reference is a Python ETL framework (providers -> validated domain bars ->
partitioned Parquet lake -> DuckDB aggregation/query). This package re-expresses
that surface Spark-first: declarative DataFrame/SQL plans optimized by Catalyst,
partitioned Parquet at rest, built-in functions only on the hot path (no
row-at-a-time Python UDFs), and partition-pruned scans designed for a
multi-executor cluster at 100 TB scale.

Subpackages:
- ``operators``  — resample, analytics, validation, SCD-2, gaps, dedup,
  similarity, text analysis, multimodal plumbing
- ``sources``    — fake bar generator, provider adapters (driver-side I/O)
- ``functions``  — shared column-expression helpers (ts_ns arithmetic etc.)
- ``plans``      — query surface: per-frame views + ``query(sql)``
- ``streaming``  — incremental-batch checkpointing / gap backfill
- ``lake``       — partitioned Parquet read/write with keep-last dedup upsert
"""

__version__ = "0.1.0"
