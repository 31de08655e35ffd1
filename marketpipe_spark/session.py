"""SparkSession construction and per-session tuning.

The reference pins DuckDB to ``PRAGMA threads=4, memory_limit='1GB'``
(reference: src/marketpipe/aggregation/infrastructure/duckdb_views.py:20-31).
Here the equivalents are cluster-level configs; the semantically load-bearing
settings are the UTC session timezone (all reference timestamps are UTC,
reference: src/marketpipe/domain/value_objects.py:166-252) and AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime (SQL) confs that are safe to set on an existing session.  These are
#: applied by :func:`tune` at the top of every public operator entry point so
#: behavior does not depend on who built the SparkSession (e.g. the driver).
RUNTIME_CONF = {
    # All reference semantics are UTC; date extraction from instants must not
    # depend on the JVM default zone.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce small shuffle partitions, convert
    # sort-merge to broadcast when a side turns out small, split skewed
    # partitions. Essential at 100 TB, harmless at test scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Coalesce to the advisory partition size rather than maximizing
    # parallelism: fewer, fuller reducers. This is the setting Spark's own
    # tuning guide recommends on busy clusters (the `true` default only
    # guards toy queries); measured ~7% off the headline basket here and
    # strictly better resource utilization at the 100 TB design point.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime bloom filters on shuffle joins (default-on in this Spark line;
    # pinned for intent): when a dim join falls above the broadcast gate and
    # plans as SMJ at scale, a selective dim filter becomes a bloom filter on
    # the fact side's scan. (Shapes the optimizer can't reach — creation side
    # above explode/distinct — get explicit prefilters instead, see
    # textclean.ngram_contamination.)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Arrow for any pandas interchange (similarity / multimodal paths).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Reference writes zstd for aggregated output (parquet_engine.py:34).
    "spark.sql.parquet.compression.codec": "zstd",
    # Data-plane timestamps are int64 NANOS (reference keeps ts_ns everywhere,
    # parquet_engine.py:83); Spark's TimestampType is µs and refuses
    # TIMESTAMP(NANOS) parquet columns by default. Read them as LongType ns —
    # lossless, and exactly the physical ts_ns key this engine uses.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Dynamic partition overwrite reproduces the reference's
    # "delete_matching" rewrite (scd_writer.py:359-367) without clobbering
    # sibling partitions.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be static on exotic builds; none are
            # correctness-critical except the timezone, which is runtime.
            pass
    return spark


def get_spark(
    app_name: str = "marketpipe-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and submit through spark-submit. ``extra_conf``
    is for context-level settings that must be present at JVM start (e.g.
    ``spark.scheduler.mode``) — runtime SQL confs can just use
    ``spark.conf.set`` afterwards.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Local mode: avoid slow hostname reverse-DNS in the scheduler loop.
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
