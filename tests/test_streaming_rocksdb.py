"""RocksDB state store provider: parity + restart (VERDICT r6 #3).

The five streaming registry entries run on the default (in-memory HDFS-
backed) state store everywhere else. At 100 TB state — minutes of
high-cardinality dedup keys, millions of open sessions — the in-memory
provider OOMs executors; RocksDB spills keyed state to local disk with an
incremental-checkpoint changelog and is the provider a production cluster
would run. These tests pin that the engine's streaming semantics are
PROVIDER-INDEPENDENT (same results under both stores) and that checkpointed
RocksDB state survives a stop/restart cycle.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture
def rocksdb_conf(spark):
    """Set the RocksDB provider for queries STARTED inside the test, then
    restore the default. The provider class is read at query start, so a
    runtime conf flip is all a per-query switch needs."""
    prev = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    yield spark
    if prev is None:
        spark.conf.unset(PROVIDER_CONF)
    else:
        spark.conf.set(PROVIDER_CONF, prev)


@pytest.mark.parametrize(
    "name",
    [
        "stream_resample_5m",
        "stream_dedup_minute",
        "stream_sessions",
        "stream_top_users",
        "stream_attribution_join",
    ],
)
def test_stream_entries_rocksdb_parity(spark, rocksdb_conf, name):
    """Every streaming entry must produce identical rows under RocksDB and
    the default provider — the state store is an execution detail, never a
    semantics knob (covers windowed agg, watermark dedup, session windows,
    complete-mode top-k, and stream-stream join state)."""
    import __spark_entry__ as entry_mod
    from conftest import SF_SMOKE

    q = entry_mod.queries()[name]
    rocks = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    spark.conf.unset(PROVIDER_CONF)
    default = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    assert rocks == default


def test_rocksdb_dedup_state_survives_restart(spark, rocksdb_conf, tmp_path):
    """Chaos restart under RocksDB: dropDuplicatesWithinWatermark state is
    checkpointed, so a duplicate key arriving AFTER a stop/restart cycle
    must still be dropped (the state store was rebuilt from the RocksDB
    checkpoint, not reset), and the blind-append sink must show each input
    file exactly once."""
    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t0 = 1_700_000_000_000_000_000

    def _drain():
        st = (
            spark.readStream.schema("user_id long, ts_ns long")
            .parquet(landing)
            .withColumn("event_time", F.timestamp_micros(F.expr("ts_ns div 1000")))
            .withWatermark("event_time", "1 hour")
            .dropDuplicatesWithinWatermark(["user_id"])
        )
        q = (
            st.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        return q

    # batch 1: users 1,2
    spark.createDataFrame(
        [(1, t0), (2, t0 + 1_000_000_000)], "user_id long, ts_ns long"
    ).coalesce(1).write.mode("append").parquet(landing)
    q1 = _drain()
    # prove RocksDB was the provider in force: its custom metrics carry
    # rocksdb-prefixed keys the default provider never emits
    ops = (q1.lastProgress or {}).get("stateOperators") or []
    metrics = " ".join(k for op in ops for k in (op.get("customMetrics") or {}))
    assert "rocksdb" in metrics.lower(), f"RocksDB not in force: {metrics!r}"
    assert spark.read.parquet(sink).count() == 2

    # stop/restart: batch 2 re-sends user 1 (duplicate) plus new user 3
    spark.createDataFrame(
        [(1, t0 + 2_000_000_000), (3, t0 + 3_000_000_000)],
        "user_id long, ts_ns long",
    ).coalesce(1).write.mode("append").parquet(landing)
    _drain()
    rows = {r.user_id for r in spark.read.parquet(sink).collect()}
    assert rows == {1, 2, 3}
    assert spark.read.parquet(sink).count() == 3  # user 1 deduped across restart
    # RocksDB left its on-disk state layout under the checkpoint
    state_dir = os.path.join(ckpt, "state")
    assert os.path.isdir(state_dir) and any(os.scandir(state_dir))
