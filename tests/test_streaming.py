"""Structured Streaming leg: file-source stream → watermarked windowed OHLCV
→ foreachBatch lake upsert with AvailableNow checkpointed catch-up."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marketpipe_spark.lake import read_bars
from marketpipe_spark.operators.resample import resample_intraday
from marketpipe_spark.schema import BARS_MIN_SCHEMA
from marketpipe_spark.streaming.stream import (
    read_bar_stream,
    run_available_now,
    stream_to_lake,
    windowed_ohlcv,
)

NS_MIN = 60_000_000_000
DAY1 = 1_704_153_600_000_000_000  # 2024-01-02 00:00 UTC


def _bars_df(spark, symbol, start_ns, n, base=100.0):
    rows = [
        (symbol, start_ns + i * NS_MIN, base + i, base + i + 1.0, base + i - 1.0, base + i + 0.5, 10 + i)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, BARS_MIN_SCHEMA)


def test_stream_catchup_and_incremental(spark, tmp_path):
    landing = str(tmp_path / "landing")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    _bars_df(spark, "AAPL", DAY1, 10).coalesce(1).write.mode("append").parquet(landing)
    q = stream_to_lake(read_bar_stream(spark, landing), lake, "1m", ckpt)
    run_available_now(q)
    assert read_bars(spark, lake, frame="1m").count() == 10

    # second file: 5 overlapping bars (dup ts, replayed) + 5 genuinely new
    _bars_df(spark, "AAPL", DAY1 + 5 * NS_MIN, 10, base=200.0).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    q = stream_to_lake(read_bar_stream(spark, landing), lake, "1m", ckpt)
    run_available_now(q)
    out = read_bars(spark, lake, frame="1m")
    assert out.count() == 15  # keep-last dedup collapsed the 5 replayed ts
    # the replayed rows won (keep-last): ts at minute 5 now carries base 200
    row = out.filter(F.col("ts_ns") == DAY1 + 5 * NS_MIN).collect()[0]
    assert row.open == 200.0


def test_windowed_ohlcv_matches_batch_resample(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    bars = _bars_df(spark, "AAPL", DAY1, 12)
    bars.coalesce(1).write.mode("append").parquet(landing)
    # Append-mode emits a window only once the watermark passes its end, and
    # the watermark advances between microbatches — land a later punctuation
    # bar as a second file (maxFilesPerTrigger=1 → second microbatch) so the
    # three real windows finalize; the punctuation's own window stays pending.
    import time

    time.sleep(1.1)  # file-source ordering is by modification time
    _bars_df(spark, "AAPL", DAY1 + 3_600_000_000_000, 1).coalesce(1).write.mode("append").parquet(
        landing
    )

    stream = windowed_ohlcv(read_bar_stream(spark, landing, max_files_per_trigger=1), minutes=5)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_available_now(q)

    got = {
        (r.symbol, r.ts_ns): (r.open, r.high, r.low, r.close, r.volume)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r.symbol, r.ts_ns): (r.open, r.high, r.low, r.close, r.volume)
        for r in resample_intraday(bars, 300).collect()
    }
    assert got == want
    assert len(got) == 3  # 12 minutes -> three 5m windows


def test_highwater_dedup_stateful_operator(spark, tmp_path):
    """applyInPandasWithState: replays/duplicates dropped across microbatches
    AND across query restarts (state survives via checkpoint)."""
    from marketpipe_spark.streaming.stream import highwater_dedup_stream

    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        deduped = highwater_dedup_stream(read_bar_stream(spark, landing))
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        run_available_now(q)

    # batch 1: 10 bars, one ts duplicated in-batch (later row must win)
    b1 = _bars_df(spark, "AAPL", DAY1, 10)
    dup = spark.createDataFrame(
        [("AAPL", DAY1 + 3 * NS_MIN, 999.0, 999.0, 999.0, 999.0, 1)], BARS_MIN_SCHEMA
    )
    b1.unionByName(dup).coalesce(1).write.mode("append").parquet(landing)
    run_once()
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == 10  # in-batch duplicate collapsed

    # batch 2 (new query run, same checkpoint): 5 replayed + 5 new bars
    _bars_df(spark, "AAPL", DAY1 + 5 * NS_MIN, 10, base=300.0).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    run_once()
    out2 = spark.read.parquet(out_dir)
    assert out2.count() == 15  # only the 5 genuinely-new ts emitted
    # replayed ts were NOT re-emitted: original values survive
    row = out2.filter(F.col("ts_ns") == DAY1 + 6 * NS_MIN).collect()
    assert len(row) == 1 and row[0].open != 300.0


def test_session_window_stream(spark, tmp_path):
    """Built-in session_window: two bursts separated by a >30min quiet gap
    become two sessions once the stream drains."""
    from marketpipe_spark.streaming.stream import session_stats_stream

    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    burst1 = _bars_df(spark, "AAPL", DAY1, 5)
    burst2 = _bars_df(spark, "AAPL", DAY1 + 90 * NS_MIN, 3, base=200.0)
    # append mode emits a session only once the watermark passes its end:
    # a far-future row on another symbol advances event time past burst2
    flush = _bars_df(spark, "ZZZZ", DAY1 + 600 * NS_MIN, 1)
    burst1.unionByName(burst2).unionByName(flush).coalesce(1).write.mode("append").parquet(landing)

    sessions = session_stats_stream(read_bar_stream(spark, landing), gap="30 minutes")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_available_now(q)
    rows = sorted(
        [r for r in spark.read.parquet(out_dir).collect() if r.symbol == "AAPL"],
        key=lambda r: r.session_start_ns,
    )
    assert len(rows) == 2
    assert rows[0].n_bars == 5 and rows[1].n_bars == 3
    assert rows[0].session_start_ns == DAY1
    assert rows[1].session_start_ns == DAY1 + 90 * NS_MIN
    # session end = last event + gap (session_window semantics)
    assert rows[0].session_end_ns == DAY1 + 4 * NS_MIN + 30 * 60 * 10**9


def test_enrich_stream_matches_batch_interval_join(spark, tmp_path):
    """Stream-stream watermarked interval join produces exactly the rows the
    batch join would on the same data (inner, 5-minute tolerance)."""
    from marketpipe_spark.streaming.stream import enrich_stream

    t_dir, q_dir, out = (str(tmp_path / d) for d in ("trades", "quotes", "out"))
    trades = _bars_df(spark, "AAPL", DAY1, 12)
    quotes = _bars_df(spark, "AAPL", DAY1 - 2 * NS_MIN, 20, base=50.0).unionByName(
        _bars_df(spark, "MSFT", DAY1, 5, base=70.0)  # wrong symbol: never joins AAPL
    )
    trades.coalesce(1).write.parquet(t_dir)
    quotes.coalesce(1).write.parquet(q_dir)

    joined = enrich_stream(
        read_bar_stream(spark, t_dir), read_bar_stream(spark, q_dir), tolerance="5 minutes"
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_available_now(q)
    got = spark.read.parquet(out)

    # batch equivalent over the same files
    bt = spark.read.parquet(t_dir)
    bq = spark.read.parquet(q_dir).select(
        *[F.col(c).alias(f"q_{c}") for c in quotes.columns]
    )
    expected = bt.join(
        bq,
        (F.col("symbol") == F.col("q_symbol"))
        & (F.col("q_ts_ns") >= F.col("ts_ns") - F.lit(5 * NS_MIN))
        & (F.col("q_ts_ns") <= F.col("ts_ns")),
        "inner",
    )
    assert got.count() == expected.count() > 0
    key = ["symbol", "ts_ns", "q_ts_ns"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, expected.select(*key).collect())
    )
    # every joined quote is within tolerance, and only same-symbol rows joined
    bad = got.filter(
        (F.col("q_symbol") != F.col("symbol"))
        | (F.col("q_ts_ns") > F.col("ts_ns"))
        | (F.col("q_ts_ns") < F.col("ts_ns") - F.lit(5 * NS_MIN))
    )
    assert bad.count() == 0


def test_dedup_within_watermark(spark, tmp_path):
    from marketpipe_spark.streaming.stream import dedup_within_watermark

    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = _bars_df(spark, "AAPL", DAY1, 10)
    # duplicates of 4 bars (same symbol+ts, different prices) in the same batch
    dups = _bars_df(spark, "AAPL", DAY1, 4, base=900.0)
    base.unionByName(dups).coalesce(1).write.mode("append").parquet(landing)

    deduped = dedup_within_watermark(read_bar_stream(spark, landing))
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    run_available_now(q)
    got = spark.read.parquet(out_dir)
    assert got.count() == 10
    assert got.select("ts_ns").distinct().count() == 10


def test_anomaly_stream_crosses_microbatches(spark, tmp_path):
    from marketpipe_spark.streaming.stream import anomaly_stream

    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: closes 100.5..104.5 (small moves only)
    _bars_df(spark, "AAPL", DAY1, 5).coalesce(1).write.mode("append").parquet(landing)

    def drain():
        q = (
            anomaly_stream(read_bar_stream(spark, landing), threshold=0.5)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        run_available_now(q)
        import os

        if not any(f.endswith(".parquet") for f in os.listdir(out_dir)):
            return []
        return spark.read.parquet(out_dir).collect()

    assert drain() == []

    # batch 2: first bar close=200.5 — a >50% jump vs batch 1's LAST close
    # (104.5), visible only if state carried across the microbatch boundary.
    _bars_df(spark, "AAPL", DAY1 + 5 * NS_MIN, 2, base=200.0).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    rows = drain()
    assert len(rows) == 1
    assert rows[0].prev_close == 104.5
    assert rows[0].close == 200.5


def test_silence_alert_stream_timer_fires_on_gap(spark, tmp_path):
    """transformWithStateInPandas with event-time timers: a symbol that goes
    quiet for >5min of event time produces an alert once the watermark
    (advanced by other traffic in a later microbatch) passes its timer."""
    import time as _time

    pytest.importorskip("google.protobuf")  # TWS python runner dependency
    from marketpipe_spark.streaming.stream import silence_alert_stream

    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # file 1: AAPL bars ending at minute 4 — timer armed at minute 4 + 5min
    _bars_df(spark, "AAPL", DAY1, 5).coalesce(1).write.mode("append").parquet(landing)
    _time.sleep(1.1)  # file-source ordering is by modification time
    # file 2: ZZZZ traffic 60min later advances the watermark past AAPL's timer
    _bars_df(spark, "ZZZZ", DAY1 + 60 * NS_MIN, 2).coalesce(1).write.mode("append").parquet(landing)

    alerts = silence_alert_stream(
        read_bar_stream(spark, landing, max_files_per_trigger=1), silence_ms=5 * 60 * 1000
    )
    q = (
        alerts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_available_now(q)
    import os

    rows = (
        spark.read.parquet(out_dir).collect()
        if any(f.endswith(".parquet") for f in os.listdir(out_dir))
        else []
    )
    by_symbol = {r.symbol: r for r in rows}
    assert "AAPL" in by_symbol  # went silent; alert fired
    a = by_symbol["AAPL"]
    assert a.last_ts_ns == DAY1 + 4 * NS_MIN
    assert a.alert_time_ms == (DAY1 + 4 * NS_MIN) // 1_000_000 + 5 * 60 * 1000


def test_anomaly_stream_group_spanning_arrow_chunks(spark, tmp_path):
    """A group larger than arrow.maxRecordsPerBatch arrives as MULTIPLE
    Arrow chunks with no cross-chunk ordering; the detector must globally
    sort the group before scanning (regression: per-chunk sorting compared
    non-adjacent bars and fabricated alerts on backfill-sized batches)."""
    import random

    from marketpipe_spark.streaming.stream import anomaly_stream

    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        # 120 smoothly-rising bars (adjacent moves ~1%), written in SHUFFLED
        # order so chunk boundaries interleave early and late timestamps.
        rows = [
            ("AAPL", DAY1 + i * NS_MIN, 100.0 + i, 101.0 + i, 99.0 + i, 100.0 + i, 10)
            for i in range(120)
        ]
        random.Random(7).shuffle(rows)
        spark.createDataFrame(rows, _bars_df(spark, "X", DAY1, 1).schema).coalesce(
            1
        ).write.mode("append").parquet(landing)

        q = (
            anomaly_stream(read_bar_stream(spark, landing), threshold=0.5)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        run_available_now(q)
        import os

        got = (
            spark.read.parquet(out_dir).collect()
            if any(f.endswith(".parquet") for f in os.listdir(out_dir))
            else []
        )
        # In event order no adjacent move exceeds 1%; ANY alert here means
        # the detector compared out-of-order neighbors.
        assert got == []
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_highwater_dedup_group_spanning_arrow_chunks(spark, tmp_path):
    """A microbatch bigger than arrow.maxRecordsPerBatch reaches the
    high-water dedup as MULTIPLE unordered Arrow chunks; the operator must
    dedup the group globally (regression: chunk-sequential processing
    dropped a later chunk's smaller-but-new timestamps as replays and kept
    the FIRST copy of a duplicate spanning chunks instead of the last)."""
    import os
    import random

    from marketpipe_spark.streaming.stream import highwater_dedup_stream

    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        # 100 distinct-ts bars in SHUFFLED order (so a later chunk holds
        # earlier timestamps) + one cross-chunk duplicate ts where the
        # LAST-sorted copy carries close=999.
        rows = [
            ("AAPL", DAY1 + i * NS_MIN, 1.0 + i, 1.0 + i, 1.0 + i, 1.0 + i, 1)
            for i in range(100)
        ]
        random.Random(11).shuffle(rows)
        rows.append(("AAPL", DAY1 + 50 * NS_MIN, 999.0, 999.0, 999.0, 999.0, 2))
        spark.createDataFrame(rows, BARS_MIN_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

        q = (
            highwater_dedup_stream(read_bar_stream(spark, landing))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        run_available_now(q)
        got = (
            spark.read.parquet(out_dir).collect()
            if any(f.endswith(".parquet") for f in os.listdir(out_dir))
            else []
        )
        by_ts = {r.ts_ns: r for r in got}
        assert len(got) == 100 and len(by_ts) == 100  # nothing dropped, no dup
        assert by_ts[DAY1 + 50 * NS_MIN].close == 999.0  # keep-LAST across chunks
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_streaming_curation_matches_batch(spark, tmp_path):
    """Map-only curation ops (PII scrub + quality features) run unchanged
    under Structured Streaming: stream the documents table through
    scrub_pii file-by-file and compare against the batch pass row-for-row.
    At 100 TB this is the continuous-ingest curation leg — the SAME operator
    serves both modes because it contains no shuffle."""
    from pyspark.sql import functions as F

    from marketpipe_spark.operators.textclean import scrub_pii

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ck = str(tmp_path / "ck")
    batch_df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    # plant one email so the scrub does real work in-stream
    batch_df = batch_df.withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" ping a@b.io"))).otherwise(
            F.col("text")
        ),
    )
    batch_df.repartition(3).write.parquet(src)

    stream = scrub_pii(
        spark.readStream.schema(batch_df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    ).select("doc_id", "n_emails", "scrubbed_text")
    (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(
        map(tuple, scrub_pii(batch_df).select("doc_id", "n_emails", "scrubbed_text").collect())
    )
    assert got == want
    assert sum(r[1] for r in got) == 12  # the planted emails were scrubbed in-stream


def test_dedup_stream_accumulates_store_and_matches_batch(spark, tmp_path):
    """The continuous-dedup loop: two micro-batches of documents stream
    through dedup_stream; the found pair set must equal running the
    incremental operator by hand batch-by-batch, and the signature store
    must hold every document exactly once."""
    from conftest import SF_SMOKE
    from marketpipe_spark.operators.dedup import minhash_incremental_pairs
    from marketpipe_spark.streaming.stream import dedup_stream

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .limit(80)
        .select("doc_id", "text")
    )
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "in")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    store_p = str(tmp_path / "store")
    pairs_p = str(tmp_path / "pairs")
    q = dedup_stream(
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src),
        store_p,
        pairs_p,
        str(tmp_path / "ck"),
        threshold=0.5,
    )
    q.awaitTermination(180)

    store = spark.read.parquet(store_p)
    assert store.count() == docs.count()
    assert store.select("doc_id").distinct().count() == docs.count()

    got = {
        (r.id_a, r.id_b) for r in spark.read.parquet(pairs_p).select("id_a", "id_b").collect()
    }
    # manual two-step reference run over the same batch split
    empty = spark.createDataFrame([], "doc_id long, sig array<bigint>")
    # file order = write order (coalesce(1) per batch); replicate either
    # order-insensitively: pairs(batch1 vs empty) ∪ pairs(batch2 vs store1)
    p1, s1 = minhash_incremental_pairs(b1, empty, threshold=0.5)
    s1 = s1.localCheckpoint()
    p2, _ = minhash_incremental_pairs(b2, s1, threshold=0.5)
    want = {(r.id_a, r.id_b) for r in p1.unionByName(p2).select("id_a", "id_b").collect()}
    assert got == want


# ---------------------------------------------------------------------------
# memory-sink verification entries (plans/queries_stream.py)


def test_session_emission_boundary_rule(spark, tmp_path):
    """Pin the append-mode emission rule the stream_sessions oracle encodes:
    a session whose end equals the final watermark EXACTLY (max event-time ms
    − delay ms) IS emitted (``end <= watermark``, not strict ``<``)."""
    import pyspark.sql.types as T

    from marketpipe_spark.streaming.stream import run_to_memory

    t0 = 1_700_000_000_000_000_000
    rows = [(1, t0), (2, t0 + 40 * 60 * 1_000_000_000)]
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("ts_ns", T.LongType())]
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).write.parquet(src)
    st = spark.readStream.schema(schema).parquet(src)
    sess = (
        st.withColumn("event_time", F.timestamp_micros(F.expr("ts_ns div 1000")))
        .withWatermark("event_time", "10 minutes")
        .groupBy("user_id", F.session_window("event_time", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", (F.unix_micros(F.col("w.end")) * 1000).alias("end_ns"), "n")
    )
    out = run_to_memory(sess, "boundary_rule", "append").collect()
    # watermark = (t0 + 40min) − 10min = t0 + 30min == user 1's session end:
    # emitted. User 2's session (end t0 + 70min) stays open: not emitted.
    assert [(r.user_id, r.end_ns) for r in out] == [(1, t0 + 30 * 60 * 1_000_000_000)]


@pytest.mark.parametrize(
    "name", ["stream_resample_5m", "stream_dedup_minute", "stream_sessions"]
)
def test_stream_entries_match_batch(spark, name):
    """Each streaming registry entry equals its batch-SQL oracle executed by
    Spark itself on the same data (the DuckDB side is covered by the
    correctness sweep; this keeps the equivalence pinned in pytest)."""
    import os

    import __spark_entry__ as entry_mod
    from conftest import SF_SMOKE

    got = entry_mod.queries()[name](spark, SF_SMOKE)
    for t in ("events",):
        spark.read.parquet(os.path.join(SF_SMOKE, f"{t}.parquet")).createOrReplaceTempView(t)
    sql = entry_mod.oracle_sql()[name].replace("epoch_ns(ts)", "unix_micros(cast(ts as timestamp)) * 1000")
    sql = sql.replace("//", "div").replace("%", "%")
    want = spark.sql(sql)
    assert got.exceptAll(want.select(got.columns)).count() == 0
    assert want.select(got.columns).exceptAll(got).count() == 0


def test_checkpoint_restart_is_exactly_once_with_blind_append_sink(spark, tmp_path):
    """Checkpoint semantics in isolation: the sink here APPENDS blindly (no
    keep-last upsert to hide reprocessing), so any source batch replayed
    across the restart would show up as duplicate rows. Across clean
    stop/restart cycles on one checkpoint, the file source must hand each
    input file to exactly one microbatch."""
    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        q = (
            read_bar_stream(spark, landing)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        run_available_now(q)

    _bars_df(spark, "AAPL", DAY1, 10).coalesce(1).write.mode("append").parquet(landing)
    _run()
    assert spark.read.parquet(sink).count() == 10

    _bars_df(spark, "MSFT", DAY1, 7).coalesce(1).write.mode("append").parquet(landing)
    _run()  # restart from the same checkpoint
    out = spark.read.parquet(sink)
    assert out.count() == 17  # 10 would be >17 if batch 0 replayed
    assert out.groupBy("symbol", "ts_ns").count().filter(F.col("count") > 1).count() == 0

    _run()  # third restart with NO new data must be a no-op
    assert spark.read.parquet(sink).count() == 17


def test_windowed_aggregation_state_recovers_across_restart(spark, tmp_path):
    """Watermarked append-mode aggregation across a stop/restart: the second
    run must resume the first run's window state (not re-emit closed windows,
    not lose open ones) and the final sink must equal the batch resample."""
    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        q = (
            windowed_ohlcv(read_bar_stream(spark, landing), minutes=5)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        run_available_now(q)

    # run 1: 20 bars (4 windows); watermark leaves the tail window open
    _bars_df(spark, "AAPL", DAY1, 20).coalesce(1).write.mode("append").parquet(landing)
    _run()
    n_first = spark.read.parquet(sink).count()

    # run 2 (restart): 20 more bars continuing the timeline, then a far-future
    # flush bar so every real window's watermark passes
    _bars_df(spark, "AAPL", DAY1 + 20 * NS_MIN, 20, base=200.0).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _bars_df(spark, "FLUSH", DAY1 + 10_000 * NS_MIN, 1).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _run()

    out = spark.read.parquet(sink).filter(F.col("symbol") == "AAPL")
    assert out.count() > n_first  # restart appended, did not start from scratch
    # no closed window emitted twice across the restart boundary
    assert out.groupBy("symbol", "ts_ns").count().filter(F.col("count") > 1).count() == 0
    # value parity with the batch resample over the same 40 bars
    batch = resample_intraday(
        _bars_df(spark, "AAPL", DAY1, 20).unionByName(
            _bars_df(spark, "AAPL", DAY1 + 20 * NS_MIN, 20, base=200.0)
        ),
        300,
    )
    got = {tuple(r) for r in out.select("symbol", "ts_ns", "open", "high", "low", "close", "volume").collect()}
    want = {tuple(r) for r in batch.select("symbol", "ts_ns", "open", "high", "low", "close", "volume").collect()}
    assert got == want


def test_sliding_volume_conserves_multiplicity(spark, tmp_path):
    """Every bar lands in exactly window/slide sliding windows, so
    sum(n_bars) == 3 x input rows and sum(volume) == 3 x input volume."""
    from marketpipe_spark.plans.registry import bars
    from marketpipe_spark.plans.queries_stream import q_stream_sliding_volume

    sf = "/root/testdata/sf0.001"
    out = q_stream_sliding_volume(spark, sf)
    agg = out.agg({"n_bars": "sum", "volume": "sum"}).collect()[0]
    src = bars(spark, sf).agg(
        {"volume": "sum"}
    ).collect()[0]
    n_src = bars(spark, sf).count()
    assert agg["sum(n_bars)"] == 3 * n_src
    assert agg["sum(volume)"] == 3 * src["sum(volume)"]
