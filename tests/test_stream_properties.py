"""Property-based micro-batch tests for the Structured Streaming entries.

The registry's streaming entries are oracle-verified over the driver's
parquet drained in ONE micro-batch (file source, no read limit). These
properties exercise the part that single-batch draining can't: the
MICRO-BATCH WATERMARK PROTOCOL. Hypothesis generates random event streams
(duplicates, late arrivals, exact-boundary gaps) and random CHUNK SPLITS;
each chunk becomes one file processed as its own micro-batch
(maxFilesPerTrigger=1, mtime-ordered), and the streamed result must equal
a pure-Python simulator of Spark's documented watermark bookkeeping:

- TWO-PHASE watermark (SPARK-24634, probed per-batch via
  numRowsDroppedByWatermark): the EVICTION/emission watermark for batch N
  is max event time over batches < N (ms truncation) minus the delay; the
  LATE-DATA filter watermark lags one further batch (it is batch N-1's
  eviction watermark). Max event time advances on every row, late ones
  included.
- session_window (append): late drop iff window END <= late watermark
  (probed: end == late_us drops, end > late_us keeps even when the event
  time is far below the eviction watermark); sessions merge on gap
  overlap; emit (and evict) iff session end <= eviction watermark — the
  `<=` boundary is pinned by
  tests/test_streaming.py::test_session_emission_boundary_rule.
- dropDuplicatesWithinWatermark: late drop iff event time <= late
  watermark; first arrival per key emits; key state expires once the
  eviction watermark passes its event time + delay. A key that expires
  and re-arrives emits AGAIN — bounded dedup, not global DISTINCT.
- stream-stream inner join: late drop per input row vs the late
  watermark; each batch joins its new rows against the other side's
  retained state plus the same batch; state the range condition proves
  dead is evicted with the eviction watermark (click older than wm -
  window; purchase older than wm).

These models are an independent reimplementation of the semantics — the
same method that caught two real contract bugs in the graph sweep (r5).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from marketpipe_spark.plans.queries_stream import (
    GAP_MIN,
    WM_MIN,
    _ATTR_WINDOW_NS,
    attribution_pipeline,
    dedup_minute_pipeline,
    sessions_pipeline,
)
from marketpipe_spark.streaming.stream import run_to_memory

US = 1_000_000  # µs per second
T0_NS = 1_700_000_000_000_000_000
DELAY_US = WM_MIN * 60 * US
GAP_US = GAP_MIN * 60 * US

_settings = settings(
    # 8 examples by default (each runs 1-3 real streaming queries); set
    # MP_HYP_EXAMPLES for a deeper one-off sweep.
    max_examples=int(os.environ.get("MP_HYP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_sink_counter = [0]


def _sink_name(prefix: str) -> str:
    _sink_counter[0] += 1
    return f"{prefix}_{_sink_counter[0]}"


# offsets in seconds, scaled so gap/watermark boundaries (30 min / 10 min)
# are actually hit: multiples of 300 s land exactly on fractions of both
offset_st = st.integers(min_value=0, max_value=40).map(lambda k: k * 300)
user_st = st.integers(min_value=1, max_value=3)


def _write_chunks(tmpdir: str, rows: list[dict], cuts: list[int]) -> str:
    """Write ``rows`` split at ``cuts`` as one parquet FILE per chunk with
    strictly increasing mtimes (the file source processes oldest-first), so
    the chunk split IS the micro-batch split under maxFilesPerTrigger=1."""
    os.makedirs(tmpdir, exist_ok=True)
    bounds = [0, *sorted(set(cuts)), len(rows)]
    chunks = [rows[a:b] for a, b in zip(bounds, bounds[1:]) if rows[a:b]]
    if not chunks:
        chunks = [rows]
    t = 1_000_000_000
    for i, chunk in enumerate(chunks):
        path = os.path.join(tmpdir, f"chunk_{i:03d}.parquet")
        pd.DataFrame(chunk).to_parquet(path, index=False)
        os.utime(path, (t + i * 10, t + i * 10))
    return os.path.join(tmpdir, "*.parquet")


def _stream(spark, glob: str, ddl: str):
    return (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", "1")
        .parquet(glob)
    )


class _TwoPhaseWatermark:
    """Spark's TWO-PHASE micro-batch watermark (SPARK-24634, pinned
    empirically with per-batch numRowsDroppedByWatermark probes):

    - ``evict_us`` (eviction/emission watermark) for batch N = max event
      time over batches < N, truncated to ms, minus the delay in ms;
    - ``late_us`` (late-data filter watermark) for batch N = the EVICTION
      watermark of batch N-1, i.e. it lags one further batch.

    Max event time is tracked over all rows that reach the watermark node
    (late ones included). Call :meth:`next_batch` before processing a
    batch's rows and :meth:`observe` after."""

    def __init__(self, delay_us: int):
        self.delay_us = delay_us
        self.max_us: int | None = None
        self.late_us: int | None = None
        self.evict_us: int | None = None

    def next_batch(self) -> None:
        self.late_us = self.evict_us
        if self.max_us is not None:
            self.evict_us = (self.max_us // 1000 - self.delay_us // 1000) * 1000

    def observe(self, ts_us_list) -> None:
        for t in ts_us_list:
            if self.max_us is None or t > self.max_us:
                self.max_us = t


def _sessions_model(batches: list[list[tuple[int, int, int]]]):
    """Pure-Python micro-batch session_window(APPEND). ``batches`` hold
    (user, ts_us, volume) rows. Returns the emitted sessions.

    Protocol detail: the watermark for batch N is fixed BEFORE the batch
    runs (from data seen through batch N-1), so batch N's own rows filter,
    emit, and evict against that lagged value; the trailing [] batch is
    AvailableNow's no-data microbatch that flushes state closed by the
    final advance."""
    wm = _TwoPhaseWatermark(DELAY_US)
    state: dict[int, list[list[int]]] = {}  # user -> [start, last, n, vol]
    emitted = []
    for batch in [*batches, []]:
        wm.next_batch()
        # Lateness for session aggregation is on the row's WINDOW END vs the
        # LATE watermark, inclusive: end <= late_us drops (probed: end ==
        # late_us dropped; end > late_us kept even with event time far
        # below the eviction watermark).
        live = [
            (u, t, v)
            for (u, t, v) in batch
            if wm.late_us is None or t + GAP_US > wm.late_us
        ]
        for u, t, v in live:
            sessions = state.setdefault(u, [])
            merged = [t, t, 1, v]
            keep = []
            for s in sessions:
                # merge on overlap OR touch: session_window extends a
                # session whose end equals the new event's time (strict-gap
                # boundary, probed batch + streaming)
                if merged[0] <= s[1] + GAP_US and s[0] <= merged[1] + GAP_US:
                    merged = [
                        min(merged[0], s[0]), max(merged[1], s[1]),
                        merged[2] + s[2], merged[3] + s[3],
                    ]
                else:
                    keep.append(s)
            keep.append(merged)
            state[u] = keep
        if wm.evict_us is not None:
            for u in list(state):
                still = []
                for s in state[u]:
                    end_us = s[1] + GAP_US
                    if end_us <= wm.evict_us:
                        emitted.append((u, s[0] * 1000, end_us * 1000, s[2], s[3]))
                    else:
                        still.append(s)
                state[u] = still
        wm.observe([t for (_, t, _) in batch])
    return sorted(emitted)


@_settings
@given(
    rows=st.lists(st.tuples(user_st, offset_st, st.integers(1, 9)), min_size=1, max_size=24),
    cuts=st.lists(st.integers(0, 24), max_size=4),
)
def test_stream_sessions_microbatch_matches_model(spark, tmp_path_factory, rows, cuts):
    tmpdir = str(tmp_path_factory.mktemp("sess"))
    data = [
        {"user_id": u, "ts_ns": T0_NS + off * US * 1000, "volume": v, "symbol": "S"}
        for (u, off, v) in rows
    ]
    glob = _write_chunks(tmpdir, data, cuts)
    src = _stream(spark, glob, "user_id long, ts_ns long, volume long, symbol string")
    out = run_to_memory(sessions_pipeline(src), _sink_name("prop_sess"), "append")
    got = sorted(
        (r.user_id, r.session_start_ns, r.session_end_ns, r.n_events, r.volume)
        for r in out.collect()
    )
    bounds = [0, *sorted(set(cuts)), len(data)]
    batches = [
        [(d["user_id"], d["ts_ns"] // 1000, d["volume"]) for d in data[a:b]]
        for a, b in zip(bounds, bounds[1:])
        if data[a:b]
    ] or [[(d["user_id"], d["ts_ns"] // 1000, d["volume"]) for d in data]]
    assert got == _sessions_model(batches)


def _dedup_model(batches: list[list[tuple[str, int, int]]]):
    """Micro-batch dropDuplicatesWithinWatermark on (symbol, minute_ns).
    ``batches`` hold (symbol, minute_ns, ts_us). The output is a LIST: a
    key whose state expired and then re-arrives is emitted AGAIN (the
    within-watermark guarantee is bounded dedup, not global DISTINCT) —
    exactly the behavior the lagged-watermark protocol controls."""
    wm = _TwoPhaseWatermark(DELAY_US)
    state: dict[tuple, int] = {}  # key -> first-arrival event time (µs)
    emitted = []
    for batch in [*batches, []]:
        wm.next_batch()
        live = [
            (k1, k2, t)
            for (k1, k2, t) in batch
            if wm.late_us is None or t > wm.late_us
        ]
        for sym, minute, t in live:
            key = (sym, minute)
            if key not in state:
                state[key] = t
                emitted.append(key)
        if wm.evict_us is not None:
            state = {
                k: t for k, t in state.items() if t + DELAY_US >= wm.evict_us
            }
        wm.observe([t for (_, _, t) in batch])
    return sorted(emitted)


@_settings
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["A", "B"]), offset_st), min_size=1, max_size=24
    ),
    cuts=st.lists(st.integers(0, 24), max_size=4),
)
def test_stream_dedup_microbatch_matches_model(spark, tmp_path_factory, rows, cuts):
    NS_MIN = 60 * US * 1000
    tmpdir = str(tmp_path_factory.mktemp("dedup"))
    data = [
        {"symbol": s, "ts_ns": T0_NS + off * US * 1000} for (s, off) in rows
    ]
    glob = _write_chunks(tmpdir, data, cuts)
    src = _stream(spark, glob, "symbol string, ts_ns long")
    out = run_to_memory(dedup_minute_pipeline(src), _sink_name("prop_dedup"), "append")
    got = sorted((r.symbol, r.minute_ns) for r in out.collect())  # list: re-emissions count
    bounds = [0, *sorted(set(cuts)), len(data)]
    batches = [
        [
            (d["symbol"], d["ts_ns"] - d["ts_ns"] % NS_MIN, d["ts_ns"] // 1000)
            for d in data[a:b]
        ]
        for a, b in zip(bounds, bounds[1:])
        if data[a:b]
    ] or [[(d["symbol"], d["ts_ns"] - d["ts_ns"] % NS_MIN, d["ts_ns"] // 1000) for d in data]]
    assert got == _dedup_model(batches)


def _attr_model(batches: list[list[tuple[int, int, str, int]]]):
    """Micro-batch stream-stream inner join with per-side watermarks and the
    30-minute range condition. ``batches`` hold (event_id, user, type, ts_us).
    Both legs read the same files, so both sides share batch boundaries —
    but each leg has its OWN watermark node (the type filter sits before
    ``withWatermark``, so the click node sees only click timestamps and the
    purchase node only purchase timestamps), and the GLOBAL watermark is the
    MIN across nodes. A leg that has seen no rows keeps the global watermark
    unset. (Found by hypothesis: a shared-max model let one leg's far-future
    row evict the other leg's state and drop its late rows, where real Spark
    holds the global watermark at the slower leg.)"""
    win_us = _ATTR_WINDOW_NS // 1000
    wm = _TwoPhaseWatermark(DELAY_US)
    max_c: int | None = None  # per-leg watermark-node maxima
    max_p: int | None = None
    clicks: list[tuple[int, int, int]] = []  # (id, user, ts_us) retained state
    purchases: list[tuple[int, int, int]] = []
    out = []

    def match(c, p):
        return c[1] == p[1] and c[2] <= p[2] <= c[2] + win_us

    for batch in [*batches, []]:
        wm.next_batch()
        late = wm.late_us
        new_c = [(e, u, t) for (e, u, ty, t) in batch
                 if ty == "click" and (late is None or t > late)]
        new_p = [(e, u, t) for (e, u, ty, t) in batch
                 if ty == "purchase" and (late is None or t > late)]
        for c in new_c:
            for p in purchases + new_p:
                if match(c, p):
                    out.append((c[1], c[0], p[0], (p[2] - c[2]) * 1000))
        for p in new_p:
            for c in clicks:
                if match(c, p):
                    out.append((c[1], c[0], p[0], (p[2] - c[2]) * 1000))
        clicks += new_c
        purchases += new_p
        if wm.evict_us is not None:
            clicks = [c for c in clicks if c[2] + win_us >= wm.evict_us]
            purchases = [p for p in purchases if p[2] >= wm.evict_us]
        cts = [t for (_, _, ty, t) in batch if ty == "click"]
        pts = [t for (_, _, ty, t) in batch if ty == "purchase"]
        if cts:
            max_c = max(max_c, *cts) if max_c is not None else max(cts)
        if pts:
            max_p = max(max_p, *pts) if max_p is not None else max(pts)
        if max_c is not None and max_p is not None:
            # min over the two nodes' maxima is non-decreasing, so feeding
            # the running combined value into the two-phase tracker is exact.
            wm.observe([min(max_c, max_p)])
    return sorted(out)


@_settings
@given(
    rows=st.lists(
        st.tuples(user_st, offset_st, st.sampled_from(["click", "purchase"])),
        min_size=1,
        max_size=20,
    ),
    cuts=st.lists(st.integers(0, 20), max_size=3),
)
def test_stream_attribution_microbatch_matches_model(
    spark, tmp_path_factory, rows, cuts
):
    tmpdir = str(tmp_path_factory.mktemp("attr"))
    data = [
        {
            "event_id": i,
            "user_id": u,
            "event_type": ty,
            "ts_ns": T0_NS + off * US * 1000,
        }
        for i, (u, off, ty) in enumerate(rows)
    ]
    glob = _write_chunks(tmpdir, data, cuts)
    ddl = "event_id long, user_id long, event_type string, ts_ns long"

    def mk_leg():
        return _stream(spark, glob, ddl)

    out = run_to_memory(attribution_pipeline(mk_leg), _sink_name("prop_attr"), "append")
    got = sorted(
        (r.user_id, r.click_id, r.purchase_id, r.gap_ns) for r in out.collect()
    )
    bounds = [0, *sorted(set(cuts)), len(data)]
    batches = [
        [
            (d["event_id"], d["user_id"], d["event_type"], d["ts_ns"] // 1000)
            for d in data[a:b]
        ]
        for a, b in zip(bounds, bounds[1:])
        if data[a:b]
    ] or [
        [(d["event_id"], d["user_id"], d["event_type"], d["ts_ns"] // 1000) for d in data]
    ]
    assert got == _attr_model(batches)


# ---------------------------------------------------------------------------
# Complete-mode entries: over a bounded stream the final emission must be
# EXACTLY the batch aggregate, for EVERY chunk split — complete mode retains
# all state, so the watermark protocol must not be able to change the
# result. (stream_resample_5m and stream_top_users are the registry's two
# complete-mode entries; their pipelines are rebuilt here over the chunked
# source the same way the append-mode properties do.)


@_settings
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["A", "B"]), offset_st, st.integers(1, 9)),
        min_size=1,
        max_size=24,
    ),
    cuts=st.lists(st.integers(0, 24), max_size=4),
)
def test_stream_resample_complete_mode_split_invariant(
    spark, tmp_path_factory, rows, cuts
):
    from marketpipe_spark.streaming.stream import windowed_ohlcv

    tmpdir = str(tmp_path_factory.mktemp("res"))
    data = [
        {
            "symbol": s,
            "ts_ns": T0_NS + off * US * 1000,
            "open": float(v),
            "high": float(v + 1),
            "low": float(v - 1),
            "close": float(v),
            "volume": v,
        }
        for (s, off, v) in rows
    ]
    glob = _write_chunks(tmpdir, data, cuts)
    ddl = (
        "symbol string, ts_ns long, open double, high double, low double, "
        "close double, volume long"
    )
    agg = windowed_ohlcv(_stream(spark, glob, ddl), minutes=5, watermark=f"{WM_MIN} minutes")
    got = sorted(tuple(r) for r in run_to_memory(agg, _sink_name("prop_res"), "complete").collect())

    from marketpipe_spark.operators.resample import resample_intraday

    batch = spark.createDataFrame([tuple(d.values()) for d in data], ddl)
    want = sorted(tuple(r) for r in resample_intraday(batch, 300).collect())
    assert got == want
