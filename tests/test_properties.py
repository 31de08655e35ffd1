"""Property-based checks (hypothesis): operators vs pure-Python models on
randomized inputs. Few examples, small data — each example runs Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from marketpipe_spark.operators.asof import asof_join
from marketpipe_spark.operators.resample import resample_intraday

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

ts_strategy = st.integers(min_value=0, max_value=40)
val_strategy = st.integers(min_value=1, max_value=9)

trades_st = st.dictionaries(
    st.tuples(st.sampled_from(["A", "B"]), ts_strategy), val_strategy, min_size=1, max_size=12
)
quotes_st = st.dictionaries(
    st.tuples(st.sampled_from(["A", "B"]), ts_strategy), val_strategy, max_size=12
)


@_settings
@given(trades=trades_st, quotes=quotes_st)
def test_asof_matches_python_model(spark, trades, quotes):
    tdf = spark.createDataFrame(
        [(s, t, float(v)) for (s, t), v in trades.items()],
        "symbol string, ts_ns long, trade_value double",
    )
    qdf = spark.createDataFrame(
        [(s, t, float(v)) for (s, t), v in quotes.items()] or [("Z", 0, 0.0)],
        "symbol string, ts_ns long, quote_value double",
    )
    got = {
        (r.symbol, r.ts_ns): r.quote_value_right
        for r in asof_join(tdf, qdf).collect()
    }
    for (s, t), _v in trades.items():
        eligible = [(qt, qv) for (qs, qt), qv in quotes.items() if qs == s and qt <= t]
        want = float(max(eligible)[1]) if eligible else None
        assert got[(s, t)] == want, f"asof mismatch at {(s, t)}"


bars_st = st.dictionaries(
    st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 120)),
    st.tuples(val_strategy, st.integers(0, 500)),
    min_size=1,
    max_size=20,
)


@_settings
@given(bars=bars_st)
def test_resample_conservation(spark, bars):
    """Volume conserves, high/low bound every member, bucket count ≤ rows."""
    ns_min = 60_000_000_000
    rows = [
        (s, m * ns_min, float(p), float(p) + 1, float(p) - 1, float(p) + 0.5, vol)
        for (s, m), (p, vol) in bars.items()
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts_ns long, open double, high double, low double, close double, volume long"
    )
    out = resample_intraday(df, 300).collect()
    assert sum(r.volume for r in out) == sum(v for _, (_, v) in bars.items())
    assert len(out) <= len(rows)
    for r in out:
        members = [
            p for (s, m), (p, _v) in bars.items()
            if s == r.symbol and (m * ns_min) // (300 * 10**9) * 300 * 10**9 == r.ts_ns
        ]
        assert r.high == max(p + 1 for p in members)
        assert r.low == min(p - 1 for p in members)
        assert r.high >= r.open >= r.low and r.high >= r.close >= r.low
