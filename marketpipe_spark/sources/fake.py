"""Fake OHLCV provider — deterministic random-walk bars, generated
cluster-side.

Reference: src/marketpipe/ingestion/infrastructure/fake_adapter.py:72-179 —
symbol-seeded base price, gaussian steps, lognormal volume, OHLC-consistency
clamping. The reference builds Python objects row by row; here the walk is
expressed over ``spark.range`` with seeded column expressions so a
billion-bar synthetic lake generates in parallel with no driver loop.

Determinism: every random draw derives from xxhash64(symbol, i) — stable
across runs, partitionings, and cluster sizes (unlike ``F.randn`` whose
draw depends on task partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _unit_uniform(*cols) -> F.Column:
    """Deterministic U(0,1) from a hash of the inputs."""
    h = F.xxhash64(*cols)
    # map int64 → [0,1): shift to non-negative then scale
    return (h.cast("double") / F.lit(2.0**63)) / F.lit(2.0) + F.lit(0.5)


def fake_bars(
    spark: SparkSession,
    symbols: list[str],
    start_ns: int,
    n_bars: int,
    bar_seconds: int = 60,
    seed: int = 42,
) -> DataFrame:
    """Generate ``n_bars`` consecutive bars per symbol from ``start_ns``.

    Matches the reference's construction: base price 100 + (hash(symbol) %
    1000)/10 (fake_adapter.py:114-120), per-bar gaussian-ish step with
    σ = 2% of price, lognormal-ish volume, high/low clamped to preserve the
    OHLC invariant (fake_adapter.py:137-166).
    """
    sym_df = spark.createDataFrame([(s.upper(),) for s in symbols], "symbol string")
    base = (
        spark.range(n_bars)
        .withColumnRenamed("id", "i")
        .crossJoin(F.broadcast(sym_df))
    )
    step_ns = bar_seconds * 10**9

    u1 = _unit_uniform(F.col("symbol"), F.col("i"), F.lit(seed))
    u2 = _unit_uniform(F.col("symbol"), F.col("i"), F.lit(seed + 1))
    u3 = _unit_uniform(F.col("symbol"), F.col("i"), F.lit(seed + 2))
    u4 = _unit_uniform(F.col("symbol"), F.col("i"), F.lit(seed + 3))

    base_price = F.lit(100.0) + (F.pmod(F.xxhash64("symbol"), F.lit(1000)).cast("double") / 10.0)
    # Box-Muller from two deterministic uniforms.
    gauss = F.sqrt(-2.0 * F.log(u1 + F.lit(1e-12))) * F.cos(F.lit(2 * 3.141592653589793) * u2)

    df = base.select(
        "symbol",
        (F.lit(start_ns) + F.col("i") * F.lit(step_ns)).cast("long").alias("ts_ns"),
        base_price.alias("base_price"),
        gauss.alias("g"),
        u3.alias("u_spread"),
        u4.alias("u_vol"),
    )
    # Random-walk-ish price: base ± cumulative drift approximated by the
    # per-bar gaussian scaled like the reference's σ=2% step. (The reference
    # walks sequentially; an exact sequential walk is a window cumsum.)
    from pyspark.sql.window import Window as W

    cum = F.sum((F.col("g") * 0.02 * F.col("base_price"))).over(
        W.partitionBy("symbol").orderBy("ts_ns").rowsBetween(W.unboundedPreceding, 0)
    )
    open_ = F.greatest(F.col("base_price") + cum, F.lit(0.01))
    close = F.greatest(open_ + F.col("g") * 0.01 * F.col("base_price"), F.lit(0.01))
    spread = F.col("u_spread") * 0.01 * open_
    high = F.greatest(open_, close) + spread
    low = F.greatest(F.least(open_, close) - spread, F.lit(0.005))
    volume = (F.exp(F.lit(8.0) + F.lit(1.5) * F.col("g")) + F.lit(100.0)).cast("long")

    return df.select(
        "symbol",
        "ts_ns",
        F.round(open_, 4).alias("open"),
        F.round(high, 4).alias("high"),
        F.round(low, 4).alias("low"),
        F.round(close, 4).alias("close"),
        volume.alias("volume"),
    )


def fake_minute_bars_for_day(
    spark: SparkSession, symbols: list[str], day_start_ns: int, seed: int = 42
) -> DataFrame:
    """One regular trading session: 390 one-minute bars from 13:30 UTC
    (reference session times, domain/services.py:610-689)."""
    open_ns = day_start_ns + (13 * 3600 + 1800) * 10**9
    return fake_bars(spark, symbols, open_ns, 390, bar_seconds=60, seed=seed)
