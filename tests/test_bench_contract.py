"""The bench's stdout line must survive the driver's bounded tail capture.

BENCH_r10.json preserved exactly 2000 chars of stdout tail while the r10
line was 2716 chars: the line's FRONT (metric/value/headline queries) was
cut, the driver's parse came back null, and PERF_r10's round-over-round
comparison zeroed out (``n_common: 0``). The r11 fix moves per-extra
timings to a sidecar and keeps the line headline-only — this test pins
that decision against anyone re-inlining the extras.
"""

from __future__ import annotations

import importlib.util
import json
import os

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_line_fits_tail_capture():
    bench = _load_bench()
    # Worst-case realistic widths: every timing 3 decimals & >= 10 s
    # (xx.xxx -> 6 chars), sf/master/parallelism at their longest.
    line = json.dumps(
        {
            "metric": "headline_queries_total_time",
            "value": 99999.999,
            "unit": "sec",
            "queries": {name: 99.999 for name in bench.HEADLINE},
            "cached_total": 99999.999,
            "extra_total": 99999.999,
            "sf": 0.001,
            "parallelism": 128,
            "master": "local[128]",
            "detail": "BENCH_DETAIL_c128.json",
            "oracle_total": 99999.999,
        },
        separators=(",", ":"),
    )
    # 2000 is the measured driver cap; keep real headroom for a trailing
    # newline and any stray characters the capture window includes.
    assert len(line) < 1500, len(line)


def test_bench_headline_basket_unchanged():
    """The timed basket is the round-over-round comparison surface: entries
    may be ADDED, never removed or renamed (driver contract)."""
    bench = _load_bench()
    assert bench.HEADLINE[:20] == [
        "pricing_summary",
        "resample_5m",
        "resample_1d",
        "vwap",
        "daily_summary",
        "availability_summary",
        "top_customers",
        "regional_revenue",
        "snapshot_diff",
        "latest_event_per_user",
        "sma_20",
        "volatility_20",
        "gap_days",
        "exact_dedup",
        "quality_score",
        "lang_id_scores",
        "validation_report",
        "token_count",
        "fingerprint",
        "embedding_near_dup",
    ]
    assert len(bench.EXTRA) >= 80
