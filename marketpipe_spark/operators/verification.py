"""Post-ingest verification: did the lake actually receive the requested
date range per symbol?

Re-expresses the reference's ``IngestionVerificationService`` (reference:
src/marketpipe/ingestion/infrastructure/verification.py:43-265) Spark-first:
the reference loops symbols and runs one bounds query each; here ONE
aggregation over the partition-pruned lake scan produces every symbol's
(first day, last day, bar count) simultaneously, and a join against the
requested symbol list surfaces symbols with no data at all. Per-symbol
pass/fail applies the reference's boundary rule: actual coverage must reach
the requested start/end within ``tolerance_days`` (verification.py:218-243).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class VerificationResult:
    symbol: str
    requested_start: dt.date
    requested_end: dt.date
    actual_start: dt.date | None
    actual_end: dt.date | None
    total_bars: int
    passed: bool
    error_message: str | None = None


@dataclass(frozen=True)
class VerificationSummary:
    results: list[VerificationResult] = field(default_factory=list)

    @property
    def all_passed(self) -> bool:
        return all(r.passed for r in self.results)

    @property
    def failed_symbols(self) -> list[str]:
        return [r.symbol for r in self.results if not r.passed]

    @property
    def total_bars(self) -> int:
        return sum(r.total_bars for r in self.results)


class VerificationError(Exception):
    def __init__(self, message: str, summary: VerificationSummary):
        super().__init__(message)
        self.summary = summary


def verify_ingestion(
    spark: SparkSession,
    root: str,
    symbols: list[str],
    requested_start: dt.date,
    requested_end: dt.date,
    frame: str = "1m",
    tolerance_days: int = 1,
    raise_on_failure: bool = False,
) -> VerificationSummary:
    """One partition-pruned scan → per-symbol (min day, max day, n bars) →
    boundary check. The result set is |symbols|-sized, so the driver
    collect is control-plane-bounded regardless of lake size."""
    from ..lake import read_bars

    symbols = [s.upper() for s in symbols]
    start_ns = int(
        dt.datetime.combine(requested_start, dt.time.min, dt.timezone.utc).timestamp() * 1e9
    )
    end_ns = int(
        dt.datetime.combine(
            requested_end + dt.timedelta(days=1), dt.time.min, dt.timezone.utc
        ).timestamp() * 1e9
    ) - 1
    # Distinguish "lake is empty/missing" (a data-absence verdict) from real
    # infrastructure failures (corrupt parquet, schema drift, permissions):
    # only the missing-path AnalysisException maps to "No data found"; any
    # other error is surfaced per symbol so it isn't misdiagnosed as absence
    # (the reference verification service reports the query error text,
    # reference: cli/ohlcv_validate.py verify path).
    from pyspark.errors import AnalysisException

    read_error: str | None = None
    try:
        lake = read_bars(spark, root, frame=frame, symbols=symbols,
                         start_ns=start_ns, end_ns=end_ns)
        bounds = {
            r["symbol"]: r
            for r in lake.groupBy("symbol")
            .agg(
                F.min("date").alias("first_day"),
                F.max("date").alias("last_day"),
                F.count(F.lit(1)).alias("n_bars"),
            )
            .collect()
        }
    except AnalysisException as e:
        cls = None
        for attr in ("getCondition", "getErrorClass"):  # 4.x name, then 3.x
            fn = getattr(e, attr, None)
            if fn is not None:
                try:
                    cls = fn()
                except Exception:
                    cls = None
                if cls:
                    break
        if "PATH_NOT_FOUND" in (cls or str(e)):
            bounds = {}  # empty/missing lake root → every symbol fails as absent
        else:
            # Any OTHER analysis failure (schema drift, unresolved column)
            # is an infrastructure error, not data absence — surface it.
            bounds = {}
            read_error = f"{type(e).__name__}: {e}"
    except Exception as e:  # infrastructure failure → surface, don't swallow
        bounds = {}
        read_error = f"{type(e).__name__}: {e}"

    tol = dt.timedelta(days=tolerance_days)
    results = []
    for s in symbols:
        r = bounds.get(s)
        if r is None or r["n_bars"] == 0:
            results.append(
                VerificationResult(s, requested_start, requested_end, None, None, 0,
                                   passed=False,
                                   error_message=read_error or f"No data found for {s}")
            )
            continue
        first, last = r["first_day"], r["last_day"]
        ok = first <= requested_start + tol and last >= requested_end - tol
        msg = None
        if not ok:
            msg = (
                f"coverage [{first}, {last}] does not reach requested "
                f"[{requested_start}, {requested_end}] within {tolerance_days}d tolerance"
            )
        results.append(
            VerificationResult(s, requested_start, requested_end, first, last,
                               r["n_bars"], passed=ok, error_message=msg)
        )
    summary = VerificationSummary(results)
    if raise_on_failure and not summary.all_passed:
        raise VerificationError(
            f"verification failed for {', '.join(summary.failed_symbols)}", summary
        )
    return summary


def render_summary(summary: VerificationSummary) -> str:
    """Human-readable table (reference print_verification_summary,
    verification.py:244-265)."""
    lines = [f"{'symbol':<10} {'bars':>8}  {'first':<12} {'last':<12} status"]
    for r in summary.results:
        lines.append(
            f"{r.symbol:<10} {r.total_bars:>8}  {str(r.actual_start or '-'):<12} "
            f"{str(r.actual_end or '-'):<12} "
            + ("PASS" if r.passed else f"FAIL ({r.error_message})")
        )
    lines.append(
        f"TOTAL: {summary.total_bars} bars, "
        + ("all symbols verified" if summary.all_passed
           else f"FAILED: {', '.join(summary.failed_symbols)}")
    )
    return "\n".join(lines)
