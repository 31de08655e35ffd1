"""Provider HTTP client protocol (S6): rate limit + retry + pagination with
an injectable transport.

Re-expresses the reference's vendor-agnostic client stack —
``BaseApiClient`` (reference: src/marketpipe/ingestion/infrastructure/
base_api_client.py:16-177), the token-bucket ``RateLimiter``
(rate_limit.py:17-140), the auth strategies (auth.py) and the per-vendor
clients (alpaca_client.py:19-260, polygon_adapter.py, finnhub_adapter.py) —
as a synchronous, dependency-injected protocol:

- ``HttpTransport`` is a two-method protocol; production code can hand in a
  urllib/requests/httpx wrapper, tests hand in :class:`FakeTransport`. The
  reference tests the same way (tests/fakes/adapters.py).
- The clock and sleep functions are injectable so rate-limit and backoff
  behavior is testable without wall-clock waits.
- Fetch is driver-side by design (SURVEY §7.4): the cluster parallelizes
  the transform/write legs via ``normalize_provider_rows``, not the API
  calls themselves. For many-symbol backfills, ``fetch_many`` fans the
  symbol list out with a shared rate limiter.
"""

from __future__ import annotations

import json as _json
import logging
import random
import time
from collections.abc import Callable, Iterable, Iterator, Mapping
from dataclasses import dataclass, field
from typing import Any, Protocol

from ..security import safe_for_log

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# config + auth (reference: models.ClientConfig, auth.AuthStrategy)

@dataclass(frozen=True)
class ClientConfig:
    """Vendor-agnostic client settings (reference models.py ClientConfig)."""

    api_key: str = ""
    base_url: str = ""
    timeout: float = 30.0
    max_retries: int = 3
    backoff_base: float = 0.5
    backoff_cap: float = 30.0
    user_agent: str = "marketpipe-spark/1.0"
    rate_capacity: int = 10
    rate_per_sec: float = 3.0


class AuthStrategy(Protocol):
    def apply(self, headers: dict[str, str], params: dict[str, str]) -> None: ...


class NoAuth:
    def apply(self, headers: dict[str, str], params: dict[str, str]) -> None:
        return None


@dataclass(frozen=True)
class HeaderTokenAuth:
    """Token in a header (Alpaca: APCA-API-KEY-ID/SECRET pair collapses to
    one bearer-style header here; reference auth.py HeaderTokenAuth)."""

    token: str
    header: str = "Authorization"
    prefix: str = "Bearer "

    def apply(self, headers: dict[str, str], params: dict[str, str]) -> None:
        headers[self.header] = f"{self.prefix}{self.token}"


@dataclass(frozen=True)
class QueryParamAuth:
    """Token as a query parameter (Polygon ``apiKey=``, Finnhub ``token=``)."""

    token: str
    param: str = "apiKey"

    def apply(self, headers: dict[str, str], params: dict[str, str]) -> None:
        params[self.param] = self.token


# ---------------------------------------------------------------------------
# token-bucket rate limiter (reference rate_limit.py:17-140)

class TokenBucketRateLimiter:
    """Token bucket: bursts up to ``capacity``, refills ``rate_per_sec``.
    ``notify_retry_after`` parks the bucket until the server-instructed time
    (the reference's Retry-After handling, rate_limit.py:55-85).

    ``clock``/``sleeper`` are injectable for deterministic tests.
    """

    def __init__(
        self,
        capacity: int,
        rate_per_sec: float,
        clock: Callable[[], float] = time.monotonic,
        sleeper: Callable[[float], None] = time.sleep,
    ):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        if rate_per_sec <= 0:
            raise ValueError("rate_per_sec must be positive")
        self.capacity = capacity
        self.rate = rate_per_sec
        self._clock = clock
        self._sleep = sleeper
        self._tokens = float(capacity)
        self._last = clock()
        self._retry_after_until: float | None = None
        self.n_waits = 0  # observable for tests/metrics

    def _refill(self) -> None:
        now = self._clock()
        self._tokens = min(self.capacity, self._tokens + (now - self._last) * self.rate)
        self._last = now

    def acquire(self, tokens: int = 1) -> None:
        if tokens > self.capacity:
            raise ValueError(f"cannot acquire {tokens} tokens, capacity {self.capacity}")
        while True:
            now = self._clock()
            if self._retry_after_until is not None and now < self._retry_after_until:
                self.n_waits += 1
                self._sleep(self._retry_after_until - now)
                continue
            self._retry_after_until = None
            self._refill()
            if self._tokens >= tokens:
                self._tokens -= tokens
                return
            self.n_waits += 1
            self._sleep((tokens - self._tokens) / self.rate)

    def notify_retry_after(self, seconds: float) -> None:
        self._retry_after_until = self._clock() + seconds


# ---------------------------------------------------------------------------
# transport protocol + fakes (reference http_client_protocol.py; test style
# mirrors tests/fakes/adapters.py)

@dataclass(frozen=True)
class HttpResponse:
    status_code: int
    body: str
    headers: Mapping[str, str] = field(default_factory=dict)

    def json(self) -> dict[str, Any]:
        return _json.loads(self.body)


class HttpTransport(Protocol):
    def get(
        self, url: str, params: Mapping[str, str], headers: Mapping[str, str], timeout: float
    ) -> HttpResponse: ...


class UrllibTransport:
    """Stdlib production transport. Constructed lazily and never exercised in
    this sandbox (no network); everything above it is tested through
    :class:`FakeTransport`."""

    def get(self, url, params, headers, timeout):
        import urllib.parse
        import urllib.request

        qs = urllib.parse.urlencode(dict(params))
        req = urllib.request.Request(f"{url}?{qs}" if qs else url, headers=dict(headers))
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
                return HttpResponse(resp.status, resp.read().decode(), dict(resp.headers))
        except Exception as e:  # urllib raises on 4xx/5xx; normalize
            status = getattr(e, "code", 599)
            body = ""
            try:
                body = e.read().decode()  # type: ignore[attr-defined]
            except Exception:
                pass
            return HttpResponse(status, body, dict(getattr(e, "headers", {}) or {}))


class FakeTransport:
    """Scripted transport: a list of (status, body_dict, headers) served in
    order, then the last one repeats. Records every request for assertions."""

    def __init__(self, script: Iterable[tuple[int, dict, dict[str, str]]]):
        self.script = list(script)
        if not self.script:
            raise ValueError("FakeTransport needs at least one scripted response")
        self.requests: list[dict[str, Any]] = []

    def get(self, url, params, headers, timeout):
        i = min(len(self.requests), len(self.script) - 1)
        self.requests.append(
            {"url": url, "params": dict(params), "headers": dict(headers), "timeout": timeout}
        )
        status, body, hdrs = self.script[i]
        return HttpResponse(status, _json.dumps(body), hdrs)


# ---------------------------------------------------------------------------
# base client (reference base_api_client.py:16-177)

class ProviderHttpError(RuntimeError):
    """Non-retryable HTTP failure (4xx other than 429)."""


class RetryLimitExceeded(ProviderHttpError):
    """Retryable failures persisted past ``max_retries``."""


class ProviderClient:
    """Vendor-agnostic sync client: rate limit → request → retry/backoff →
    paginate → parse. Subclasses define the four vendor hooks exactly as the
    reference's abstract methods do (base_api_client.py:60-164)."""

    name = "base"
    path = "/"

    def __init__(
        self,
        config: ClientConfig,
        auth: AuthStrategy | None = None,
        transport: HttpTransport | None = None,
        rate_limiter: TokenBucketRateLimiter | None = None,
        sleeper: Callable[[float], None] = time.sleep,
        rng: Callable[[], float] = random.random,
    ):
        self.config = config
        self.auth = auth or NoAuth()
        self.transport = transport or UrllibTransport()
        self.rate_limiter = rate_limiter or TokenBucketRateLimiter(
            config.rate_capacity, config.rate_per_sec
        )
        self._sleep = sleeper
        self._rng = rng

    # ---- vendor hooks -----------------------------------------------------
    def build_request_params(
        self, symbol: str, start_ns: int, end_ns: int, cursor: str | None
    ) -> dict[str, str]:
        raise NotImplementedError

    def next_cursor(self, raw: dict[str, Any]) -> str | None:
        raise NotImplementedError

    def parse_response(self, raw: dict[str, Any]) -> list[dict[str, Any]]:
        raise NotImplementedError

    def should_retry(self, status_code: int, body: dict[str, Any]) -> bool:
        # default: retry on 429 + 5xx (reference clients share this shape)
        return status_code == 429 or status_code >= 500

    # ---- core -------------------------------------------------------------
    def _backoff(self, attempt: int) -> float:
        """Exponential backoff with full jitter (reference _backoff)."""
        return min(self.config.backoff_cap, self.config.backoff_base * (2**attempt)) * (
            0.5 + 0.5 * self._rng()
        )

    def _request(self, params: Mapping[str, str]) -> dict[str, Any]:
        self.rate_limiter.acquire()
        url = f"{self.config.base_url}{self.path}"
        headers = {"Accept": "application/json", "User-Agent": self.config.user_agent}
        p = dict(params)
        self.auth.apply(headers, p)
        attempt = 0
        ra_honors = 0
        while True:
            r = self.transport.get(url, p, headers, self.config.timeout)
            try:
                body = r.json() if r.body else {}
            except ValueError:
                body = {}
            if r.status_code < 400 and not self.should_retry(r.status_code, body):
                return body
            if not self.should_retry(r.status_code, body):
                raise ProviderHttpError(safe_for_log(
                    f"{self.name}: non-retryable HTTP {r.status_code}: {r.body[:200]}",
                    self.config.api_key,
                ))
            # Retry-After on 429 parks the shared bucket (alpaca_client.py:124-133).
            # Honored WITHOUT consuming a retry attempt only max_retries times:
            # a server that answers 429+Retry-After forever must not trap a
            # sync driver-side client in an unbounded sleep loop — past the
            # cap, 429s consume regular attempts and hit RetryLimitExceeded.
            if r.status_code == 429:
                ra = r.headers.get("Retry-After")
                if ra is not None:
                    try:
                        wait = float(ra)
                    except ValueError:
                        log.warning("%s: invalid Retry-After %r", self.name, ra)
                    else:
                        ra_honors += 1
                        if ra_honors <= self.config.max_retries:
                            self.rate_limiter.notify_retry_after(wait)
                            self.rate_limiter.acquire()
                            continue  # does not consume a retry attempt
            attempt += 1
            if attempt > self.config.max_retries:
                raise RetryLimitExceeded(safe_for_log(
                    f"{self.name}: exceeded {self.config.max_retries} retries "
                    f"(last HTTP {r.status_code}): {r.body[:200]}",
                    self.config.api_key,
                ))
            self._sleep(self._backoff(attempt - 1))

    def paginate(self, symbol: str, start_ns: int, end_ns: int) -> Iterator[dict[str, Any]]:
        cursor: str | None = None
        while True:
            raw = self._request(self.build_request_params(symbol, start_ns, end_ns, cursor))
            yield raw
            cursor = self.next_cursor(raw)
            if not cursor:
                break

    def fetch_batch(self, symbol: str, start_ns: int, end_ns: int) -> list[dict[str, Any]]:
        rows: list[dict[str, Any]] = []
        for page in self.paginate(symbol, start_ns, end_ns):
            rows.extend(self.parse_response(page))
        return rows

    def fetch_many(self, symbols: list[str], start_ns: int, end_ns: int) -> dict[str, list[dict]]:
        """Sequential multi-symbol fetch through the shared rate limiter.
        (The reference's async gather achieves concurrency; with one bucket
        the throughput ceiling is the rate limit either way.)"""
        return {s: self.fetch_batch(s, start_ns, end_ns) for s in symbols}

    def fetch_bars_df(self, spark, symbol: str, start_ns: int, end_ns: int):
        """e2e: fetch + anti-corruption translation to canonical bars."""
        from .providers import normalize_provider_rows

        rows = self.fetch_batch(symbol, start_ns, end_ns)
        return normalize_provider_rows(spark, self.name, rows, symbol)


# ---------------------------------------------------------------------------
# vendor clients

class AlpacaClient(ProviderClient):
    """Alpaca Data v2 bars (reference alpaca_client.py:19-260): page_token
    cursor, bars keyed by symbol, RFC3339 ``t``."""

    name = "alpaca"
    path = "/v2/stocks/bars"

    def build_request_params(self, symbol, start_ns, end_ns, cursor):
        iso = lambda ns: time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(ns // 1_000_000_000))  # noqa: E731
        qp = {
            "symbols": symbol,
            "timeframe": "1Min",
            "start": iso(start_ns),
            "end": iso(end_ns),
            "limit": "10000",
            "feed": "iex",
        }
        if cursor:
            qp["page_token"] = cursor
        return qp

    def next_cursor(self, raw):
        return raw.get("next_page_token")

    def parse_response(self, raw):
        bars = raw.get("bars", {})
        if isinstance(bars, dict):  # v2: {"bars": {"AAPL": [...]}}
            out = []
            for sym_bars in bars.values():
                out.extend(sym_bars)
            return out
        return list(bars)  # legacy list form (alpaca_client.py:232-244)


class PolygonClient(ProviderClient):
    """Polygon aggregates (reference polygon_adapter.py): ``results`` rows
    with ms-epoch ``t``, ``next_url`` cursor."""

    name = "polygon"
    path = "/v2/aggs"

    def build_request_params(self, symbol, start_ns, end_ns, cursor):
        qp = {
            "symbol": symbol,
            "from": str(start_ns // 1_000_000),
            "to": str(end_ns // 1_000_000),
            "limit": "50000",
        }
        if cursor:
            qp["cursor"] = cursor
        return qp

    def next_cursor(self, raw):
        nxt = raw.get("next_url")
        if not nxt:
            return None
        # polygon embeds the cursor in next_url's query string
        return nxt.rsplit("cursor=", 1)[-1] if "cursor=" in nxt else nxt

    def parse_response(self, raw):
        return list(raw.get("results", []))


class FinnhubClient(ProviderClient):
    """Finnhub candles (reference finnhub_adapter.py): column-oriented
    arrays keyed o/h/l/c/t/v with a status field; no pagination."""

    name = "finnhub"
    path = "/api/v1/stock/candle"

    def build_request_params(self, symbol, start_ns, end_ns, cursor):
        return {
            "symbol": symbol,
            "resolution": "1",
            "from": str(start_ns // 1_000_000_000),
            "to": str(end_ns // 1_000_000_000),
        }

    def next_cursor(self, raw):
        return None

    def parse_response(self, raw):
        if raw.get("s") != "ok":
            return []
        keys = ("t", "o", "h", "l", "c", "v")
        cols = [raw.get(k, []) for k in keys]
        return [dict(zip(keys, vals)) for vals in zip(*cols)]


class IexClient(ProviderClient):
    """IEX Cloud intraday-prices (reference iex_adapter.py:109-200): row per
    minute with separate ``date`` + ``minute`` fields, combined here into an
    ISO ``ts`` for the shared translation layer; no pagination."""

    name = "iex"
    path = "/stock/intraday-prices"

    _DAY_NS = 86_400 * 1_000_000_000

    def build_request_params(self, symbol, start_ns, end_ns, cursor):
        day = time.strftime("%Y-%m-%d", time.gmtime(start_ns // 1_000_000_000))
        return {"symbol": symbol, "chartByDay": "true", "exactDate": day}

    def fetch_batch(self, symbol, start_ns, end_ns):
        """One request per UTC day in [start_ns, end_ns] — the API takes a
        single ``exactDate``, so a multi-day range must chunk day-by-day
        (the reference iex_adapter iterates chart dates the same way);
        deriving only the first day would silently drop the rest."""
        rows: list[dict[str, Any]] = []
        d = start_ns - (start_ns % self._DAY_NS)
        # A day is fetched only if the range genuinely overlaps it: an end
        # bound landing exactly on the next midnight does not pull in that
        # day (zero-width overlap).
        while d < end_ns or d == start_ns:
            raw = self._request(
                self.build_request_params(symbol, max(d, start_ns), min(d + self._DAY_NS - 1, end_ns), None)
            )
            rows.extend(self.parse_response(raw))
            d += self._DAY_NS
        return rows

    def next_cursor(self, raw):
        return None

    def parse_response(self, raw):
        rows = raw if isinstance(raw, list) else raw.get("data", [])
        out = []
        for r in rows:
            if "date" not in r or "minute" not in r:
                continue
            out.append({**r, "ts": f"{r['date']}T{r['minute']}:00Z"})
        return out


CLIENT_REGISTRY: dict[str, type[ProviderClient]] = {
    c.name: c for c in (AlpacaClient, PolygonClient, FinnhubClient, IexClient)
}
