"""YAML ingestion-job configuration (reference: src/marketpipe/config/
{ingestion,loader}.py and the CLI config/flag merge in
cli/ohlcv_ingest.py:420-520).

Reproduced semantics:
- ``load_config`` expands ``$ENV_VARS`` in the raw YAML, normalizes
  kebab-case keys to snake_case, enforces ``config_version`` (missing or
  too old → :class:`ConfigVersionError`; newer → best-effort warning), and
  rejects unknown keys (reference ``extra = "forbid"``).
- ``IngestionJobConfig`` validates symbols (1-10 chars of A-Z/0-9/dot,
  normalized upper), provider, timeframe, batch_size/workers bounds, and
  date ordering — as plain dataclass checks instead of pydantic (not a
  baked-in dependency here).
- ``merge_overrides`` layers non-None CLI flags over the file values,
  returning a new validated config (reference ingestion.py:156-171).
"""

from __future__ import annotations

import datetime as dt
import os
import re
from dataclasses import asdict, dataclass, field, replace
from typing import Any

import yaml

CURRENT_CONFIG_VERSION = "1"
MIN_SUPPORTED_VERSION = "1"

_SYMBOL_RE = re.compile(r"^[A-Z0-9.]{1,10}$")
TIMEFRAMES = ("1m", "5m", "15m", "30m", "1h", "4h", "1d")


class ConfigVersionError(ValueError):
    """config_version missing or incompatible (reference loader.py:58-78)."""


def _known_providers() -> set[str]:
    from .sources.httpclient import CLIENT_REGISTRY

    return set(CLIENT_REGISTRY) | {"fake", "iex"}


@dataclass(frozen=True)
class IngestionJobConfig:
    symbols: list[str]
    start: dt.date
    end: dt.date
    config_version: str = CURRENT_CONFIG_VERSION
    batch_size: int = 1000
    provider: str = "fake"
    feed_type: str = "iex"
    timeframe: str = "1m"
    output_path: str = "./data"
    workers: int = 4
    extra: dict[str, Any] = field(default_factory=dict, compare=False)  # never populated; placeholder for future versions

    def __post_init__(self):
        # symbols: normalize + validate (reference ingestion.py:52-75)
        if not self.symbols:
            raise ValueError("symbols list cannot be empty")
        norm = []
        for s in self.symbols:
            if not isinstance(s, str):
                raise ValueError(f"symbol must be a string, got {type(s).__name__}")
            s = s.strip().upper()
            if not _SYMBOL_RE.match(s):
                raise ValueError(
                    f"invalid symbol {s!r}: must be 1-10 characters of A-Z, 0-9, or '.'"
                )
            norm.append(s)
        object.__setattr__(self, "symbols", norm)
        # dates
        start, end = (_coerce_date(self.start, "start"), _coerce_date(self.end, "end"))
        object.__setattr__(self, "start", start)
        object.__setattr__(self, "end", end)
        if start > end:
            raise ValueError(f"start {start} is after end {end}")
        # bounded ints (reference Field ge/le)
        if not 1 <= self.batch_size <= 10_000:
            raise ValueError(f"batch_size {self.batch_size} outside [1, 10000]")
        if not 1 <= self.workers <= 32:
            raise ValueError(f"workers {self.workers} outside [1, 32]")
        if self.timeframe not in TIMEFRAMES:
            raise ValueError(f"timeframe {self.timeframe!r} not one of {TIMEFRAMES}")
        prov = self.provider.lower()
        object.__setattr__(self, "provider", prov)
        if prov not in _known_providers():
            raise ValueError(f"unknown provider {prov!r}; expected one of {sorted(_known_providers())}")

    def merge_overrides(self, **overrides: Any) -> IngestionJobConfig:
        """New config with every non-None override applied (reference
        ingestion.py:156-171); validation re-runs in the new instance."""
        kept = {k: v for k, v in overrides.items() if v is not None}
        bad = set(kept) - set(self.__dataclass_fields__)
        if bad:
            raise ValueError(f"unknown override fields: {sorted(bad)}")
        return replace(self, **kept)

    def to_dict(self) -> dict[str, Any]:
        d = asdict(self)
        d.pop("extra")
        d["start"], d["end"] = self.start.isoformat(), self.end.isoformat()
        return d

    @property
    def trading_days(self) -> list[dt.date]:
        """Weekdays in [start, end] — the per-day ingestion unit the
        reference's job builder partitions work by."""
        out, d = [], self.start
        while d <= self.end:
            if d.weekday() < 5:
                out.append(d)
            d += dt.timedelta(days=1)
        return out


def _coerce_date(v: Any, name: str) -> dt.date:
    if isinstance(v, dt.datetime):
        return v.date()
    if isinstance(v, dt.date):
        return v
    if isinstance(v, str):
        return dt.date.fromisoformat(v)
    raise ValueError(f"{name} must be a date or ISO date string, got {type(v).__name__}")


def _normalize_keys(data: dict[str, Any]) -> dict[str, Any]:
    """kebab-case → snake_case, one level (reference loader.py:90-101)."""
    return {k.replace("-", "_"): v for k, v in data.items()}


def load_config(path: str | os.PathLike) -> IngestionJobConfig:
    """Load + validate a YAML job config (reference loader.py:13-88)."""
    p = os.fspath(path)
    if not os.path.exists(p):
        raise FileNotFoundError(f"configuration file not found: {p}")
    with open(p) as f:
        raw = f.read()
    cfg = yaml.safe_load(os.path.expandvars(raw))
    if not isinstance(cfg, dict):
        raise ValueError("YAML file must contain a mapping at the root level")
    cfg = _normalize_keys(cfg)

    ver = str(cfg.get("config_version", "") or "")
    if not ver:
        raise ConfigVersionError('config_version missing. Add `config_version: "1"` to your YAML.')

    def _vernum(v: str) -> tuple[int, ...]:
        # Numeric ordering: lexicographic strings misorder once versions hit
        # two digits ('10' < '2'). Dotted forms compare as int tuples, with
        # trailing zero components stripped so '1.0' == '1' (YAML floats
        # arrive as '1.0' for the current version).
        try:
            parts = tuple(int(part) for part in v.split("."))
        except ValueError:
            raise ConfigVersionError(f"config_version {v!r} is not a numeric version") from None
        while len(parts) > 1 and parts[-1] == 0:
            parts = parts[:-1]
        return parts

    if _vernum(ver) < _vernum(MIN_SUPPORTED_VERSION):
        raise ConfigVersionError(
            f"config version {ver} is too old; minimum supported is {MIN_SUPPORTED_VERSION}"
        )
    if _vernum(ver) > _vernum(CURRENT_CONFIG_VERSION):
        import warnings

        warnings.warn(
            f"this build understands config_version {CURRENT_CONFIG_VERSION} but the file "
            f"says {ver}; attempting best-effort parse",
            UserWarning,
            stacklevel=2,
        )
        # best-effort: drop keys this version doesn't know
        cfg = {k: v for k, v in cfg.items() if k in IngestionJobConfig.__dataclass_fields__}

    unknown = set(cfg) - set(IngestionJobConfig.__dataclass_fields__)
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return IngestionJobConfig(**cfg)
