"""Prometheus-format metrics endpoint over the MetricsStore.

Re-expresses the reference's metrics server (reference:
src/marketpipe/metrics_server.py:34-240 — an HTTP server exposing
``/metrics`` in Prometheus text exposition format, plus request counting
and error handling) on the stdlib: ``prometheus_client`` is not a baked-in
dependency here, so the exposition format (text/plain; version=0.0.4) is
rendered directly from the parquet-backed :class:`~marketpipe_spark.
control.MetricsStore` rows.

Exported series per recorded metric name (sanitized to the Prometheus
grammar, labels ``provider``/``feed``):

- ``mp_<name>_last``  — most recent recorded value (gauge)
- ``mp_<name>_sum`` / ``mp_<name>_count`` — lifetime sum/count, the
  standard pair a Prometheus summary exposes

plus ``mp_scrapes_total`` (the reference's request counter).
"""

from __future__ import annotations

import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import functions as F

from .control import MetricsStore

_NAME_RE = re.compile(r"[^a-zA-Z0-9_]")

CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"


def _sanitize(name: str) -> str:
    """Metric-name grammar: [a-zA-Z_][a-zA-Z0-9_]* (dots → underscores)."""
    s = _NAME_RE.sub("_", name)
    return s if not s[:1].isdigit() else f"_{s}"


def _escape_label(v: str) -> str:
    return v.replace("\\", r"\\").replace('"', r"\"").replace("\n", r"\n")


def render_prometheus(store: MetricsStore) -> str:
    """One aggregation pass over the store → exposition text. The per-series
    rollup (last/sum/count keyed by name+labels) is a single groupBy with
    ``max_by`` for the latest value — control-plane-sized data, one job."""
    m = store.load()
    rows = (
        m.groupBy("name", "provider", "feed")
        .agg(
            F.max_by("value", "ts").alias("last"),
            F.sum("value").alias("sum"),
            F.count(F.lit(1)).alias("count"),
        )
        .orderBy("name", "provider", "feed")
        .collect()
    )
    by_metric: dict[str, list] = {}
    for r in rows:
        by_metric.setdefault(_sanitize(r["name"]), []).append(r)
    lines: list[str] = []
    for name, series in by_metric.items():
        for suffix, typ in (("last", "gauge"), ("sum", "counter"), ("count", "counter")):
            full = f"mp_{name}_{suffix}"
            lines.append(f"# HELP {full} {suffix} of recorded metric '{name}'")
            lines.append(f"# TYPE {full} {typ}")
            for r in series:
                labels = (
                    f'provider="{_escape_label(r["provider"])}",feed="{_escape_label(r["feed"])}"'
                )
                val = r[suffix]
                lines.append(f"{full}{{{labels}}} {float(val):g}")
    return "\n".join(lines) + "\n"


class MetricsServer:
    """Threaded HTTP server exposing ``GET /metrics`` (reference
    AsyncMetricsServer, metrics_server.py:34-200). ``port=0`` binds an
    ephemeral port (test-friendly); anything but /metrics is a 404; scrape
    failures return 500 with the error text, mirroring the reference's
    handler."""

    def __init__(self, store: MetricsStore, host: str = "127.0.0.1", port: int = 8000):
        self.store = store
        self.host = host
        self.scrapes = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                if self.path.split("?")[0] != "/metrics":
                    self.send_error(404, "only /metrics is served")
                    return
                try:
                    outer.scrapes += 1
                    body = render_prometheus(outer.store)
                    body += f"# HELP mp_scrapes_total scrapes served\n# TYPE mp_scrapes_total counter\nmp_scrapes_total {outer.scrapes}\n"
                    payload = body.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", CONTENT_TYPE)
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                except Exception as e:  # pragma: no cover - defensive
                    self.send_error(500, f"scrape failed: {e}")

            def log_message(self, *a):  # silence per-request stderr noise
                return None

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/metrics"

    def start(self) -> MetricsServer:
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self) -> MetricsServer:
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
