"""Ingest observability — parity with the reference's Prometheus surface.

Reference (T6, SURVEY §2.10): counters ``input_records_total`` /
``errors_total`` (main.go:52-60), summaries ``batch_size`` /
``flush_time_seconds`` with p50/p90/p95/p99 (main.go:62-73), a log counter by
level (pkg/instrument/logger/logger.go:17,61), and a /metrics + /health HTTP
server (pkg/instrument/metrics/metrics.go:26-57).

Spark-native mapping: a StreamingQueryListener accumulates the same series
from micro-batch progress events; ``render_prometheus`` produces the
text-format exposition; ``MetricsServer`` serves it on /metrics with a
/health endpoint — full parity with the reference's metrics service.
"""

from __future__ import annotations

import logging
import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


def _quantiles(values: list[float], qs: tuple[float, ...]) -> dict[float, float]:
    if not values:
        return {q: 0.0 for q in qs}
    s = sorted(values)
    out = {}
    for q in qs:
        idx = min(int(q * len(s)), len(s) - 1)
        out[q] = s[idx]
    return out


@dataclass
class IngestMetrics:
    """Counter/summary store, one per pipeline (thread-safe like the
    reference's promauto registry)."""

    input_records_total: int = 0       # main.go:52-55
    errors_total: int = 0              # main.go:57-60
    batch_sizes: list[float] = field(default_factory=list)   # main.go:62-67
    flush_seconds: list[float] = field(default_factory=list)  # main.go:69-73
    # by-level self-log counter (pkg/instrument/logger/logger.go:17-19):
    # every line the ENGINE logs increments its level's bucket — the
    # first series an operator hits when debugging the pipeline's own
    # warnings. Fed by SelfLogCounterHandler (logger.go:61).
    logs_total: dict = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    QUANTILES = (0.5, 0.9, 0.95, 0.99)  # main.go:65,72

    # Python levelname -> slog Level.String() (the reference's label set)
    _SLOG_LEVEL = {"WARNING": "WARN"}

    def observe_log(self, levelname: str) -> None:
        """logger.go:61 — one increment per log record, labeled by level."""
        level = self._SLOG_LEVEL.get(levelname, levelname)
        with self._lock:
            self.logs_total[level] = self.logs_total.get(level, 0) + 1

    def observe_batch(
        self, n_rows: int, seconds: float, decoded_rows: int | None = None
    ) -> None:
        """Record one flush. ``n_rows`` is the RAW received-record count —
        the reference increments input_records_total per received record
        BEFORE decode (main.go:246), so rejected/blank lines are counted.
        ``decoded_rows`` (defaults to ``n_rows``) is the flushed buffer
        size feeding the batch_size summary (main.go:62-67)."""
        with self._lock:
            self.input_records_total += int(n_rows)
            self.batch_sizes.append(
                float(n_rows if decoded_rows is None else decoded_rows)
            )
            self.flush_seconds.append(float(seconds))

    def observe_error(self) -> None:
        with self._lock:
            self.errors_total += 1

    def render_prometheus(self, prefix: str = "klogs_spark") -> str:
        """Text exposition matching the reference's metric names
        (clickhouse_* family, main.go:52-73)."""
        with self._lock:
            lines = [
                f"{prefix}_input_records_total {self.input_records_total}",
                f"{prefix}_errors_total {self.errors_total}",
            ]
            for level in sorted(self.logs_total):  # logger.go:17-19
                lines.append(
                    f'{prefix}_logs_total{{level="{level}"}} '
                    f"{self.logs_total[level]}"
                )
            for name, series in (
                ("batch_size", self.batch_sizes),
                ("flush_time_seconds", self.flush_seconds),
            ):
                for q, v in _quantiles(series, self.QUANTILES).items():
                    lines.append(
                        f'{prefix}_{name}{{quantile="{q}"}} {v}'
                    )
                lines.append(f"{prefix}_{name}_count {len(series)}")
                lines.append(f"{prefix}_{name}_sum {sum(series)}")
        return "\n".join(lines) + "\n"

    def healthy(self) -> bool:
        """/health equivalent (metrics.go:51-53)."""
        return True


class SelfLogCounterHandler(logging.Handler):
    """The Python twin of the reference's slog ``CustomHandler``
    (pkg/instrument/logger/logger.go:56-69): wraps the engine's logger so
    EVERY record it emits increments ``logs_total{level}`` before normal
    handling proceeds. Attach via :func:`instrument_logger`."""

    def __init__(self, metrics: IngestMetrics):
        super().__init__()
        self.metrics = metrics

    def emit(self, record: logging.LogRecord) -> None:
        self.metrics.observe_log(record.levelname)


ENGINE_LOGGER = "klogs_spark"


def instrument_logger(
    metrics: IngestMetrics, name: str = ENGINE_LOGGER
) -> logging.Logger:
    """logger.go:32-52 (New): install the counting handler on the engine's
    logger namespace and return the logger. Idempotent — a second call
    with the same metrics object does not double-count.

    The reference handler counts EVERY record its configured handler
    receives, including Info lines (logger.go:61 runs before level-based
    drop-off is even possible — slog handlers see what the logger emits).
    Python's root default is WARNING, which would silently starve the
    ``logs_total{level="INFO"}`` series, so we pin the logger to INFO —
    but ONLY when nothing in its ancestor chain was configured: an
    explicit level on the logger itself, on any parent namespace (an
    operator quieting ``klogs_spark`` must also quiet
    ``klogs_spark.engine``), or on the root logger is respected.

    Known blind spot: an operator who EXPLICITLY set root to WARNING is
    indistinguishable from the stock default (logging keeps no
    was-configured bit on the level), so that one configuration still
    gets the INFO pin. The root logger itself is never pinned — counting
    on root is fine, but setLevel there would mutate global logging."""
    logger = logging.getLogger(name)
    configured = logger is logging.root  # never re-level global logging
    node: logging.Logger | None = logger
    while node is not None:
        if node is logging.root:
            # the root's WARNING is the stock default; any other value
            # was set by an operator
            configured = configured or node.level != logging.WARNING
            break
        if node.level != logging.NOTSET:
            configured = True
            break
        node = node.parent if isinstance(node.parent, logging.Logger) else None
    if not configured:
        logger.setLevel(logging.INFO)
    for h in logger.handlers:
        if isinstance(h, SelfLogCounterHandler) and h.metrics is metrics:
            return logger
    logger.addHandler(SelfLogCounterHandler(metrics))
    return logger


class MetricsServer:
    """/metrics + /health HTTP server — parity with the reference's metrics
    service (pkg/instrument/metrics/metrics.go:26-57: Start/Stop lifecycle,
    ``/health`` answering ``OK``, ``/metrics`` serving the Prometheus text
    exposition). stdlib-only; runs on a daemon thread next to the driver.

    On a real cluster you'd usually scrape Spark's own metrics sink instead,
    but the reference ships this surface, so the engine does too.
    """

    def __init__(self, metrics: IngestMetrics, address: str = "127.0.0.1:0"):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        host, _, port = address.rpartition(":")
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API)
                if self.path == "/health":
                    body = b"OK" if outer.metrics.healthy() else b"UNHEALTHY"
                    code = 200 if outer.metrics.healthy() else 503
                    ctype = "text/plain"
                elif self.path == "/metrics":
                    body = outer.metrics.render_prometheus().encode()
                    code, ctype = 200, "text/plain; version=0.0.4"
                else:
                    body, code, ctype = b"not found", 404, "text/plain"
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # quiet: no per-scrape spam
                pass

        self.metrics = metrics
        self._httpd = ThreadingHTTPServer((host, int(port)), _Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> None:
        """metrics.go:26-34 — serve until stopped; daemon thread so an
        un-stopped server never blocks driver shutdown."""
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="metrics-server", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        """Graceful shutdown (metrics.go:37-47)."""
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)


class IngestMetricsListener(StreamingQueryListener):
    """Feeds IngestMetrics from Structured Streaming progress events —
    the engine-side replacement for the plugin's inline instrumentation
    (main.go:246, 371-373)."""

    def __init__(self, metrics: IngestMetrics | None = None):
        self.metrics = metrics or IngestMetrics()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        seconds = (p.batchDuration or 0) / 1000.0
        self.metrics.observe_batch(p.numInputRows, seconds)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if event.exception is not None:
            self.metrics.observe_error()
            # through the engine logger so the by-level self-log counter
            # moves exactly when the reference's would (logger.go:61)
            logging.getLogger(ENGINE_LOGGER).error(
                "streaming query terminated with exception: %s",
                event.exception,
            )
