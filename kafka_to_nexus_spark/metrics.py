"""C6 — metrics registry + sinks (the analog of src/Metrics/, ~900 LoC).

The reference keeps a tree of named int64 counters (Metric.h:20-76),
registered through prefixing Registrars (Registrar.h:26-45), and reports
them periodically to two sink kinds: a log sink for ERROR-severity
metrics and a Carbon/Graphite line-protocol TCP sink for everything
(LogSink.cpp, CarbonSink.cpp, Reporter.cpp). This module reproduces that
surface Python-side:

- :class:`Metric` — a named counter/gauge with severity;
- :class:`Registrar` — hierarchical dotted-name prefixing; ``prefixed()``
  returns a child registrar, mirroring the reference's per-component
  registrar hand-down (StreamController gets "writer.", each Source gets
  its topic/source prefix);
- sinks: :class:`LogSink` (stdlib logging), :class:`CarbonSink`
  (Graphite plaintext ``<path> <value> <ts>\\n`` lines over a socket,
  import/connect-gated), :class:`FileSink` (same line protocol to a
  local file — the broker-free twin used in tests and offline runs);
- :class:`Reporter` — interval flush of every registered metric to a
  sink; driven manually (``report_once``) or by a daemon thread.

Spark note: metrics count DRIVER-side observations (micro-batch stats,
job summaries, observe() results). Executor-side counting happens through
``DataFrame.observe`` aggregates (operators/quality.py), which arrive on
the driver already folded — so a plain in-process registry is the whole
story; no cross-process aggregation is needed.
"""

from __future__ import annotations

import enum
import logging
import threading
import time
from pathlib import Path
from typing import Callable, Iterable


class Severity(enum.Enum):
    DEBUG = "debug"
    INFO = "info"
    WARNING = "warning"
    ERROR = "error"


class Metric:
    """Named int64 counter/gauge (Metric.h:20-76 surface)."""

    def __init__(
        self, name: str, description: str, severity: Severity = Severity.DEBUG
    ) -> None:
        self.name = name
        self.description = description
        self.severity = severity
        self._value = 0
        self._lock = threading.Lock()

    def increment(self, by: int = 1) -> int:
        with self._lock:
            self._value += by
            return self._value

    def set(self, value: int) -> int:
        with self._lock:
            self._value = int(value)
            return self._value

    @property
    def value(self) -> int:
        return self._value

    def __iadd__(self, other: int) -> "Metric":
        self.increment(other)
        return self


class Registrar:
    """Prefixing metric registry (Registrar.h:26-45): names are dotted
    paths; child registrars extend the prefix."""

    def __init__(self, prefix: str = "", _root: "Registrar | None" = None) -> None:
        self.prefix = prefix
        self._root = _root or self
        if self._root is self:
            self._metrics: dict[str, Metric] = {}
            self._lock = threading.Lock()

    def prefixed(self, component: str) -> "Registrar":
        base = f"{self.prefix}.{component}" if self.prefix else component
        return Registrar(base, self._root)

    def register(
        self,
        name: str,
        description: str = "",
        severity: Severity = Severity.DEBUG,
    ) -> Metric:
        full = f"{self.prefix}.{name}" if self.prefix else name
        root = self._root
        with root._lock:
            if full in root._metrics:
                return root._metrics[full]
            m = Metric(full, description, severity)
            root._metrics[full] = m
            return m

    def deregister(self, metric: Metric) -> None:
        root = self._root
        with root._lock:
            root._metrics.pop(metric.name, None)

    def snapshot(self) -> dict[str, int]:
        root = self._root
        with root._lock:
            return {name: m.value for name, m in sorted(root._metrics.items())}

    def metrics(self) -> "Iterable[Metric]":
        root = self._root
        with root._lock:
            return list(root._metrics.values())


class LogSink:
    """ERROR-severity metrics to the logger (LogSink.cpp behavior: the log
    sink only reports metrics registered at ERROR level)."""

    def __init__(self, logger: logging.Logger | None = None) -> None:
        self.log = logger or logging.getLogger("kafka_to_nexus_spark.metrics")

    def report(self, metrics: Iterable[Metric], now: float) -> None:
        for m in metrics:
            if m.severity is Severity.ERROR:
                self.log.error("%s = %d (%s)", m.name, m.value, m.description)


class FileSink:
    """Graphite/Carbon plaintext line protocol to a local file — the
    broker-free stand-in for CarbonSink (identical payload format:
    ``<metric.path> <value> <epoch-seconds>``)."""

    def __init__(self, path: str | Path) -> None:
        self.path = Path(path)

    def report(self, metrics: Iterable[Metric], now: float) -> None:
        ts = int(now)
        with open(self.path, "a") as f:
            for m in metrics:
                f.write(f"{m.name} {m.value} {ts}\n")


class CarbonSink:  # pragma: no cover - needs a live Graphite endpoint
    """Graphite plaintext over TCP (CarbonConnection.cpp). Connection
    failures are swallowed and retried next report, like the reference's
    fire-and-forget sender."""

    def __init__(self, host: str, port: int = 2003, timeout_s: float = 2.0) -> None:
        self.host, self.port, self.timeout_s = host, port, timeout_s

    def report(self, metrics: Iterable[Metric], now: float) -> None:
        import socket

        lines = "".join(f"{m.name} {m.value} {int(now)}\n" for m in metrics)
        try:
            with socket.create_connection(
                (self.host, self.port), timeout=self.timeout_s
            ) as s:
                s.sendall(lines.encode())
        except OSError:
            pass  # next interval retries


class Reporter:
    """Interval flush of the registry to a sink (Reporter.cpp). Use
    ``report_once`` for deterministic tests/finalize; ``start`` spawns a
    daemon thread for live jobs."""

    def __init__(
        self,
        registrar: Registrar,
        sink,
        interval_s: float = 10.0,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self.registrar = registrar
        self.sink = sink
        self.interval_s = interval_s
        self._clock = clock
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def report_once(self) -> None:
        self.sink.report(self.registrar.metrics(), self._clock())

    def start(self) -> None:
        def loop() -> None:
            while not self._stop.wait(self.interval_s):
                self.report_once()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval_s + 1)
            self._thread = None
        self.report_once()  # final flush, like the reference's teardown


def registrar_from_counts(
    counts: dict[str, int], prefix: str, registrar: Registrar | None = None
) -> Registrar:
    """Fold a plain counters dict (runner/streaming metrics) into a
    registry subtree — the bridge from observe()-style folded counts to
    the reporting surface."""
    reg = registrar or Registrar()
    sub = reg.prefixed(prefix)
    for name, value in counts.items():
        sub.register(name).set(value)
    return reg
