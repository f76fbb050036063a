"""Realtime lake monitoring + asynchronous benchmark execution registry.

Engine-side analogue of the reference's performance stack — the last
reference subsystem without a counterpart here:

- ``RealtimeMonitor`` mirrors the realtime performance monitor
  (``/root/reference/internal/application/services/performance/
  realtime_performance_monitor.go:287-480``): a ticker loop that collects a
  performance snapshot, derives rate metrics, broadcasts ``metrics`` to
  subscribed clients, checks thresholds and broadcasts ``alerts`` — with the
  reference's exact severity ladder (``determineSeverity``, :443-453: ratio
  >3 critical, >2 high, >1.5 medium, else low) and its drop-on-full alert
  channel semantics (:436-440).
- ``BenchmarkService`` mirrors the benchmark execution registry
  (``benchmark_service.go:58-250``): named tools registered behind an
  availability check, per-execution id + status lifecycle
  (pending → running → completed/failed/cancelled), asynchronous execution,
  concurrent-run limit, result retention and a cleanup sweep.
- ``ServingProbeTool`` is the sysbench adapter analogue
  (``sysbench_adapter.go:86-143`` + ``parseOutput:414-505``): instead of an
  external subprocess hammering MySQL, it hammers the engine's own no-Ray
  serving primitives (point ``lookup`` — sysbench ``oltp_point_select``)
  and parses latency quantiles + qps into a ``PerformanceMetrics`` record.
- ``ReplayTool`` benchmarks the write path (CDC replay events/s), the
  engine's headline number.

Where the reference samples MySQL ``performance_schema`` tables
(``performance_schema_adapter.go:212-302``), the engine's system of record
is the lake manifest: per-commit lineage counters, delta-file pressure,
bucket skew and commit recency are all manifest-derived, so the collector
is **no-Ray and O(manifest)** — safe to run at 1 Hz against a 100 TB lake
(the manifest is KBs; nothing touches data files unless a probe is
configured, and a probe is O(requested keys)).
"""

from __future__ import annotations

import itertools
import json
import os
import threading
import time
import uuid
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable

from .pipelines.cdc import LakeTable
from .state.manifest import MANIFEST_NAME, Manifest

__all__ = [
    "AlertThresholds",
    "Alert",
    "MonitorSample",
    "LakeStatsCollector",
    "RealtimeMonitor",
    "PerformanceMetrics",
    "BenchmarkConfig",
    "BenchmarkResult",
    "BenchmarkService",
    "ServingProbeTool",
    "ReplayTool",
    "severity",
]


# ---------------------------------------------------------------------------
# Alerts
# ---------------------------------------------------------------------------


def severity(value: float, threshold: float) -> str:
    """The reference's severity ladder, verbatim semantics
    (``realtime_performance_monitor.go:443-453``)."""
    if threshold <= 0:
        return "low"
    ratio = value / threshold
    if ratio > 3.0:
        return "critical"
    if ratio > 2.0:
        return "high"
    if ratio > 1.5:
        return "medium"
    return "low"


@dataclass(frozen=True)
class Alert:
    """One threshold violation (``PerformanceAlert``,
    ``realtime_performance_monitor.go:421-441``)."""

    id: str
    type: str
    severity: str
    title: str
    description: str
    value: float
    threshold: float
    ts: float

    def to_dict(self) -> dict:
        return dict(self.__dict__)


@dataclass(frozen=True)
class AlertThresholds:
    """Alert thresholds (``AlertThresholds`` config in the reference; the
    quantities are re-based on the lake's own health axes).

    - ``slow_probe_ms``: serving probe latency (the reference's
      ``SlowQueryThreshold`` in ms).
    - ``max_commit_lag_s``: seconds since the last data commit — staleness
      of the ingest loop (the reference's realtime loop asserts freshness
      by construction; a pull-based lake needs it explicit).
    - ``max_delta_files_per_bucket``: merge-on-read read amplification —
      when the hottest bucket's file count passes this, reads pay and
      ``compact()`` is overdue.
    - ``max_bucket_skew``: max/mean live-row ratio across buckets — a hot
      key family concentrating in one bucket.
    - ``max_tombstone_ratio``: cumulative deletes vs live rows — vacuum
      pressure.
    """

    slow_probe_ms: float = 100.0
    max_commit_lag_s: float = float("inf")
    max_delta_files_per_bucket: int = 64
    max_bucket_skew: float = 8.0
    max_tombstone_ratio: float = 0.5


@dataclass
class MonitorSample:
    """One collector snapshot (``RealtimeMetrics``,
    ``realtime_performance_monitor.go:368-396``)."""

    ts: float
    version: int
    applied_epoch: int
    counters: dict
    commits_since_last: int
    events_since_last: int
    events_per_sec: float  # QPS analogue (generateRealtimeMetrics :404-417)
    commit_lag_s: float | None
    buckets: int
    live_rows: int
    tombstones: int
    max_delta_files: int
    mean_delta_files: float
    bucket_skew: float
    probe_ms: float | None = None

    def to_dict(self) -> dict:
        return dict(self.__dict__)


# ---------------------------------------------------------------------------
# Collector
# ---------------------------------------------------------------------------


class LakeStatsCollector:
    """Manifest-driven performance collector — the engine's counterpart of
    ``PerformanceSchemaAdapter.CollectPerformanceData``
    (``performance_schema_adapter.go:212-302``), which samples
    ``performance_schema`` statement/IO/connection tables.

    Reads ONLY the manifest (plus optional O(keys) serving probes): no Ray,
    no data files. Rate metrics (commits/s, events/s) are derived from the
    manifest's commit history between consecutive ``collect()`` calls, the
    way the reference derives QPS from consecutive ``COUNT_STAR`` samples.
    """

    def __init__(
        self,
        lake_dir: str,
        *,
        probe_keys: list | None = None,
        probe_fn: Callable[[LakeTable], None] | None = None,
        view_fn: Callable[[], LakeTable] | None = None,
    ):
        self.lake_dir = lake_dir
        self.probe_keys = probe_keys
        self.probe_fn = probe_fn
        self.view_fn = view_fn  # e.g. GraphServer.lake_view (stat-guarded)
        self._last_version: int | None = None
        self._last_ts: float | None = None

    def _view(self) -> LakeTable:
        lake = self.view_fn() if self.view_fn is not None else LakeTable.open(
            self.lake_dir
        )
        if lake.manifest is None:
            raise LookupError(f"no lake manifest at {self.lake_dir}")
        return lake

    def collect(self, *, now: float | None = None) -> MonitorSample:
        now = time.time() if now is None else now
        lake = self._view()
        m: Manifest = lake.manifest

        buckets = m.data.get("buckets", {})
        file_counts = [len(b.get("files", ())) for b in buckets.values()]
        rows = [
            int(b.get("rows", 0)) - int(b.get("tombstones", 0))
            for b in buckets.values()
        ]
        live_rows = sum(rows)
        tombstones = sum(int(b.get("tombstones", 0)) for b in buckets.values())
        mean_rows = live_rows / len(rows) if rows else 0.0
        skew = (max(rows) / mean_rows) if rows and mean_rows > 0 else 1.0

        # rate window: everything committed after the last-seen version.
        # The FIRST poll is the baseline — it reports 0/0 (standard rate-
        # collector semantics) rather than the lake's whole retained
        # history, which would spike every alerting consumer on collector
        # restart and walk the full (possibly archived) history for it.
        commits, events = 0, 0
        last_wall: float | None = None
        if self._last_version is not None:
            for h in m.history_after(self.lake_dir, self._last_version):
                wall = h.get("wall_ts")
                if wall is not None:
                    last_wall = float(wall)
                if "events_in" not in h:  # compaction/backfill: no events
                    continue
                commits += 1
                events += int(h.get("events_in", 0))
        if last_wall is None:
            # pre-wall_ts lakes (or a window with only maintenance commits):
            # the manifest file's mtime is the newest-commit time
            entry = m.history_entry(self.lake_dir, m.version)
            if entry is not None and entry.get("wall_ts") is not None:
                last_wall = float(entry["wall_ts"])
            else:
                try:
                    last_wall = os.path.getmtime(
                        os.path.join(self.lake_dir, MANIFEST_NAME)
                    )
                except OSError:
                    last_wall = None

        dt = (now - self._last_ts) if self._last_ts is not None else None
        eps = (events / dt) if dt and dt > 0 else 0.0
        self._last_version = m.version
        self._last_ts = now

        probe_ms: float | None = None
        if self.probe_fn is not None or self.probe_keys:
            t0 = time.perf_counter()
            if self.probe_fn is not None:
                self.probe_fn(lake)
            else:
                lake.lookup(self.probe_keys)
            probe_ms = (time.perf_counter() - t0) * 1000.0

        return MonitorSample(
            ts=now,
            version=m.version,
            applied_epoch=m.applied_epoch,
            counters=dict(m.data.get("counters", {})),
            commits_since_last=commits,
            events_since_last=events,
            events_per_sec=round(eps, 2),
            commit_lag_s=(
                round(now - last_wall, 3) if last_wall is not None else None
            ),
            buckets=len(buckets),
            live_rows=live_rows,
            tombstones=tombstones,
            max_delta_files=max(file_counts, default=0),
            mean_delta_files=(
                round(sum(file_counts) / len(file_counts), 2)
                if file_counts
                else 0.0
            ),
            bucket_skew=round(skew, 3),
            probe_ms=round(probe_ms, 3) if probe_ms is not None else None,
        )


def check_alerts(
    sample: MonitorSample, thresholds: AlertThresholds
) -> list[Alert]:
    """Threshold sweep over one sample (``checkAndGenerateAlerts``,
    ``realtime_performance_monitor.go:421-441``). Pure — usable from the
    monitor loop, the CLI and the HTTP route alike."""
    out: list[Alert] = []

    def alert(type_: str, title: str, value: float, threshold: float, desc: str):
        out.append(
            Alert(
                id=f"{type_}-{uuid.uuid4().hex[:12]}",
                type=type_,
                severity=severity(value, threshold),
                title=title,
                description=desc,
                value=round(float(value), 3),
                threshold=float(threshold),
                ts=sample.ts,
            )
        )

    t = thresholds
    if sample.probe_ms is not None and sample.probe_ms > t.slow_probe_ms:
        alert(
            "slow_query",
            "Slow serving probe",
            sample.probe_ms,
            t.slow_probe_ms,
            f"probe latency {sample.probe_ms:.2f}ms exceeds threshold",
        )
    if (
        sample.commit_lag_s is not None
        and sample.commit_lag_s > t.max_commit_lag_s
    ):
        alert(
            "commit_lag",
            "Ingest is stale",
            sample.commit_lag_s,
            t.max_commit_lag_s,
            f"last data commit {sample.commit_lag_s:.1f}s ago",
        )
    if sample.max_delta_files > t.max_delta_files_per_bucket:
        alert(
            "delta_files",
            "Compaction overdue",
            sample.max_delta_files,
            t.max_delta_files_per_bucket,
            f"hottest bucket holds {sample.max_delta_files} delta files",
        )
    if sample.bucket_skew > t.max_bucket_skew:
        alert(
            "bucket_skew",
            "Hot bucket detected",
            sample.bucket_skew,
            t.max_bucket_skew,
            f"max/mean live-row skew {sample.bucket_skew:.2f}",
        )
    if sample.live_rows > 0:
        ratio = sample.tombstones / sample.live_rows
        if ratio > t.max_tombstone_ratio:
            alert(
                "tombstones",
                "Vacuum pressure",
                ratio,
                t.max_tombstone_ratio,
                f"tombstone/live ratio {ratio:.2f}",
            )
    return out


# ---------------------------------------------------------------------------
# Realtime monitor
# ---------------------------------------------------------------------------


class RealtimeMonitor:
    """Ticker-driven monitor with a subscriber registry — the WS-free
    analogue of ``RealtimePerformanceMonitor``: ``subscribe()`` returns a
    bounded queue standing in for a WebSocket client
    (``broadcastToClients``, ``realtime_performance_monitor.go:455-472``
    fans out to a mutex-guarded client map; topic filtering included), and
    the tick body is ``collectAndBroadcastPerformanceData`` (:331-366):
    collect → broadcast("metrics") → check thresholds → broadcast("alerts").

    Messages are ``{"type": "data", "topic": ..., "data": ..., "ts": ...}``
    — the reference's ``WebSocketMessage`` wire shape. A full client queue
    drops the message (the reference drops on a full alert channel,
    :436-440) rather than stalling the collection loop.

    ``tick()`` is public so tests and CLIs can drive the loop
    deterministically without threads.
    """

    def __init__(
        self,
        collector: LakeStatsCollector,
        *,
        thresholds: AlertThresholds | None = None,
        interval_s: float = 1.0,
        history: int = 256,
    ):
        self.collector = collector
        self.thresholds = thresholds or AlertThresholds()
        self.interval_s = interval_s
        self.samples: deque[MonitorSample] = deque(maxlen=history)
        self.alerts: deque[Alert] = deque(maxlen=history)
        self._clients: dict[int, tuple[Any, frozenset[str]]] = {}
        self._client_ids = itertools.count(1)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- client registry (clientMutex + clients map in the reference) ----
    def subscribe(self, topics: tuple[str, ...] = ("metrics", "alerts")):
        """Register a client; returns ``(client_id, queue)``. The queue is
        bounded (drop-on-full) so one stuck consumer can't wedge the loop."""
        import queue as _q

        q: "_q.Queue[dict]" = _q.Queue(maxsize=1024)
        with self._lock:
            cid = next(self._client_ids)
            self._clients[cid] = (q, frozenset(topics))
        return cid, q

    def unsubscribe(self, client_id: int) -> None:
        with self._lock:
            self._clients.pop(client_id, None)

    def _broadcast(self, topic: str, data: dict) -> None:
        msg = {
            "type": "data",
            "topic": topic,
            "data": data,
            "ts": time.time(),
            "id": f"msg-{uuid.uuid4().hex[:12]}",
        }
        with self._lock:
            clients = list(self._clients.values())
        for q, topics in clients:
            if topic in topics:
                try:
                    q.put_nowait(msg)
                except Exception:  # queue.Full: drop, never stall the loop
                    pass

    # -- collection loop ---------------------------------------------------
    def tick(self, *, now: float | None = None) -> MonitorSample:
        """One collection round; returns the sample (alerts land in
        ``self.alerts`` and on subscriber queues)."""
        sample = self.collector.collect(now=now)
        self.samples.append(sample)
        self._broadcast("metrics", sample.to_dict())
        for a in check_alerts(sample, self.thresholds):
            self.alerts.append(a)
            self._broadcast("alerts", a.to_dict())
        return sample

    def latest(self) -> MonitorSample | None:
        return self.samples[-1] if self.samples else None

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                self.tick()
            except Exception:  # lake mid-publish etc.: next tick retries
                pass

    def start(self) -> "RealtimeMonitor":
        if self._thread is not None:
            return self
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._loop, name="lake-monitor", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        t, self._thread = self._thread, None
        if t is not None:
            t.join(timeout=10)

    def __enter__(self) -> "RealtimeMonitor":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


# ---------------------------------------------------------------------------
# Benchmark service
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BenchmarkConfig:
    """Benchmark run parameters (``ports.BenchmarkConfig``). ``duration_s``
    and ``threads`` are honored by tools where they apply; ``params`` is
    tool-specific (the reference's ``ToolConfigurations``)."""

    test_type: str = "point_select"
    duration_s: float = 5.0
    threads: int = 1
    params: dict = field(default_factory=dict)


@dataclass
class PerformanceMetrics:
    """Parsed benchmark output (``sysbench_adapter.go parseOutput:414-505``
    extracts qps, latency avg/p95/max, total events, errors)."""

    queries_per_second: float = 0.0
    total_queries: int = 0
    errors: int = 0
    avg_latency_ms: float = 0.0
    p95_latency_ms: float = 0.0
    max_latency_ms: float = 0.0
    extra: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return dict(self.__dict__)


@dataclass
class BenchmarkResult:
    """Execution record (``ports.BenchmarkResult``)."""

    id: str
    tool: str
    test_type: str
    status: str  # pending | running | completed | failed | cancelled
    start_ts: float
    end_ts: float | None = None
    duration_s: float | None = None
    error: str | None = None
    metrics: PerformanceMetrics | None = None

    def to_dict(self) -> dict:
        d = dict(self.__dict__)
        d["metrics"] = self.metrics.to_dict() if self.metrics else None
        return d


class ServingProbeTool:
    """sysbench ``oltp_point_select`` analogue over the no-Ray serving path:
    each "query" is a point ``lookup`` (optionally a ``search`` — set
    ``params={"kind": "search", "column": ..., "value": ...}``) against a
    pinned lake view; output is latency quantiles + qps, exactly what
    ``sysbench_adapter.go:parseOutput`` scrapes from sysbench stdout."""

    name = "serving_probe"

    def __init__(self, lake_dir: str, keys: list):
        self.lake_dir = lake_dir
        self.keys = list(keys)

    def is_available(self) -> bool:
        return bool(self.keys) and os.path.exists(
            os.path.join(self.lake_dir, MANIFEST_NAME)
        )

    def validate(self, config: BenchmarkConfig) -> None:
        if config.duration_s <= 0:
            raise ValueError("duration_s must be positive")
        if config.test_type not in ("point_select", "search"):
            raise ValueError(f"unsupported test_type {config.test_type!r}")
        if config.test_type == "search" and not (
            config.params.get("column") and "value" in config.params
        ):
            raise ValueError("search benchmark needs params.column/value")

    def execute(
        self,
        config: BenchmarkConfig,
        *,
        cancel: threading.Event,
        deadline: float,
    ) -> PerformanceMetrics:
        lake = LakeTable.open(self.lake_dir)  # one pinned view for the run
        lats: list[float] = []
        errors = 0
        i = 0
        t_start = time.time()
        t_end = min(deadline, t_start + config.duration_s)
        while time.time() < t_end and not cancel.is_set():
            t0 = time.perf_counter()
            try:
                if config.test_type == "search":
                    lake.search(
                        config.params["column"],
                        config.params.get("op", "=="),
                        config.params["value"],
                    )
                else:
                    lake.lookup([self.keys[i % len(self.keys)]])
            except Exception:
                errors += 1
            lats.append((time.perf_counter() - t0) * 1000.0)
            i += 1
        if cancel.is_set():
            raise InterruptedError("cancelled")
        lats.sort()
        total = len(lats)
        # qps over the ELAPSED wall clock, not the sum of the timed
        # sections — loop overhead outside the per-query timer is real
        # time the process spent, and sum(lats) would overstate throughput
        wall = (time.time() - t_start) or 1e-9
        q = lambda p: lats[min(total - 1, int(p * total))] if total else 0.0
        return PerformanceMetrics(
            queries_per_second=round(total / wall, 2),
            total_queries=total,
            errors=errors,
            avg_latency_ms=round(sum(lats) / total, 3) if total else 0.0,
            p95_latency_ms=round(q(0.95), 3),
            max_latency_ms=round(lats[-1], 3) if lats else 0.0,
        )


class ReplayTool:
    """CDC write-path benchmark: replay a changelog directory into a fresh
    throwaway lake and report events/s — the engine's headline metric
    (BASELINE.md), packaged as a registry tool the way the reference wraps
    sysbench OLTP write tests. Needs a live Ray session (the only tool that
    does; ``is_available`` gates on it, mirroring
    ``RegisterBenchmarkTool``'s availability check,
    ``benchmark_service.go:113-126``)."""

    name = "cdc_replay"

    def __init__(self, changelog_dir: str, *, num_buckets: int = 16):
        self.changelog_dir = changelog_dir
        self.num_buckets = num_buckets

    def is_available(self) -> bool:
        try:
            import ray

            return ray.is_initialized() and os.path.isdir(self.changelog_dir)
        except ImportError:  # pragma: no cover
            return False

    def validate(self, config: BenchmarkConfig) -> None:
        if config.test_type != "replay":
            raise ValueError("ReplayTool only runs test_type='replay'")

    def execute(
        self,
        config: BenchmarkConfig,
        *,
        cancel: threading.Event,
        deadline: float,
    ) -> PerformanceMetrics:
        import shutil
        import tempfile

        out = tempfile.mkdtemp(prefix="bench_replay_")
        try:
            lake = LakeTable.open(
                os.path.join(out, "lake"), num_buckets=self.num_buckets
            )
            # chunked apply so the cancel event and the service deadline
            # actually bite: one fused Ray pipeline per chunk, checks
            # between chunks (a whole-changelog apply would run unbounded
            # while cancel() and default_timeout_s silently no-op). The
            # chunk is epochs, so throughput stays near the single-commit
            # headline while cancellation latency is one chunk.
            chunk = max(1, int(config.params.get("epochs_per_commit", 8)))
            totals: dict[str, int] = {}
            t0 = time.perf_counter()
            while True:
                if cancel.is_set():
                    raise InterruptedError("cancelled")
                if time.time() >= deadline:
                    raise TimeoutError(
                        "replay benchmark exceeded its deadline "
                        f"({totals.get('events_in', 0)} events applied)"
                    )
                c = lake.apply(self.changelog_dir, max_epochs=chunk)
                if not c.get("epochs"):
                    break
                for k, v in c.items():
                    totals[k] = totals.get(k, 0) + int(v)
            wall = time.perf_counter() - t0
            counters = totals
            events = int(counters.get("events_in", 0))
            return PerformanceMetrics(
                queries_per_second=round(events / wall, 1) if wall else 0.0,
                total_queries=events,
                avg_latency_ms=round(wall * 1000.0, 1),
                max_latency_ms=round(wall * 1000.0, 1),
                extra={"counters": {k: int(v) for k, v in counters.items()}},
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)


class BenchmarkService:
    """Async benchmark registry (``benchmark_service.go:58-250``): register
    tools, start runs (id returned immediately, thread executes), poll
    status/result, cancel, enforce a concurrent-run cap, and retire old
    results on a cleanup sweep."""

    def __init__(
        self,
        *,
        max_concurrent: int = 2,
        default_timeout_s: float = 300.0,
        retain_results_s: float = 3600.0,
    ):
        self.max_concurrent = max_concurrent
        self.default_timeout_s = default_timeout_s
        self.retain_results_s = retain_results_s
        self._tools: dict[str, Any] = {}
        self._runs: dict[str, BenchmarkResult] = {}
        self._cancels: dict[str, threading.Event] = {}
        self._threads: dict[str, threading.Thread] = {}
        self._lock = threading.Lock()

    # -- tool registry ---------------------------------------------------
    def register_tool(self, tool: Any) -> None:
        """RegisterBenchmarkTool (:113-126): availability-gated."""
        if not tool.is_available():
            raise RuntimeError(f"benchmark tool {tool.name} is not available")
        with self._lock:
            self._tools[tool.name] = tool

    def available_tools(self) -> list[str]:
        with self._lock:
            return [n for n, t in self._tools.items() if t.is_available()]

    # -- lifecycle ---------------------------------------------------------
    def _active(self) -> int:
        return sum(
            1
            for r in self._runs.values()
            if r.status in ("pending", "running")
        )

    def execute_benchmark(
        self, config: BenchmarkConfig, tool_name: str
    ) -> str:
        """ExecuteBenchmark (:143-199): validate → cap check → register
        pending execution → run async → return the execution id."""
        with self._lock:
            tool = self._tools.get(tool_name)
            if tool is None:
                raise KeyError(f"unknown benchmark tool {tool_name!r}")
            if self._active() >= self.max_concurrent:
                raise RuntimeError(
                    f"maximum concurrent runs ({self.max_concurrent}) exceeded"
                )
            tool.validate(config)
            run_id = uuid.uuid4().hex
            result = BenchmarkResult(
                id=run_id,
                tool=tool_name,
                test_type=config.test_type,
                status="pending",
                start_ts=time.time(),
            )
            self._runs[run_id] = result
            cancel = self._cancels[run_id] = threading.Event()
            t = threading.Thread(
                target=self._execute_async,
                args=(run_id, tool, config, cancel),
                name=f"bench-{tool_name}-{run_id[:8]}",
                daemon=True,
            )
            self._threads[run_id] = t
        t.start()
        return run_id

    def _execute_async(
        self,
        run_id: str,
        tool: Any,
        config: BenchmarkConfig,
        cancel: threading.Event,
    ) -> None:
        """executeAsync (:202-250): run, fold errors into a failed result."""
        with self._lock:
            self._runs[run_id].status = "running"
        deadline = time.time() + self.default_timeout_s
        try:
            metrics = tool.execute(config, cancel=cancel, deadline=deadline)
            status, error = "completed", None
        except InterruptedError:
            metrics, status, error = None, "cancelled", "cancelled"
        except Exception as e:  # failures are results, not crashes
            metrics, status, error = None, "failed", str(e)
        with self._lock:
            r = self._runs[run_id]
            r.status = status
            r.error = error
            r.metrics = metrics
            r.end_ts = time.time()
            r.duration_s = round(r.end_ts - r.start_ts, 3)

    def cancel(self, run_id: str) -> bool:
        with self._lock:
            ev = self._cancels.get(run_id)
        if ev is None:
            return False
        ev.set()
        return True

    def wait(self, run_id: str, timeout: float | None = None) -> bool:
        t = self._threads.get(run_id)
        if t is None:
            return True
        t.join(timeout)
        return not t.is_alive()

    def get_result(self, run_id: str) -> BenchmarkResult:
        """GetBenchmarkResult (:253-262)."""
        with self._lock:
            r = self._runs.get(run_id)
        if r is None:
            raise KeyError(f"execution {run_id} not found")
        return r

    def list_executions(self) -> list[BenchmarkResult]:
        with self._lock:
            return sorted(self._runs.values(), key=lambda r: r.start_ts)

    def cleanup(self, *, now: float | None = None) -> int:
        """cleanupRoutine: drop terminal results older than the retention
        window; running executions are never dropped."""
        now = time.time() if now is None else now
        dropped = 0
        with self._lock:
            for rid in list(self._runs):
                r = self._runs[rid]
                if r.status in ("pending", "running"):
                    continue
                if (now - (r.end_ts or r.start_ts)) > self.retain_results_s:
                    del self._runs[rid]
                    self._cancels.pop(rid, None)
                    self._threads.pop(rid, None)
                    dropped += 1
        return dropped


def monitor_jsonl(
    lake_dir: str,
    *,
    polls: int = 1,
    interval_s: float = 1.0,
    thresholds: AlertThresholds | None = None,
) -> list[str]:
    """CLI helper: N polls → JSON lines (sample + any alerts inline)."""
    coll = LakeStatsCollector(lake_dir)
    th = thresholds or AlertThresholds()
    out = []
    for i in range(polls):
        if i:
            time.sleep(interval_s)
        s = coll.collect()
        d = s.to_dict()
        d["alerts"] = [a.to_dict() for a in check_alerts(s, th)]
        out.append(json.dumps(d))
    return out
