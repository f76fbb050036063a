"""Realtime monitor + benchmark service (monitor.py): the engine-side
analogue of the reference's performance stack
(realtime_performance_monitor.go / benchmark_service.go /
sysbench_adapter.go). Collector numbers must agree with the manifest,
alerts must fire with the reference's severity ladder, subscribers must
receive broadcast messages, and the benchmark registry must run the
pending→running→terminal lifecycle asynchronously."""

import json
import time
import urllib.request

import pytest

from sql_graph_visualizer_ray.monitor import (
    Alert,
    AlertThresholds,
    BenchmarkConfig,
    BenchmarkService,
    LakeStatsCollector,
    RealtimeMonitor,
    ReplayTool,
    ServingProbeTool,
    check_alerts,
    monitor_jsonl,
    severity,
)
from sql_graph_visualizer_ray.pipelines.cdc import LakeTable
from sql_graph_visualizer_ray.sources.changelog import ChangelogSpec, materialize


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("monitor")
    clog = materialize(
        "monitor", ChangelogSpec(n_events=4000, n_convs=80, n_epochs=4, seed=11)
    )
    lk = LakeTable.open(str(root / "lake"), num_buckets=8)
    lk.apply(clog, max_epochs=2)  # two commits so history has >1 entry
    lk.apply(clog)
    return lk, clog


def test_severity_ladder_matches_reference():
    # realtime_performance_monitor.go:443-453
    assert severity(301, 100) == "critical"
    assert severity(250, 100) == "high"
    assert severity(160, 100) == "medium"
    assert severity(120, 100) == "low"
    assert severity(5, 0) == "low"  # degenerate threshold never divides


def test_collector_agrees_with_manifest(lake):
    lk, _ = lake
    coll = LakeStatsCollector(lk.path)
    s = coll.collect()
    m = lk.manifest
    assert s.version == m.version
    assert s.applied_epoch == m.applied_epoch
    assert s.counters == m.data["counters"]
    assert s.buckets == len(m.data["buckets"])
    live = sum(
        int(b["rows"]) - int(b["tombstones"])
        for b in m.data["buckets"].values()
    )
    assert s.live_rows == live
    assert s.max_delta_files >= 1
    # the first collect is the rate BASELINE: deltas are 0 (no spurious
    # whole-history spike on collector restart), lag still derived
    assert s.commits_since_last == 0
    assert s.events_since_last == 0
    # wall_ts stamping makes commit lag real (seconds, small in a test)
    assert s.commit_lag_s is not None and 0 <= s.commit_lag_s < 3600


def test_collector_rate_window_between_polls(lake):
    lk, clog = lake
    coll = LakeStatsCollector(lk.path)
    coll.collect()
    s2 = coll.collect()
    assert s2.commits_since_last == 0  # nothing new between the polls
    assert s2.events_since_last == 0
    assert s2.events_per_sec == 0.0


def test_collector_sees_commit_between_polls(ray_session, tmp_path):
    """A commit landing between two polls shows up as that poll's delta
    (the baseline poll itself reports 0)."""
    clog = materialize(
        "monitor", ChangelogSpec(n_events=4000, n_convs=80, n_epochs=4, seed=11)
    )
    lk = LakeTable.open(str(tmp_path / "lake"), num_buckets=8)
    lk.apply(clog, max_epochs=2)
    coll = LakeStatsCollector(lk.path)
    coll.collect()  # baseline
    lk.apply(clog)  # epochs 3..4 land as one commit
    s = coll.collect()
    assert s.commits_since_last == 1
    assert s.events_since_last > 0
    assert s.events_per_sec > 0


def test_collector_probe_latency(lake):
    lk, _ = lake
    key = lk.final_table().column("conv_id")[0].as_py()
    coll = LakeStatsCollector(lk.path, probe_keys=[key])
    s = coll.collect()
    assert s.probe_ms is not None and s.probe_ms > 0


def test_alerts_fire_and_carry_severity(lake):
    lk, _ = lake
    coll = LakeStatsCollector(lk.path)
    s = coll.collect()
    # thresholds set beneath reality: every axis with data must fire
    th = AlertThresholds(
        max_commit_lag_s=0.0,
        max_delta_files_per_bucket=0,
        max_bucket_skew=s.bucket_skew / 4,  # ratio 4 -> critical
    )
    alerts = check_alerts(s, th)
    types = {a.type: a for a in alerts}
    assert "commit_lag" in types
    assert "delta_files" in types
    assert types["bucket_skew"].severity == "critical"
    # sane defaults: a healthy fresh lake raises nothing
    assert check_alerts(s, AlertThresholds()) == []


def test_monitor_broadcasts_to_subscribers(lake):
    lk, _ = lake
    mon = RealtimeMonitor(
        LakeStatsCollector(lk.path),
        thresholds=AlertThresholds(max_delta_files_per_bucket=0),
    )
    _, q_all = mon.subscribe()
    cid_m, q_metrics = mon.subscribe(topics=("metrics",))
    mon.tick()
    msgs = [q_all.get_nowait() for _ in range(q_all.qsize())]
    topics = [m["topic"] for m in msgs]
    assert "metrics" in topics and "alerts" in topics
    assert all(m["type"] == "data" for m in msgs)
    only_m = [q_metrics.get_nowait() for _ in range(q_metrics.qsize())]
    assert {m["topic"] for m in only_m} == {"metrics"}  # topic filtering
    # unsubscribe: no further messages
    mon.unsubscribe(cid_m)
    mon.tick()
    assert q_metrics.qsize() == 0
    assert mon.latest() is not None
    assert len(mon.alerts) >= 1


def test_monitor_thread_loop(lake):
    lk, _ = lake
    mon = RealtimeMonitor(LakeStatsCollector(lk.path), interval_s=0.05)
    with mon:
        deadline = time.time() + 5
        while not mon.samples and time.time() < deadline:
            time.sleep(0.02)
    assert mon.samples, "ticker thread never collected"


def test_benchmark_service_lifecycle(lake):
    lk, _ = lake
    keys = lk.final_table().column("conv_id").to_pylist()[:5]
    svc = BenchmarkService(max_concurrent=2)
    svc.register_tool(ServingProbeTool(lk.path, keys))
    assert svc.available_tools() == ["serving_probe"]

    rid = svc.execute_benchmark(
        BenchmarkConfig(test_type="point_select", duration_s=0.3),
        "serving_probe",
    )
    assert svc.wait(rid, timeout=30)
    r = svc.get_result(rid)
    assert r.status == "completed"
    assert r.metrics.total_queries > 0
    assert r.metrics.errors == 0
    assert r.metrics.avg_latency_ms > 0
    assert r.metrics.p95_latency_ms >= r.metrics.avg_latency_ms * 0.5
    assert r.metrics.queries_per_second > 0
    assert r.duration_s is not None

    # unknown tool / bad config are rejected up front
    with pytest.raises(KeyError):
        svc.execute_benchmark(BenchmarkConfig(), "nope")
    with pytest.raises(ValueError):
        svc.execute_benchmark(
            BenchmarkConfig(test_type="bogus"), "serving_probe"
        )

    # cleanup retires terminal results past retention
    svc.retain_results_s = 0.0
    assert svc.cleanup(now=time.time() + 1) == 1
    with pytest.raises(KeyError):
        svc.get_result(rid)


def test_benchmark_concurrency_cap_and_cancel(lake):
    lk, _ = lake
    keys = lk.final_table().column("conv_id").to_pylist()[:2]
    svc = BenchmarkService(max_concurrent=1)
    svc.register_tool(ServingProbeTool(lk.path, keys))
    rid = svc.execute_benchmark(
        BenchmarkConfig(duration_s=30.0), "serving_probe"
    )
    with pytest.raises(RuntimeError):  # cap: one active run allowed
        svc.execute_benchmark(BenchmarkConfig(duration_s=1.0), "serving_probe")
    assert svc.cancel(rid)
    assert svc.wait(rid, timeout=30)
    assert svc.get_result(rid).status == "cancelled"
    assert not svc.cancel("missing")


def test_benchmark_search_kind(lake):
    lk, _ = lake
    svc = BenchmarkService()
    keys = lk.final_table().column("conv_id").to_pylist()[:1]
    svc.register_tool(ServingProbeTool(lk.path, keys))
    rid = svc.execute_benchmark(
        BenchmarkConfig(
            test_type="search",
            duration_s=0.2,
            params={"column": "conv_id", "value": keys[0]},
        ),
        "serving_probe",
    )
    svc.wait(rid, timeout=30)
    r = svc.get_result(rid)
    assert r.status == "completed" and r.metrics.errors == 0


def test_replay_tool(lake, tmp_path):
    _, clog = lake
    svc = BenchmarkService()
    svc.register_tool(ReplayTool(clog, num_buckets=4))
    rid = svc.execute_benchmark(
        BenchmarkConfig(test_type="replay"), "cdc_replay"
    )
    assert svc.wait(rid, timeout=120)
    r = svc.get_result(rid)
    assert r.status == "completed", r.error
    # events_in is post-precompact (within-commit superseded events drop);
    # the raw event count is the spec's n_events
    assert r.metrics.extra["counters"]["raw_events"] == 4000
    assert 0 < r.metrics.total_queries <= 4000
    assert r.metrics.queries_per_second > 0


def test_replay_tool_honors_cancel_and_deadline(ray_session, tmp_path):
    """ReplayTool checks the cancel event and the service deadline between
    apply chunks — svc.cancel() and default_timeout_s must actually stop a
    replay run, not no-op while it replays unbounded."""
    import threading

    clog = materialize(
        "monitor", ChangelogSpec(n_events=4000, n_convs=80, n_epochs=4, seed=11)
    )
    tool = ReplayTool(clog, num_buckets=4)
    ev = threading.Event()
    ev.set()
    with pytest.raises(InterruptedError):
        tool.execute(
            BenchmarkConfig(test_type="replay"),
            cancel=ev,
            deadline=time.time() + 60,
        )
    with pytest.raises(TimeoutError, match="deadline"):
        tool.execute(
            BenchmarkConfig(test_type="replay"),
            cancel=threading.Event(),
            deadline=time.time() - 1,
        )


def test_monitor_jsonl_cli_helper(lake):
    lk, _ = lake
    lines = monitor_jsonl(lk.path, polls=1)
    d = json.loads(lines[0])
    assert d["version"] == lk.manifest.version
    assert isinstance(d["alerts"], list)


def test_http_monitor_route(lake):
    from sql_graph_visualizer_ray.serve import GraphServer

    lk, _ = lake
    with GraphServer(lk.path) as srv:
        with urllib.request.urlopen(srv.url + "/monitor", timeout=30) as r:
            d1 = json.loads(r.read())
        assert d1["version"] == lk.manifest.version
        assert d1["alerts"] == []  # default thresholds: healthy lake
        # threshold query params drive alerting, reference severity ladder
        url = srv.url + "/monitor?max_delta_files_per_bucket=0&max_commit_lag_s=0"
        with urllib.request.urlopen(url, timeout=30) as r:
            d2 = json.loads(r.read())
        kinds = {a["type"] for a in d2["alerts"]}
        assert {"delta_files", "commit_lag"} <= kinds
        # rate window is per-server state: second poll sees no new commits
        assert d2["commits_since_last"] == 0
        # /monitor is a known route in the metrics vocabulary
        with urllib.request.urlopen(srv.url + "/metrics", timeout=30) as r:
            m = json.loads(r.read())
        assert "/monitor" in m["routes"]


def test_cli_monitor_and_benchmark(lake, capsys):
    from sql_graph_visualizer_ray.cli import main

    lk, clog = lake
    assert main(["monitor", lk.path, "--max-delta-files", "0"]) == 0
    d = json.loads(capsys.readouterr().out.strip())
    assert d["version"] == lk.manifest.version
    assert any(a["type"] == "delta_files" for a in d["alerts"])

    assert main(["benchmark", "serving", lk.path, "--duration", "0.2"]) == 0
    r = json.loads(capsys.readouterr().out.strip())
    assert r["status"] == "completed"
    assert r["metrics"]["total_queries"] > 0

    assert main(["benchmark", "replay", clog, "--num-buckets", "4"]) == 0
    r = json.loads(capsys.readouterr().out.strip())
    assert r["status"] == "completed"
    assert r["metrics"]["extra"]["counters"]["raw_events"] == 4000
