"""HTTP serving-layer latency: the GraphServer endpoints vs the library
primitives they wrap, on a real replayed lake (no Ray session on the
request path — the server process only pays JSON encode + HTTP framing
over the same no-Ray serving calls).

Usage: python tools/bench_http.py [--events 2000000] [--buckets 64]
Prints one JSON line: median ms per endpoint + the library-direct medians.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--reps", type=int, default=15)
    a = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from sql_graph_visualizer_ray.pipelines.cdc import LakeTable, replay
    from sql_graph_visualizer_ray.serve import GraphServer
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )

    n_convs = max(100, a.events // 40)
    clog = materialize(
        f"benchlookup-{a.events}-w0",  # share bench_lookup's cached fixture
        ChangelogSpec(n_events=a.events, n_convs=n_convs, n_epochs=4, seed=7),
    )
    lake_dir = f"/tmp/bench_lookup/lake-{a.events}-{a.buckets}-d1-w0"
    if not os.path.exists(os.path.join(lake_dir, "MANIFEST.json")):
        t0 = time.time()
        replay(
            clog,
            lake_dir,
            num_buckets=a.buckets,
            shuffle="spill",
            auto_compact_files=None,
            auto_split_bytes=None,
        )
        print(f"# built lake in {time.time() - t0:.1f}s", file=sys.stderr)
    lake = LakeTable.open(lake_dir, num_buckets=a.buckets)
    conv = f"conv{3 * max(1, n_convs // 200):08d}"
    probe_dt = lake.lookup([conv]).column("ts")[0].as_py()
    probe_ts = probe_dt.isoformat()

    def timed(fn, reps=a.reps):
        xs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            xs.append(time.perf_counter() - t0)
        return round(statistics.median(xs) * 1000, 1)

    def get(path):
        with urllib.request.urlopen(srv.url + path, timeout=60) as r:
            return json.loads(r.read())

    out = {"events": a.events, "buckets": a.buckets}
    with GraphServer(lake_dir) as srv:
        # warm both paths once (manifest open, first footer reads)
        get(f"/node/{conv}")
        out["lib_lookup_ms"] = timed(lambda: lake.lookup([conv]))
        out["http_node_ms"] = timed(lambda: get(f"/node/{conv}"))
        out["lib_search_ts_ms"] = timed(
            lambda: lake.search("ts", "==", probe_dt), max(5, a.reps // 2)
        )
        out["http_where_ts_ms"] = timed(
            lambda: get(f"/where?col=ts&op=%3D%3D&value={probe_ts}"),
            max(5, a.reps // 2),
        )
        out["http_search_term_ms"] = timed(
            lambda: get(f"/search?q={conv}"), max(5, a.reps // 2)
        )
        out["http_graph_ms"] = timed(lambda: get("/graph?limit=100"))
        # long-poll with nothing new: returns immediately with no_change
        cur_v = lake.manifest.version
        out["http_updates_nochange_ms"] = timed(
            lambda: get(f"/updates?after={cur_v}&wait=0")
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
