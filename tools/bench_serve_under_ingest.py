"""Serving latency UNDER ACTIVE INGEST — snapshot isolation in practice.

A child process runs an ingest loop (one delta commit per epoch, plus the
auto-compaction/split housekeeping those commits trigger) while the parent
measures the no-Ray serving calls (`lookup`, selective `search`) against
the SAME lake, re-opening the manifest per probe like a real serving tier
would. Reported: p50/p95 during ingest vs after it goes idle. The design
claim under test: published files are immutable and the manifest swap is
atomic, so an in-flight commit never blocks or corrupts a read — serving
latency should track file-count (merge-on-read width), not writer activity.

Usage: python tools/bench_serve_under_ingest.py [--events 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import sys
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from sql_graph_visualizer_ray.pipelines.cdc import LakeTable
clog, lake_dir = sys.argv[1], sys.argv[2]
lake = LakeTable.open(lake_dir, num_buckets=32)
while True:
    r = lake.commit_with_retry(lambda lk: lk.apply(clog, max_epochs=1))
    if r.get("epochs", 0) == 0:
        break
    lake.maybe_auto_split(1 << 30)
    if max(len(f) for f in lake.manifest.bucket_files(lake.path).values()) >= 8:
        lake.compact(min_files=8)
print("CHILD DONE", flush=True)
"""


def probe(lake_dir: str, keys, ts_probe):
    from sql_graph_visualizer_ray.pipelines.cdc import LakeTable

    lk = LakeTable.open(lake_dir)  # fresh manifest, like a serving tier
    t0 = time.perf_counter()
    lk.lookup([keys[0]])
    lu = time.perf_counter() - t0
    t0 = time.perf_counter()
    lk.search("ts", "==", ts_probe)
    se = time.perf_counter() - t0
    return lu * 1000, se * 1000


def pct(xs, q):
    if not xs:  # child finished before the first probe landed
        return float("nan")
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--epochs", type=int, default=16)
    a = ap.parse_args()

    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )

    clog = materialize(
        f"serveingest-{a.events}-{a.epochs}",
        ChangelogSpec(
            n_events=a.events,
            n_convs=max(100, a.events // 40),
            n_epochs=a.epochs,
            seed=13,
        ),
    )
    lake_dir = f"/tmp/bench_serve_under_ingest/lake-{a.events}-{a.epochs}"
    import shutil

    shutil.rmtree(lake_dir, ignore_errors=True)

    # bootstrap: one committed epoch so the parent has rows to probe
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from sql_graph_visualizer_ray.pipelines.cdc import LakeTable

    lake = LakeTable.open(lake_dir, num_buckets=32)
    lake.apply(str(clog), max_epochs=1)
    probe_row = lake.lookup([f"conv{3:08d}"])
    keys = [f"conv{3:08d}"]
    ts_probe = probe_row.column("ts")[0].as_py()
    ray.shutdown()

    child = subprocess.Popen(
        [sys.executable, "-c", CHILD, str(clog), lake_dir],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env={**os.environ, "PYTHONPATH": os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))},
    )
    during_lu, during_se = [], []
    while child.poll() is None:
        lu, se = probe(lake_dir, keys, ts_probe)
        during_lu.append(lu)
        during_se.append(se)
        time.sleep(0.05)
    child.wait()

    idle_lu, idle_se = [], []
    for _ in range(25):
        lu, se = probe(lake_dir, keys, ts_probe)
        idle_lu.append(lu)
        idle_se.append(se)

    print(
        json.dumps(
            {
                "metric": "serving latency under active ingest vs idle (ms)",
                "probes_during_ingest": len(during_lu),
                "lookup_during_p50": round(pct(during_lu, 0.5), 1),
                "lookup_during_p95": round(pct(during_lu, 0.95), 1),
                "lookup_idle_p50": round(pct(idle_lu, 0.5), 1),
                "search_during_p50": round(pct(during_se, 0.5), 1),
                "search_during_p95": round(pct(during_se, 0.95), 1),
                "search_idle_p50": round(pct(idle_se, 0.5), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
