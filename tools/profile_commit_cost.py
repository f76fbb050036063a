"""Per-commit FIXED-cost profile of the commit protocol pieces added since
round 1 (VERDICT r3 "What's wrong" #3): CAS publish (version-dir rename +
conflict stat), per-commit ``_snapshot.json`` write, history roll, and the
manifest ``save_atomic`` fsync. Wraps each with a timer and replays a
changelog at one commit per epoch, so the printout is the metadata overhead
a many-small-commits ingest loop pays per commit — to be read against the
delta-vs-rewrite A/B (tools/ab_replay.py --epochs-per-commit 1).

Usage: python tools/profile_commit_cost.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import collections
import functools
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--buckets", type=int, default=64)
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

    from sql_graph_visualizer_ray.pipelines import cdc
    from sql_graph_visualizer_ray.state import manifest as mf
    from sql_graph_visualizer_ray.sources.changelog import fixture_for

    acc: dict[str, list[float]] = collections.defaultdict(list)

    def wrap(obj, name, label):
        orig = getattr(obj, name)

        @functools.wraps(orig)
        def timed(*args, **kw):
            t0 = time.perf_counter()
            try:
                return orig(*args, **kw)
            finally:
                acc[label].append(time.perf_counter() - t0)

        setattr(obj, name, timed)

    wrap(cdc.LakeTable, "_publish_version_dir", "cas_publish")
    wrap(mf.Manifest, "_write_snapshot", "snapshot_write")
    wrap(mf.Manifest, "_roll_history", "history_roll")
    wrap(mf.Manifest, "save_atomic", "save_atomic_total")

    clog = fixture_for(a.sf, "basic")
    lake_dir = "/tmp/profile_commit/lake"
    shutil.rmtree(lake_dir, ignore_errors=True)
    t0 = time.perf_counter()
    lake = cdc.replay(
        clog,
        lake_dir,
        num_buckets=a.buckets,
        shuffle="spill",
        epochs_per_commit=1,
        auto_compact_files=None,
        auto_split_bytes=None,
    )
    wall = time.perf_counter() - t0
    commits = lake.manifest.version
    out = {
        "metric": "per-commit metadata overhead",
        "sf": os.path.basename(os.path.normpath(a.sf)),
        "commits": commits,
        "replay_wall_s": round(wall, 2),
    }
    for k, xs in sorted(acc.items()):
        out[f"{k}_ms_per_commit"] = round(sum(xs) * 1000 / max(1, commits), 2)
    out["metadata_pct_of_wall"] = round(
        100
        * (sum(acc["cas_publish"]) + sum(acc["save_atomic_total"]))
        / wall,
        2,
    )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
