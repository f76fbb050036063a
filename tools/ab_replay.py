"""Interleaved A/B of the CDC replay between two CODE VERSIONS.

Settles perf-drift questions the driver's single-shot numbers cannot: this
host shows 2-4x wall-clock noise between windows (BASELINE.md §scaling), so
the only meaningful comparison is A and B alternating within the SAME
window, fresh Ray session per leg, identical fixture and settings, best-of
per code version.

Usage:
  python tools/ab_replay.py --repo-a /tmp/r1 --repo-b /root/repo \
      [--pairs 3] [--cpus 32] [--sf /root/testdata/sf0.1] \
      [--epochs-per-commit N]   # N=1 isolates per-commit fixed cost

``--repo-a/-b`` are checkouts of the two versions (e.g. ``git worktree add
/tmp/r1 <round-1-sha>``). The child is version-agnostic: it only uses the
``fixture_for``/``replay`` API both rounds share, and disables newer
auto-management knobs when present so the JOB is identical.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import inspect, json, os, shutil, sys, time
repo, sf_dir, cpus, epc = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
sys.path.insert(0, repo)
import ray
ray.init(address="local", num_cpus=cpus, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
rd.range(cpus * 2).map_batches(lambda b: b).materialize()  # warm workers
from sql_graph_visualizer_ray.sources.changelog import fixture_for, spec_for
from sql_graph_visualizer_ray.pipelines.cdc import replay
label = os.path.basename(os.path.normpath(sf_dir))
clog = fixture_for(sf_dir, "basic")
n_events = spec_for(label, "basic").n_events
lake_dir = f"/tmp/graft_ab/{label}/{os.getpid()}"
shutil.rmtree(lake_dir, ignore_errors=True)
os.environ.setdefault("GRAFT_SPILL_DIR", "/dev/shm/graft_spill")
kw = {"num_buckets": 64, "shuffle": "spill"}
sig = inspect.signature(replay).parameters
if epc != "none":
    kw["epochs_per_commit"] = int(epc)
# identical job across versions: newer auto-management stays OFF
for knob in ("auto_compact_files", "auto_split_bytes"):
    if knob in sig:
        kw[knob] = None
t0 = time.perf_counter()
lake = replay(clog, lake_dir, **kw)
sec = time.perf_counter() - t0
shutil.rmtree(lake_dir, ignore_errors=True)
print(json.dumps({"seconds": sec, "events": n_events,
                  "version": lake.manifest.version}))
"""


def leg(repo: str, sf: str, cpus: int, epc: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, repo, sf, str(cpus), epc],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-a", required=True, help="baseline code checkout")
    ap.add_argument("--repo-b", default="/root/repo", help="candidate code")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--epochs-per-commit",
        default="none",
        help="'none' = single commit (the bench default); 1 = many small "
        "commits, isolating per-commit fixed cost",
    )
    a = ap.parse_args()

    runs: dict[str, list[float]] = {"a": [], "b": []}
    events = None
    for i in range(a.pairs):
        for tag, repo in (("a", a.repo_a), ("b", a.repo_b)):
            r = leg(repo, a.sf, a.cpus, a.epochs_per_commit)
            runs[tag].append(round(r["seconds"], 3))
            events = r["events"]
            print(
                f"pair {i} {tag} ({repo}): {r['seconds']:.2f}s "
                f"v{r['version']}",
                file=sys.stderr,
            )
    best_a, best_b = min(runs["a"]), min(runs["b"])
    print(
        json.dumps(
            {
                "metric": "interleaved A/B cdc_replay",
                "epochs_per_commit": a.epochs_per_commit,
                "events": events,
                "a": {"repo": a.repo_a, "runs": runs["a"], "best": best_a},
                "b": {"repo": a.repo_b, "runs": runs["b"], "best": best_b},
                "b_over_a": round(best_b / best_a, 3),
                "num_cpus": a.cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
