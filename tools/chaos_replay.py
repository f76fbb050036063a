"""Chaos harness: kill a replay at RANDOM wall-clock points, resume, and
verify the lake equals the sequential oracle — evidence that the commit
protocol survives arbitrary crash windows (mid-spill, mid-merge, between
the version-dir rename and the manifest save), not just the between-epoch
kills the unit tests stage deliberately.

Each iteration forks a child that replays one epoch per commit; the parent
SIGKILLs it after a uniformly random delay. After ``--iters`` kills, a
final un-killed run completes the replay and the lake's merged state is
compared row-for-row against the single-process oracle. Any divergence or
unexpected child error fails loudly.

Usage: python tools/chaos_replay.py [--iters 8] [--events 60000] [--seed 1]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import os, sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from sql_graph_visualizer_ray.pipelines.cdc import LakeTable
clog, lake_dir, shuffle = sys.argv[1], sys.argv[2], sys.argv[3]
lake = LakeTable.open(lake_dir, num_buckets=8)
conflicts = []
# the one-liner multi-writer protocol: commit_with_retry owns reload/retry
while True:
    c = lake.commit_with_retry(
        lambda lk: lk.apply(clog, max_epochs=1, shuffle=shuffle),
        max_attempts=64,
        on_conflict=conflicts.append,
    )
    if not c.get("epochs"):
        break
print("COMPLETE", lake.manifest.version, "conflicts", len(conflicts))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--events", type=int, default=60_000)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--workdir", default="/tmp/chaos_replay")
    ap.add_argument(
        "--writers",
        type=int,
        default=1,
        help="concurrent writer PROCESSES per iteration (each its own Ray "
        "cluster) racing the commit CAS with the reload/retry protocol; "
        "one of them is the random-kill victim",
    )
    a = ap.parse_args()

    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )

    clog = materialize(
        f"chaos-{a.events}-{a.seed}",
        ChangelogSpec(
            n_events=a.events,
            n_convs=max(50, a.events // 40),
            n_epochs=a.epochs,
            seed=a.seed,
        ),
    )
    lake_dir = os.path.join(a.workdir, f"lake-{a.events}-{a.seed}")
    subprocess.run(["rm", "-rf", lake_dir], check=True)
    rng = random.Random(a.seed)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    kills = []
    for i in range(a.iters):
        shuffle = rng.choice(["sort", "spill"])
        victim = subprocess.Popen(
            [sys.executable, "-c", CHILD, clog, lake_dir, shuffle],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        # optional peer writers racing the victim through the commit CAS
        peers = [
            subprocess.Popen(
                [sys.executable, "-c", CHILD, clog, lake_dir, rng.choice(["sort", "spill"])],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
            )
            for _ in range(a.writers - 1)
        ]
        # kill anywhere inside the run: Ray startup (~3s) + commit work
        delay = rng.uniform(2.0, 9.0)
        entry = {"iter": i, "shuffle": shuffle}
        try:
            victim.communicate(timeout=delay)
            entry["outcome"] = "completed"  # finished before the axe fell
        except subprocess.TimeoutExpired:
            victim.send_signal(signal.SIGKILL)
            victim.wait()
            entry["killed_after_s"] = round(delay, 2)
        for p in peers:
            out, _ = p.communicate(timeout=300)
            if b"conflicts" in out:
                entry.setdefault("peer_conflicts", []).append(
                    int(out.split()[-1])
                )
        kills.append(entry)
        if entry.get("outcome") == "completed":
            break
        time.sleep(0.5)

    # final clean run to completion
    done = subprocess.run(
        [sys.executable, "-c", CHILD, clog, lake_dir, "sort"],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert done.returncode == 0, done.stderr[-2000:]
    assert "COMPLETE" in done.stdout, done.stdout

    # verify against the single-process oracle (no Ray needed driver-side
    # for the oracle; lake read via final_table needs Ray)
    verify = subprocess.run(
        [
            sys.executable,
            "-c",
            r"""
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow.compute as pc
from sql_graph_visualizer_ray.pipelines.cdc import LakeTable
from sql_graph_visualizer_ray.pipelines.oracle import replay_oracle
clog, lake_dir = sys.argv[1], sys.argv[2]
def canonical(t):
    t = t.select(sorted(t.column_names))
    return t.take(pc.sort_indices(t, sort_keys=[("conv_id","ascending"),("turn_idx","ascending")]))
got = canonical(LakeTable.open(lake_dir, num_buckets=8).final_table())
want = canonical(replay_oracle(clog))
assert got.num_rows == want.num_rows, (got.num_rows, want.num_rows)
assert got.equals(want), "state diverged from oracle"
print("VERIFIED", got.num_rows)
""",
            clog,
            lake_dir,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert verify.returncode == 0, verify.stderr[-2000:]
    print(
        json.dumps(
            {
                "metric": "chaos replay (random SIGKILL + resume)",
                "kills": kills,
                "verified": verify.stdout.strip(),
            }
        )
    )


if __name__ == "__main__":
    main()
