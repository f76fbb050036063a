"""Evidence for the delta-commit design: wall-time of a SMALL commit against
lakes of growing size, delta mode vs rewrite mode.

Builds a lake of N events, then times one ~20k-event commit on top of it.
Under ``commit_mode="delta"`` the commit writes only per-bucket delta files
(IO ~ delta); under ``"rewrite"`` every touched bucket's full state rewrites
(IO ~ table). Prints one JSON line per (base_size, mode); BASELINE.md records
the result.

Usage: python tools/bench_commit_cost.py [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--sizes", default="200000,2000000")
    ap.add_argument("--delta", type=int, default=20000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import ray

    ray.init(
        address="local", num_cpus=args.cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    rd.range(args.cpus * 2).map_batches(lambda b: b).materialize()  # warm pool

    from sql_graph_visualizer_ray.pipelines.cdc import LakeTable
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )

    results = []
    for base_n in (int(s) for s in args.sizes.split(",")):
        n_epochs = max(2, base_n // args.delta)
        spec = ChangelogSpec(
            n_events=base_n, n_convs=max(100, base_n // 20),
            n_epochs=n_epochs, seed=42,
        )
        clog = materialize(f"commitcost-{base_n}", spec)
        for mode in ("delta", "rewrite"):
            best = None
            for _ in range(args.reps):
                lake_dir = f"/tmp/graft_bench/commitcost/{base_n}-{mode}"
                shutil.rmtree(lake_dir, ignore_errors=True)
                lake = LakeTable.open(lake_dir, num_buckets=64)
                # base: every epoch but the last, as one big commit
                lake.apply(clog, upto_epoch=n_epochs - 2, commit_mode=mode)
                base_rows = sum(
                    b["rows"] for b in lake.manifest.data["buckets"].values()
                )
                t0 = time.perf_counter()
                c = lake.apply(clog, commit_mode=mode)  # the small commit
                sec = time.perf_counter() - t0
                best = sec if best is None else min(best, sec)
                delta_events = c["raw_events"]
            results.append(
                {
                    "base_events": base_n,
                    "base_rows": base_rows,
                    "delta_events": delta_events,
                    "mode": mode,
                    "commit_sec": round(best, 3),
                }
            )
            print(json.dumps(results[-1]), flush=True)
    # headline ratio: rewrite commit slowdown at the biggest base vs delta
    big = max(r["base_events"] for r in results)
    d = next(r for r in results if r["base_events"] == big and r["mode"] == "delta")
    w = next(r for r in results if r["base_events"] == big and r["mode"] == "rewrite")
    small_d = next(
        r
        for r in results
        if r["base_events"] == min(x["base_events"] for x in results)
        and r["mode"] == "delta"
    )
    print(
        json.dumps(
            {
                "metric": "small-commit wall-time: delta vs rewrite at "
                f"{big} base events",
                "delta_sec": d["commit_sec"],
                "rewrite_sec": w["commit_sec"],
                "rewrite_over_delta": round(w["commit_sec"] / d["commit_sec"], 2),
                "delta_growth_small_to_big_base": round(
                    d["commit_sec"] / small_d["commit_sec"], 2
                ),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
