"""String-statistics A/B (`compact --string-stats`): serving-path cost of a
string-range search across four lake states on the same data —

  A. stats stripped entirely (pre-stats lake)
  B. after `backfill_stats` (numeric/ts bounds only — strings skipped:
     parquet footer string bounds may be truncated)
  E. after `backfill_string_stats` (exact string bounds recorded by a
     column-pruned read of the gap files, ORIGINAL file layout kept)
  C. after `compact_for_string_stats` (write-time exact string bounds,
     but a bucket's delta files merge — their string ranges UNION, so on
     hash-mixed buckets the merged bounds prune nothing)
  D. state C's files with stats stripped again — isolates the stats skip
     from the compaction's file-count reduction

Expected shape: E scans only the commit whose prefix range matches (the
big win); C ≈ D (compaction's gain here is file count, not string stats).

The lake is built with per-commit DISJOINT name prefixes on a payload
string column (the realistic shape: each ingest epoch covers a key/entity
range), so a prefix-range predicate provably misses most files once exact
string bounds exist.

Usage: python tools/bench_string_stats.py [--rows 2000000] [--buckets 64]
Prints one JSON line of median latencies (ms) + files scanned in phase 1.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PREFIXES = ["alpha", "bravo", "china", "delta"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--reps", type=int, default=9)
    a = ap.parse_args()

    import numpy as np
    import pyarrow as pa

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from sql_graph_visualizer_ray.pipelines import cdc
    from sql_graph_visualizer_ray.pipelines.cdc import LakeTable

    pristine = f"/tmp/bench_sstats/pristine-{a.rows}-{a.buckets}"
    lake_dir = f"/tmp/bench_sstats/work-{a.rows}-{a.buckets}"
    per = a.rows // len(PREFIXES)
    if not os.path.exists(os.path.join(pristine, "MANIFEST.json")):
        t0 = time.time()
        lk = LakeTable.open(pristine, num_buckets=a.buckets)
        base = dt.datetime(2024, 1, 1)
        for ep, pref in enumerate(PREFIXES):
            ids = np.arange(per, dtype=np.int64)
            t = pa.table(
                {
                    "lsn": pa.array(ep * per + ids),
                    "epoch": pa.array(np.full(per, ep, np.int32)),
                    "op": pa.array(["I"] * per),
                    "conv_id": pa.array(
                        [f"conv{ep}_{i:08d}" for i in range(per)]
                    ),
                    "turn_idx": pa.array(np.zeros(per, np.int32)),
                    "role": pa.array(["user"] * per),
                    # the searched payload column: commit-disjoint prefix
                    "text": pa.array([f"{pref} item {i}" for i in range(per)]),
                    "tool": pa.array([None] * per, pa.string()),
                    "ts": pa.array(
                        [base + dt.timedelta(seconds=int(i)) for i in ids]
                    ),
                }
            )
            lk.apply_dataset(rd.from_arrow(t), epoch=ep)
        print(f"# built lake in {time.time() - t0:.1f}s", file=sys.stderr)

    # the benchmark MUTATES its lake (backfills, compaction): always start
    # from a fresh copy of the pristine build
    import shutil

    shutil.rmtree(lake_dir, ignore_errors=True)
    shutil.copytree(pristine, lake_dir)

    # selective probe: ONE row, inside the last commit's prefix range —
    # pre-stats every file must be scanned for it; with exact string
    # bounds only that commit's files survive phase 1
    probe = ("text", "==", f"{PREFIXES[-1]} item {per // 3}")

    def timed(lk):
        import pyarrow.dataset as pads
        from unittest import mock

        scanned = []
        real = pads.dataset

        def spy(paths, *g, **kw):
            if not scanned:
                scanned.append(len(paths))
            return real(paths, *g, **kw)

        xs = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            n = lk.search(*probe).num_rows
            xs.append(time.perf_counter() - t0)
        with mock.patch.object(pads, "dataset", side_effect=spy):
            assert lk.search(*probe).num_rows == n
        return round(statistics.median(xs) * 1000, 1), scanned[0], n

    def strip(lk):
        for b in lk.manifest.data["buckets"].values():
            b.pop("stats", None)
            b.pop("footer_stats", None)
        lk.manifest.save_atomic(lk.path)
        return LakeTable.open(lk.path)

    out = {"rows": a.rows, "buckets": a.buckets, "match_rows": per}
    lk = strip(LakeTable.open(lake_dir))
    out["A_stripped_ms"], out["A_files"], n_a = timed(lk)
    lk.backfill_stats()
    out["B_backfilled_ms"], out["B_files"], n_b = timed(lk)
    gaps = lk.string_stats_gaps()
    out["gap_files"] = sum(len(v) for v in gaps.values())
    t0 = time.time()
    lk.backfill_string_stats()
    out["string_backfill_s"] = round(time.time() - t0, 1)
    out["E_string_backfill_ms"], out["E_files"], n_e = timed(lk)
    assert lk.string_stats_gaps() == {}
    t0 = time.time()
    # force the compact path for the C/D contrast: re-strip so the gap
    # detector flags every file again
    lk = strip(lk)
    lk.backfill_stats()
    lk.compact_for_string_stats()
    out["targeted_compact_s"] = round(time.time() - t0, 1)
    out["C_string_stats_ms"], out["C_files"], n_c = timed(lk)
    lk = strip(lk)
    out["D_compacted_stripped_ms"], out["D_files"], n_d = timed(lk)
    assert n_a == n_b == n_e == n_c == n_d == 1, (n_a, n_b, n_e, n_c, n_d)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
