"""Serving-path cost evidence: point-lookup latency vs full-scan on a lake.

Builds a lake from a synthetic changelog (size via --events), then measures:
- ``lookup([one conv])`` — must open ONE bucket's files and read only the
  row groups whose conv_id stats match (files are key-sorted);
- ``lookup`` of a 100-key batch;
- ``read_final().count()`` full scan for contrast.

The interesting number is the RATIO: lookup cost must stay flat as the lake
grows (it is O(requested keys)), while the scan grows linearly. Run with
two --events values to see it.

Usage: python tools/bench_lookup.py [--events 2000000] [--buckets 64]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument(
        "--delta-files",
        type=int,
        default=1,
        dest="delta_files",
        help="commits per lake build (files per bucket before compaction) "
        "- measures merge-on-read amplification on the serving path",
    )
    ap.add_argument(
        "--wide-text",
        type=int,
        default=0,
        dest="wide_text",
        help="max text bytes per row (0 = fixture default 400): the "
        "wide-payload variant confirms row-group pruning still carries the "
        "serving path when one row group is ~100 MB",
    )
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
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )

    n_convs = max(100, a.events // 40)
    spec_kw = {}
    if a.wide_text:
        spec_kw["max_text_len"] = a.wide_text
    clog = materialize(
        f"benchlookup-{a.events}-w{a.wide_text}",
        ChangelogSpec(
            n_events=a.events, n_convs=n_convs, n_epochs=4, seed=7, **spec_kw
        ),
    )
    lake_dir = (
        f"/tmp/bench_lookup/lake-{a.events}-{a.buckets}"
        f"-d{a.delta_files}-w{a.wide_text}"
    )
    if not os.path.exists(os.path.join(lake_dir, "MANIFEST.json")):
        t0 = time.time()
        replay(
            clog,
            lake_dir,
            num_buckets=a.buckets,
            shuffle="spill",
            # one commit -> one file per bucket; N commits -> N delta files
            epochs_per_commit=(
                None if a.delta_files <= 1 else max(1, 4 // a.delta_files)
            ),
            # pin the measured layout: auto-management would silently
            # compact/split away the exact num_buckets/delta-files
            # configuration this benchmark reports
            auto_compact_files=None,
            auto_split_bytes=None,
        )
        print(f"# built lake in {time.time() - t0:.1f}s", file=sys.stderr)
    lake = LakeTable.open(lake_dir, num_buckets=a.buckets)
    rows = sum(b["rows"] for b in lake.manifest.data["buckets"].values())

    some = [f"conv{i:08d}" for i in range(0, n_convs, max(1, n_convs // 200))]

    def timed(fn, reps):
        xs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            xs.append(time.perf_counter() - t0)
        return statistics.median(xs) * 1000  # ms

    one_ms = timed(lambda: lake.lookup([some[3]]), a.reps)
    batch_ms = timed(lambda: lake.lookup(some[:100]), max(3, a.reps // 4))

    # predicate fetch (searchNodes analogue). Two selectivity regimes:
    # - selective (~1 matching row, the serving design point): ts equality
    #   on a live row's timestamp;
    # - broad (~2.5% of rows): turn_idx equality — past this the distributed
    #   batch scan wins and max_result_keys is the guard rail.
    probe = lake.lookup([some[3]])
    probe_ts = probe.column("ts")[0].as_py()
    sel_search_ms = timed(
        lambda: lake.search("ts", "==", probe_ts), max(3, a.reps // 4)
    )
    sel_rows = lake.search("ts", "==", probe_ts).num_rows
    spec_turns = 40
    search_ms = timed(
        lambda: lake.search(
            "turn_idx", "==", spec_turns - 1, max_result_keys=1_000_000
        ),
        max(3, a.reps // 4),
    )
    t0 = time.perf_counter()
    search_scan_rows = (
        lake.read_final().filter(expr=f"turn_idx == {spec_turns - 1}").count()
    )
    search_scan_ms = (time.perf_counter() - t0) * 1000

    t0 = time.perf_counter()
    scan_rows = lake.read_final().count()
    scan_ms = (time.perf_counter() - t0) * 1000

    print(
        json.dumps(
            {
                "metric": "point lookup vs full scan",
                "lake_rows": rows,
                "max_text_len": a.wide_text or 400,
                "lake_bytes": sum(lake.bucket_bytes().values()),
                "num_buckets": a.buckets,
                "lookup_1key_ms_p50": round(one_ms, 2),
                "lookup_100key_ms_p50": round(batch_ms, 2),
                "search_selective_ms_p50": round(sel_search_ms, 2),
                "search_selective_rows": sel_rows,
                "search_broad_ms_p50": round(search_ms, 2),
                "search_batch_scan_ms": round(search_scan_ms, 1),
                "search_scan_rows": search_scan_rows,
                "full_scan_ms": round(scan_ms, 1),
                "scan_over_lookup": round(scan_ms / one_ms, 1),
                "scan_rows": scan_rows,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
