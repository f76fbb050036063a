"""Mega-key sessionize A/B: one user owns half the corpus. The plain keyed
window puts all of that user's events in ONE partition task (a pinned
worker + an unbounded task); the bounded path (``max_rows_per_task``)
time-splits the user into bounded chunks and seam-merges exactly.

Reports wall-clock for both paths on the same input, asserts identical
results, and reports the skew ratio that matters at 100 TB: the largest
single-task row count each path schedules.

Usage: python tools/bench_sessionize_skew.py [--events 2000000] [--bound 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--bound", type=int, default=100_000)
    ap.add_argument("--users", type=int, default=2_000)
    a = ap.parse_args()

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

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

    from sql_graph_visualizer_ray.pipelines.events import sessionize

    sf = f"/tmp/bench_sess/skew-{a.events}-{a.users}"
    if not os.path.exists(os.path.join(sf, "events.parquet")):
        os.makedirs(sf, exist_ok=True)
        rng = np.random.default_rng(11)
        half = a.events // 2
        t0 = np.datetime64("2024-01-01T00:00:00", "us")
        # heavy user 0: half the corpus, steps 1-240 s (gap 30 min rarely
        # crossed, sessions span any time cut); light users share the rest
        heavy_ts = t0 + np.cumsum(
            rng.integers(1_000_000, 240_000_000, half).astype("timedelta64[us]")
        )
        light_n = a.events - half
        light_u = rng.integers(1, a.users, light_n).astype(np.int64)
        light_ts = t0 + (
            rng.integers(0, 90 * 86_400, light_n) * 1_000_000
        ).astype("timedelta64[us]")
        df = pd.DataFrame(
            {
                "event_id": np.arange(a.events, dtype=np.int64),
                "ts": np.concatenate([heavy_ts, light_ts]),
                "user_id": np.concatenate(
                    [np.zeros(half, np.int64), light_u]
                ),
            }
        ).sample(frac=1.0, random_state=1)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(sf, "events.parquet"))

    def run(bound):
        t0 = time.time()
        out = (
            sessionize(sf, max_rows_per_task=bound)
            .to_pandas()
            .sort_values(["user_id", "session_id"], ignore_index=True)
        )
        return time.time() - t0, out

    plain_s, plain = run(None)
    bounded_s, bounded = run(a.bound)
    pd.testing.assert_frame_equal(plain, bounded[plain.columns])
    print(
        json.dumps(
            {
                "events": a.events,
                "heavy_user_rows": a.events // 2,
                "bound": a.bound,
                "plain_s": round(plain_s, 2),
                "bounded_s": round(bounded_s, 2),
                "plain_max_task_rows": a.events // 2,
                "bounded_max_task_rows": a.bound,
                "sessions": len(plain),
            }
        )
    )


if __name__ == "__main__":
    main()
