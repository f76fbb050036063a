"""Reproduces the round-5 systemic find: Ray's sort shuffle over PANDAS
blocks pays a huge per-block fixed cost that Arrow blocks don't.

One combiner pass (per-batch pandas groupby partials) feeding a
groupby().aggregate() over ~2k keys, measured in four configurations on
the same 2M-row events projection:

    pandas blocks, block-sized batches   (the round-4 shape)
    pandas blocks, 256Ki batches
    Arrow blocks,  block-sized batches
    Arrow blocks,  256Ki batches         (the round-5 shape: arrow_out)

Usage: python tools/bench_arrow_blocks.py [--rows 2000000]
Prints one JSON line of wall seconds per configuration.
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
    ap.add_argument("--rows", type=int, default=2_000_000)
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
    from ray.data.aggregate import Max, Min, Sum

    DataContext.get_current().enable_progress_bars = False

    from sql_graph_visualizer_ray.pipelines.relational import (
        arrow_out,
        read_table,
    )

    sf = f"/tmp/bench_arrow/{a.rows}-{a.users}"
    if not os.path.exists(os.path.join(sf, "events.parquet")):
        os.makedirs(sf, exist_ok=True)
        rng = np.random.default_rng(5)
        t0 = np.datetime64("2024-01-01", "us")
        pq.write_table(
            pa.table(
                {
                    "event_id": np.arange(a.rows, dtype=np.int64),
                    "ts": t0
                    + rng.integers(0, 10**9, a.rows).astype("timedelta64[us]"),
                    "user_id": rng.integers(0, a.users, a.rows).astype(np.int64),
                }
            ),
            os.path.join(sf, "events.parquet"),
        )

    def partial_stats(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("user_id", sort=False, as_index=False).agg(
            n=("event_id", "size"), ts_lo=("ts", "min"), ts_hi=("ts", "max")
        )

    def run(fn, batch_size):
        ds = read_table(sf, "events", columns=["event_id", "ts", "user_id"])
        kw = {} if batch_size is None else {"batch_size": batch_size}
        t0 = time.time()
        n = len(
            ds.map_batches(fn, batch_format="pandas", **kw)
            .groupby("user_id")
            .aggregate(
                Sum("n", alias_name="n"),
                Min("ts_lo", alias_name="ts_lo"),
                Max("ts_hi", alias_name="ts_hi"),
            )
            .take_all()
        )
        assert n == a.users
        return round(time.time() - t0, 2)

    out = {
        "rows": a.rows,
        "keys": a.users,
        "pandas_blockbatch_s": run(partial_stats, None),
        "pandas_256k_s": run(partial_stats, 256 * 1024),
        "arrow_blockbatch_s": run(arrow_out(partial_stats), None),
        "arrow_256k_s": run(arrow_out(partial_stats), 256 * 1024),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
