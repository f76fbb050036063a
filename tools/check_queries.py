"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf against its oracle_sql() via DuckDB and compare
row-count + schema-width + order-insensitive value hash.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canonical_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    rows = df.astype(str).agg("|".join, axis=1).sort_values()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    # oracle_sql() is the DRIVER's contract and bakes sf0.01 fixture paths
    # into the cdc-family SQL (the driver always runs at sf0.01). For a
    # local sweep at another sf, rebuild the SQL against THAT sf so the
    # changelog-fixture paths match the Ray side.
    from sql_graph_visualizer_ray.pipelines.queries import build_oracle_sql

    sqls = build_oracle_sql(sf_dir)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ray_t = time.time() - t0
        if name not in sqls:
            print(f"rows-only  {name}: {len(got)} rows ({ray_t:.1f}s)")
            continue
        try:
            want = con.execute(sqls[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL raised {e}")
            failures.append(name)
            continue
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and canonical_hash(got) == canonical_hash(want)
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        print(
            f"{status} {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} ({ray_t:.1f}s)"
        )
        if status.startswith("FAIL"):
            failures.append(name)
            if not ok_cols:
                print(f"    got cols:  {sorted(got.columns)}")
                print(f"    want cols: {sorted(want.columns)}")
            elif ok_rows and not ok_hash:
                merged_g = got[sorted(got.columns)].head(3)
                merged_w = want[sorted(want.columns)].head(3)
                print("    got sample:\n", merged_g.to_string())
                print("    want sample:\n", merged_w.to_string())
    ray.shutdown()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
