"""Stable hash partitioning + hot-key (skew) handling.

The reference has no partitioning at all (single process, SURVEY.md §4.1); at
100 TB the bucket function IS the design. Requirements:

- **Stable across processes and runs** — lake state written by run N must land
  in the same bucket as new events for the same key in run N+1, so we use a
  seeded siphash (``pandas.util.hash_array`` with a fixed key), never Python's
  salted ``hash()``.
- **Giant-conversation splitting** — an optional ``turn_shard_size`` sub-keys
  a conversation by ``turn_idx // turn_shard_size`` so a single hot ``conv_id``
  with millions of turns cannot pin one partition. Every ``(conv_id,
  turn_idx)`` merge key still maps to exactly one bucket, so LWW correctness
  is unaffected. The value is fixed at table creation and recorded in the
  manifest (changing it would orphan state).
- **Pre-shuffle salting** — independent of the home bucket, the pre-compaction
  combiner can fan hot keys over many sub-groups (see pipelines/cdc.py);
  that's a volume optimization and never changes the home bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "graft_cdc_bucket"  # fixed 16-byte siphash key -> run-stable


def conv_hash(conv_id: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of a conv_id object array."""
    return pd.util.hash_array(np.asarray(conv_id, dtype=object), hash_key=_HASH_KEY)


def bucket_of(
    conv_id: np.ndarray,
    turn_idx: np.ndarray,
    num_buckets: int,
    turn_shard_size: int | None = None,
) -> np.ndarray:
    """int32 bucket ids for each row; pure function of key + table config."""
    h = conv_hash(conv_id)
    if turn_shard_size:
        shard = (np.asarray(turn_idx, dtype=np.int64) // turn_shard_size).astype(np.uint64)
        h = h ^ (shard * np.uint64(0x9E3779B97F4A7C15))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def add_bucket_column(
    table: pa.Table, num_buckets: int, turn_shard_size: int | None = None
) -> pa.Table:
    conv = table.column("conv_id").to_numpy(zero_copy_only=False)
    turn = table.column("turn_idx").to_numpy(zero_copy_only=False)
    b = bucket_of(conv, turn, num_buckets, turn_shard_size)
    if "_bucket" in table.column_names:
        table = table.drop_columns(["_bucket"])
    return table.append_column("_bucket", pa.array(b, type=pa.int32()))
