"""Last-writer-wins merge kernels (pure pyarrow/numpy, fully vectorized).

Reference semantics being generalized: ``AddNode`` finds an existing node by
key and *overwrites its properties* — last writer wins by arrival order
(``/root/reference/internal/domain/aggregates/graph/graph_aggregate.go:46-59``).
We make the order explicit: winner per key ``(conv_id, turn_idx)`` is the
event with the greatest ``(ts, lsn)``; an op of ``"D"`` is a tombstone that
masks every earlier version (the reference's full-refresh delete,
``/root/reference/cmd/main.go:173``, made keyed and incremental).

These kernels run in three places:
- per-batch pre-compaction inside ``map_batches`` (combiner before the
  shuffle — at 100 TB this is what keeps the all-to-all exchange small),
- per-bucket merge inside ``groupby(bucket).map_groups`` / the apply actors,
- the single-process oracle used by the correctness tests.

No Python loop touches a row: sort + run-boundary detection over numpy views.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SORT_KEYS = [
    ("conv_id", "ascending"),
    ("turn_idx", "ascending"),
    ("ts", "ascending"),
    ("lsn", "ascending"),
]


def _key_codes(table: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(conv_codes, turn) integer views of the merge key, cheap to compare."""
    conv = table.column("conv_id").combine_chunks()
    codes = pc.dictionary_encode(conv).indices.to_numpy(zero_copy_only=False)
    turn = table.column("turn_idx").to_numpy(zero_copy_only=False)
    return codes, turn


def lww_compact(table: pa.Table, *, keep_tombstones: bool) -> pa.Table:
    """Keep the winning version per ``(conv_id, turn_idx)``.

    Winner = max ``(ts, lsn)``. Output is sorted by ``(conv_id, turn_idx)``
    (the stable-turn-ordering invariant comes for free from the merge sort).
    With ``keep_tombstones=True`` the winning "D" rows are retained (needed
    when the result feeds a later merge); with ``False`` they are dropped
    (final read view).
    """
    if table.num_rows == 0:
        return table
    idx = pc.sort_indices(table, sort_keys=_SORT_KEYS)
    t = table.take(idx)
    codes, turn = _key_codes(t)
    n = len(codes)
    # row i is the last of its key-run iff key(i) != key(i+1)
    boundary = (codes[:-1] != codes[1:]) | (turn[:-1] != turn[1:])
    winners = np.append(boundary, True)
    out = t.filter(pa.array(winners))
    if not keep_tombstones:
        out = out.filter(pc.not_equal(out.column("op"), pa.scalar("D")))
    return out


#: hidden column carrying partial late-event counts through the shuffle
#: (the combiner drops superseded rows, so lateness must be tallied where the
#: rows still exist and the partial sums carried along — same pattern as any
#: pre-aggregated counter)
LATE_COL = "_late"


def compact_with_lineage(table: pa.Table, *, keep_tombstones: bool) -> pa.Table:
    """``lww_compact`` + late-event accounting that survives multi-stage
    compaction.

    Late = an event that sorts before already-seen data for its key (arrival
    order ``lsn`` disagrees with event time ``ts`` — SURVEY.md §2.9). Each
    same-key (earlier, later) pair co-occurs in exactly one compaction stage
    (the loser is dropped afterwards), so summing per-stage counts never
    double-counts. Counts ride in ``LATE_COL`` on the first output row.
    """
    prior = 0
    if LATE_COL in table.column_names:
        prior = int(pc.sum(table.column(LATE_COL)).as_py() or 0)
        table = table.drop_columns([LATE_COL])
    new = count_late(table)
    out = lww_compact(table, keep_tombstones=keep_tombstones)
    late = np.zeros(out.num_rows, dtype=np.int64)
    if out.num_rows:
        late[0] = prior + new
    return out.append_column(LATE_COL, pa.array(late, type=pa.int64()))


def count_late(table: pa.Table) -> int:
    """Events whose arrival order (lsn) disagrees with event time within a key:
    ts < running max ts over the key's events in lsn order. This is the
    "late data" lineage counter."""
    if table.num_rows == 0:
        return 0
    idx = pc.sort_indices(
        table,
        sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending"), ("lsn", "ascending")],
    )
    t = table.take(idx)
    codes, turn = _key_codes(t)
    ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    new_key = np.empty(len(codes), dtype=bool)
    new_key[0] = True
    new_key[1:] = (codes[1:] != codes[:-1]) | (turn[1:] != turn[:-1])
    # segmented running max: subtract a huge offset at each key start so the
    # accumulate never bleeds across keys
    seg_id = np.cumsum(new_key) - 1
    offset = seg_id.astype(np.float64) * 1e18
    run_max = np.maximum.accumulate(ts + offset) - offset
    # a row is late iff some EARLIER-lsn row in the same key has greater ts
    prev_max = np.concatenate(([-np.inf], run_max[:-1]))
    prev_max[new_key] = -np.inf
    return int(np.sum(ts < prev_max))
