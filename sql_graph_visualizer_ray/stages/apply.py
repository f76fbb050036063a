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

Hot-path design: everything happens in INDEX SPACE. The string key is rank-
encoded once (``unique`` + ``index_in``), the winner per key is found with a
single ``np.lexsort`` over four int64 arrays, and only the surviving rows are
gathered from the original table — the wide ``text`` payload is copied
exactly once, never for losers. The previous version materialized a fully
sorted copy of the whole table before filtering; on an 8M-row batch that is
~2.4 GB of pointless string movement per merge pass.

No Python loop touches a row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: hidden column carrying partial late-event counts through the shuffle
#: (the combiner drops superseded rows, so lateness must be tallied where the
#: rows still exist and the partial sums carried along — same pattern as any
#: pre-aggregated counter)
LATE_COL = "_late"


def _int_key_arrays(
    table: pa.Table,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(conv_rank, turn, ts_us, lsn) int64 views of the merge/order columns.

    ``conv_rank`` is the LEXICOGRAPHIC rank of conv_id within this table, so
    sorting by it is identical to sorting by the string itself — but integer-
    cheap. Null ``ts`` becomes NaN under the float view numpy produces, which
    lexsort places last — the same winner semantics as Arrow's nulls-at-end.
    """
    conv = table.column("conv_id").combine_chunks()
    uniq = pc.unique(conv)
    uniq_sorted = uniq.take(pc.sort_indices(uniq))
    codes = (
        pc.index_in(conv, value_set=uniq_sorted)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    turn = table.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False)
    ts = (
        pc.cast(table.column("ts").combine_chunks(), pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    lsn = table.column("lsn").combine_chunks().to_numpy(zero_copy_only=False)
    return codes, turn, ts, lsn


def _winner_indices(
    codes: np.ndarray, turn: np.ndarray, ts: np.ndarray, lsn: np.ndarray
) -> np.ndarray:
    """Row indices of the winning version per (conv, turn), in (conv, turn)
    output order. Winner = max (ts, lsn) within the key."""
    order = np.lexsort((lsn, ts, turn, codes))
    c = codes[order]
    t = turn[order]
    boundary = np.empty(len(c), dtype=bool)
    if len(c):
        boundary[:-1] = (c[:-1] != c[1:]) | (t[:-1] != t[1:])
        boundary[-1] = True
    return order[boundary]


def lww_compact(table: pa.Table, *, keep_tombstones: bool) -> pa.Table:
    """Keep the winning version per ``(conv_id, turn_idx)``.

    Winner = max ``(ts, lsn)``. Output is sorted by ``(conv_id, turn_idx)``
    (the stable-turn-ordering invariant comes for free from the rank-encoded
    merge sort). With ``keep_tombstones=True`` the winning "D" rows are
    retained (needed when the result feeds a later merge); with ``False``
    they are dropped (final read view).
    """
    if table.num_rows == 0:
        return table
    codes, turn, ts, lsn = _int_key_arrays(table)
    winners = _winner_indices(codes, turn, ts, lsn)
    out = table.take(pa.array(winners))
    if not keep_tombstones:
        out = out.filter(pc.not_equal(out.column("op"), pa.scalar("D")))
    return out


def _count_late_arrays(
    codes: np.ndarray, turn: np.ndarray, ts: np.ndarray, lsn: np.ndarray
) -> int:
    """Late events: ts < running max ts over the key's events in lsn order."""
    n = len(codes)
    if n == 0:
        return 0
    order = np.lexsort((lsn, turn, codes))
    c = codes[order]
    t = turn[order]
    v = ts[order]
    # exact integer space: microsecond timestamps near 1.7e15 lose sub-second
    # ulps under float64 once a big segment offset is added, so the running
    # max is computed as a segmented int64 cummax (pandas' cythonized grouped
    # cummax — segments are contiguous after the lexsort). Null ts (tombstone
    # rows) arrive as NaN under numpy's float view: they never count as late
    # and never raise the running max (sentinel INT64_MIN).
    if v.dtype.kind == "f":
        valid = ~np.isnan(v)
        vi = np.where(valid, v, float(np.iinfo(np.int64).min)).astype(np.int64)
    else:
        valid = np.ones(n, dtype=bool)
        vi = v.astype(np.int64)
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    new_key[1:] = (c[1:] != c[:-1]) | (t[1:] != t[:-1])
    seg_id = np.cumsum(new_key) - 1
    import pandas as pd

    run_max = pd.Series(vi).groupby(seg_id).cummax().to_numpy()
    # a row is late iff some EARLIER-lsn row in the same key has greater ts
    sentinel = np.iinfo(np.int64).min
    prev_max = np.concatenate(([sentinel], run_max[:-1]))
    prev_max[new_key] = sentinel
    return int(np.sum(valid & (vi < prev_max)))


def count_late(table: pa.Table) -> int:
    """Events whose arrival order (lsn) disagrees with event time within a
    key — the "late data" lineage counter (SURVEY.md §2.9)."""
    if table.num_rows == 0:
        return 0
    return _count_late_arrays(*_int_key_arrays(table))


def compact_with_lineage(table: pa.Table, *, keep_tombstones: bool = True) -> pa.Table:
    """``lww_compact`` + late-event accounting across multi-stage compaction.

    Late = an event that sorts before already-seen data for its key (arrival
    order ``lsn`` disagrees with event time ``ts`` — SURVEY.md §2.9). Partial
    counts ride in ``LATE_COL`` on the first output row and sum across
    stages.

    Counter contract — telemetry, LOWER BOUND, never an overcount: a
    same-key (earlier, later) pair is counted in the stage where both rows
    co-occur, and at most once (the loser is dropped afterwards, so no later
    stage re-pairs them). Pairs whose late member was ALREADY dropped by an
    earlier stage before meeting its earlier-lsn partner (the partner lived
    in a different batch) are unobservable and NOT counted — exact cross-
    stage counting would require carrying every dropped row's (lsn, ts),
    defeating compaction. The count is exact whenever each key's events of a
    commit arrive within one combiner batch (the common case: epoch files
    are written in key order). Final-state correctness never depends on this
    counter.

    ``keep_tombstones`` must remain True: winning "D" rows both carry the
    partial counts and are required by every later merge stage (the lineage
    variant only runs mid-pipeline; final read views use ``lww_compact``).

    Key arrays are extracted once and shared by the late counter and the
    winner selection — one string rank-encode, two int lexsorts, one gather
    of survivors.
    """
    if not keep_tombstones:
        raise ValueError(
            "compact_with_lineage requires keep_tombstones=True (dropping "
            "winning tombstones can drop the row carrying the late count); "
            "use lww_compact for the final read view"
        )
    prior = 0
    if LATE_COL in table.column_names:
        prior = int(pc.sum(table.column(LATE_COL)).as_py() or 0)
        table = table.drop_columns([LATE_COL])
    if table.num_rows == 0:
        return table.append_column(LATE_COL, pa.array([], type=pa.int64()))
    codes, turn, ts, lsn = _int_key_arrays(table)
    new = _count_late_arrays(codes, turn, ts, lsn)
    winners = _winner_indices(codes, turn, ts, lsn)
    out = table.take(pa.array(winners))
    late = np.zeros(out.num_rows, dtype=np.int64)
    if out.num_rows:
        late[0] = prior + new
    return out.append_column(LATE_COL, pa.array(late, type=pa.int64()))
