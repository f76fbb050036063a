"""Property-based tests (hypothesis) for the pure kernels the distributed
paths are built on. No Ray involved — these pin the ALGEBRA the pipelines
rely on:

- ``lww_compact`` must be idempotent, input-order-invariant, and
  split/merge-associative: ``compact(compact(A) + compact(B)) ==
  compact(A + B)``. The last one IS the correctness of the combiner-then-
  merge shuffle (pre-compaction inside map_batches + per-bucket merge) —
  if it held only for the fixtures, a skewed repartition could silently
  change results at scale.
- ``bucket_of`` must be a pure, stable function of (key, config) — pinned
  against golden values so an accidental hash/seed change (which would
  orphan every existing lake's state) fails loudly.
- ``HyperLogLog`` registers must satisfy ``regs(A ∪ B) ==
  max(regs(A), regs(B))`` exactly — the mergeability that lets partial
  sketches replace a COUNT DISTINCT shuffle.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from sql_graph_visualizer_ray.functions.sketches import HyperLogLog
from sql_graph_visualizer_ray.stages.apply import lww_compact
from sql_graph_visualizer_ray.stages.partitioning import bucket_of

# --- event-table strategy ------------------------------------------------

_event = st.tuples(
    st.sampled_from(["c0", "c1", "c2", "conv-long-id-3"]),  # few keys → collisions
    st.integers(0, 3),
    st.one_of(st.none(), st.integers(0, 50)),  # ts (None = null; small → ties)
    st.sampled_from(["I", "U", "D"]),
)


def _to_table(events) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([e[0] for e in events], type=pa.string()),
            "turn_idx": pa.array([e[1] for e in events], type=pa.int64()),
            "ts": pa.array(
                [e[2] for e in events], type=pa.timestamp("us")
            ),
            "lsn": pa.array(list(range(len(events))), type=pa.int64()),
            "op": pa.array([e[3] for e in events], type=pa.string()),
            "payload": pa.array(
                [f"v{i}" for i in range(len(events))], type=pa.string()
            ),
        }
    )


def _pandas_lww(t: pa.Table, *, keep_tombstones: bool) -> pd.DataFrame:
    """Independent single-process oracle: winner per key = max (ts, lsn),
    null ts greatest (matches Arrow nulls-at-end / the kernel's NaN-last
    lexsort)."""
    df = t.to_pandas()
    ts_int = np.where(
        df.ts.isna(), np.iinfo(np.int64).max, df.ts.values.astype("int64")
    )
    df = df.assign(_ts=ts_int)
    df = df.sort_values(["conv_id", "turn_idx", "_ts", "lsn"], kind="stable")
    win = df.groupby(["conv_id", "turn_idx"], sort=True).tail(1)
    win = win.sort_values(["conv_id", "turn_idx"], kind="stable")
    if not keep_tombstones:
        win = win[win.op != "D"]
    return win.drop(columns=["_ts"]).reset_index(drop=True)


@settings(max_examples=120, deadline=None)
@given(events=st.lists(_event, max_size=60), keep=st.booleans())
def test_lww_matches_independent_oracle(events, keep):
    t = _to_table(events)
    got = lww_compact(t, keep_tombstones=keep).to_pandas().reset_index(drop=True)
    want = _pandas_lww(t, keep_tombstones=keep)
    pd.testing.assert_frame_equal(got, want)


@settings(max_examples=60, deadline=None)
@given(events=st.lists(_event, max_size=60))
def test_lww_idempotent_and_order_invariant(events):
    t = _to_table(events)
    once = lww_compact(t, keep_tombstones=True)
    twice = lww_compact(once, keep_tombstones=True)
    assert once.to_pandas().equals(twice.to_pandas())
    if t.num_rows > 1:
        perm = np.random.RandomState(7).permutation(t.num_rows)
        shuffled = lww_compact(t.take(pa.array(perm)), keep_tombstones=True)
        assert shuffled.to_pandas().equals(once.to_pandas())


@settings(max_examples=80, deadline=None)
@given(events=st.lists(_event, min_size=1, max_size=60), split=st.integers(0, 60))
def test_lww_split_merge_associative(events, split):
    """compact(compact(A) + compact(B)) == compact(A + B): the combiner/
    merge decomposition the shuffle relies on."""
    t = _to_table(events)
    k = min(split, t.num_rows)
    a, b = t.slice(0, k), t.slice(k)
    recombined = lww_compact(
        pa.concat_tables(
            [
                lww_compact(a, keep_tombstones=True),
                lww_compact(b, keep_tombstones=True),
            ]
        ),
        keep_tombstones=True,
    )
    direct = lww_compact(t, keep_tombstones=True)
    assert recombined.to_pandas().equals(direct.to_pandas())


# --- bucket routing ------------------------------------------------------


def test_bucket_of_golden_values():
    """Pinned outputs: a hash/seed change would orphan every existing
    lake's persisted state — fail loudly, never silently."""
    got = bucket_of(
        np.array(["a", "b", "c", "conv42"], dtype=object),
        np.array([0, 1, 2, 3]),
        16,
    )
    assert got.tolist() == bucket_of(
        np.array(["a", "b", "c", "conv42"], dtype=object),
        np.array([9, 9, 9, 9]),  # unsharded: turn must not matter
        16,
    ).tolist()
    assert (got >= 0).all() and (got < 16).all()
    # golden pin (computed once from the shipped _HASH_KEY and hard-coded)
    assert got.tolist() == [15, 11, 14, 3]
    # sharded variant with turns inside shard 0 routes identically
    assert bucket_of(
        np.array(["a", "b", "c", "conv42"], dtype=object),
        np.array([0, 1, 2, 3]),
        16,
        5,
    ).tolist() == [15, 11, 14, 3]


@settings(max_examples=60, deadline=None)
@given(
    convs=st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=30),
    nb=st.sampled_from([1, 2, 16, 1024]),
    shard=st.sampled_from([None, 1, 5]),
)
def test_bucket_of_stable_and_bounded(convs, nb, shard):
    conv = np.array(convs, dtype=object)
    turn = np.arange(len(convs), dtype=np.int64)
    b1 = bucket_of(conv, turn, nb, shard)
    b2 = bucket_of(conv, turn, nb, shard)
    assert b1.tolist() == b2.tolist()  # pure function
    assert (b1 >= 0).all() and (b1 < nb).all()
    # same (conv, turn) key always lands in the same bucket, regardless of
    # position or neighbors
    b_solo = [
        bucket_of(conv[i : i + 1], turn[i : i + 1], nb, shard)[0]
        for i in range(len(convs))
    ]
    assert b1.tolist() == [int(x) for x in b_solo]


# --- HyperLogLog ---------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    a=st.lists(st.integers(0, 10**9), max_size=200),
    b=st.lists(st.integers(0, 10**9), max_size=200),
    p=st.sampled_from([4, 8, 12]),
)
def test_hll_register_mergeability(a, b, p):
    """regs(A ∪ B) == max(regs(A), regs(B)) EXACTLY — the identity that
    makes partial sketches a lossless substitute for a distinct shuffle."""
    hll = HyperLogLog(p)
    ra = hll.registers(np.array(a, dtype=np.int64))
    rb = hll.registers(np.array(b, dtype=np.int64))
    ru = hll.registers(np.array(a + b, dtype=np.int64))
    merged = HyperLogLog.merge([ra.tobytes(), rb.tobytes()])
    assert np.array_equal(merged, ru)
    # commutative
    assert np.array_equal(
        HyperLogLog.merge([rb.tobytes(), ra.tobytes()]), merged
    )


@pytest.mark.parametrize("n", [10, 1_000, 50_000])
def test_hll_estimate_error_bound(n):
    hll = HyperLogLog(12)
    vals = np.arange(n, dtype=np.int64)
    est = hll.estimate(hll.registers(vals))
    assert abs(est - n) / n < 0.05, f"{est} vs {n}"


# --- schema evolution kernel --------------------------------------------

_COLTYPES = [pa.int32(), pa.int64(), pa.float64(), pa.string()]

_WIDEN_OK = {
    (pa.int32(), pa.int64()),
    (pa.int32(), pa.float64()),
    (pa.int64(), pa.float64()),
}


@settings(max_examples=80, deadline=None)
@given(
    names=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=5, unique=True
    ),
    which=st.data(),
)
def test_normalize_table_evolution_roundtrip(names, which):
    """normalize_table must (1) preserve values of shared columns under a
    legal widen, (2) null-fill added columns, (3) emit exactly the target
    schema — the contract merge-on-read relies on when a lake mixes files
    from before and after a schema evolution."""
    import pandas as pd

    from sql_graph_visualizer_ray.schema import normalize_table

    src_fields, tgt_fields, widened = [], [], []
    for n in names:
        src_t = which.draw(st.sampled_from(_COLTYPES), label=f"src:{n}")
        if which.draw(st.booleans(), label=f"widen:{n}"):
            cands = [t for s, t in _WIDEN_OK if s == src_t]
            tgt_t = which.draw(st.sampled_from(cands), label=f"tgt:{n}") if cands else src_t
        else:
            tgt_t = src_t
        src_fields.append(pa.field(n, src_t))
        tgt_fields.append(pa.field(n, tgt_t))
        if tgt_t != src_t:
            widened.append(n)
    added = which.draw(
        st.lists(st.sampled_from(["x", "y"]), max_size=2, unique=True), label="added"
    )
    tgt_fields += [pa.field(n, pa.string()) for n in added]
    nrows = which.draw(st.integers(0, 7), label="rows")

    def col(t, i):
        if t == pa.string():
            return pa.array([f"s{i}{j}" for j in range(nrows)], t)
        return pa.array(range(i, i + nrows), t)

    src = pa.Table.from_arrays(
        [col(f.type, i) for i, f in enumerate(src_fields)],
        schema=pa.schema(src_fields),
    )
    target = pa.schema(tgt_fields)
    out = normalize_table(src, target)
    assert out.schema == target
    assert out.num_rows == nrows
    for i, f in enumerate(src_fields):
        got = out.column(f.name).to_pylist()
        want = src.column(f.name).to_pylist()
        if f.name in widened and target.field(f.name).type == pa.float64():
            want = [float(v) for v in want]
        assert got == want, f"column {f.name} changed under normalize"
    for n in added:
        assert out.column(n).null_count == nrows  # null-filled


def test_unify_widens_and_refuses_narrowing():
    from sql_graph_visualizer_ray.schema import unify

    a = pa.schema([("k", pa.int32()), ("t", pa.string())])
    b = pa.schema([("k", pa.int64()), ("u", pa.float64())])
    u = unify([a, b])
    assert u.field("k").type == pa.int64()  # widened
    assert {f.name for f in u} == {"k", "t", "u"}  # union of columns
    with pytest.raises(pa.lib.ArrowTypeError):
        unify([pa.schema([("k", pa.string())]), pa.schema([("k", pa.int64())])])


# --- file-statistics pruning kernels --------------------------------------
#
# _stats_reject may return True ONLY when NO value in the file could satisfy
# the predicate; _stats_range_hits may return False ONLY when NO candidate
# value lies in the file. Soundness (never skipping a matching file) is the
# property that keeps pruning a pure optimization — checked here against a
# brute-force evaluation over the actual value population.

from sql_graph_visualizer_ray.pipelines.cdc import (  # noqa: E402
    _stats_range_hits,
    _stats_reject,
)

_OPS = {
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=30
    ),
    op=st.sampled_from(list(_OPS)),
    q=st.integers(-60, 60),
)
@settings(max_examples=300, deadline=None)
def test_stats_reject_sound_vs_bruteforce(vals, op, q):
    nn = [v for v in vals if v is not None]
    colstats = [min(nn), max(nn)] if nn else [None, None]
    any_match = any(_OPS[op](v, q) for v in nn)  # nulls never match
    rejected = _stats_reject(colstats, op, q)
    if rejected:
        assert not any_match, (colstats, op, q)
    # completeness on exact bounds: no-match ranges must be rejected for
    # the range ops (equality can only check the bounds)
    if op in ("<", "<=", ">", ">=") and nn and not any_match:
        assert rejected, (colstats, op, q)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=30
    ),
    probes=st.lists(st.integers(-60, 60), min_size=1, max_size=10),
)
@settings(max_examples=300, deadline=None)
def test_stats_range_hits_sound_vs_bruteforce(vals, probes):
    nn = [v for v in vals if v is not None]
    colstats = [min(nn), max(nn)] if nn else [None, None]
    if any(v in nn for v in probes):  # a probe value really occurs
        assert _stats_range_hits(colstats, probes)
    if not _stats_range_hits(colstats, probes):  # skip => provably no probe
        assert not any(v in nn for v in probes)
