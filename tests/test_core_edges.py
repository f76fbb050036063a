"""Core-layer edge cases pinned by the round-5 review: history-segment
overlap dedup, same-epoch edge-event determinism (forward == reverse),
and epoch-file ordering past the filename padding."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from sql_graph_visualizer_ray.pipelines.cdc import LakeTable
from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake
from sql_graph_visualizer_ray.sources.changelog import (
    ChangelogSpec,
    epoch_files,
    materialize,
    spec_for,
)


def test_history_after_dedupes_overlapping_segments(ray_session, tmp_path):
    """A crash between a history roll and the manifest publish leaves the
    rolled entries both in an orphan segment and in the manifest tail (and
    the next roll writes an overlapping segment). history_after must yield
    each version ONCE, strictly ascending — feed cursors and monitor rate
    windows would otherwise double-count commits forever."""
    clog = materialize(
        "core-hist", ChangelogSpec(n_events=2000, n_convs=50, n_epochs=4, seed=9)
    )
    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=2)
    while lake.apply(clog, max_epochs=1)["epochs"]:
        pass
    m = lake.manifest
    tail = list(m.data["history"])
    assert len(tail) >= 3
    # fabricate the crash artifact: an orphan segment duplicating the
    # first two tail entries (their versions overlap the manifest tail)
    d = os.path.join(lake.path, "_history")
    os.makedirs(d, exist_ok=True)
    dup = tail[:2]
    first, last = int(dup[0]["version"]), int(dup[-1]["version"])
    with open(os.path.join(d, f"seg-{first:012d}-{last:012d}.jsonl"), "w") as f:
        for e in dup:
            f.write(json.dumps(e) + "\n")
    versions = [int(h["version"]) for h in m.history_after(lake.path, 0)]
    assert versions == sorted(set(versions)), versions  # once each, ascending
    assert versions == [int(h["version"]) for h in tail]


def test_edge_conflict_within_epoch_is_deterministic(ray_session, tmp_path):
    """Two conflicting events for the SAME edge in ONE epoch (an 'I' and a
    'D') must resolve identically in the forward and reverse lakes (their
    shuffles are independent — a row-order tie-break could diverge), and
    identically across independent rebuilds."""
    rows = [
        {"source_id": 1, "target_id": 2, "relation_type": "KNOWS",
         "direction": "outgoing", "op": "I"},
        {"source_id": 1, "target_id": 2, "relation_type": "KNOWS",
         "direction": "outgoing", "op": "D"},
        {"source_id": 3, "target_id": 4, "relation_type": "KNOWS",
         "direction": "outgoing", "op": "I"},
    ]

    def build(name):
        lk = EdgeLake(str(tmp_path / name), num_buckets=4, reverse_index=True)
        lk.ingest(rd.from_items(rows), epoch=0)
        return lk

    a = build("edges_a")
    fwd = set(
        zip(
            a.lake.read_final().to_pandas()["source_id"],
            a.lake.read_final().to_pandas()["target_id"],
        )
    )
    rev = set(
        zip(
            a.reverse.read_final().to_pandas()["source_id"],
            a.reverse.read_final().to_pandas()["target_id"],
        )
    )
    # reverse lake is keyed (target, source); its columns are renamed back
    assert {(3, 4)} <= fwd
    assert fwd == rev or fwd == {(s, t) for (t, s) in rev} or fwd == {
        (t, s) for (s, t) in rev
    }
    # forward/reverse agree on whether edge (1,2) is live
    n_out = a.neighbors(1, direction="out").num_rows
    n_in = a.neighbors(2, direction="in").num_rows
    assert n_out == n_in
    # an independent rebuild resolves the conflict the same way
    b = build("edges_b")
    assert b.neighbors(1, direction="out").num_rows == n_out


def test_epoch_files_numeric_order_past_padding(tmp_path):
    """Filenames past the %05d padding must still come back in EPOCH order
    (lexicographic order puts epoch_100000 before epoch_99999)."""
    t = pa.table({"x": pa.array([1], pa.int64())})
    for ep in (99999, 100000, 7):
        pq.write_table(t, str(tmp_path / f"epoch_{ep:05d}.parquet"))
    got = [e for e, _ in epoch_files(str(tmp_path))]
    assert got == [7, 99999, 100000]


def test_spec_for_rejects_unknown_label():
    with pytest.raises(ValueError, match="unknown sf label"):
        spec_for("sf10")


def test_tail_stop_after_epoch_is_exact(ray_session, tmp_path):
    """A changelog already holding epochs PAST the stop point must not be
    applied beyond it in the first micro-batch (apply is bounded with
    upto_epoch, not merely checked after the fact)."""
    from sql_graph_visualizer_ray.pipelines.streaming import tail

    clog = materialize(
        "core-tailstop",
        ChangelogSpec(n_events=2000, n_convs=50, n_epochs=4, seed=3),
    )
    lake = tail(
        clog,
        str(tmp_path / "lake"),
        num_buckets=2,
        stop_after_epoch=1,
        idle_timeout=1.0,
    )
    assert lake.manifest.applied_epoch == 1  # epochs 0..1 only


def test_collect_with_timeout_empty_schemaless(ray_session):
    """An empty dataset with no derivable schema returns an empty table,
    not AttributeError on None.base_schema."""
    from sql_graph_visualizer_ray.stages.timeouts import collect_with_timeout

    t = collect_with_timeout(rd.from_items([]), 5.0)
    assert t.num_rows == 0


def test_final_table_promotes_big_string_columns(ray_session, tmp_path, monkeypatch):
    """A full-table sort of a text column approaching the int32 offset
    limit must promote to large_string instead of dying with Arrow's
    'offset overflow while concatenating arrays' (hit live on the sf1
    20M-event soak). Pinned with a tiny promotion threshold."""
    from sql_graph_visualizer_ray.pipelines import cdc

    clog = materialize(
        "core-bigsort", ChangelogSpec(n_events=1000, n_convs=30, n_epochs=1, seed=4)
    )
    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=2)
    lake.apply(clog)
    want = lake.final_table()  # un-promoted baseline
    monkeypatch.setattr(cdc, "_SORT_PROMOTE_BYTES", 1)
    got = lake.final_table()
    assert pa.types.is_large_string(got.schema.field("text").type)
    assert got.cast(want.schema).equals(want)  # same rows, same order
