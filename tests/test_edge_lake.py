"""Persisted relationship lake (K2): upsert/delete semantics keyed by
(source, target), epoch fencing, kill-and-resume across instances."""

import pandas as pd
import pytest
import pyarrow as pa

import ray.data as rd

from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake


def edges_ds(rows):
    return rd.from_arrow(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("source_id", pa.int64()),
                    ("target_id", pa.int64()),
                    ("relation_type", pa.string()),
                    ("direction", pa.string()),
                    ("op", pa.string()),
                ]
            ),
        )
    )


def e(s, t, rel="KNOWS", op="I"):
    return {
        "source_id": s, "target_id": t, "relation_type": rel,
        "direction": "outgoing", "op": op,
    }


def test_edge_lake_upsert_delete_and_resume(ray_session, tmp_path):
    path = str(tmp_path / "edges")
    lake = EdgeLake(path, num_buckets=4)
    c0 = lake.ingest(edges_ds([e(1, 2), e(1, 3), e(2, 3)]), epoch=0)
    assert c0["upserts"] == 3
    t = lake.edges_table()
    assert t.num_rows == 3

    # re-ingesting the same epoch is fenced out (idempotent sink retries)
    assert lake.ingest(edges_ds([e(9, 9)]), epoch=0) == {"epochs": 0}
    assert lake.edges_table().num_rows == 3

    # a later epoch updates one edge's properties and deletes another
    lake.ingest(
        edges_ds([e(1, 2, rel="LIKES"), e(2, 3, op="D")]), epoch=1
    )
    t = lake.edges_table()
    assert t.num_rows == 2
    df = t.to_pandas().set_index(["source_id", "target_id"])
    assert df.loc[(1, 2), "relation_type"] == "LIKES"
    assert (1, 3) in df.index and (2, 3) not in df.index

    # kill-and-resume: a fresh instance sees the same state and continues
    lake2 = EdgeLake(path, num_buckets=4)
    assert lake2.edges_table().equals(t)
    lake2.ingest(edges_ds([e(5, 6)]), epoch=2)
    assert lake2.edges_table().num_rows == 3
    # compaction folds the three delta files and preserves the edge set
    before = lake2.edges_table()
    lake2.lake.compact(min_files=1)
    assert lake2.edges_table().equals(before)


def test_edge_lake_duplicate_rows_collapse(ray_session, tmp_path):
    """A duplicated ingest batch (producer retry) is a LWW no-op."""
    path = str(tmp_path / "edges")
    lake = EdgeLake(path, num_buckets=4)
    rows = [e(1, 2), e(1, 2), e(3, 4)]
    lake.ingest(edges_ds(rows), epoch=0)
    assert lake.edges_table().num_rows == 2


def test_rel_lake_roundtrip_matches_rule_output(ray_session):
    from sql_graph_visualizer_ray.pipelines.queries import (
        rel_customer_nation,
        rel_lake_roundtrip,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        rel_lake_roundtrip(sf)
        .to_pandas()
        .sort_values(["source_id", "target_id"], ignore_index=True)
    )
    want = (
        rel_customer_nation(sf)
        .to_pandas()
        .sort_values(["source_id", "target_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_native_key_schema_round_trip(ray_session, tmp_path):
    """VERDICT r2 #8: the edge lake's merge key is natively
    (source_id, target_id) — declared in the manifest (key_columns), native
    names on every read surface (read_edges, read_final, changes), canonical
    physical names confined to the lake files."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    lk = EdgeLake(str(tmp_path / "edges"), num_buckets=2)
    assert lk.manifest.key_columns == ("source_id", "target_id")
    edges = rd.from_items(
        [
            {"source_id": i, "target_id": i % 3, "relation_type": "R",
             "direction": "out"}
            for i in range(20)
        ]
    )
    lk.ingest(edges, epoch=0)
    # read surfaces speak native names
    assert lk.read_edges().schema().names == [
        "source_id", "target_id", "relation_type", "direction",
    ]
    feed = lk.lake.changes(lk.manifest.version).to_pandas()
    assert {"source_id", "target_id"} <= set(feed.columns)
    assert "conv_id" not in feed.columns
    # physical files keep the canonical key names (shared kernels/layout)
    f = lk.manifest.bucket_files(lk.lake.path)
    some = next(iter(f.values()))[0]
    names = set(pq.read_schema(some).names)
    assert {"conv_id", "turn_idx"} <= names and "source_id" not in names
    # column pruning accepts/reports NATIVE names
    one = lk.lake.read_final(columns=["source_id"]).schema().names
    assert one == ["source_id"]
    try:
        lk.lake.read_final(columns=["nope"])
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_native_key_view_sees_logical_names(ray_session, tmp_path):
    """BucketAggView agg_fn over a native-key lake receives logical
    column names."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake
    from sql_graph_visualizer_ray.pipelines.views import BucketAggView

    lk = EdgeLake(str(tmp_path / "edges"), num_buckets=2)
    lk.ingest(
        rd.from_items(
            [
                {"source_id": i, "target_id": 1, "relation_type": "R",
                 "direction": "out"}
                for i in range(10)
            ]
        ),
        epoch=0,
    )

    def fanout(t: pa.Table) -> pa.Table:
        assert "source_id" in t.column_names  # logical names visible
        g = t.group_by("source_id").aggregate([("target_id", "count")])
        return g.rename_columns(["source_id", "n_out"])

    v = BucketAggView(lk.lake, "fanout", fanout)
    v.refresh()
    got = v.read().to_pandas().sort_values("source_id", ignore_index=True)
    assert got["n_out"].tolist() == [1] * 10


def test_neighbors_serving_fetch(ray_session, tmp_path):
    """neighbors(): the click-to-expand graph fetch — outgoing via keyed
    lookup, incoming via predicate search, self-loop deduped, oracle = an
    in-memory filter of the full edge table."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    lk = EdgeLake(str(tmp_path / "edges"), num_buckets=4)
    edges = (
        [{"source_id": 1, "target_id": t, "relation_type": "R", "direction": "out"}
         for t in (2, 3, 4)]
        + [{"source_id": s, "target_id": 1, "relation_type": "R", "direction": "out"}
           for s in (5, 6)]
        + [{"source_id": 1, "target_id": 1, "relation_type": "SELF", "direction": "out"},
           {"source_id": 7, "target_id": 8, "relation_type": "R", "direction": "out"}]
    )
    lk.ingest(rd.from_items(edges), epoch=0)
    full = lk.edges_table().to_pandas()

    def oracle(node, direction):
        m = {
            "out": full.source_id == node,
            "in": full.target_id == node,
            "both": (full.source_id == node) | (full.target_id == node),
        }[direction]
        return (
            full[m].sort_values(["source_id", "target_id"], ignore_index=True)
        )

    for direction in ("out", "in", "both"):
        got = lk.neighbors(1, direction=direction).to_pandas()
        pd.testing.assert_frame_equal(got, oracle(1, direction))
    assert lk.neighbors(7, direction="in").num_rows == 0
    assert lk.neighbors(99).num_rows == 0
    with pytest.raises(ValueError, match="out|in|both"):
        lk.neighbors(1, direction="sideways")


def test_neighbors_reverse_index(ray_session, tmp_path):
    """reverse_index=True: incoming neighbors come from the (target_id,
    source_id)-keyed reverse lake's O(keys) lookup — results identical to
    the search-based fallback, and a crash between the two ingests heals
    on the idempotent re-ingest of the same epoch."""
    import pandas as pd
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    edges = [
        {"source_id": s, "target_id": t, "relation_type": "R", "direction": "out"}
        for s in range(12)
        for t in ((s + 1) % 12, (s + 5) % 12)
    ]
    plain = EdgeLake(str(tmp_path / "plain"), num_buckets=4)
    plain.ingest(rd.from_items(edges), epoch=0)
    fast = EdgeLake(str(tmp_path / "fast"), num_buckets=4, reverse_index=True)
    fast.ingest(rd.from_items(edges), epoch=0)

    for node in (0, 3, 7):
        for direction in ("in", "both"):
            a = plain.neighbors(node, direction=direction).to_pandas()
            b = fast.neighbors(node, direction=direction).to_pandas()
            pd.testing.assert_frame_equal(a, b)

    # crash-between-commits heal: commit epoch 1 through a forward-only
    # handle (as if the process died before the reverse ingest ran)
    more = [{"source_id": 99, "target_id": 3, "relation_type": "R",
             "direction": "out"}]
    half = EdgeLake(str(tmp_path / "fast"), num_buckets=4)  # forward only
    half.ingest(rd.from_items(more), epoch=1)
    assert fast.lake.reload().manifest.applied_epoch == 1
    assert fast.reverse.reload().manifest.applied_epoch == 0
    # full re-ingest of epoch 1: forward no-ops (fence), reverse completes
    fast2 = EdgeLake(str(tmp_path / "fast"), num_buckets=4, reverse_index=True)
    fast2.ingest(rd.from_items(more), epoch=1)
    assert fast2.reverse.manifest.applied_epoch == 1
    got = fast2.neighbors(3, direction="in").to_pandas()
    assert 99 in set(got.source_id)


def test_expand_khop_vs_bfs_oracle(ray_session, tmp_path):
    """expand(): k-hop neighborhood equals a pandas BFS oracle for every
    (hops, direction) combination on a ring+chords graph."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    n = 20
    edges = [
        {"source_id": s, "target_id": t, "relation_type": "R", "direction": "out"}
        for s in range(n)
        for t in ((s + 1) % n, (s + 7) % n)
    ]
    lk = EdgeLake(str(tmp_path / "g"), num_buckets=4, reverse_index=True)
    lk.ingest(rd.from_items(edges), epoch=0)
    full = lk.edges_table().to_pandas()

    def bfs_edges(seeds, hops, direction):
        visited, frontier, keep = set(), set(seeds), set()
        for _ in range(hops):
            frontier -= visited
            if not frontier:
                break
            visited |= frontier
            nxt = set()
            for _, e in full.iterrows():
                s, t = int(e.source_id), int(e.target_id)
                if direction in ("out", "both") and s in frontier:
                    keep.add((s, t)); nxt.add(t)
                if direction in ("in", "both") and t in frontier:
                    keep.add((s, t)); nxt.add(s)
            frontier = nxt
        m = full.apply(
            lambda e: (int(e.source_id), int(e.target_id)) in keep, axis=1
        )
        return full[m].sort_values(
            ["source_id", "target_id"], ignore_index=True
        )

    for hops in (1, 2, 3):
        for direction in ("out", "in", "both"):
            got = lk.expand([0], hops=hops, direction=direction).to_pandas()
            want = bfs_edges([0], hops, direction)
            pd.testing.assert_frame_equal(got, want), (hops, direction)

    assert lk.expand([999], hops=3).num_rows == 0
    with pytest.raises(ValueError, match="frontier grew"):
        lk.expand(range(5), hops=3, max_frontier=3)
    plain = EdgeLake(str(tmp_path / "plain"), num_buckets=2)
    plain.ingest(rd.from_items(edges[:4]), epoch=0)
    with pytest.raises(ValueError, match="reverse_index"):
        plain.expand([0], direction="both")


def test_reverse_index_guard_and_sync(ray_session, tmp_path):
    """A lagging reverse index refuses to serve incoming adjacency (silent
    incompleteness is worse than an error), and sync_reverse() rebuilds it
    from the forward lake — including tombstones, so a rebuilt index cannot
    resurrect deleted edges."""
    import pytest
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    path = str(tmp_path / "g")
    # populate WITHOUT the reverse index first (the enable-later scenario)
    plain = EdgeLake(path, num_buckets=4)
    plain.ingest(edges_ds([e(1, 2), e(3, 2), e(2, 4)]), epoch=0)
    plain.ingest(edges_ds([e(3, 2, op="D")]), epoch=1)

    lk = EdgeLake(path, num_buckets=4, reverse_index=True)
    with pytest.raises(RuntimeError, match="sync_reverse"):
        lk.neighbors(2, direction="in")
    with pytest.raises(RuntimeError, match="sync_reverse"):
        lk.expand([2], direction="both")
    # outgoing stays served — only the reverse-backed paths refuse
    assert lk.neighbors(2, direction="out").num_rows == 1

    lk.sync_reverse()
    got = lk.neighbors(2, direction="in").to_pandas()
    assert set(zip(got.source_id, got.target_id)) == {(1, 2)}  # (3,2) deleted

    # tombstones survived the rebuild: a genuinely LATE event for (3,2)
    # whose ts predates the delete's (row-ts events through both lakes,
    # the sync-path event builder) must not resurrect the edge on EITHER
    # side — this is exactly what keep_tombstones in sync_reverse buys
    import pyarrow as pa

    from sql_graph_visualizer_ray.pipelines.graph_sink import _edge_events

    late = pa.table(
        {
            "source_id": pa.array([3], pa.int64()),
            "target_id": pa.array([2], pa.int64()),
            "relation_type": ["R"],
            "direction": ["outgoing"],
            "ts": pa.array([0], pa.timestamp("us")),  # older than the delete
        }
    )
    ev = rd.from_arrow(_edge_events(late, 3, use_row_ts=True))
    lk.lake.apply_dataset(ev, epoch=3)
    lk.reverse.apply_dataset(ev, epoch=3)
    fwd = {(r.source_id, r.target_id)
           for r in lk.edges_table().to_pandas().itertuples()}
    assert (3, 2) not in fwd, "late pre-delete event resurrected on forward"
    d = lk.neighbors(2, direction="in").to_pandas()
    assert (3, 2) not in set(zip(d.source_id, d.target_id)), (
        "late pre-delete event resurrected on the REBUILT reverse index"
    )

    # ...while ingest-path events deliberately IGNORE a caller ts column
    # (epoch stamping keeps 'later epoch wins'); the re-created edge shows
    # up on both sides in step
    lk.ingest(edges_ds([e(3, 2)]), epoch=4)
    assert (3, 2) in {
        (r.source_id, r.target_id)
        for r in lk.edges_table().to_pandas().itertuples()
    }
    d = lk.neighbors(2, direction="in").to_pandas()
    assert (3, 2) in set(zip(d.source_id, d.target_id))


def test_reverse_index_refuses_epoch_skip(ray_session, tmp_path):
    """A resume that SKIPS the epoch the reverse index missed must refuse
    at ingest: applying the later epoch would advance the reverse watermark
    past the hole and no guard could ever see it again."""
    import pytest
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    path = str(tmp_path / "g")
    lk = EdgeLake(path, num_buckets=2, reverse_index=True)
    lk.ingest(edges_ds([e(1, 2)]), epoch=0)
    # crash between the double-writes of epoch 1: forward-only handle
    EdgeLake(path, num_buckets=2).ingest(edges_ds([e(2, 3)]), epoch=1)

    lk2 = EdgeLake(path, num_buckets=2, reverse_index=True)
    with pytest.raises(RuntimeError, match="out of step"):
        lk2.ingest(edges_ds([e(3, 4)]), epoch=2)  # skip attempt
    # the sanctioned heal: re-ingest exactly the lagging epoch, then go on
    lk2.ingest(edges_ds([e(2, 3)]), epoch=1)
    lk2.ingest(edges_ds([e(3, 4)]), epoch=2)
    d = lk2.neighbors(3, direction="in").to_pandas()
    assert set(zip(d.source_id, d.target_id)) == {(2, 3)}


def test_reverse_heal_with_divergent_data_converges_to_forward(
    ray_session, tmp_path
):
    """The crash heal rebuilds the reverse index from the forward lake's
    COMMITTED state: a heal-epoch re-ingest carrying different rows than
    the original commit (caller bug / nondeterministic source) no-ops on
    the forward lake (epoch fence) and must NOT plant those rows in the
    reverse lake — adjacency stays identical on both sides."""
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    path = str(tmp_path / "g")
    lk = EdgeLake(path, num_buckets=2, reverse_index=True)
    lk.ingest(edges_ds([e(1, 2)]), epoch=0)
    # crash between the double-writes of epoch 1 (forward-only handle)
    EdgeLake(path, num_buckets=2).ingest(edges_ds([e(2, 3)]), epoch=1)

    # heal re-ingest of epoch 1 with DIFFERENT data
    lk2 = EdgeLake(path, num_buckets=2, reverse_index=True)
    lk2.ingest(edges_ds([e(7, 8)]), epoch=1)
    assert lk2.reverse.manifest.applied_epoch == 1
    fwd = {
        (r.source_id, r.target_id)
        for r in lk2.edges_table().to_pandas().itertuples()
    }
    assert fwd == {(1, 2), (2, 3)}  # the divergent row never landed
    d = lk2.neighbors(3, direction="in").to_pandas()
    assert set(zip(d.source_id, d.target_id)) == {(2, 3)}
    d = lk2.neighbors(8, direction="in")
    assert d.num_rows == 0  # divergent edge absent from the reverse too


def test_edge_ingest_auto_management_bounds_files(ray_session, tmp_path):
    """A naive 12-commit edge ingest loop keeps per-bucket files bounded on
    BOTH lakes out of the box (auto-compaction defaults, mirroring
    replay/tail), and the edge set stays exact."""
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    lk = EdgeLake(str(tmp_path / "g"), num_buckets=2, reverse_index=True)
    want = set()
    for ep in range(12):
        rows = [e(ep, t) for t in range(3)]
        want |= {(ep, t) for t in range(3)}
        lk.ingest(edges_ds(rows), epoch=ep)
    for lake in (lk.lake, lk.reverse):
        worst = max(len(f) for f in lake.manifest.bucket_files(lake.path).values())
        assert worst < 8 + 2, f"unbounded delta files: {worst}"
    got = {(r.source_id, r.target_id)
           for r in lk.edges_table().to_pandas().itertuples()}
    assert got == want
    # every epoch wrote (ep, 1): the reverse index survived the per-commit
    # compactions/splits with the full incoming set intact
    d = lk.neighbors(1, direction="in").to_pandas()
    assert set(zip(d.source_id, d.target_id)) == {(s, 1) for s in range(12)}


def test_edge_degree_view_incremental_vs_duckdb(ray_session, tmp_path):
    """Degree-per-node as an INCREMENTAL materialized view over the edge
    lake (VERDICT r4 item 8): out-degree on the forward lake, in-degree on
    the reverse lake, both matching a DuckDB LWW + GROUP BY oracle across
    two delta commits — and the second refresh recomputes only the buckets
    the second commit touched."""
    import duckdb
    import numpy as np

    from sql_graph_visualizer_ray.stages.partitioning import bucket_of

    path = str(tmp_path / "edges")
    lake = EdgeLake(path, num_buckets=4, reverse_index=True)

    def with_epoch(rows, ep):
        return [{**r, "epoch": ep} for r in rows]

    rows0 = [e(s, t) for s in range(1, 21) for t in (100 + s, 200 + (s % 5))]
    lake.ingest(edges_ds(rows0), epoch=0)
    vout, vin = lake.degree_view("out"), lake.degree_view("in")
    r0 = vout.refresh()
    assert r0["recomputed"] > 0 and r0["reused"] == 0
    vin.refresh()

    def oracle(all_rows):
        con = duckdb.connect()
        con.register("edges", pd.DataFrame(all_rows))
        q = (
            "WITH ranked AS (SELECT *, row_number() OVER ("
            "  PARTITION BY source_id, target_id ORDER BY epoch DESC) rn "
            "  FROM edges), "
            "live AS (SELECT * FROM ranked WHERE rn = 1 AND op = 'I') "
            "SELECT {col} AS node_id, COUNT(*) AS degree FROM live GROUP BY 1"
        )
        out = con.execute(q.format(col="source_id")).df()
        inn = con.execute(q.format(col="target_id")).df()
        con.close()
        return out, inn

    def canon(df):
        return (
            df.astype({"node_id": "int64", "degree": "int64"})
            .sort_values("node_id", ignore_index=True)
        )

    want_out, want_in = oracle(with_epoch(rows0, 0))
    pd.testing.assert_frame_equal(canon(vout.read().to_pandas()), canon(want_out))
    pd.testing.assert_frame_equal(canon(vin.read().to_pandas()), canon(want_in))

    # epoch 1 touches ONE forward bucket: all its sources hash to the same
    # bucket, so the out-view must reuse every other populated bucket
    pool = np.arange(1, 21)
    bks = bucket_of(pool, np.zeros(20), 4)
    target_bucket = int(bks[0])
    hot = [int(s) for s, b in zip(pool, bks) if int(b) == target_bucket]
    assert len(hot) >= 2
    rows1 = (
        [e(hot[0], 100 + hot[0], op="D")]  # drop one edge
        + [e(hot[1], 100 + hot[1], rel="LIKES")]  # overwrite (degree same)
        + [e(s, 900 + s) for s in hot]  # one new edge per hot source
    )
    lake.ingest(edges_ds(rows1), epoch=1)

    populated = len(lake.lake.manifest.data["buckets"])
    r1 = vout.refresh()
    assert r1 == {"recomputed": 1, "reused": populated - 1}
    vin.refresh()

    want_out, want_in = oracle(with_epoch(rows0, 0) + with_epoch(rows1, 1))
    pd.testing.assert_frame_equal(canon(vout.read().to_pandas()), canon(want_out))
    pd.testing.assert_frame_equal(canon(vin.read().to_pandas()), canon(want_in))

    # guard rails: 'in' without a reverse index refuses with guidance
    solo = EdgeLake(str(tmp_path / "noidx"), num_buckets=2)
    solo.ingest(edges_ds([e(1, 2)]), epoch=0)
    with pytest.raises(ValueError, match="reverse_index=True"):
        solo.degree_view("in")
    with pytest.raises(ValueError, match="'out' or 'in'"):
        lake.degree_view("sideways")
