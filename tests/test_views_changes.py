"""Change feed (CDC out) and incremental materialized views."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from sql_graph_visualizer_ray.pipelines.cdc import LakeTable, replay
from sql_graph_visualizer_ray.pipelines.views import BucketAggView
from sql_graph_visualizer_ray.sources.changelog import ChangelogSpec, materialize

SPEC = ChangelogSpec(n_events=8_000, n_convs=250, n_epochs=6, seed=47)


@pytest.fixture(scope="module")
def clog():
    return materialize("unit-views", SPEC)


def _make_turns_per_conv():
    # defined via a factory so cloudpickle serializes the function BY VALUE —
    # a module-level function in a test module is pickled by reference and
    # Ray workers cannot import pytest test modules
    def turns_per_conv(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("conv_id", as_index=False).agg(
            n_turns=("turn_idx", "size")
        )
        return pa.Table.from_pandas(
            df.astype({"n_turns": "int64"}), preserve_index=False
        )

    return turns_per_conv


def test_change_feed_covers_commit_rows(ray_session, clog, tmp_path):
    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=4)
    lake.apply(clog, max_epochs=3)
    v1 = lake.manifest.version
    c2 = lake.apply(clog)
    v2 = lake.manifest.version
    feed = lake.changes(v2).to_pandas()
    # the commit's feed carries exactly its compacted delta rows
    assert len(feed) == c2["upserts"] + c2["deletes"]
    assert set(feed["op"]) <= {"I", "U", "D"}
    assert (feed[feed["op"] == "D"]["text"].isna()).all()
    # the older commit's feed is still addressable
    assert lake.changes(v1).count() > 0
    with pytest.raises(KeyError):
        lake.changes(99)
    # compaction folds deltas away -> the feed for v2 disappears, and the
    # compaction commit itself has no feed
    lake.compact(min_files=1)
    with pytest.raises(KeyError):
        lake.changes(v2)
    with pytest.raises(KeyError):
        lake.changes(lake.manifest.version)


def test_changes_rewrite_commit_has_no_feed(ray_session, clog, tmp_path):
    """A rewrite commit's files hold merged prior state, not a delta —
    serving them as a feed would replay pre-existing rows as changes."""
    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=4)
    lake.apply(clog, max_epochs=3)
    lake.apply(clog, commit_mode="rewrite")
    with pytest.raises(KeyError, match="rewrite"):
        lake.changes(lake.manifest.version)


def test_view_rejects_turn_sharded_lake(ray_session, clog, tmp_path):
    """bucket = hash(conv) ^ f(turn//shard) spreads one conv over several
    buckets, so a conv-grouped per-bucket aggregate would emit partials."""
    lake = LakeTable.open(
        str(tmp_path / "lake"), num_buckets=4, turn_shard_size=8
    )
    lake.apply(clog)
    with pytest.raises(ValueError, match="turn_shard_size"):
        BucketAggView(lake, "v", _make_turns_per_conv())


def test_view_refresh_crash_atomic(ray_session, clog, tmp_path, monkeypatch):
    """Partitions are generation-stamped and only become visible via the
    manifest commit; orphans from a killed refresh are GC'd next refresh.
    GC is age-gated like the lake's (grace=0 here to make it immediate)."""
    monkeypatch.setenv("GRAFT_PUBLISH_GRACE_S", "0")
    import os

    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=4)
    lake.apply(clog)
    view = BucketAggView(lake, "v", _make_turns_per_conv())
    view.refresh()
    before = view.read().to_pandas().sort_values("conv_id", ignore_index=True)
    # simulate a refresh killed after writing partitions, before the
    # manifest commit: an orphan next-generation file appears
    orphan = os.path.join(view.dir, "bucket=00000.g99.parquet")
    live0 = os.path.join(view.dir, view.state["buckets"]["0"]["out"])
    import shutil

    shutil.copyfile(live0, orphan)
    reopened = BucketAggView(lake, "v", _make_turns_per_conv())
    after = reopened.read().to_pandas().sort_values("conv_id", ignore_index=True)
    pd.testing.assert_frame_equal(after, before)  # orphan invisible
    reopened.refresh()
    assert not os.path.exists(orphan)  # GC'd by the next committed refresh


def test_view_schema_evolution_forces_full_recompute(ray_session, clog, tmp_path):
    """A column-add commit touches only the event-bearing buckets' FILES,
    but every bucket's agg_fn output must reflect the unified schema —
    the view fingerprints the payload schema and recomputes ALL buckets
    on evolution instead of mixing old- and new-schema partitions."""
    import os

    import pyarrow.parquet as pq

    priv = str(tmp_path / "clog")
    import shutil

    shutil.copytree(clog, priv)
    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=8)
    lake.apply(priv)

    def _make_agg():
        def agg(t: pa.Table) -> pa.Table:
            df = t.to_pandas().groupby("conv_id", as_index=False).agg(
                n_turns=("turn_idx", "size")
            )
            df["n_cols"] = t.num_columns
            return pa.Table.from_pandas(
                df.astype({"n_turns": "int64", "n_cols": "int64"}),
                preserve_index=False,
            )

        return agg

    view = BucketAggView(lake, "v", _make_agg())
    view.refresh()
    width0 = view.read().to_pandas()["n_cols"].unique().tolist()
    assert len(width0) == 1

    # craft a 5-row epoch that ADDS a column — it touches <= 5 buckets
    last = pq.read_table(os.path.join(priv, sorted(os.listdir(priv))[-2])).slice(0, 5)
    e = lake.manifest.applied_epoch + 1
    small = last.set_column(
        last.schema.get_field_index("epoch"), "epoch",
        pa.array([e] * 5, pa.int32()),
    ).set_column(
        last.schema.get_field_index("lsn"), "lsn",
        pa.array(range(10**9, 10**9 + 5), pa.int64()),
    ).append_column("extra", pa.array(["x"] * 5, pa.string()))
    pq.write_table(small, os.path.join(priv, f"epoch_{e:05d}.parquet"))
    lake.apply(priv)

    r = view.refresh()
    assert r["reused"] == 0  # schema changed: no bucket may be reused
    assert r["recomputed"] == len(lake.manifest.data["buckets"])
    got = view.read().to_pandas()
    widths = got["n_cols"].unique().tolist()
    assert widths == [width0[0] + 1]  # every bucket sees the new column
    # and a follow-up refresh with no changes reuses everything again
    r2 = view.refresh()
    assert r2 == {"recomputed": 0, "reused": len(lake.manifest.data["buckets"])}


def test_view_over_empty_lake_reads_empty(ray_session, tmp_path):
    """refresh() over a lake with no buckets is legitimate; read() returns
    an empty dataset, not the 'never refreshed' error."""
    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=4)
    view = BucketAggView(lake, "v", _make_turns_per_conv())
    with pytest.raises(RuntimeError, match="never been refreshed"):
        view.read()
    view.refresh()
    assert view.read().count() == 0


def test_view_incremental_refresh(ray_session, clog, tmp_path):
    import shutil

    priv = str(tmp_path / "clog")
    shutil.copytree(clog, priv)
    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=8)
    lake.apply(priv)  # the full original changelog
    turns_per_conv = _make_turns_per_conv()
    view = BucketAggView(lake, "turns_per_conv", turns_per_conv)
    r1 = view.refresh()
    assert r1["recomputed"] > 0 and r1["reused"] == 0

    def expected():
        df = lake.final_table().to_pandas()
        return (
            df.groupby("conv_id", as_index=False)
            .agg(n_turns=("turn_idx", "size"))
            .astype({"n_turns": "int64"})
            .sort_values("conv_id", ignore_index=True)
        )

    got = view.read().to_pandas().sort_values("conv_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, expected())

    # idempotent refresh: nothing changed -> nothing recomputed
    r2 = view.refresh()
    assert r2 == {"recomputed": 0, "reused": r1["recomputed"]}

    # a tiny commit touches FEW buckets -> few bucket recomputes
    import os

    import pyarrow.parquet as pq

    last = pq.read_table(os.path.join(priv, sorted(os.listdir(priv))[-2])).slice(0, 5)
    e = lake.manifest.applied_epoch + 1
    small = last.set_column(
        last.schema.get_field_index("epoch"), "epoch",
        pa.array([e] * 5, pa.int32()),
    ).set_column(
        last.schema.get_field_index("lsn"), "lsn",
        pa.array(range(10**9, 10**9 + 5), pa.int64()),
    )
    pq.write_table(small, os.path.join(priv, f"epoch_{e:05d}.parquet"))
    lake.apply(priv)
    r3 = view.refresh()
    assert 1 <= r3["recomputed"] <= 5  # only touched buckets
    assert r3["recomputed"] + r3["reused"] == 8
    got = view.read().to_pandas().sort_values("conv_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, expected())

    # a NEW view instance (process restart) reloads the manifest and reuses
    view2 = BucketAggView(lake, "turns_per_conv", _make_turns_per_conv())
    assert view2.refresh()["recomputed"] == 0

    # bucket split invalidates everything coherently
    lake.split_buckets(16)
    r4 = view2.refresh()
    assert r4["recomputed"] == len(lake.manifest.data["buckets"])
    got = view2.read().to_pandas().sort_values("conv_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, expected())


def test_empty_view_read_is_schema_typed(ray_session, tmp_path):
    """A refreshed-but-empty view must read with the aggregate's OUTPUT
    schema (pinned by probing agg_fn with an empty typed table), not a
    zero-column dataset — schema-bound consumers index columns."""
    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=4)
    view = BucketAggView(lake, "v", _make_turns_per_conv())
    view.refresh()
    ds = view.read()
    # (Dataset.to_pandas() drops columns on empty datasets — a Ray quirk —
    # so the schema is the surface a typed consumer actually binds to)
    assert ds.schema().names == ["conv_id", "n_turns"]
    assert ds.count() == 0


def test_view_gc_collects_crashed_refresh_temps(ray_session, clog, tmp_path):
    """A '.parquet.tmp' orphan left by a refresh task killed between write
    and rename must be collected by a later refresh's GC (age-gated), not
    accumulate forever."""
    import os
    import time

    lake = replay(clog, str(tmp_path / "lake"), num_buckets=4)
    view = BucketAggView(lake, "tpc", _make_turns_per_conv())
    view.refresh()
    orphan = os.path.join(view.dir, "bucket=00001.g9.parquet.tmp")
    with open(orphan, "wb") as f:
        f.write(b"partial write")
    past = time.time() - 7 * 24 * 3600
    os.utime(orphan, (past, past))
    # force work so refresh reaches the GC sweep even with nothing new
    lake.apply_dataset(
        __import__("ray").data.from_arrow(
            pa.table(
                {
                    "lsn": pa.array([10**9], pa.int64()),
                    "op": pa.array(["I"], pa.string()),
                    "conv_id": pa.array(["zzz"], pa.string()),
                    "turn_idx": pa.array([0], pa.int32()),
                    "ts": pa.array([0], pa.timestamp("us")),
                }
            )
        ),
        epoch=10**6,
    )
    view.refresh()
    assert not os.path.exists(orphan)
