"""Schema evolution (column add / int widen), hot-key skew with the salted
pre-compaction pass, and crash-window recovery."""

import os
import shutil

import pyarrow.compute as pc
import pytest

from sql_graph_visualizer_ray.pipelines.cdc import LakeTable, replay
from sql_graph_visualizer_ray.pipelines.oracle import replay_oracle
from sql_graph_visualizer_ray.sources.changelog import ChangelogSpec, materialize


def canonical(t):
    t = t.select(sorted(t.column_names))
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )


@pytest.mark.parametrize("evolution", ["addcol", "widen"])
def test_schema_evolution_mid_stream(evolution, tmp_path):
    spec = ChangelogSpec(
        n_events=8_000, n_convs=300, n_epochs=6, seed=11, evolution=evolution
    )
    clog = materialize(f"unit-evolve-{evolution}", spec)
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8)
    got = canonical(lake.final_table())
    want = canonical(replay_oracle(clog))
    assert got.schema == want.schema
    if evolution == "addcol":
        assert "tool_version" in got.schema.names
    if evolution == "widen":
        assert got.schema.field("turn_idx").type == "int64"
    assert got.equals(want)


def test_evolution_incremental_commits_cross_boundary(tmp_path):
    """Commit-by-commit replay where the schema changes BETWEEN commits:
    early lake files carry the old schema and must unify with later events."""
    spec = ChangelogSpec(
        n_events=8_000, n_convs=300, n_epochs=6, seed=12, evolution="addcol"
    )
    clog = materialize("unit-evolve-inc", spec)
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8, epochs_per_commit=2)
    assert canonical(lake.final_table()).equals(canonical(replay_oracle(clog)))


def test_skew_salted_matches_oracle(tmp_path):
    spec = ChangelogSpec(
        n_events=20_000, n_convs=500, n_epochs=4, seed=13, zipf_theta=1.2
    )
    clog = materialize("unit-skew", spec)
    plain = replay(clog, str(tmp_path / "plain"), num_buckets=8)
    salted = replay(clog, str(tmp_path / "salted"), num_buckets=8, salt_groups=4)
    want = canonical(replay_oracle(clog))
    assert canonical(plain.final_table()).equals(want)
    assert canonical(salted.final_table()).equals(want)


def test_turn_shard_splits_giant_conversations(tmp_path):
    """turn_shard_size spreads one hot conv over many buckets, result equal."""
    spec = ChangelogSpec(n_events=10_000, n_convs=10, n_epochs=4, seed=14)
    clog = materialize("unit-giantconv", spec)
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8, turn_shard_size=5)
    assert canonical(lake.final_table()).equals(canonical(replay_oracle(clog)))
    # with 10 convs and shard=5, state must occupy most buckets
    assert len(lake.manifest.data["buckets"]) >= 6


def test_crash_between_data_rename_and_manifest(tmp_path):
    """Simulate dying after v{N} was renamed into place but before the
    manifest publish: reopen must discard the orphan version and re-apply."""
    spec = ChangelogSpec(n_events=6_000, n_convs=200, n_epochs=4, seed=15)
    clog = materialize("unit-crash", spec)
    lake_dir = str(tmp_path / "lake")
    lake = LakeTable.open(lake_dir, num_buckets=4)
    lake.apply(clog, max_epochs=2)
    committed_version = lake.manifest.version
    # fabricate the crash window: orphan newer version dir + stale staging,
    # backdated past the publish grace window (a FRESH orphan is treated as
    # a possibly-live peer's in-flight publish and left alone — see
    # test_concurrency.py)
    import time

    orphan_v = os.path.join(lake_dir, f"v{committed_version + 1}")
    shutil.copytree(os.path.join(lake_dir, f"v{committed_version}"), orphan_v)
    orphan_stg = os.path.join(lake_dir, "_staging", "v999-deadbeef")
    os.makedirs(os.path.join(orphan_stg, "bucket=00000"))
    old = time.time() - 3600
    # staleness is judged on the NEWEST mtime anywhere in the tree (a live
    # peer's long write into existing subdirs must not look abandoned), so
    # a genuinely-dead orphan means the WHOLE tree is old
    for root in (orphan_v, orphan_stg):
        for dirpath, dirnames, filenames in os.walk(root):
            for n in dirnames + filenames:
                os.utime(os.path.join(dirpath, n), (old, old))
        os.utime(root, (old, old))
    reopened = LakeTable.open(lake_dir, num_buckets=4)
    assert not os.path.exists(orphan_v)
    assert not os.path.exists(orphan_stg)
    reopened.apply(clog)  # remaining epochs
    assert canonical(reopened.final_table()).equals(canonical(replay_oracle(clog)))


def test_reopen_resume_across_instances(tmp_path):
    """Applying half the epochs with one instance and the rest with a fresh
    instance (new process stand-in) equals one-shot replay."""
    spec = ChangelogSpec(n_events=9_000, n_convs=300, n_epochs=6, seed=16)
    clog = materialize("unit-reopen", spec)
    a = LakeTable.open(str(tmp_path / "lake"), num_buckets=8)
    a.apply(clog, max_epochs=3)
    del a
    b = LakeTable.open(str(tmp_path / "lake"), num_buckets=8)
    b.apply(clog)
    one = replay(clog, str(tmp_path / "one"), num_buckets=8)
    assert canonical(b.final_table()).equals(canonical(one.final_table()))


def test_spill_and_actor_merge_match_sort(tmp_path, ray_session):
    """All three exchange paths (sort groupby, spill task pool, spill actor
    pool) must produce byte-identical final tables."""
    from sql_graph_visualizer_ray.pipelines.cdc import replay
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )

    spec = ChangelogSpec(n_events=8_000, n_convs=250, n_epochs=4, seed=21)
    clog = materialize("unit-exchange", spec)
    tables = {}
    for tag, kw in [
        ("sort", dict(shuffle="sort")),
        ("spill", dict(shuffle="spill")),
        ("actor", dict(shuffle="spill", merge_actors=True)),
    ]:
        lake = replay(clog, str(tmp_path / tag), num_buckets=8, **kw)
        tables[tag] = lake.final_table()
    assert tables["sort"].equals(tables["spill"])
    assert tables["sort"].equals(tables["actor"])


def test_wide_text_rows_replay(tmp_path):
    """64KB text payloads flow through replay correctly (block sizing:
    SURVEY.md §7.4 'Wide text rows') — spill exchange, no truncation."""
    import pyarrow.compute as pc

    from sql_graph_visualizer_ray.pipelines.cdc import replay
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )

    spec = ChangelogSpec(
        n_events=1_500, n_convs=30, n_epochs=3, seed=51, max_text_len=64_000
    )
    clog = materialize("unit-widetext", spec)
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=4, shuffle="spill")
    final = lake.final_table()
    assert final.num_rows > 0
    max_len = pc.max(pc.utf8_length(pc.coalesce(final.column("text"), ""))).as_py()
    assert max_len > 10_000, "wide texts should survive untruncated"


@pytest.mark.parametrize("evolution", ["addcol", "widen"])
def test_schema_evolution_through_spill_exchange(evolution, tmp_path):
    """Mid-stream schema evolution must produce identical results through the
    spill exchange as through the sort exchange (spill runs are normalized to
    the unified schema before hitting disk)."""
    from sql_graph_visualizer_ray.pipelines.cdc import replay
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )

    spec = ChangelogSpec(
        n_events=6_000, n_convs=200, n_epochs=6, seed=71, evolution=evolution
    )
    clog = materialize(f"unit-evolve-spill-{evolution}", spec)
    a = replay(clog, str(tmp_path / "sort"), num_buckets=8, shuffle="sort")
    b = replay(clog, str(tmp_path / "spill"), num_buckets=8, shuffle="spill")
    assert a.final_table().equals(b.final_table())
