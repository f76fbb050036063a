"""Replay-equivalence: the distributed pipeline's final table must equal the
single-process oracle byte-for-byte (per-turn text equality under stable
(conv_id, turn_idx) ordering — BASELINE.json input_hint)."""

import pyarrow.compute as pc
import pytest

from sql_graph_visualizer_ray.pipelines.cdc import replay
from sql_graph_visualizer_ray.pipelines.oracle import replay_oracle
from sql_graph_visualizer_ray.sources.changelog import ChangelogSpec, materialize

SPEC = ChangelogSpec(n_events=12_000, n_convs=400, n_epochs=6, seed=7)


@pytest.fixture(scope="module")
def changelog_dir():
    return materialize("unit-basic", SPEC)


def canonical(t):
    cols = sorted(t.column_names)
    t = t.select(cols)
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )


def test_replay_matches_oracle(changelog_dir, tmp_path):
    lake = replay(changelog_dir, str(tmp_path / "lake"), num_buckets=8)
    got = canonical(lake.final_table())
    want = canonical(replay_oracle(changelog_dir))
    assert got.schema.names == want.schema.names
    assert got.num_rows == want.num_rows
    assert got.equals(want), "final table differs from oracle"
    # per-turn text equality, explicitly
    assert got.column("text").equals(want.column("text"))


def test_lineage_counters(changelog_dir, tmp_path):
    lake = replay(changelog_dir, str(tmp_path / "lake"), num_buckets=8)
    c = lake.manifest.data["counters"]
    assert c["raw_events"] == SPEC.n_events
    # every raw event is accounted for: applied live, tombstoned, superseded
    # in merge, or dropped by the pre-shuffle combiner
    assert (
        c["upserts"] + c["deletes"] + c["superseded"] + c["precompact_dropped"]
        == c["raw_events"]
    )
    assert lake.manifest.applied_epoch == SPEC.n_epochs - 1


def test_idempotent_reapply(changelog_dir, tmp_path):
    lake = replay(changelog_dir, str(tmp_path / "lake"), num_buckets=8)
    before = canonical(lake.final_table())
    c = lake.apply(changelog_dir)  # nothing new
    assert c["epochs"] == 0
    assert canonical(lake.final_table()).equals(before)


def test_multi_commit_equals_single_commit(changelog_dir, tmp_path):
    one = replay(changelog_dir, str(tmp_path / "one"), num_buckets=8)
    inc = replay(
        changelog_dir, str(tmp_path / "inc"), num_buckets=8, epochs_per_commit=2
    )
    assert canonical(one.final_table()).equals(canonical(inc.final_table()))
    assert inc.manifest.version == 3  # 6 epochs / 2 per commit


def test_tombstone_blocks_late_resurrection(tmp_path):
    """A late event with an OLDER ts than an applied delete must not
    resurrect the row — tombstones persist in lake files and win the LWW
    merge (SURVEY.md §7.4). Hand-built two-epoch changelog:
      epoch 0: insert (ts=100), delete (ts=300)
      epoch 1: late update, ts=200 < 300 (arrives after the delete applied)
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sql_graph_visualizer_ray.pipelines.cdc import LakeTable

    clog = tmp_path / "clog"
    clog.mkdir()
    base = 1_700_000_000_000_000

    def ev(lsn, epoch, op, turn, ts_off, text):
        return {
            "lsn": lsn, "epoch": epoch, "op": op, "conv_id": "conv0",
            "turn_idx": turn, "role": None if op == "D" else "user",
            "text": None if op == "D" else text, "tool": None,
            "ts": base + ts_off,
        }

    schema = pa.schema([
        ("lsn", pa.int64()), ("epoch", pa.int32()), ("op", pa.string()),
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()), ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ])
    e0 = pa.Table.from_pylist(
        [ev(0, 0, "I", 7, 100, "v1"), ev(1, 0, "D", 7, 300, None),
         ev(2, 0, "I", 8, 100, "keep")], schema=schema)
    e1 = pa.Table.from_pylist([ev(3, 1, "U", 7, 200, "zombie")], schema=schema)
    pq.write_table(e0, clog / "epoch_00000.parquet")

    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=4)
    lake.apply(str(clog), upto_epoch=0)
    assert lake.final_table().num_rows == 1  # turn 7 deleted, turn 8 lives

    pq.write_table(e1, clog / "epoch_00001.parquet")
    lake.apply(str(clog))
    final = lake.final_table()
    assert final.num_rows == 1, "late pre-delete update resurrected the row"
    assert final.column("text").to_pylist() == ["keep"]


def test_vacuum_removes_unreferenced_versions(tmp_path):
    """Delta commits keep every version dir referenced; after a compaction
    commit rewrites the buckets, vacuum() deletes the de-referenced version
    dirs and the live table is unaffected."""
    import os

    from sql_graph_visualizer_ray.pipelines.cdc import replay
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )
    from sql_graph_visualizer_ray.state.manifest import vacuum

    clog = materialize(
        "unit-vacuum", ChangelogSpec(n_events=4_000, n_convs=100, n_epochs=4, seed=31)
    )
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=4, epochs_per_commit=1)
    before = lake.final_table()
    versions = [n for n in os.listdir(lake.path) if n.startswith("v")]
    assert len(versions) >= 2  # multiple delta commits -> multiple versions
    assert vacuum(lake.path, lake.manifest) == 0  # all still referenced
    res = lake.compact()
    assert res["compacted_buckets"] >= 1
    removed = vacuum(lake.path, lake.manifest)
    assert removed >= 1
    assert lake.final_table().equals(before)


def test_streaming_tail_follows_growing_changelog(tmp_path):
    """The tail loop applies epochs as a writer adds them; the final lake
    equals a one-shot replay of the complete changelog."""
    import shutil
    import threading
    import time as _time

    from sql_graph_visualizer_ray.pipelines.cdc import replay
    from sql_graph_visualizer_ray.pipelines.streaming import tail
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        epoch_files,
        materialize,
    )

    spec = ChangelogSpec(n_events=6_000, n_convs=150, n_epochs=5, seed=41)
    full = materialize("unit-tail", spec)
    files = epoch_files(full)
    live = tmp_path / "live_clog"
    live.mkdir()
    # two epochs exist before the tail starts; the rest arrive while it runs
    for _, p in files[:2]:
        shutil.copy(p, live)

    def writer():
        for _, p in files[2:]:
            _time.sleep(0.4)
            shutil.copy(p, live / (p.split("/")[-1] + ".tmp"))
            (live / (p.split("/")[-1] + ".tmp")).rename(live / p.split("/")[-1])

    w = threading.Thread(target=writer)
    w.start()
    lake = tail(
        str(live),
        str(tmp_path / "lake"),
        num_buckets=4,
        poll_interval=0.2,
        stop_after_epoch=spec.n_epochs - 1,
    )
    w.join()
    oneshot = replay(full, str(tmp_path / "oneshot"), num_buckets=4)
    assert lake.final_table().equals(oneshot.final_table())
    assert lake.manifest.data["history"], "tail should have made commits"


def test_duplicate_events_collapse(tmp_path):
    """Exact duplicate events (same lsn — what a retried producer or a
    replayed spill run creates) must collapse to the same final state as the
    clean changelog. This is the idempotence property task-retry safety
    rests on."""
    import shutil

    import pyarrow.parquet as pq

    from sql_graph_visualizer_ray.pipelines.cdc import replay
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        epoch_files,
        materialize,
    )

    spec = ChangelogSpec(n_events=5_000, n_convs=120, n_epochs=4, seed=61)
    clean = materialize("unit-dupev", spec)
    duped = tmp_path / "duped_clog"
    duped.mkdir()
    for e, p in epoch_files(clean):
        t = pq.read_table(p)
        import pyarrow as pa

        pq.write_table(
            pa.concat_tables([t, t]), duped / f"epoch_{e:05d}.parquet"
        )

    a = replay(clean, str(tmp_path / "clean_lake"), num_buckets=4, shuffle="spill")
    b = replay(str(duped), str(tmp_path / "duped_lake"), num_buckets=4, shuffle="spill")
    assert a.final_table().equals(b.final_table())


def test_tombstone_compaction_watermark(tmp_path):
    """compact_tombstones drops only tombstones older than the lateness
    watermark; the live view is unchanged, and a within-bound late event can
    still not resurrect a row."""
    import pyarrow.compute as pc

    from sql_graph_visualizer_ray.pipelines.cdc import replay
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )

    spec = ChangelogSpec(
        n_events=8_000, n_convs=200, n_epochs=4, seed=91, p_delete=0.15
    )
    clog = materialize("unit-compact", spec)
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=4)
    before_live = lake.final_table()
    tombs_before = sum(
        b["tombstones"] for b in lake.manifest.data["buckets"].values()
    )
    assert tombs_before > 0

    # generous lateness bound: nothing old enough to drop yet
    res_keep = lake.compact_tombstones(allowed_lateness_us=10**15)
    assert res_keep["dropped"] == 0

    # tight bound: every tombstone is past the watermark
    res_drop = lake.compact_tombstones(allowed_lateness_us=0)
    assert res_drop["dropped"] == tombs_before
    tombs_after = sum(
        b["tombstones"] for b in lake.manifest.data["buckets"].values()
    )
    assert tombs_after == 0
    assert lake.final_table().equals(before_live)


def test_tail_with_auto_compaction(tmp_path):
    """The ingest loop's size-tiered compaction keeps per-bucket file counts
    bounded while the tail follows the changelog; result unchanged."""
    from sql_graph_visualizer_ray.pipelines.streaming import tail
    from sql_graph_visualizer_ray.sources.changelog import (
        ChangelogSpec,
        materialize,
    )

    spec = ChangelogSpec(n_events=6_000, n_convs=150, n_epochs=6, seed=43)
    clog = materialize("unit-tailcompact", spec)
    lake = tail(
        str(clog), str(tmp_path / "lake"), num_buckets=4,
        stop_after_epoch=spec.n_epochs - 1, idle_timeout=2.0,
        max_epochs=1,  # one commit per epoch -> deltas accumulate fast
        auto_compact_files=2,
    )
    assert all(
        len(b["files"]) <= 2 for b in lake.manifest.data["buckets"].values()
    )
    from sql_graph_visualizer_ray.pipelines.oracle import replay_oracle

    assert canonical(lake.final_table()).equals(canonical(replay_oracle(clog)))


def test_naive_tail_stays_bounded(tmp_path):
    """Out-of-the-box management: a tail loop with NO tuning (defaults:
    compact at 8 files per bucket) keeps per-bucket file counts bounded
    while committing once per epoch, and the result still equals the
    oracle. (The 1 GiB default split threshold is exercised by the
    maybe_auto_split unit tests; these fixtures never reach it.)"""
    from sql_graph_visualizer_ray.pipelines.streaming import tail

    spec = ChangelogSpec(n_events=12_000, n_convs=200, n_epochs=12, seed=77)
    clog = materialize("unit-naive-tail", spec)
    lake = tail(
        clog,
        str(tmp_path / "lake"),
        num_buckets=4,
        idle_timeout=1.0,
        poll_interval=0.05,
        max_epochs=1,  # one commit per epoch: 12 commits
    )
    by_bucket = lake.manifest.bucket_files(lake.path)
    worst = max(len(f) for f in by_bucket.values())
    assert worst <= 8, f"unbounded delta files: {worst}"
    assert canonical(lake.final_table()).equals(canonical(replay_oracle(clog)))
