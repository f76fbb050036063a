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
