"""Time-travel snapshot reads (``LakeTable.snapshot`` / ``read_final(version=)``).

Every commit pins its table state as ``v{N}/_snapshot.json`` (Iceberg-style
per-commit metadata); because commits never mutate published files, reading
through an old snapshot reproduces that commit's exact state until
``vacuum()`` deletes the de-referenced version dirs.
"""

import pytest

from sql_graph_visualizer_ray.pipelines.cdc import LakeTable, replay
from sql_graph_visualizer_ray.pipelines.oracle import replay_oracle
from sql_graph_visualizer_ray.sources.changelog import ChangelogSpec, materialize
from sql_graph_visualizer_ray.state.manifest import vacuum

from test_delta_compaction import canonical

SPEC = ChangelogSpec(n_events=8_000, n_convs=200, n_epochs=4, seed=31)


@pytest.fixture(scope="module")
def clog():
    return materialize("unit-timetravel", SPEC)


def test_every_commit_version_is_readable(clog, tmp_path):
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8, epochs_per_commit=1)
    head = lake.manifest.version
    assert head == SPEC.n_epochs  # one commit per epoch, v1..v4
    for v in range(1, head + 1):
        want = canonical(replay_oracle(clog, max_epoch=v - 1))
        got = canonical(lake.final_table(version=v))
        assert got.equals(want), f"snapshot v{v} diverged"
    # version=head is the live view (no snapshot indirection)
    assert lake.snapshot(head) is lake


def test_snapshots_survive_compaction_until_vacuum(clog, tmp_path):
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8, epochs_per_commit=1)
    v_old = 2
    want_old = canonical(lake.final_table(version=v_old))
    lake.compact()
    # compaction de-references old version dirs but leaves them on disk:
    # the pre-compaction snapshot still reads exactly
    assert canonical(lake.final_table(version=v_old)).equals(want_old)
    removed = vacuum(lake.path, lake.manifest)
    assert removed > 0
    with pytest.raises(KeyError, match="vacuum"):
        lake.snapshot(v_old)


def test_vacuum_retention_window(clog, tmp_path):
    """``vacuum(min_age_s=W)`` reclaims a de-referenced version dir only
    once W seconds have passed since a vacuum pass FIRST SAW it
    de-referenced (marker file) — the knob that makes compact+vacuum safe
    on a live server whose pinned per-request reads finish within W. The
    clock must start at de-reference time, not publish time: dirs published
    long before the compaction still get the full window."""
    import time as _time

    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8, epochs_per_commit=1)
    v_old = 2
    want_old = canonical(lake.final_table(version=v_old))
    # age the version dirs' publish mtimes far past any window: retention
    # keyed on publish time would (wrongly) reclaim them instantly
    import os

    for name in os.listdir(lake.path):
        if name.startswith("v") and name[1:].isdigit():
            os.utime(os.path.join(lake.path, name), (1.0, 1.0))
    lake.compact()
    # first retention pass only starts the clocks (marker files)
    assert vacuum(lake.path, lake.manifest, min_age_s=0.2) == 0
    # inside the window: still kept, snapshot fully readable
    assert vacuum(lake.path, lake.manifest, min_age_s=0.2) == 0
    assert canonical(lake.final_table(version=v_old)).equals(want_old)
    # window elapsed since the marking pass: reclaimed
    _time.sleep(0.25)
    assert vacuum(lake.path, lake.manifest, min_age_s=0.2) > 0
    with pytest.raises(KeyError, match="vacuum"):
        lake.snapshot(v_old)


def test_vacuum_aggressive_ignores_markers(clog, tmp_path):
    """min_age_s=0 (offline maintenance) reclaims immediately, marker or
    not."""
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8, epochs_per_commit=1)
    lake.compact()
    assert vacuum(lake.path, lake.manifest, min_age_s=3600.0) == 0  # marks only
    assert vacuum(lake.path, lake.manifest) > 0


def test_snapshot_is_readonly_and_split_safe(clog, tmp_path):
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=4, epochs_per_commit=2)
    v_pre = lake.manifest.version
    pre_state = canonical(lake.final_table())
    lake.split_buckets(8)
    assert lake.manifest.num_buckets == 8
    snap = lake.snapshot(v_pre)
    # snapshot pins the pre-split bucket layout and state
    assert snap.manifest.num_buckets == 4
    assert canonical(snap.final_table()).equals(pre_state)
    with pytest.raises(RuntimeError, match="read-only"):
        snap.apply(clog)
    with pytest.raises(RuntimeError, match="read-only"):
        snap.compact()


def test_unknown_version_raises(clog, tmp_path):
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=4)
    with pytest.raises(KeyError):
        lake.snapshot(99)
