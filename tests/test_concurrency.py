"""Optimistic concurrency on commits (``CommitConflictError`` + CAS publish).

The version-dir rename is the atomic claim on a version number: of two
writers based on the same manifest, exactly one publishes; the loser raises
with nothing mutated and retries after ``reload()``. The reference has no
concurrent-writer story at all (single process, destructive full refresh —
``/root/reference/cmd/main.go:165-177``); at 100 TB independent jobs
(ingest vs compaction, two ingest shards) WILL race on one table, so the
commit protocol has to arbitrate.
"""

import json
import os

import pytest

from sql_graph_visualizer_ray.pipelines.cdc import (
    CommitConflictError,
    LakeTable,
    replay,
)
from sql_graph_visualizer_ray.pipelines.oracle import replay_oracle
from sql_graph_visualizer_ray.sources.changelog import ChangelogSpec, materialize

from test_delta_compaction import canonical

SPEC = ChangelogSpec(n_events=8_000, n_convs=200, n_epochs=4, seed=83)


@pytest.fixture(scope="module")
def clog():
    return materialize("unit-conc", SPEC)


def test_stale_writer_conflicts_then_retries(clog, tmp_path):
    """B commits between A's manifest read and A's publish; A must raise,
    reload, retry — and the final lake equals the sequential replay."""
    path = str(tmp_path / "lake")
    a = LakeTable.open(path, num_buckets=8)
    a.apply(clog, max_epochs=2)
    b = LakeTable.open(path, num_buckets=8)
    b.apply(clog, max_epochs=1)  # B wins v(a+1): applies epoch 2
    with pytest.raises(CommitConflictError, match="another writer"):
        a.apply(clog, max_epochs=1)  # A still based on B's predecessor
    # nothing of A's attempt leaked into the published lake
    assert LakeTable.open(path, num_buckets=8).manifest.version == b.manifest.version
    a.reload()
    a.apply(clog)  # retry applies the remaining epochs
    assert canonical(a.final_table()).equals(canonical(replay_oracle(clog)))


def test_compaction_races_ingest(clog, tmp_path):
    """Compaction and ingest arbitrate through the same CAS: the loser
    (whichever it is) conflicts cleanly instead of silently dropping the
    winner's commit."""
    path = str(tmp_path / "lake")
    ingest = LakeTable.open(path, num_buckets=8)
    for _ in range(3):
        ingest.apply(clog, max_epochs=1)
    compactor = LakeTable.open(path, num_buckets=8)
    ingest.apply(clog, max_epochs=1)  # ingest advances past compactor's base
    with pytest.raises(CommitConflictError):
        compactor.compact()
    compactor.reload()
    out = compactor.compact()
    assert out["compacted_buckets"] > 0
    assert canonical(compactor.final_table()).equals(canonical(replay_oracle(clog)))


def test_crashed_attempt_garbage_is_reclaimed(clog, tmp_path):
    """A v{N} dir WITHOUT a manifest at >= N and older than the publish
    grace window is a crashed attempt: the next commit removes it and
    claims the version. The SAME dir while fresh is indistinguishable from
    a live peer mid-publish and must conflict instead."""
    import time

    path = str(tmp_path / "lake")
    lake = LakeTable.open(path, num_buckets=8)
    lake.apply(clog, max_epochs=2)
    orphan = os.path.join(path, f"v{lake.manifest.version + 1}")
    os.makedirs(os.path.join(orphan, "bucket=00000"))
    with open(os.path.join(orphan, "bucket=00000", "junk"), "w") as f:
        f.write("crashed")
    with pytest.raises(CommitConflictError, match="publishing right now"):
        lake.apply(clog)  # fresh orphan: could be a live peer — hands off
    old = time.time() - 3600
    # staleness is judged on the NEWEST mtime in the tree — age all of it
    for dirpath, dirnames, filenames in os.walk(orphan):
        for n in dirnames + filenames:
            os.utime(os.path.join(dirpath, n), (old, old))
    os.utime(orphan, (old, old))
    lake.apply(clog)  # stale orphan: reclaimed, version claimed
    assert not os.path.exists(os.path.join(orphan, "bucket=00000", "junk"))
    assert canonical(lake.final_table()).equals(canonical(replay_oracle(clog)))


@pytest.mark.parametrize("shuffles", [("sort", "sort"), ("sort", "spill")])
def test_two_writers_race_to_completion(clog, tmp_path, shuffles):
    """Two writer instances race epoch-by-epoch over the same lake with a
    conflict-retry loop (the documented client protocol). Whatever the
    interleaving: every epoch applies exactly once (fencing), the union of
    both writers' work is the full changelog, and the result equals the
    sequential-replay oracle. The mixed sort/spill variant exercises the
    writer-unique spill scratch dirs under contention too."""
    import threading

    path = str(tmp_path / "lake")
    LakeTable.open(path, num_buckets=8)  # create
    applied = {"a": 0, "b": 0, "conflicts": 0}
    lock = threading.Lock()
    errors = []

    def writer(tag: str, shuffle: str):
        lake = LakeTable.open(path, num_buckets=8)
        try:
            while True:
                try:
                    c = lake.apply(clog, max_epochs=1, shuffle=shuffle)
                except CommitConflictError:
                    with lock:
                        applied["conflicts"] += 1
                    lake.reload()
                    continue
                if not c.get("epochs"):
                    break
                with lock:
                    applied[tag] += c["epochs"]
        except Exception as e:  # surface thread failures in the main thread
            errors.append((tag, e))

    ts = [
        threading.Thread(target=writer, args=(t, sh))
        for t, sh in zip(("a", "b"), shuffles)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errors, errors
    assert applied["a"] + applied["b"] == SPEC.n_epochs, applied
    final = LakeTable.open(path, num_buckets=8)
    assert canonical(final.final_table()).equals(canonical(replay_oracle(clog)))


def test_open_preserves_fresh_peer_staging(clog, tmp_path):
    """Opening a lake must NOT collect a FRESH staging dir (it may belong
    to a live peer writer mid-commit); a stale one is garbage and goes."""
    import time

    path = str(tmp_path / "lake")
    lake = LakeTable.open(path, num_buckets=8)
    lake.apply(clog, max_epochs=1)
    fresh = os.path.join(path, "_staging", "v9-feedf00d")
    sub = os.path.join(fresh, "bucket=00000")
    os.makedirs(sub)
    LakeTable.open(path, num_buckets=8)
    assert os.path.isdir(fresh), "fresh peer staging was collected at open"
    old = time.time() - 3600
    # age the ROOT but keep a fresh file deep in the tree: a long write
    # phase into an existing bucket subdir never touches the root mtime,
    # so staleness must be judged on the newest mtime anywhere in the tree
    with open(os.path.join(sub, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    os.utime(fresh, (old, old))
    LakeTable.open(path, num_buckets=8)
    assert os.path.isdir(fresh), "live peer's long write was collected"
    # age the WHOLE tree -> genuinely abandoned -> collected
    for dirpath, dirnames, filenames in os.walk(fresh):
        for n in dirnames + filenames:
            os.utime(os.path.join(dirpath, n), (old, old))
    os.utime(fresh, (old, old))
    LakeTable.open(path, num_buckets=8)
    assert not os.path.exists(fresh), "stale staging survived the grace"


def test_loser_manifest_not_corrupted(clog, tmp_path):
    """After a conflict the on-disk manifest is exactly the winner's —
    byte-identical before and after the loser's failed attempt."""
    path = str(tmp_path / "lake")
    a = LakeTable.open(path, num_buckets=8)
    a.apply(clog, max_epochs=1)
    b = LakeTable.open(path, num_buckets=8)
    b.apply(clog, max_epochs=1)
    with open(os.path.join(path, "MANIFEST.json")) as f:
        before = json.load(f)
    with pytest.raises(CommitConflictError):
        a.apply(clog, max_epochs=1)
    with open(os.path.join(path, "MANIFEST.json")) as f:
        after = json.load(f)
    assert before == after


def test_commit_with_retry_one_liner(clog, tmp_path):
    """The convenience wrapper for the reload/retry protocol: a stale
    writer's commit goes through ``commit_with_retry`` with no hand-rolled
    loop, the conflict is surfaced to the hook, and the final lake equals
    the sequential oracle."""
    path = str(tmp_path / "lake")
    a = LakeTable.open(path, num_buckets=8)
    a.apply(clog, max_epochs=2)
    b = LakeTable.open(path, num_buckets=8)
    b.apply(clog, max_epochs=1)  # B wins v3; A is now stale

    conflicts = []
    c = a.commit_with_retry(
        lambda lk: lk.apply(clog), on_conflict=conflicts.append
    )
    assert len(conflicts) == 1 and isinstance(conflicts[0], CommitConflictError)
    assert c.get("epochs", 0) >= 1
    assert canonical(a.final_table()).equals(canonical(replay_oracle(clog)))


def test_commit_with_retry_exhausts(clog, tmp_path):
    """When every attempt conflicts the last error re-raises."""
    path = str(tmp_path / "lake")
    a = LakeTable.open(path, num_buckets=8)
    a.apply(clog, max_epochs=1)

    def always_conflicts(lk):
        raise CommitConflictError("synthetic")

    with pytest.raises(CommitConflictError, match="synthetic"):
        a.commit_with_retry(always_conflicts, max_attempts=3)


def test_commit_with_retry_hook_and_validation(clog, tmp_path):
    """The on_conflict hook fires once per actual retry (not after the
    final failed attempt), and a non-positive max_attempts is a clear
    ValueError, not a stray AssertionError."""
    path = str(tmp_path / "lake")
    a = LakeTable.open(path, num_buckets=8)
    a.apply(clog, max_epochs=1)

    def always_conflicts(lk):
        raise CommitConflictError("synthetic")

    hook = []
    with pytest.raises(CommitConflictError):
        a.commit_with_retry(always_conflicts, max_attempts=3, on_conflict=hook.append)
    assert len(hook) == 2  # 3 attempts -> 2 retries

    with pytest.raises(ValueError, match="max_attempts"):
        a.commit_with_retry(always_conflicts, max_attempts=0)


def test_tail_survives_commit_conflict(clog, tmp_path, monkeypatch):
    """The long-running ingest loop must not die when a concurrent writer
    (an operator's CLI compact/split) wins the version CAS mid-tail —
    tail commits through commit_with_retry, so a conflict costs one
    reload-and-retry and the loop finishes to oracle equality."""
    from sql_graph_visualizer_ray.pipelines.streaming import tail

    real_apply = LakeTable.apply
    fired = []

    def flaky_apply(self, *a, **kw):
        if not fired:
            fired.append(1)
            raise CommitConflictError("synthetic: concurrent writer won the CAS")
        return real_apply(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "apply", flaky_apply)
    lake = tail(
        clog,
        str(tmp_path / "lake"),
        num_buckets=8,
        idle_timeout=0.1,
        stop_after_epoch=SPEC.n_epochs,
    )
    assert fired  # the conflict actually fired inside the loop
    assert canonical(lake.final_table()).equals(canonical(replay_oracle(clog)))


def test_stats_survive_cas_retry(clog, tmp_path):
    """File statistics ride the counter rows into the manifest AFTER the
    version claim; a losing writer's retry must leave every live file
    covered (no stats lost or attributed to the losing attempt's paths),
    including through backfill_stats racing an ingest."""
    path = str(tmp_path / "lake")
    a = LakeTable.open(path, num_buckets=8)
    a.apply(clog, max_epochs=1)
    b = LakeTable.open(path, num_buckets=8)
    b.apply(clog, max_epochs=1)  # B wins the next version
    a.commit_with_retry(lambda lk: lk.apply(clog, max_epochs=1))
    live = set(a.manifest.bucket_paths(path))
    covered = set(a.manifest.file_stats(path))
    assert covered == live and live, "every live file must carry stats"
    # every stats relpath points at a real file (no losing-attempt paths)
    for p in covered:
        assert os.path.exists(p)

    # backfill_stats loses a race to an ingest, retries, still exact
    m = a.manifest
    for bkt in m.data["buckets"].values():
        bkt.pop("stats", None)
    m.save_atomic(path)
    backfiller = LakeTable.open(path, num_buckets=8)
    ingest = LakeTable.open(path, num_buckets=8)
    ingest.apply(clog, max_epochs=1)  # advances past backfiller's base
    with pytest.raises(CommitConflictError):
        backfiller.backfill_stats()
    backfiller.reload()
    r = backfiller.backfill_stats()
    assert r["files_backfilled"] > 0
    fresh = LakeTable.open(path, num_buckets=8)
    assert canonical(fresh.final_table()).equals(canonical(replay_oracle(clog)))
