"""Manifest-level per-file column statistics (data skipping).

Every write task records min/max per stat-eligible column of the file it
writes; the manifest stores them per bucket file and the serving readers
(``lookup`` / ``search``) plus ``read_final(keys=)`` skip whole files whose
range provably misses — the Iceberg/Delta data-skipping pattern, applied on
top of parquet row-group pruning. Reference analogue: the reference has no
file pruning at all (every fetch is a full SQL/Cypher scan,
``/root/reference/internal/infrastructure/persistence/neo4j/repository.go:239-299``);
this is what makes the same fetches O(matching files) on a 100 TB lake.
"""

import datetime as dt
from unittest import mock

import pyarrow as pa
import pytest

import ray.data as rd

from sql_graph_visualizer_ray.pipelines import cdc
from sql_graph_visualizer_ray.pipelines.cdc import (
    LakeTable,
    _column_stats,
    _stats_range_hits,
    _stats_reject,
)

TS0 = dt.datetime(2023, 11, 14, 12, 0, 0)


def _events(convs, turn0=0, nturns=3, lsn0=0, text="hello world", extra=None):
    rows = {
        "lsn": [], "epoch": [], "op": [], "conv_id": [], "turn_idx": [],
        "role": [], "text": [], "tool": [], "ts": [],
    }
    if extra:
        rows[extra[0]] = []
    lsn = lsn0
    for c in convs:
        for t in range(turn0, turn0 + nturns):
            rows["lsn"].append(lsn)
            rows["epoch"].append(0)
            rows["op"].append("I")
            rows["conv_id"].append(c)
            rows["turn_idx"].append(t)
            rows["role"].append("user" if t % 2 == 0 else "assistant")
            rows["text"].append(f"{text} {c} {t}")
            rows["tool"].append(None)
            rows["ts"].append(TS0 + dt.timedelta(seconds=lsn))
            if extra:
                rows[extra[0]].append(extra[1])
            lsn += 1
    t = pa.table(rows)
    return t.set_column(
        t.schema.get_field_index("turn_idx"),
        "turn_idx",
        t.column("turn_idx").cast(pa.int32()),
    ).set_column(
        t.schema.get_field_index("epoch"),
        "epoch",
        t.column("epoch").cast(pa.int32()),
    )


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    """Single-bucket lake with two delta commits over DISJOINT conv ranges
    (a* then b*) — file skipping inside one bucket is directly observable."""
    lk = LakeTable.open(str(tmp_path_factory.mktemp("fs") / "lake"), num_buckets=1)
    lk.apply_dataset(rd.from_arrow(_events([f"a{i:03d}" for i in range(20)])), epoch=0)
    lk.apply_dataset(
        rd.from_arrow(_events([f"b{i:03d}" for i in range(20)], lsn0=10_000)),
        epoch=1,
    )
    return lk


def _spy_reads(fn):
    """Collect every file path cdc opens via pq.read_table — batched reads
    pass a LIST of paths (one dataset scanner), so flatten."""
    opened = []
    real = cdc.pq.read_table

    def spy(path, *a, **kw):
        opened.extend(path if isinstance(path, list) else [path])
        return real(path, *a, **kw)

    with mock.patch.object(cdc.pq, "read_table", side_effect=spy):
        out = fn()
    return out, opened


# ---------------------------------------------------------------------------
# Kernel unit tests
# ---------------------------------------------------------------------------


def test_stats_reject_ops():
    st = [10, 20]
    assert _stats_reject(st, "=", 5) and _stats_reject(st, "=", 25)
    assert not _stats_reject(st, "=", 10) and not _stats_reject(st, "=", 20)
    assert _stats_reject(st, "<", 10) and not _stats_reject(st, "<", 11)
    assert _stats_reject(st, "<=", 9) and not _stats_reject(st, "<=", 10)
    assert _stats_reject(st, ">", 20) and not _stats_reject(st, ">", 19)
    assert _stats_reject(st, ">=", 21) and not _stats_reject(st, ">=", 20)
    assert _stats_reject([7, 7], "!=", 7) and not _stats_reject(st, "!=", 15)
    # all-null column: nothing satisfies any predicate readers support
    assert _stats_reject([None, None], "=", 1)
    assert _stats_reject([None, None], "contains", "x")
    # unknowable cases never reject
    assert not _stats_reject(None, "=", 1)
    assert not _stats_reject(st, "=", None)
    assert not _stats_reject(st, "contains", 15)
    assert not _stats_reject(st, "=", "cross-type")  # TypeError -> scan


def test_stats_range_hits():
    assert _stats_range_hits(None, [1])  # no stats: must scan
    assert not _stats_range_hits([None, None], [1])  # all-null: skip
    assert _stats_range_hits([5, 9], [1, 7])
    assert not _stats_range_hits([5, 9], [1, 4, 10])
    assert _stats_range_hits(["b", "d"], ["c"])
    assert _stats_range_hits([5, 9], ["cross-type"])  # TypeError -> scan


def test_column_stats_shapes():
    t = pa.table(
        {
            "conv_id": ["c2", "c1"],
            "turn_idx": pa.array([3, 1], pa.int32()),
            "ts": pa.array([TS0, TS0 + dt.timedelta(seconds=5)], pa.timestamp("us")),
            "text": ["x" * 200, "y"],  # bound over the string cap -> omitted
            "allnull": pa.array([None, None], pa.string()),
            "_lsn": pa.array([1, 2], pa.int64()),  # hidden -> omitted
            "payload": pa.array([b"a", b"b"], pa.binary()),  # ineligible
        }
    )
    st = _column_stats(t)
    assert st["conv_id"] == ["c1", "c2"]
    assert st["turn_idx"] == [1, 3]
    micros = int(TS0.timestamp() * 1_000_000)
    assert st["ts"] == [micros, micros + 5_000_000]
    assert st["allnull"] == [None, None]
    assert "text" not in st and "_lsn" not in st and "payload" not in st
    assert _column_stats(t.slice(0, 0)) == {}


# ---------------------------------------------------------------------------
# Lake integration
# ---------------------------------------------------------------------------


def test_stats_recorded_per_delta_file(lake):
    fs = lake.manifest.file_stats(lake.path)
    files = lake.manifest.bucket_paths(lake.path)
    assert len(files) == 2 and set(fs) == set(files)
    ranges = sorted(st["conv_id"] for st in fs.values())
    assert ranges[0][0].startswith("a") and ranges[0][1].startswith("a")
    assert ranges[1][0].startswith("b") and ranges[1][1].startswith("b")


def test_lookup_skips_nonmatching_delta(lake):
    exp = lake.final_table().to_pandas()
    exp = exp[exp.conv_id == "a005"].reset_index(drop=True)
    got, opened = _spy_reads(lambda: lake.lookup(["a005"]))
    assert got.to_pandas().reset_index(drop=True).equals(exp)
    assert len(opened) == 1, "b-range delta must be skipped by conv_id stats"


def test_search_skips_by_range_predicate(lake):
    # conv_id > 'b' can only live in the second delta
    got, opened = _spy_reads(lambda: lake.search("conv_id", ">=", "b000"))
    assert set(got.to_pandas().conv_id) == {f"b{i:03d}" for i in range(20)}
    # phase 2's lookup reads only the b file (phase 1 streams through a
    # dataset scanner the pq.read_table spy cannot see)
    assert all("v2" in p for p in opened)
    # a predicate outside every file's range opens nothing at all
    got, opened = _spy_reads(lambda: lake.search("conv_id", ">", "zzz"))
    assert got.num_rows == 0 and opened == []
    # behavioral proof that PHASE 1 skips too: delete the a-file on a copy;
    # a b-range search (stats-pruned to the b file) must still succeed,
    # while a search needing the deleted file fails
    import os
    import shutil

    dst = lake.path + "-p1skip"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(lake.path, dst)
    lk = LakeTable.open(dst)
    a_file = next(
        p
        for p, st in lk.manifest.file_stats(dst).items()
        if st["conv_id"][0].startswith("a")
    )
    os.remove(a_file)
    ok = lk.search("conv_id", ">=", "b000")
    assert set(ok.to_pandas().conv_id) == {f"b{i:03d}" for i in range(20)}
    with pytest.raises(Exception):
        lk.search("conv_id", "<=", "a999")


def test_search_correct_when_stats_absent(lake):
    """A pre-stats manifest (stats stripped) must still produce identical
    results — pruning is an optimization, never a correctness input."""
    stripped = LakeTable.open(lake.path)
    for b in stripped.manifest.data["buckets"].values():
        b.pop("stats", None)
    want = lake.search("conv_id", ">=", "b000").to_pandas()
    got = stripped.search("conv_id", ">=", "b000").to_pandas()
    assert got.equals(want)


def test_read_final_keys_skips_files(lake):
    """The merge tasks run in Ray workers where a driver-side read spy can't
    see, so prove the skip behaviorally: delete the a-range delta on a copy —
    a stats-pruned keyed read never opens it and must still succeed."""
    import os
    import shutil

    dst = lake.path + "-readfinal"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(lake.path, dst)
    lk = LakeTable.open(dst)
    fs = lk.manifest.file_stats(lk.path)
    a_file = next(p for p, st in fs.items() if st["conv_id"][0].startswith("a"))
    os.remove(a_file)
    df = lk.read_final(keys=["b003"]).to_pandas()
    assert set(df.conv_id) == {"b003"} and len(df) == 3
    with pytest.raises(Exception):  # unpruned key DOES need the deleted file
        lk.read_final(keys=["a003"]).materialize()


def test_compaction_replaces_stats(lake):
    # compact on a COPY so the module-scoped lake stays two-file
    import shutil

    dst = lake.path + "-compacted"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(lake.path, dst)
    lk = LakeTable.open(dst)
    lk.compact()
    fs = lk.manifest.file_stats(lk.path)
    files = lk.manifest.bucket_paths(lk.path)
    assert len(files) == 1 and set(fs) == set(files)
    st = next(iter(fs.values()))
    assert st["conv_id"] == ["a000", "b019"]
    # post-compaction search still exact
    got = lk.search("conv_id", "=", "a007")
    assert set(got.to_pandas().turn_idx) == {0, 1, 2}


def test_split_carries_stats(lake):
    import shutil

    dst = lake.path + "-split"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(lake.path, dst)
    lk = LakeTable.open(dst)
    lk.split_buckets(4)
    fs = lk.manifest.file_stats(lk.path)
    assert set(fs) == set(lk.manifest.bucket_paths(lk.path))
    got, opened = _spy_reads(lambda: lk.lookup(["a005"]))
    assert got.num_rows == 3 and len(opened) == 1


def test_snapshot_time_travel_keeps_stats(lake):
    got, opened = _spy_reads(
        lambda: lake.search("conv_id", ">=", "b000", version=1)
    )
    assert got.num_rows == 0, "v1 predates the b-range commit"
    assert opened == [], "v1 snapshot stats must prune the a-range file"


def test_search_ts_pushdown(lake):
    full = lake.final_table().to_pandas()
    cut = full.ts.quantile(0.5).to_pydatetime()
    got = lake.search("ts", ">", cut).to_pandas()
    exp = full[full.ts > cut]
    assert len(got) == len(exp) > 0
    # a ts below every file's min opens nothing
    got, opened = _spy_reads(
        lambda: lake.search("ts", "<", TS0 - dt.timedelta(days=1))
    )
    assert got.num_rows == 0 and opened == []


def test_evolution_all_null_column_skips(lake):
    """After add-column evolution, a rewritten file whose new column is
    all-null records [None, None] and search skips it outright."""
    import shutil

    dst = lake.path + "-evolved"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(lake.path, dst)
    lk = LakeTable.open(dst)
    lk.apply_dataset(
        rd.from_arrow(
            _events(["c000"], lsn0=20_000, extra=("score", 0.75))
        ),
        epoch=2,
    )
    lk.compact()  # one file; a/b rows carry score = null
    got = lk.search("score", ">", 0.5).to_pandas()
    assert set(got.conv_id) == {"c000"}
    # rewrite the c rows away and confirm the all-null file is skipped
    lk2 = LakeTable.open(lake.path + "-evolved2")
    shutil.rmtree(lk2.path, ignore_errors=True)
    shutil.copytree(lake.path, lk2.path)
    lk2 = LakeTable.open(lk2.path)
    ev = _events(["d000"], lsn0=30_000)
    ev = ev.append_column("score", pa.nulls(ev.num_rows, pa.float64()))
    lk2.apply_dataset(rd.from_arrow(ev), epoch=2)
    lk2.compact()
    got, opened = _spy_reads(lambda: lk2.search("score", ">", 0.5))
    assert got.num_rows == 0 and opened == []


def test_backfill_stats_from_footers(lake):
    """Metadata-only backfill: strip the stats (a pre-stats lake), recover
    numeric/timestamp bounds from parquet footers with zero data reads, and
    prove pruning works again — while string columns stay uncovered (footer
    string bounds may be truncated) and results stay exact."""
    import shutil

    import pyarrow.parquet as pq_mod

    dst = lake.path + "-backfill"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(lake.path, dst)
    lk = LakeTable.open(dst)
    v0 = lk.manifest.version
    for b in lk.manifest.data["buckets"].values():
        b.pop("stats", None)
    baseline = lk.search("conv_id", ">=", "b000").to_pandas()

    # zero data IO: only read_metadata/read_schema during the backfill
    reads = []
    real = cdc.pq.read_table

    def spy(path, *a, **kw):
        reads.append(path)
        return real(path, *a, **kw)

    with mock.patch.object(cdc.pq, "read_table", side_effect=spy):
        r = lk.backfill_stats()
    assert reads == [] and r["files_backfilled"] == 2
    assert lk.manifest.version == v0 + 1  # metadata-only commit

    fs = lk.manifest.file_stats(lk.path)
    assert len(fs) == 2
    for st in fs.values():
        assert "turn_idx" in st and "ts" in st
        assert "conv_id" not in st and "name" not in st  # strings skipped
    # footer bounds match the write-time (exact) bounds for covered columns
    orig = lake.manifest.file_stats(lake.path)
    by_tail = lambda d: {  # noqa: E731 — key by v*/bucket=*/file
        "/".join(p.rsplit("/", 3)[-3:]): s for p, s in d.items()
    }
    ofs = by_tail(orig)
    for tail, st in by_tail(fs).items():
        assert st["turn_idx"] == ofs[tail]["turn_idx"]
        assert st["ts"] == ofs[tail]["ts"]

    # pruning active again on a covered column; results unchanged
    got, opened = _spy_reads(
        lambda: lk.search("ts", "<", TS0 - dt.timedelta(days=1))
    )
    assert got.num_rows == 0 and opened == []
    assert lk.search("conv_id", ">=", "b000").to_pandas().equals(baseline)

    # idempotent: second call is a no-op with no version bump
    v1 = lk.manifest.version
    assert lk.backfill_stats() == {"files_backfilled": 0}
    assert lk.manifest.version == v1

    # a readonly snapshot refuses (snapshot(current) returns self, so
    # time-travel to the previous commit)
    snap = lk.snapshot(v1 - 1)
    with pytest.raises(RuntimeError, match="read-only"):
        snap.backfill_stats()


def test_feed_skips_stats_backfill_commit(lake):
    """A metadata-only stats_backfill commit changed zero rows; the change
    feed must skip it exactly like a compaction instead of hard-failing on
    a version dir with no data files (review regression)."""
    import shutil

    from sql_graph_visualizer_ray.pipelines.feed import ChangeFeedCursor

    dst = lake.path + "-feed"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(lake.path, dst)
    lk = LakeTable.open(dst)
    for b in lk.manifest.data["buckets"].values():
        b.pop("stats", None)
    lk.manifest.save_atomic(dst)
    lk = LakeTable.open(dst)
    assert lk.backfill_stats()["files_backfilled"] == 2
    bf_version = lk.manifest.version

    cur = ChangeFeedCursor(dst + ".cursor")
    seen_versions = []
    while True:
        item = cur.poll(lk)
        if item is None:
            break
        v, ds = item
        seen_versions.append(v)
        ds.count()
        cur.ack(v)
    assert bf_version not in seen_versions
    assert seen_versions == [1, 2]  # the two data commits, in order
    with pytest.raises(KeyError, match="stats-backfill|not a data commit"):
        lk.changes(bf_version)


def test_string_stats_gap_targeted_compact(tmp_path, ray_session):
    """String bounds after a footer backfill (VERDICT r4 item 6): backfill
    deliberately skips strings, so string searches still open every file.
    ``string_stats_gaps`` flags exactly the no-stats/footer-backfilled
    files, ``compact_for_string_stats`` rewrites exactly those buckets
    (min_files=1), and the A/B shows the file-skip win: a text-range
    search opens every file pre-compact and only the matching bucket's
    file post-compact, with identical results throughout."""
    import numpy as np

    from sql_graph_visualizer_ray.pipelines.cdc import string_stats_gaps
    from sql_graph_visualizer_ray.stages.partitioning import bucket_of

    # craft convs so bucket 0 gets 'aaa *' texts and bucket 1 'zzz *' —
    # per-bucket files then carry DISJOINT text ranges
    convs = [f"c{i:03d}" for i in range(40)]
    b = bucket_of(np.array(convs, dtype=object), np.zeros(40), 2)
    parts = [
        _events([c for c, bk in zip(convs, b) if bk == 0], text="aaa low"),
        _events([c for c, bk in zip(convs, b) if bk == 1], lsn0=5000, text="zzz high"),
    ]
    lk = LakeTable.open(str(tmp_path / "lake"), num_buckets=2)
    lk.apply_dataset(rd.from_arrow(pa.concat_tables(parts)), epoch=0)

    # simulate a pre-stats lake, then footer-backfill (numeric/ts only)
    for be in lk.manifest.data["buckets"].values():
        be.pop("stats", None)
    lk.manifest.save_atomic(lk.path)
    lk = LakeTable.open(lk.path)
    assert lk.backfill_stats()["files_backfilled"] == 2
    gaps = lk.string_stats_gaps()
    assert sorted(gaps) == [0, 1] and sum(len(v) for v in gaps.values()) == 2

    baseline = lk.search("text", ">=", "zzz").to_pandas()
    assert len(baseline) > 0

    # phase-1 candidate discovery goes through pyarrow.dataset — capture
    # the path list that survives the MANIFEST stats skip
    import pyarrow.dataset as pads

    def _scanned(fn):
        real = pads.dataset
        calls = []

        def spy(paths, *a, **kw):
            calls.append(list(paths))
            return real(paths, *a, **kw)

        with mock.patch.object(pads, "dataset", side_effect=spy):
            out = fn()
        return out, calls[0]  # first call = phase-1 candidate discovery

    _, scanned_pre = _scanned(lambda: lk.search("text", ">=", "zzz"))
    assert len(scanned_pre) == 2  # no string bounds: every file scanned

    r = lk.compact_for_string_stats()
    assert r == {"compacted_buckets": 2, "files_merged": 2}
    assert lk.string_stats_gaps() == {}

    got, scanned_post = _scanned(lambda: lk.search("text", ">=", "zzz"))
    assert len(scanned_post) == 1  # the 'aaa' bucket file is stats-skipped
    assert "bucket=00001" in scanned_post[0]
    key = ["conv_id", "turn_idx"]
    assert (
        got.to_pandas()
        .sort_values(key, ignore_index=True)
        .equals(baseline.sort_values(key, ignore_index=True))
    )

    # idempotent: a second targeted compact finds nothing to rewrite
    assert lk.compact_for_string_stats() == {
        "compacted_buckets": 0,
        "files_merged": 0,
    }

    # manifest-only helper path (what `analyze` uses) agrees pre/post
    assert string_stats_gaps(lk.manifest) == {}

    # a lake whose stat-cap excludes every string column reports no gaps
    # (rewriting could add nothing) even when files have no stats at all
    for be in lk.manifest.data["buckets"].values():
        be.pop("stats", None)
        be.pop("footer_stats", None)
    import os as _os
    from unittest import mock as _mock

    with _mock.patch.dict(_os.environ, {"GRAFT_STAT_COLUMNS_MAX": "2"}):
        # cap 2 = conv_id, turn_idx priority... conv_id IS a string — cap 0
        # strings requires excluding it, so assert against the real order:
        # conv_id (string) sits inside any cap >= 1, gaps stay flagged
        assert sorted(string_stats_gaps(lk.manifest)) == [0, 1]


def test_string_stats_backfill_preserves_layout(lake):
    """`backfill_string_stats`: exact string bounds recorded by a
    column-pruned read of exactly the gap files — no rewrite, so each
    delta file keeps its NARROW string range (the thing
    compact_for_string_stats destroys by unioning ranges on merge).
    After it, a conv-range search prunes to the matching delta file."""
    import shutil

    dst = lake.path + "-sbackfill"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(lake.path, dst)
    lk = LakeTable.open(dst)
    for b in lk.manifest.data["buckets"].values():
        b.pop("stats", None)
    lk.manifest.save_atomic(dst)
    lk = LakeTable.open(dst)
    baseline = lk.search("conv_id", ">=", "b000").to_pandas()

    assert lk.backfill_stats()["files_backfilled"] == 2  # numeric/ts only
    assert sum(len(v) for v in lk.string_stats_gaps().values()) == 2
    v0 = lk.manifest.version
    r = lk.backfill_string_stats()
    assert r["files_backfilled"] == 2
    assert lk.manifest.version == v0 + 1  # metadata-only commit
    assert lk.string_stats_gaps() == {}

    # string bounds now exact — identical to the original write-time ones
    orig = lake.manifest.file_stats(lake.path)
    by_tail = lambda d: {  # noqa: E731
        "/".join(p.rsplit("/", 3)[-3:]): s for p, s in d.items()
    }
    ofs = by_tail(orig)
    for tail, st in by_tail(lk.manifest.file_stats(dst)).items():
        assert st["conv_id"] == ofs[tail]["conv_id"]
        assert st["turn_idx"] == ofs[tail]["turn_idx"]  # footer pass kept

    # the per-file range locality survives: phase 1 scans ONE of the two
    # delta files for a b-range predicate (both files live in ONE bucket,
    # so this is pure string-stats pruning, not bucket routing)
    import pyarrow.dataset as pads

    calls = []
    real = pads.dataset

    def spy(paths, *a, **kw):
        calls.append(list(paths))
        return real(paths, *a, **kw)

    with mock.patch.object(pads, "dataset", side_effect=spy):
        got = lk.search("conv_id", ">=", "b000").to_pandas()
    assert len(calls[0]) == 1 and "v2" in calls[0][0]
    assert got.equals(baseline)

    # idempotent: nothing left to record, no version bump
    v1 = lk.manifest.version
    assert lk.backfill_string_stats() == {"files_backfilled": 0}
    assert lk.manifest.version == v1


def test_string_backfill_first_still_allows_numeric_backfill(lake):
    """Ordering independence (round-5 review finding): a library caller
    who runs ``backfill_string_stats()`` BEFORE ``backfill_stats()`` must
    not permanently lose the numeric/timestamp bounds — the string pass
    folds in the footer bounds for files that had no stats entry at all,
    so either ordering converges to the same complete per-file stats."""
    import shutil

    dst = lake.path + "-sfirst"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(lake.path, dst)
    lk = LakeTable.open(dst)
    for b in lk.manifest.data["buckets"].values():
        b.pop("stats", None)
        b.pop("footer_stats", None)
    lk.manifest.save_atomic(dst)
    lk = LakeTable.open(dst)

    # string pass FIRST: records exact string bounds AND the zero-IO
    # footer numeric/timestamp bounds for the never-stat-ed files
    assert lk.backfill_string_stats()["files_backfilled"] == 2
    for st in lk.manifest.file_stats(dst).values():
        assert "conv_id" in st  # exact string bounds
        assert "turn_idx" in st and "ts" in st  # footer numerics folded in

    # the numeric pass afterwards finds nothing missing (not silently
    # blocked — genuinely complete), and no gap detector fires
    assert lk.backfill_stats() == {"files_backfilled": 0}
    assert lk.string_stats_gaps() == {}

    # stats equal the reference ordering (numeric first, then strings)
    dst2 = lake.path + "-nfirst"
    shutil.rmtree(dst2, ignore_errors=True)
    shutil.copytree(lake.path, dst2)
    lk2 = LakeTable.open(dst2)
    for b in lk2.manifest.data["buckets"].values():
        b.pop("stats", None)
        b.pop("footer_stats", None)
    lk2.manifest.save_atomic(dst2)
    lk2 = LakeTable.open(dst2)
    assert lk2.backfill_stats()["files_backfilled"] == 2
    assert lk2.backfill_string_stats()["files_backfilled"] == 2
    by_tail = lambda d: {  # noqa: E731
        "/".join(p.rsplit("/", 3)[-3:]): s for p, s in d.items()
    }
    assert by_tail(lk.manifest.file_stats(dst)) == by_tail(
        lk2.manifest.file_stats(dst2)
    )
