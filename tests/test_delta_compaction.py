"""Delta-file commits, merge-on-read, compaction and bucket splitting.

The commit protocol writes each commit's per-bucket output as a NEW delta
file (commit IO ~ delta, never table size); reads LWW-merge base + deltas on
the fly; ``compact()`` is the separate commit that folds them back into one
base. These tests pin the equivalences that make that safe.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
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


SPEC = ChangelogSpec(n_events=10_000, n_convs=300, n_epochs=6, seed=23)


@pytest.fixture(scope="module")
def clog():
    return materialize("unit-delta", SPEC)


def test_delta_and_rewrite_modes_agree(clog, tmp_path):
    d = replay(clog, str(tmp_path / "d"), num_buckets=8, epochs_per_commit=2,
               commit_mode="delta")
    r = replay(clog, str(tmp_path / "r"), num_buckets=8, epochs_per_commit=2,
               commit_mode="rewrite")
    want = canonical(replay_oracle(clog))
    assert canonical(d.final_table()).equals(want)
    assert canonical(r.final_table()).equals(want)
    # delta mode accumulated per-bucket files; rewrite kept exactly one
    d_files = max(len(b["files"]) for b in d.manifest.data["buckets"].values())
    r_files = max(len(b["files"]) for b in r.manifest.data["buckets"].values())
    assert d_files >= 2
    assert r_files == 1


def test_compact_preserves_state_and_folds_files(clog, tmp_path):
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8, epochs_per_commit=1)
    before = canonical(lake.final_table())
    n_files_before = sum(
        len(b["files"]) for b in lake.manifest.data["buckets"].values()
    )
    res = lake.compact()
    assert res["files_merged"] == n_files_before
    assert all(
        len(b["files"]) == 1 for b in lake.manifest.data["buckets"].values()
    )
    assert canonical(lake.final_table()).equals(before)
    # further applies on the compacted lake still resume cleanly
    assert lake.apply(clog)["epochs"] == 0


def test_size_tiered_compact_only_touches_deep_buckets(clog, tmp_path):
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8, epochs_per_commit=1)
    deep = [
        int(k)
        for k, b in lake.manifest.data["buckets"].items()
        if len(b["files"]) >= 4
    ]
    before = canonical(lake.final_table())
    lake.compact(min_files=4)
    for k, b in lake.manifest.data["buckets"].items():
        if int(k) in deep:
            assert len(b["files"]) == 1
    assert canonical(lake.final_table()).equals(before)


def test_auto_compact_bounds_files_per_bucket(clog, tmp_path):
    lake = replay(
        clog, str(tmp_path / "lake"), num_buckets=8, epochs_per_commit=1,
        auto_compact_files=3,
    )
    assert all(
        len(b["files"]) < 3 + 1
        for b in lake.manifest.data["buckets"].values()
    )
    assert canonical(lake.final_table()).equals(canonical(replay_oracle(clog)))


def test_post_evolution_commit_touching_subset_of_buckets(tmp_path):
    """Regression (ADVICE r1, medium): a schema-evolving commit that touches
    only SOME buckets must leave the lake readable — untouched buckets keep
    old-schema files, and read_final() null-fills the new column."""
    clog = tmp_path / "clog"
    clog.mkdir()
    base = 1_700_000_000_000_000
    schema0 = pa.schema([
        ("lsn", pa.int64()), ("epoch", pa.int32()), ("op", pa.string()),
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()), ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ])
    rows0 = [
        {"lsn": i, "epoch": 0, "op": "I", "conv_id": f"conv{i:04d}",
         "turn_idx": 0, "role": "user", "text": f"t{i}", "tool": None,
         "ts": base + i}
        for i in range(64)  # spread over all buckets
    ]
    pq.write_table(pa.Table.from_pylist(rows0, schema=schema0),
                   clog / "epoch_00000.parquet")
    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=8)
    lake.apply(str(clog))

    # evolved epoch with ONE key -> exactly one bucket receives a delta
    schema1 = schema0.append(pa.field("tool_version", pa.string()))
    rows1 = [{"lsn": 100, "epoch": 1, "op": "U", "conv_id": "conv0000",
              "turn_idx": 0, "role": "user", "text": "evolved", "tool": None,
              "ts": base + 10_000, "tool_version": "v2"}]
    pq.write_table(pa.Table.from_pylist(rows1, schema=schema1),
                   clog / "epoch_00001.parquet")
    lake.apply(str(clog))

    final = lake.final_table()
    assert final.num_rows == 64
    assert "tool_version" in final.schema.names
    tv = dict(zip(final.column("conv_id").to_pylist(),
                  final.column("tool_version").to_pylist()))
    assert tv["conv0000"] == "v2"
    assert all(v is None for k, v in tv.items() if k != "conv0000")
    # and the same holds for the rewrite commit mode + after compaction
    lake.compact(min_files=1)
    assert lake.final_table().equals(final)


def test_split_buckets_preserves_table(clog, tmp_path):
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8)
    before = canonical(lake.final_table())
    res = lake.split_buckets(32)
    assert res == {"split": 1, "from": 8, "to": 32}
    assert lake.manifest.num_buckets == 32
    assert len(lake.manifest.data["buckets"]) > 8
    assert canonical(lake.final_table()).equals(before)
    # new events after the split land in the right (finer) buckets
    assert lake.apply(clog)["epochs"] == 0
    with pytest.raises(ValueError):
        lake.split_buckets(33)


def test_auto_split_triggers_on_bucket_size(clog, tmp_path):
    """Ingesting past the per-bucket byte cap triggers an automatic split;
    table state is preserved and the split factor converges geometrically."""
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=2)
    before = canonical(lake.final_table())
    sizes = lake.bucket_bytes()
    assert set(sizes) == {0, 1} and all(v > 0 for v in sizes.values())
    # cap above the largest bucket: no-op
    assert lake.maybe_auto_split(max(sizes.values()) + 1) == {"split": 0}
    assert lake.manifest.num_buckets == 2
    # cap at half the largest bucket: one doubling suffices
    res = lake.maybe_auto_split(max(sizes.values()) // 2 + 1)
    assert res == {"split": 1, "from": 2, "to": 4}
    assert canonical(lake.final_table()).equals(before)
    # far smaller cap: factor rises geometrically but is bounded by max_factor
    res2 = lake.maybe_auto_split(1, max_factor=8)
    assert res2 == {"split": 1, "from": 4, "to": 32}
    assert canonical(lake.final_table()).equals(before)


def test_auto_split_in_ingest_loop(clog, tmp_path):
    """The tail/replay loop folds bucket-size management into ingest: a lake
    created too coarse ends finer, with state equal to the oracle."""
    cap = 60_000  # bytes; the 10k-event fixture at 2 buckets far exceeds it
    lake = replay(
        clog, str(tmp_path / "lake"), num_buckets=2, epochs_per_commit=2,
        auto_split_bytes=cap,
    )
    assert lake.manifest.num_buckets > 2
    assert max(lake.bucket_bytes().values()) <= cap * 8  # bounded per trigger
    assert canonical(lake.final_table()).equals(canonical(replay_oracle(clog)))
    # resumes cleanly at the finer bucket count
    assert lake.apply(clog)["epochs"] == 0


def test_split_then_apply_matches_oracle(tmp_path):
    """Half the epochs at 4 buckets, split to 16, apply the rest — must equal
    the one-shot oracle (bucket routing of NEW events uses the new count)."""
    spec = ChangelogSpec(n_events=8_000, n_convs=250, n_epochs=6, seed=29)
    clog = materialize("unit-split-apply", spec)
    lake = LakeTable.open(str(tmp_path / "lake"), num_buckets=4)
    lake.apply(clog, max_epochs=3)
    lake.split_buckets(16)
    # reopen (fresh instance reads num_buckets from the manifest)
    lake2 = LakeTable.open(str(tmp_path / "lake"))
    assert lake2.manifest.num_buckets == 16
    lake2.apply(clog)
    assert canonical(lake2.final_table()).equals(canonical(replay_oracle(clog)))


def test_commit_io_scales_with_delta_not_table(clog, tmp_path):
    """The property the delta design exists for: bytes written by a commit
    are ~ the commit's events, independent of how big the lake already is."""
    import shutil

    # private copy — the cached fixture must stay immutable
    priv = str(tmp_path / "clog")
    shutil.copytree(clog, priv)
    clog = priv
    lake_dir = str(tmp_path / "lake")
    lake = replay(clog, lake_dir, num_buckets=8)  # big-ish base

    def version_bytes(v):
        d = os.path.join(lake_dir, f"v{v}")
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d) for f in fs
        )

    base_bytes = version_bytes(lake.manifest.version)

    # tiny follow-up commit: one updated key
    last = pq.read_table(
        os.path.join(clog, sorted(os.listdir(clog))[-2])
    ).slice(0, 1)
    e = lake.manifest.applied_epoch + 1
    small = last.set_column(
        last.schema.get_field_index("epoch"), "epoch",
        pa.array([e], pa.int32()),
    ).set_column(
        last.schema.get_field_index("lsn"), "lsn",
        pa.array([10**9], pa.int64()),
    )
    pq.write_table(small, os.path.join(clog, f"epoch_{e:05d}.parquet"))
    lake.apply(clog)
    delta_bytes = version_bytes(lake.manifest.version)
    # one-row delta must be orders of magnitude below the base rewrite
    assert delta_bytes < base_bytes / 20


def test_read_final_column_pruning(clog, tmp_path):
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=4, epochs_per_commit=2)
    sub = lake.read_final(columns=["conv_id", "role"]).to_pandas()
    full = lake.final_table().to_pandas()
    assert list(sub.columns) == ["conv_id", "role"]
    assert len(sub) == len(full)
    key = ["conv_id"]
    assert (
        sub.sort_values(key + ["role"], ignore_index=True)["role"]
        .fillna("~")
        .tolist()
        == full[["conv_id", "role"]]
        .sort_values(key + ["role"], ignore_index=True)["role"]
        .fillna("~")
        .tolist()
    )
    import pytest as _pytest

    with _pytest.raises(KeyError):
        lake.read_final(columns=["nope"])
