"""Key-pruned point lookup (``LakeTable.lookup``) — the CDC-serving
primitive: hash the key to its home bucket, open only that bucket's files,
push a key-exact predicate into the parquet read. Reference analogue:
``GetNodeByID`` in
``/root/reference/internal/application/services/direct_database_service.go``,
made key-partition-aware so cost is O(keys), not O(lake).
"""

from unittest import mock

import pyarrow.parquet as pq
import pytest

from sql_graph_visualizer_ray.pipelines import cdc
from sql_graph_visualizer_ray.pipelines.cdc import LakeTable, replay
from sql_graph_visualizer_ray.sources.changelog import ChangelogSpec, materialize

SPEC = ChangelogSpec(n_events=8_000, n_convs=200, n_epochs=4, seed=47)


@pytest.fixture(scope="module")
def clog():
    return materialize("unit-lookup", SPEC)


@pytest.fixture(scope="module")
def lake(clog, tmp_path_factory):
    return replay(clog, str(tmp_path_factory.mktemp("lk") / "lake"), num_buckets=16)


def _expected(lake, convs):
    full = lake.final_table().to_pandas()
    return full[full.conv_id.isin(convs)].reset_index(drop=True)


def test_conv_lookup_matches_full_scan(lake):
    convs = lake.final_table().to_pandas().conv_id.unique()[:4].tolist()
    got = lake.lookup(convs).to_pandas().reset_index(drop=True)
    assert got.equals(_expected(lake, convs))


def test_pair_lookup_exact(lake):
    full = lake.final_table().to_pandas()
    pairs = full.iloc[[0, 7, 100]][["conv_id", "turn_idx"]]
    got = lake.lookup(pairs.conv_id.tolist(), turns=pairs.turn_idx.tolist())
    exp = (
        full.merge(pairs, on=["conv_id", "turn_idx"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.to_pandas().reset_index(drop=True).equals(exp)


def test_lookup_opens_only_home_bucket_files(lake):
    """The scale property itself: a one-key lookup must not touch the other
    15 buckets' files."""
    conv = lake.final_table().column("conv_id")[0].as_py()
    by_bucket = lake.manifest.bucket_files(lake.path)
    opened = []
    real = pq.read_table

    def spy(path, *a, **kw):
        # the batched serving read passes a LIST of paths (one scanner)
        opened.extend(path if isinstance(path, list) else [path])
        return real(path, *a, **kw)

    with mock.patch.object(cdc.pq, "read_table", side_effect=spy):
        got = lake.lookup([conv])
    assert got.num_rows > 0
    home = {b for b, paths in by_bucket.items() if set(opened) & set(paths)}
    assert len(home) == 1, f"lookup touched buckets {sorted(home)}"
    assert len(opened) == len(by_bucket[home.pop()])


def test_projection_and_missing_key(lake):
    convs = lake.final_table().to_pandas().conv_id.unique()[:2].tolist()
    t = lake.lookup(convs, columns=["conv_id", "role"])
    assert t.column_names == ["conv_id", "role"]
    assert t.num_rows == len(_expected(lake, convs))
    miss = lake.lookup(["conv-that-does-not-exist"])
    assert miss.num_rows == 0
    assert miss.column_names == lake.final_table().column_names


def test_lookup_time_travel(clog, tmp_path):
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8, epochs_per_commit=1)
    conv = lake.final_table().column("conv_id")[0].as_py()
    for v in (1, lake.manifest.version):
        want = lake.final_table(version=v).to_pandas()
        want = want[want.conv_id == conv].reset_index(drop=True)
        got = lake.lookup([conv], version=v).to_pandas().reset_index(drop=True)
        assert got.equals(want), f"lookup diverged at v{v}"


def test_lookup_on_sharded_lake(clog, tmp_path):
    """turn_shard_size spreads a conv over buckets; conv-only lookup falls
    back to a key-filtered scan of all buckets, pair lookup stays pruned —
    both must return exactly the live rows."""
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8, turn_shard_size=5)
    full = lake.final_table().to_pandas()
    conv = full.conv_id.iloc[0]
    exp = full[full.conv_id == conv].reset_index(drop=True)
    assert lake.lookup([conv]).to_pandas().reset_index(drop=True).equals(exp)
    pair = exp.iloc[[1]]
    got = lake.lookup(pair.conv_id.tolist(), turns=pair.turn_idx.tolist())
    assert got.to_pandas().reset_index(drop=True).equals(pair.reset_index(drop=True))


def test_read_final_keys_pruned_scan(lake):
    """read_final(keys=...) is the distributed counterpart of lookup: same
    rows as a post-hoc filter, but only the keys' home buckets become read
    tasks."""
    full = lake.final_table().to_pandas()
    convs = full.conv_id.unique()[:5].tolist()
    ds = lake.read_final(keys=convs)
    got = (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = (
        full[full.conv_id.isin(convs)]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)
    # bucket pruning is observable in the task count: one input block per
    # needed bucket, strictly fewer than the lake's bucket count
    need = lake._buckets_for_keys(convs, None, lake.manifest.bucket_files(lake.path))
    assert ds.materialize().num_blocks() == len(need) < lake.manifest.num_buckets


def test_read_final_keys_empty_and_columns(lake):
    assert lake.read_final(keys=[]).count() == 0
    convs = lake.final_table().to_pandas().conv_id.unique()[:2].tolist()
    df = lake.read_final(columns=["conv_id", "role"], keys=convs).to_pandas()
    assert sorted(df.columns) == ["conv_id", "role"]
    assert set(df.conv_id) == set(convs)


def test_lookup_native_keys_on_edge_lake(tmp_path):
    """lookup speaks the lake's NATIVE key schema: an edge lake keyed
    (source_id, target_id) looks up by int source ids and returns native
    column names."""
    import pyarrow as pa
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    lake = EdgeLake(str(tmp_path / "edges"), num_buckets=4)
    rows = [
        {"source_id": s, "target_id": t, "relation_type": "KNOWS",
         "direction": "outgoing", "op": "I"}
        for s, t in [(1, 2), (1, 3), (2, 3), (7, 1)]
    ]
    lake.ingest(rd.from_arrow(pa.Table.from_pylist(rows)), epoch=0)
    got = lake.lake.lookup([1]).to_pandas()
    assert set(zip(got.source_id, got.target_id)) == {(1, 2), (1, 3)}
    pair = lake.lake.lookup([2], turns=[3])
    assert pair.num_rows == 1 and pair.column("target_id")[0].as_py() == 3


def test_search_key_routing_casts_cross_typed_value(tmp_path):
    """A key-equality search with a cross-typed value (float 1.0 against
    int64 keys) must route to the SAME home bucket as the stored int —
    Arrow '==' numeric-promotes, so the unrouted scan would match; routing
    on the raw value's hash would silently return empty."""
    import pyarrow as pa
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    lake = EdgeLake(str(tmp_path / "edges"), num_buckets=8)
    rows = [
        {"source_id": s, "target_id": t, "relation_type": "KNOWS",
         "direction": "outgoing", "op": "I"}
        for s, t in [(1, 2), (1, 3), (2, 3), (7, 1)]
    ]
    lake.ingest(rd.from_arrow(pa.Table.from_pylist(rows)), epoch=0)
    want = lake.lake.search("source_id", "==", 1).to_pandas()
    got = lake.lake.search("source_id", "==", 1.0).to_pandas()  # float query
    assert len(want) == 2
    assert got.equals(want)
    # an uncastable value skips routing and (correctly) matches nothing
    assert lake.lake.search_where([("source_id", "==", 1.5)]).num_rows == 0


def test_reader_snapshot_isolation(clog, tmp_path):
    """A read_final Dataset captures the manifest at creation; commits that
    land afterwards don't bleed into it (published files are immutable
    until vacuum) — concurrent readers see a consistent snapshot."""
    path = str(tmp_path / "lake")
    lake = LakeTable.open(path, num_buckets=8)
    lake.apply(clog, max_epochs=2)
    before = lake.final_table()
    ds = lake.read_final()  # plan pinned to the pre-commit manifest
    lake.apply(clog)  # more commits land
    got = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = before.to_pandas().reset_index(drop=True)
    assert got.equals(want)
    # and the lake itself did move on
    assert not lake.final_table().to_pandas().reset_index(drop=True).equals(want)


def test_lookup_survives_split_and_compaction(clog, tmp_path):
    """Key routing must follow the manifest: after split_buckets the hash
    modulus changes, after compact the file layout changes — lookup (and
    its bucket pruning) must stay exact through both."""
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=4, epochs_per_commit=1)
    full = lake.final_table().to_pandas()
    convs = full.conv_id.unique()[:3].tolist()
    exp = _expected(lake, convs)
    lake.compact(min_files=2)
    assert lake.lookup(convs).to_pandas().reset_index(drop=True).equals(exp)
    lake.split_buckets(16)
    assert lake.manifest.num_buckets == 16
    assert lake.lookup(convs).to_pandas().reset_index(drop=True).equals(exp)
    # pruning still holds post-split: a one-key lookup touches one bucket
    conv = convs[0]
    by_bucket = lake.manifest.bucket_files(lake.path)
    need = lake._buckets_for_keys([conv], None, by_bucket)
    assert len(need) == 1


def test_lookup_sees_deletes_and_updates(tmp_path):
    """A deleted key returns no rows; an updated key returns the winner."""
    spec = ChangelogSpec(n_events=6_000, n_convs=80, n_epochs=5, seed=11)
    clog = materialize("unit-lookup-del", spec)
    lake = replay(clog, str(tmp_path / "lake"), num_buckets=8)
    import duckdb

    con = duckdb.connect()
    dead = con.execute(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY ts DESC, lsn DESC) rn
          FROM read_parquet('{clog}/*.parquet'))
        SELECT conv_id, turn_idx FROM ranked WHERE rn=1 AND op = 'D' LIMIT 3
        """
    ).df()
    assert len(dead) > 0, "fixture produced no deletes"
    got = lake.lookup(dead.conv_id.tolist(), turns=dead.turn_idx.tolist())
    assert got.num_rows == 0


def _duckdb_lww(clog):
    """Independent LWW oracle over the raw changelog files."""
    import duckdb

    return duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) rn
          FROM read_parquet('{clog}/*.parquet'))
        SELECT conv_id, turn_idx, role, text, tool, ts FROM ranked
        WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx
        """
    ).df()


def test_search_equality_matches_duckdb(lake, clog):
    """searchNodes analogue: no-Ray predicate fetch on a NON-key column,
    value-checked against an independent DuckDB LWW oracle. Superseded
    versions that matched the predicate must NOT resurrect (the two-phase
    candidate+post-merge-filter design)."""
    want = _duckdb_lww(clog)
    want = want[want.role == "assistant"].reset_index(drop=True)
    got = (
        lake.search("role", "==", "assistant")
        .to_pandas()[want.columns.tolist()]
        .reset_index(drop=True)
    )
    assert got.equals(want), (len(got), len(want))


def test_search_contains_and_range(lake, clog):
    want = _duckdb_lww(clog)

    w1 = want[want.text.str.contains("the", na=False)].reset_index(drop=True)
    g1 = (
        lake.search("text", "contains", "the")
        .to_pandas()[w1.columns.tolist()]
        .reset_index(drop=True)
    )
    assert g1.equals(w1)

    w2 = want[want.turn_idx >= 30].reset_index(drop=True)
    g2 = (
        lake.search("turn_idx", ">=", 30)
        .to_pandas()[w2.columns.tolist()]
        .reset_index(drop=True)
    )
    assert g2.equals(w2)


def test_search_projection_cap_and_errors(lake):
    got = lake.search("role", "==", "assistant", columns=["role"])
    assert got.column_names == ["conv_id", "turn_idx", "role"] or set(
        got.column_names
    ) >= {"role"}
    # column not requested -> predicate column dropped from output
    got2 = lake.search("role", "==", "assistant", columns=["text"])
    assert "role" not in got2.column_names

    with pytest.raises(ValueError, match="read_final"):
        lake.search("turn_idx", ">=", 0, max_result_keys=5)
    with pytest.raises(KeyError):
        lake.search("no_such_col", "==", 1)
    with pytest.raises(ValueError, match="unsupported op"):
        lake.search("role", "~~", "x")


@pytest.fixture(scope="module")
def delta_lake(clog, tmp_path_factory):
    """Multi-commit delta lake: superseded row versions stay PHYSICALLY
    present in earlier delta files — the regime where a naive single-phase
    predicate read would resurrect them."""
    lake = replay(
        clog,
        str(tmp_path_factory.mktemp("dlk") / "lake"),
        num_buckets=8,
        epochs_per_commit=1,
        auto_compact_files=None,
        auto_split_bytes=None,
    )
    # the test is vacuous unless buckets really hold multiple delta files
    assert any(
        len(fs) > 1 for fs in lake.manifest.bucket_files(lake.path).values()
    )
    return lake


def test_search_on_delta_lake_matches_duckdb(delta_lake, clog):
    want = _duckdb_lww(clog)
    want = want[want.role == "assistant"].reset_index(drop=True)
    got = (
        delta_lake.search("role", "==", "assistant")
        .to_pandas()[want.columns.tolist()]
        .reset_index(drop=True)
    )
    assert got.equals(want), (len(got), len(want))


def test_search_superseded_version_does_not_resurrect(delta_lake, clog):
    """Fixture texts embed their version ('v=<lsn>'), so a superseded
    version's exact text exists ONLY in an old delta file. Searching for it
    must return nothing, even though phase 1 finds the candidate row."""
    import duckdb

    stale = duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) rn
          FROM read_parquet('{clog}/*.parquet'))
        SELECT text FROM ranked
        WHERE rn > 1 AND text IS NOT NULL LIMIT 3
        """
    ).df()
    assert len(stale) > 0
    for old_text in stale.text:
        got = delta_lake.search("text", "==", old_text)
        assert got.num_rows == 0, old_text


def test_search_ops_property_vs_final_table(delta_lake):
    """Every comparison op over a numeric and a string column agrees with an
    in-memory filter of final_table() (SQL null semantics: null never
    matches)."""
    import operator

    full = delta_lake.final_table().to_pandas()
    ops = {
        "==": operator.eq,
        "!=": operator.ne,
        "<": operator.lt,
        "<=": operator.le,
        ">": operator.gt,
        ">=": operator.ge,
    }
    cases = [("turn_idx", 17), ("turn_idx", 0), ("role", "tool")]
    for col, val in cases:
        for op, py in ops.items():
            want = (
                full[full[col].notna() & py(full[col], val)]
                .sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True)
            )
            got = (
                delta_lake.search(col, op, val, max_result_keys=10**6)
                .to_pandas()[full.columns.tolist()]
                .sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True)
            )
            assert got.equals(want), (col, op, val, len(got), len(want))


def test_search_on_widen_evolved_lake(tmp_path):
    """Regression: pre-widen files carry int32 turn_idx, post-widen int64.
    Phase-1 candidate tables must cast to the current (widest) key schema
    before pooling — concat of raw per-file schemas used to raise
    ArrowInvalid whenever candidates spanned the evolution boundary."""
    spec = ChangelogSpec(
        n_events=6_000, n_convs=150, n_epochs=4, seed=48, evolution="widen"
    )
    clog = materialize("unit-search-widen", spec)
    lake = replay(
        str(clog), str(tmp_path / "lake"), num_buckets=8, epochs_per_commit=1
    )
    full = lake.final_table().to_pandas()
    want = (
        full[full.role == "assistant"]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got = (
        lake.search("role", "==", "assistant", max_result_keys=10**6)
        .to_pandas()[full.columns.tolist()]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(want) > 0 and got.equals(want)


def test_search_cap_counts_distinct_keys(delta_lake, clog):
    """The max_result_keys bound is compaction-independent: superseded
    physical rewrites of the same key count once. On this multi-delta lake
    the physical candidate rows for `role == assistant` exceed the distinct
    (conv, turn) pairs, and search at cap == distinct must succeed."""
    import duckdb

    # each delta file holds its commit's (= epoch's, epochs_per_commit=1)
    # LWW winners, so the physical candidates are per-epoch winners — a pair
    # rewritten across N epochs appears N times physically, once distinct
    cand = duckdb.sql(
        f"""
        WITH per_epoch AS (
          SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx, epoch
            ORDER BY ts DESC, lsn DESC) rn
          FROM read_parquet('{clog}/*.parquet'))
        SELECT count(*) AS phys,
               count(DISTINCT (conv_id, turn_idx)) AS pairs
        FROM per_epoch WHERE rn = 1 AND role = 'assistant'
        """
    ).df()
    phys, pairs = int(cand.phys[0]), int(cand.pairs[0])
    assert phys > pairs, "fixture must contain superseded rewrites"
    got = delta_lake.search("role", "==", "assistant", max_result_keys=pairs)
    assert got.num_rows > 0
    with pytest.raises(ValueError, match="read_final"):
        delta_lake.search("role", "==", "assistant", max_result_keys=pairs - 1)


def test_search_any_or_across_columns(delta_lake, clog):
    """search_any (the searchNodes(searchTerm) shape): one term OR-matched
    across string payload columns, checked against the DuckDB LWW oracle —
    on a delta lake, so superseded matching versions must not resurrect."""
    want = _duckdb_lww(clog)
    term = "an"  # hits role ('assistant') AND text tokens: real OR coverage
    mask = (
        want.role.str.contains(term, na=False)
        | want.text.str.contains(term, na=False)
        | want.tool.str.contains(term, na=False)
    )
    assert (
        want.role.str.contains(term, na=False) & ~want.text.str.contains(term, na=False)
    ).any() or (
        ~want.role.str.contains(term, na=False) & want.text.str.contains(term, na=False)
    ).any(), "term must exercise more than one column"
    w = want[mask].reset_index(drop=True)
    got = (
        delta_lake.search_any(term, max_result_keys=10**6)
        .to_pandas()[w.columns.tolist()]
        .reset_index(drop=True)
    )
    assert len(w) > 0 and got.equals(w), (len(got), len(w))


def test_search_any_superseded_not_resurrected(delta_lake, clog):
    """A superseded version's exact text exists only in old delta files;
    search_any for it must return nothing post-merge."""
    import duckdb

    stale = duckdb.sql(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) rn
          FROM read_parquet('{clog}/*.parquet'))
        SELECT text FROM ranked WHERE rn > 1 AND text IS NOT NULL LIMIT 2
        """
    ).df()
    assert len(stale) > 0
    for old_text in stale.text:
        assert delta_lake.search_any(old_text).num_rows == 0


def test_search_any_projection_scope_and_errors(lake, clog):
    want = _duckdb_lww(clog)
    # restrict the searched columns: a text-only term must not match roles
    w = want[want.text.str.contains("assistant", na=False)]
    got = lake.search_any(
        "assistant", search_columns=["text"], max_result_keys=10**6
    )
    assert got.num_rows == len(w)
    # projection keeps ONLY the requested columns even though the searched
    # column had to ride through the lookup
    got2 = lake.search_any(
        "assistant", search_columns=["text"], columns=["conv_id", "role"],
        max_result_keys=10**6,
    )
    assert got2.column_names == ["conv_id", "role"]
    with pytest.raises(KeyError):
        lake.search_any("x", search_columns=["no_such_col"])
    with pytest.raises(ValueError, match="read_final"):
        lake.search_any("a", max_result_keys=1)


def test_search_where_conjunction_matches_duckdb(delta_lake, clog):
    """search_where: ANDed predicates on the serving path equal the DuckDB
    LWW oracle's WHERE a AND b — on a delta lake so superseded versions
    that matched must not resurface."""
    want = _duckdb_lww(clog)
    w = want[
        (want.role == "assistant")
        & (want.turn_idx >= 10)
        & want.text.str.contains("the", na=False)
    ].reset_index(drop=True)
    got = (
        delta_lake.search_where(
            [
                ("role", "==", "assistant"),
                ("turn_idx", ">=", 10),
                ("text", "contains", "the"),
            ],
            max_result_keys=10**6,
        )
        .to_pandas()[w.columns.tolist()]
        .reset_index(drop=True)
    )
    assert len(w) > 0 and got.equals(w), (len(got), len(w))
    # single-predicate search delegates to the same machinery
    one = delta_lake.search("role", "==", "assistant", max_result_keys=10**6)
    assert one.num_rows == int((want.role == "assistant").sum())


def test_search_where_stats_skip_and_errors(lake):
    # a conjunct outside every file's range skips everything
    got = lake.search_where(
        [("role", "==", "assistant"), ("turn_idx", ">", 10**9)]
    )
    assert got.num_rows == 0
    with pytest.raises(ValueError, match="at least one predicate"):
        lake.search_where([])
    with pytest.raises(KeyError):
        lake.search_where([("role", "==", "x"), ("nope", "==", 1)])
    with pytest.raises(ValueError, match="unsupported op"):
        lake.search_where([("role", "~~", "x")])


def test_search_where_equals_intersection_of_searches(delta_lake):
    """Algebraic pin: a conjunction's row set equals the intersection of
    its conjuncts' single-predicate results (same lake, same versions)."""
    preds = [("role", "==", "user"), ("turn_idx", "<", 12)]
    both = delta_lake.search_where(preds, max_result_keys=10**6).to_pandas()
    single = [
        delta_lake.search(c, o, v, max_result_keys=10**6).to_pandas()
        for c, o, v in preds
    ]
    key = ["conv_id", "turn_idx"]
    inter = set(map(tuple, single[0][key].values)) & set(
        map(tuple, single[1][key].values)
    )
    assert set(map(tuple, both[key].values)) == inter and len(inter) > 0


def test_head_bounded_noray_read(lake):
    """head(n): no-Ray bounded merged read. With n >= row count it must
    equal the full Ray merge-on-read path (read_final/final_table); with a
    small n it returns exactly n live rows, every one present in the full
    state (so LWW merge and tombstone filtering happened per bucket)."""
    full = lake.final_table().to_pandas()
    big = lake.head(10 ** 9).to_pandas()
    assert big.sort_values(["conv_id", "turn_idx"], ignore_index=True).equals(
        full.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    small = lake.head(17).to_pandas()
    assert len(small) == 17
    keyed = full.set_index(["conv_id", "turn_idx"])
    for r in small.itertuples():
        assert (r.conv_id, r.turn_idx) in keyed.index
        assert keyed.loc[(r.conv_id, r.turn_idx)].text == r.text
    assert lake.head(0).num_rows == 0
