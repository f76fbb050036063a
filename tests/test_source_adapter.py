"""Live-DB source adapter: a SQL change table pulled through sql_to_epochs
must replay into the same lake state as the original changelog; snapshot
pulls synthesize meta columns; epoch/lsn numbering survives restarts."""

import sqlite3

import duckdb
import pyarrow as pa
import pytest
import pyarrow.compute as pc
import pyarrow.parquet as pq

from sql_graph_visualizer_ray.pipelines.cdc import replay
from sql_graph_visualizer_ray.pipelines.oracle import replay_oracle
from sql_graph_visualizer_ray.sources.adapter import EpochWriter, sql_to_epochs
from sql_graph_visualizer_ray.sources.changelog import (
    ChangelogSpec,
    epoch_files,
    materialize,
)


def canonical(t):
    t = t.select(sorted(t.column_names))
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )


def test_sql_cdc_pull_matches_replay_oracle(ray_session, tmp_path):
    """Load a changelog fixture into DuckDB as the 'live' change table, pull
    it through the adapter, replay the produced epoch files — final state
    must equal the oracle over the original fixture."""
    spec = ChangelogSpec(n_events=8_000, n_convs=200, n_epochs=5, seed=37)
    src = materialize("unit-adapter", spec)
    con = duckdb.connect()
    files = [p for _, p in epoch_files(src)]
    con.execute(
        f"CREATE TABLE changes AS SELECT * FROM read_parquet({files!r})"
    )

    out = str(tmp_path / "pulled_clog")
    n = sql_to_epochs(
        con,
        "SELECT lsn, op, conv_id, turn_idx, role, text, tool, ts "
        "FROM changes ORDER BY lsn",
        out,
        rows_per_epoch=1_500,
    )
    assert n >= 5  # 8000 rows / 1500 per epoch
    lake = replay(out, str(tmp_path / "lake"), num_buckets=4)
    assert canonical(lake.final_table()).equals(canonical(replay_oracle(src)))


def test_snapshot_pull_synthesizes_meta(ray_session, tmp_path):
    """A snapshot query with NO meta columns gets monotone lsn + op='I' and
    replays to exactly the source rows."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT 'conv' || lpad(CAST(i AS VARCHAR), 4, '0') "
        "AS conv_id, CAST(i % 7 AS INT) AS turn_idx, 'user' AS role, "
        "'txt' || CAST(i AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS tool, "
        "TIMESTAMP '2024-01-01' + INTERVAL (i) SECOND AS ts "
        "FROM range(500) r(i)"
    )
    out = str(tmp_path / "clog")
    sql_to_epochs(con, "SELECT * FROM t ORDER BY conv_id, turn_idx", out,
                  rows_per_epoch=200)
    first = pq.read_table(epoch_files(out)[0][1])
    assert first.column("op").to_pylist()[0] == "I"
    assert first.column("lsn").to_pylist()[:3] == [0, 1, 2]
    lake = replay(out, str(tmp_path / "lake"), num_buckets=4)
    # every (conv_id, turn_idx) key is unique in the snapshot -> row counts match
    assert lake.final_table().num_rows == con.execute(
        "SELECT COUNT(*) FROM (SELECT DISTINCT conv_id, turn_idx FROM t)"
    ).fetchone()[0]


def test_epoch_writer_resumes_numbering(tmp_path):
    out = str(tmp_path / "clog")
    w = EpochWriter(out)
    t = pa.table({"conv_id": ["a"], "turn_idx": pa.array([1], pa.int32())})
    assert w.write_epoch(t) == 0
    assert w.write_epoch(t) == 1
    # a NEW writer instance (process restart) continues where the old stopped
    w2 = EpochWriter(out)
    assert w2.next_epoch == 2
    assert w2.next_lsn == 2  # one synthesized lsn per row so far
    assert w2.write_epoch(t) == 2
    assert pq.read_table(epoch_files(out)[2][1]).column("lsn").to_pylist() == [2]


def _fk_schema(dialect: str = "duckdb"):
    """The same live schema (declared FKs + a junction table) on either
    backend — the dual-engine introspection matrix (reference:
    mysql/repository.go vs postgresql/repository.go)."""
    if dialect == "sqlite":
        import sqlite3

        con = sqlite3.connect(":memory:")
    else:
        con = duckdb.connect()
    con.execute("CREATE TABLE nation(n_nationkey INT PRIMARY KEY, n_name TEXT)")
    con.execute(
        "CREATE TABLE customer(c_custkey INT PRIMARY KEY, c_name TEXT, "
        "c_nationkey INT REFERENCES nation(n_nationkey))"
    )
    con.execute(
        "CREATE TABLE orders(o_orderkey INT PRIMARY KEY, "
        "o_custkey INT REFERENCES customer(c_custkey), o_total DOUBLE)"
    )
    con.execute(
        "CREATE TABLE part_supplier("
        "ps_partkey INT REFERENCES nation(n_nationkey), "
        "ps_suppkey INT REFERENCES customer(c_custkey))"
    )
    return con


@pytest.mark.parametrize("dialect", ["duckdb", "sqlite"])
def test_introspect_foreign_keys_true_metadata(dialect):
    """S7 full: declared FKs come back exactly, with real column pairs —
    not suffix guesses (reference KEY_COLUMN_USAGE walk,
    schema_analyzer_service.go:116-161) — on BOTH backends."""
    from sql_graph_visualizer_ray.sources.adapter import introspect_foreign_keys

    fks = introspect_foreign_keys(_fk_schema(dialect))
    got = {
        (f["source_table"], f["source_column"], f["target_table"], f["target_column"])
        for f in fks
    }
    assert got == {
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("part_supplier", "ps_partkey", "nation", "n_nationkey"),
        ("part_supplier", "ps_suppkey", "customer", "c_custkey"),
    }


@pytest.mark.parametrize("dialect", ["duckdb", "sqlite"])
def test_rules_from_connection_junction_and_fk_rules(dialect):
    """M13 over true metadata: node rule per plain table, junction table
    demoted to a relationship rule (isJunctionTable heuristic), one
    relationship rule per declared FK with real column pairs — identical
    rules from either backend."""
    from sql_graph_visualizer_ray.sources.adapter import rules_from_connection

    t = rules_from_connection(_fk_schema(dialect))
    rows = t.to_pylist()
    by_name = {r["rule_name"]: r for r in rows}
    # plain tables -> node rules
    for tbl in ("nation", "customer", "orders"):
        assert by_name[f"{tbl}_to_node"]["rule_type"] == "node"
    # junction: 2 FKs / 2 columns -> relationship, no node rule
    assert "part_supplier_to_node" not in by_name
    j = by_name["part_supplier_as_junction"]
    assert j["rule_type"] == "relationship"
    assert j["source_column"] == "ps_partkey"
    assert (j["target_type"], j["target_column"]) == ("customer", "c_custkey")
    # FK rules carry the true column pair
    fk = by_name["customer_c_nationkey_to_nation"]
    assert (fk["source_column"], fk["target_column"]) == (
        "c_nationkey",
        "n_nationkey",
    )
    # deterministic ordering: priority then name
    prios = [r["priority"] for r in rows]
    assert prios == sorted(prios)


def test_ruleset_from_connection_executes(ray_session, tmp_path):
    """The FK-derived RuleSet is executable end-to-end: introspect a live
    DuckDB, snapshot its tables to Parquet, run_rules — edges equal the
    declared FK joins."""
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.rules import run_rules
    from sql_graph_visualizer_ray.sources.adapter import ruleset_from_connection

    con = duckdb.connect()
    con.execute("CREATE TABLE nation(n_nationkey INT PRIMARY KEY, n_name TEXT)")
    con.execute(
        "CREATE TABLE customer(c_custkey INT PRIMARY KEY, c_name TEXT, "
        "c_nationkey INT REFERENCES nation(n_nationkey))"
    )
    con.execute(
        "INSERT INTO nation SELECT i, 'N' || i FROM range(5) r(i)"
    )
    con.execute(
        "INSERT INTO customer SELECT i, 'C' || i, CAST(i % 5 AS INT) "
        "FROM range(40) r(i)"
    )
    # snapshot the live tables to parquet (the adapter's normal export path)
    for t in ("nation", "customer"):
        con.execute(
            f"COPY {t} TO '{tmp_path}/{t}.parquet' (FORMAT PARQUET)"
        )

    rs = ruleset_from_connection(con)
    assert rs.validate() == []
    out = run_rules(str(tmp_path), rs)
    edges = out["customer_c_nationkey_to_nation"].to_pandas()
    assert len(edges) == 40
    assert set(edges["relation_type"]) == {"HAS_NATION"}
    # every edge joins on the declared (c_nationkey = n_nationkey) pair
    assert sorted(edges["target_id"].unique()) == [0, 1, 2, 3, 4]
    nodes = out["customer_to_node"].to_pandas()
    assert len(nodes) == 40 and "c_name" in nodes.columns


def test_introspection_scoped_to_current_schema():
    """Same-named tables in OTHER schemas must not merge into one table's
    metadata (columns concatenated, PKs mixed -> wrong auto rules)."""
    from sql_graph_visualizer_ray.sources.adapter import (
        introspect_columns,
        introspect_primary_keys,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE users(id INT PRIMARY KEY, name TEXT)")
    con.execute("CREATE SCHEMA other")
    con.execute(
        "CREATE TABLE other.users(uid BIGINT PRIMARY KEY, email TEXT, x INT)"
    )
    cols = introspect_columns(con)
    assert cols["users"] == ["id", "name"], cols
    pks = introspect_primary_keys(con)
    assert pks["users"] == ["id"], pks


def test_validate_source_and_dsn_errors(tmp_path):
    import pytest as _pytest

    from sql_graph_visualizer_ray.sources.adapter import (
        SourceValidationError,
        open_source,
        validate_source,
    )

    # happy path: in-memory DSN, tables present
    con = open_source("duckdb://:memory:")
    con.execute("CREATE TABLE t1(a INT)")
    info = validate_source(con, required_tables=["t1"])
    assert info["n_tables"] == 1

    # missing required table -> clear error naming it
    with _pytest.raises(SourceValidationError, match="t_missing"):
        validate_source(con, required_tables=["t1", "t_missing"])

    # unsupported scheme
    with _pytest.raises(SourceValidationError, match="scheme"):
        open_source("mysql://root@localhost/db")

    # nonexistent file
    with _pytest.raises(SourceValidationError, match="does not exist"):
        open_source(str(tmp_path / "nope.duckdb"))

    # dead connection
    con.close()
    with _pytest.raises(SourceValidationError, match="not usable"):
        validate_source(con)


def test_dual_backend_pull_identical_lake(ray_session, tmp_path):
    """VERDICT r4 #4: the full sql_to_epochs -> replay -> final_table loop
    against BOTH live backends (DuckDB native-Arrow path, SQLite DBAPI
    fetchmany path) produces an identical lake — the reference's
    dual-repository behavior matrix (postgresql/repository.go:50-86)."""
    spec = ChangelogSpec(n_events=6_000, n_convs=150, n_epochs=4, seed=11)
    src = materialize("unit-adapter-dual", spec)
    files = [p for _, p in epoch_files(src)]
    ddb = duckdb.connect()
    # one typed change table; turn_idx widened to BIGINT so the duckdb
    # Arrow path and the sqlite DBAPI path (which can only say int64)
    # produce the same lake schema
    ddb.execute(
        "CREATE TABLE changes AS SELECT lsn, op, conv_id, "
        "CAST(turn_idx AS BIGINT) AS turn_idx, role, text, tool, ts "
        f"FROM read_parquet({files!r})"
    )
    rows = ddb.execute("SELECT * FROM changes ORDER BY lsn").fetchall()
    # PARSE_DECLTYPES round-trips datetime through sqlite's TEXT storage,
    # so both DBAPIs hand the adapter real datetime objects for ts
    sq = sqlite3.connect(":memory:", detect_types=sqlite3.PARSE_DECLTYPES)
    sq.execute(
        "CREATE TABLE changes(lsn INTEGER, op TEXT, conv_id TEXT, "
        "turn_idx INTEGER, role TEXT, text TEXT, tool TEXT, ts TIMESTAMP)"
    )
    sq.executemany("INSERT INTO changes VALUES (?,?,?,?,?,?,?,?)", rows)
    sq.commit()

    q = (
        "SELECT lsn, op, conv_id, turn_idx, role, text, tool, ts "
        "FROM changes ORDER BY lsn"
    )
    lakes = {}
    for name, con in (("duckdb", ddb), ("sqlite", sq)):
        out = str(tmp_path / f"clog_{name}")
        n = sql_to_epochs(con, q, out, rows_per_epoch=1_000)
        assert n >= 6
        lakes[name] = replay(
            out, str(tmp_path / f"lake_{name}"), num_buckets=4
        ).final_table()
    a, b = canonical(lakes["duckdb"]), canonical(lakes["sqlite"])
    assert a.schema.equals(b.schema), (a.schema, b.schema)
    assert a.equals(b)


def test_open_source_sqlite_dsn_and_magic_sniff(tmp_path):
    from sql_graph_visualizer_ray.sources.adapter import (
        SourceValidationError,
        open_source,
        validate_source,
    )

    p = str(tmp_path / "src.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t1(a INT)")
    con.commit()
    con.close()

    c2 = open_source(f"sqlite://{p}")
    info = validate_source(c2, required_tables=["t1"])
    assert info == {"schema": "main", "n_tables": 1}

    # a plain path routes by file magic -> sqlite3, not duckdb
    c3 = open_source(p)
    assert isinstance(c3, sqlite3.Connection)

    # missing file errors instead of sqlite3 silently creating it
    with pytest.raises(SourceValidationError, match="does not exist"):
        open_source(f"sqlite://{tmp_path}/nope.db")

    assert isinstance(open_source("sqlite://:memory:"), sqlite3.Connection)
