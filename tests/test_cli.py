"""CLI verbs drive the same machinery as the library; killed runs resume
through `run`, analyze emits the K5 report, rules CRUD persists to YAML."""

import json

import pytest

from sql_graph_visualizer_ray.cli import main
from sql_graph_visualizer_ray.sources.changelog import ChangelogSpec, materialize

SPEC = ChangelogSpec(n_events=6_000, n_convs=150, n_epochs=4, seed=33)


@pytest.fixture(scope="module")
def clog():
    return materialize("unit-cli", SPEC)


def test_cli_run_resume_verify_analyze(ray_session, clog, tmp_path, capsys):
    lake = str(tmp_path / "lake")
    # partial run (2 epochs), as if the process died mid-replay
    from sql_graph_visualizer_ray.pipelines.cdc import LakeTable

    LakeTable.open(lake, num_buckets=4).apply(clog, max_epochs=2)

    assert main(["run", clog, lake]) == 0  # resumes the remaining epochs
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied_epoch"] == SPEC.n_epochs - 1

    assert main(["verify", clog, lake]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["ok"]

    assert main(["compact", lake]) == 0
    capsys.readouterr()
    assert main(["vacuum", lake]) == 0
    capsys.readouterr()
    assert main(["verify", clog, lake]) == 0
    capsys.readouterr()

    assert main(["analyze", lake, "--format", "json"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["applied_epoch"] == SPEC.n_epochs - 1
    assert rep["counters"]["raw_events"] == SPEC.n_events
    assert main(["analyze", lake]) == 0  # summary form prints
    assert "events applied" in capsys.readouterr().out

    assert main(["split", lake, "8"]) == 0
    capsys.readouterr()
    assert main(["verify", clog, lake]) == 0
    capsys.readouterr()


def test_cli_rules_crud_and_validate(tmp_path, capsys):
    import shutil

    import sql_graph_visualizer_ray as pkg

    yml = str(tmp_path / "rules.yml")
    shutil.copy(f"{pkg.__path__[0]}/rules_example.yml", yml)

    assert main(["rules", "validate", yml]) == 0
    capsys.readouterr()
    assert main(["rules", "list", yml]) == 0
    listing = capsys.readouterr().out
    assert "customer_nodes" in listing and "belongs_to" in listing

    assert main(["rules", "set-priority", yml, "customer_nodes", "9"]) == 0
    assert main(["rules", "list", yml]) == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    # customer_nodes (prio 9) now sorts after nation_nodes (prio 2)
    assert lines[0].endswith("nation_nodes")

    assert main(["rules", "delete", yml, "belongs_to"]) == 0
    assert main(["rules", "delete", yml, "belongs_to"]) == 1
    assert main(["rules", "validate", yml]) == 0


def test_cli_rules_run_writes_outputs(ray_session, tmp_path, capsys):
    import os

    import sql_graph_visualizer_ray as pkg

    yml = f"{pkg.__path__[0]}/rules_example.yml"
    out_dir = str(tmp_path / "out")
    assert main(["rules", "run", yml, "/root/testdata/sf0.001", out_dir]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(res["outputs"]) == {"customer_nodes", "nation_nodes", "belongs_to"}
    for name in res["outputs"]:
        assert os.listdir(os.path.join(out_dir, name))


def test_cli_tail_follows(ray_session, clog, tmp_path, capsys):
    lake = str(tmp_path / "lake")
    assert main(["tail", clog, lake, "--stop-after-epoch",
                 str(SPEC.n_epochs - 1), "--num-buckets", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied_epoch"] == SPEC.n_epochs - 1
    assert main(["verify", clog, lake]) == 0
    capsys.readouterr()


def test_cli_rules_run_into_edge_lake(ray_session, tmp_path, capsys):
    import sql_graph_visualizer_ray as pkg
    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    yml = f"{pkg.__path__[0]}/rules_example.yml"
    out_dir = str(tmp_path / "out")
    elakes = str(tmp_path / "edges")
    assert main(["rules", "run", yml, "/root/testdata/sf0.001", out_dir,
                 "--edge-lake", elakes]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "edge lake" in res["outputs"]["belongs_to"]
    lake = EdgeLake(f"{elakes}/belongs_to")
    before = lake.edges_table()
    # sf0.001 customers passing the YAML's tables.where c_acctbal > 0 filter
    import pyarrow.parquet as pq

    cust = pq.read_table(
        "/root/testdata/sf0.001/customer.parquet", columns=["c_acctbal"]
    )
    import pyarrow.compute as pc

    n_pos = pc.sum(pc.greater(cust.column("c_acctbal"), 0)).as_py()
    assert before.num_rows == n_pos == 139
    # a re-run commits a NEW refresh epoch; the same edges LWW-collapse, so
    # the table is unchanged (content idempotence)
    assert main(["rules", "run", yml, "/root/testdata/sf0.001", out_dir,
                 "--edge-lake", elakes]) == 0
    capsys.readouterr()
    lake2 = EdgeLake(f"{elakes}/belongs_to")
    assert lake2.manifest.applied_epoch == 1
    assert lake2.edges_table().equals(before)


def test_cli_changes_feed(ray_session, clog, tmp_path, capsys):
    lake = str(tmp_path / "lake")
    assert main(["run", clog, lake, "--epochs-per-commit", "2"]) == 0
    capsys.readouterr()
    assert main(["changes", lake, "1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0
    assert main(["changes", lake, "99"]) == 1
    capsys.readouterr()


def test_cli_snapshot(ray_session, clog, tmp_path, capsys):
    lake = str(tmp_path / "lake")
    assert main(["run", clog, lake, "--epochs-per-commit", "2"]) == 0
    capsys.readouterr()
    assert main(["snapshot", lake, "1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0 and out["version"] == 1
    assert main(["snapshot", lake, "99"]) == 1
    capsys.readouterr()


def test_cli_lookup_int_keyed_edge_lake(ray_session, tmp_path, capsys):
    """`cli lookup` on a native int-keyed lake must coerce --key strings to
    the manifest key type instead of crashing in pa.array (library lookup
    with real ints is covered by test_lookup)."""
    import json

    from sql_graph_visualizer_ray.cli import main
    from test_edge_lake import edges_ds, e

    from sql_graph_visualizer_ray.pipelines.graph_sink import EdgeLake

    path = str(tmp_path / "edges")
    lake = EdgeLake(path, num_buckets=4)
    lake.ingest(edges_ds([e(1, 2), e(1, 3), e(2, 3)]), epoch=0)

    rc = main(["lookup", path, "--key", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 2

    rc = main(["lookup", path, "--key", "not-an-int"])
    assert rc == 1
    assert "must be int64" in capsys.readouterr().err


def test_cli_search(ray_session, clog, tmp_path, capsys):
    import json

    from sql_graph_visualizer_ray.cli import main
    from sql_graph_visualizer_ray.pipelines.cdc import replay

    lake_dir = str(tmp_path / "lake")
    lake = replay(clog, lake_dir, num_buckets=4)
    want = lake.final_table().to_pandas()
    n_assist = int((want.role == "assistant").sum())

    rc = main(["search", lake_dir, "role", "==", "assistant", "--columns", "role"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == n_assist

    # int coercion on turn_idx + clear error paths
    rc = main(["search", lake_dir, "turn_idx", "<", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == int((want.turn_idx < 1).sum())

    assert main(["search", lake_dir, "nope", "==", "x"]) == 1
    assert "unknown column" in capsys.readouterr().err
    assert main(["search", lake_dir, "turn_idx", "==", "NaNope"]) == 1
    assert "must be int" in capsys.readouterr().err  # turn_idx is int32


def test_cli_search_any(ray_session, clog, tmp_path, capsys):
    import json

    from sql_graph_visualizer_ray.cli import main
    from sql_graph_visualizer_ray.pipelines.cdc import replay

    lake_dir = str(tmp_path / "lake")
    lake = replay(clog, lake_dir, num_buckets=4)
    want = lake.final_table().to_pandas()
    mask = (
        want.role.str.contains("an", na=False)
        | want.text.str.contains("an", na=False)
        | want.tool.str.contains("an", na=False)
    )

    rc = main(
        ["search-any", lake_dir, "an", "--max-result-keys", "1000000"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == int(mask.sum())

    rc = main(
        [
            "search-any", lake_dir, "assistant",
            "--search-columns", "text", "--columns", "conv_id,role",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == int(want.text.str.contains("assistant", na=False).sum())
    if out["rows"]:
        assert sorted(out["data"][0]) == ["conv_id", "role"]

    assert main(["search-any", lake_dir, "x", "--search-columns", "nope"]) == 1
    assert "nope" in capsys.readouterr().err


def test_cli_analyze_reports_stats_coverage(ray_session, clog, tmp_path, capsys):
    import json

    from sql_graph_visualizer_ray.cli import main
    from sql_graph_visualizer_ray.pipelines.cdc import replay
    from sql_graph_visualizer_ray.state.manifest import Manifest

    lake_dir = str(tmp_path / "lake")
    replay(clog, lake_dir, num_buckets=4)
    assert main(["analyze", lake_dir, "--format", "json"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["stats_files"] == rep["data_files"] > 0
    assert not any("lack column statistics" in r for r in rep["recommendations"])

    # a pre-stats lake (stats stripped) gets the compact recommendation
    m = Manifest.load(lake_dir)
    for b in m.data["buckets"].values():
        b.pop("stats", None)
    m.save_atomic(lake_dir)
    assert main(["analyze", lake_dir, "--format", "json"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["stats_files"] == 0
    assert any("lack column statistics" in r for r in rep["recommendations"])


def test_cli_search_and_conjunction(ray_session, clog, tmp_path, capsys):
    import json

    from sql_graph_visualizer_ray.cli import main
    from sql_graph_visualizer_ray.pipelines.cdc import replay

    lake_dir = str(tmp_path / "lake")
    lake = replay(clog, lake_dir, num_buckets=4)
    want = lake.final_table().to_pandas()
    n = int(((want.role == "assistant") & (want.turn_idx < 5)).sum())
    rc = main(
        [
            "search", lake_dir, "role", "==", "assistant",
            "--and", "turn_idx", "<", "5", "--columns", "conv_id",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == n
    # coercion error in an --and predicate reports cleanly
    assert main(
        ["search", lake_dir, "role", "==", "x", "--and", "turn_idx", "<", "z"]
    ) == 1
    assert "must be int" in capsys.readouterr().err


def test_cli_backfill_stats(ray_session, clog, tmp_path, capsys):
    import json

    from sql_graph_visualizer_ray.cli import main
    from sql_graph_visualizer_ray.pipelines.cdc import replay
    from sql_graph_visualizer_ray.state.manifest import Manifest

    lake_dir = str(tmp_path / "lake")
    replay(clog, lake_dir, num_buckets=4)
    m = Manifest.load(lake_dir)
    n_files = sum(len(b["files"]) for b in m.data["buckets"].values())
    for b in m.data["buckets"].values():
        b.pop("stats", None)
    m.save_atomic(lake_dir)

    assert main(["backfill-stats", lake_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_backfilled"] == n_files
    # second run is a no-op
    assert main(["backfill-stats", lake_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_backfilled"] == 0


def test_cli_read_verbs_never_create_lakes(tmp_path, capsys):
    """A mistyped lake path is exit 1 + a message — LakeTable.open would
    have written a default-schema manifest there as a side effect."""
    from sql_graph_visualizer_ray.cli import main

    missing = str(tmp_path / "nope")
    for argv in (
        ["lookup", missing, "--key", "x"],
        ["vacuum", missing],
        ["search-any", missing, "zz"],
    ):
        assert main(argv) == 1, argv
        assert "MANIFEST.json missing" in capsys.readouterr().err
        assert not (tmp_path / "nope").exists()
