"""Command-line entry points — the engine's counterpart of the reference CLI
(``/root/reference/cmd/sql-graph-cli/commands/*.go``: analyze / generate /
config validate) plus the lake lifecycle verbs the reference's wipe-and-reload
design never needed (resume-safe run, tail, compact, split, vacuum, verify).

Usage: ``python -m sql_graph_visualizer_ray.cli <verb> ...``. The CLI owns a
Ray session only when none exists (so tests can drive ``main()`` in-process
under the shared session fixture).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False


def _open_existing(path: str):
    """Open a lake WITHOUT creating one. Every serving/maintenance verb
    operates on an existing lake; ``LakeTable.open`` would write a
    default-transcript-schema manifest at a mistyped path as a side
    effect (the create-on-open hazard fixed in serve.GraphServer).
    Prints the error and returns None when no manifest exists."""
    from .pipelines.cdc import LakeTable
    from .state.manifest import Manifest

    m = Manifest.load(path)
    if m is None:
        print(
            f"no lake at {path} (MANIFEST.json missing) — create one with "
            "`run`/`tail` first",
            file=sys.stderr,
        )
        return None
    return LakeTable(path, m)


def _emsg(e: BaseException) -> str:
    """str(KeyError) is the repr of its argument (quotes included)."""
    return str(e.args[0]) if isinstance(e, KeyError) and e.args else str(e)


def _emit_table(t, out: str | None) -> int:
    """Shared result tail of the serving verbs: --out writes parquet,
    otherwise the rows print as JSON."""
    if out:
        import pyarrow.parquet as pq

        pq.write_table(t, out)
        print(json.dumps({"rows": t.num_rows, "out": out}))
    else:
        print(json.dumps({"rows": t.num_rows, "data": t.to_pylist()}, default=str))
    return 0


def cmd_run(a) -> int:
    from .pipelines.cdc import replay

    _ensure_ray(a.num_cpus)
    lake = replay(
        a.changelog_dir,
        a.lake_dir,
        num_buckets=a.num_buckets,
        epochs_per_commit=a.epochs_per_commit,
        shuffle=a.shuffle,
        commit_mode=a.commit_mode,
        auto_compact_files=a.auto_compact_files or None,
        auto_split_bytes=a.auto_split_bytes or None,
    )
    m = lake.manifest
    print(
        json.dumps(
            {
                "applied_epoch": m.applied_epoch,
                "version": m.version,
                "counters": m.data["counters"],
            }
        )
    )
    return 0


def cmd_tail(a) -> int:
    from .pipelines.streaming import tail

    _ensure_ray(a.num_cpus)
    lake = tail(
        a.changelog_dir,
        a.lake_dir,
        num_buckets=a.num_buckets,
        idle_timeout=a.idle_timeout,
        stop_after_epoch=a.stop_after_epoch,
        shuffle=a.shuffle,
        auto_compact_files=a.auto_compact_files or None,
        auto_split_bytes=a.auto_split_bytes or None,
    )
    print(json.dumps({"applied_epoch": lake.manifest.applied_epoch}))
    return 0


def cmd_compact(a) -> int:
    from .pipelines.cdc import LakeTable

    _ensure_ray(a.num_cpus)
    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1
    if a.tombstone_lateness_us is not None:
        res = lake.compact_tombstones(allowed_lateness_us=a.tombstone_lateness_us)
    elif a.string_stats:
        res = lake.compact_for_string_stats()
    else:
        res = lake.compact(min_files=a.min_files)
    print(json.dumps(res))
    return 0


def cmd_split(a) -> int:
    from .pipelines.cdc import LakeTable

    _ensure_ray(a.num_cpus)
    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1
    print(json.dumps(lake.split_buckets(a.new_buckets)))
    return 0


def cmd_vacuum(a) -> int:
    from .pipelines.cdc import LakeTable
    from .state.manifest import vacuum

    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1
    n = vacuum(a.lake_dir, lake.manifest, min_age_s=a.min_age_s)
    print(json.dumps({"removed_versions": n}))
    return 0


def cmd_changes(a) -> int:
    from .pipelines.cdc import LakeTable

    _ensure_ray(a.num_cpus)
    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1
    try:
        feed = lake.changes(a.version)
    except KeyError as e:
        print(str(e), file=sys.stderr)
        return 1
    if a.out:
        feed.write_parquet(a.out)
        print(json.dumps({"version": a.version, "out": a.out}))
    else:
        print(json.dumps({"version": a.version, "rows": feed.count()}))
    return 0


def cmd_feed(a) -> int:
    """Drain the change feed to parquet with a durable consumer cursor —
    the restart-safe CDC-out export loop (run from cron; at-least-once)."""
    from .pipelines.cdc import LakeTable
    from .pipelines.feed import ChangeFeedCursor, drain

    _ensure_ray(a.num_cpus)
    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1
    cur = ChangeFeedCursor(a.cursor, start_after=a.start_after)
    try:
        delivered = drain(lake, cur, a.out, max_polls=a.max_polls)
    except KeyError as e:
        print(str(e), file=sys.stderr)
        return 1
    print(
        json.dumps(
            {"delivered": delivered, "acked": cur.acked, "lag": cur.lag(lake)}
        )
    )
    return 0


def cmd_lookup(a) -> int:
    """Point lookup by key — opens only the keys' home buckets, no Ray
    session needed (the latency-sensitive serving verb)."""
    from .pipelines.cdc import LakeTable

    import pyarrow as pa

    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1
    turns = a.turn if a.turn else None
    if turns is not None and len(turns) not in (0, len(a.key)):
        print("--turn must be given once per --key", file=sys.stderr)
        return 1
    # --key arrives as strings; coerce to the manifest's key type (an
    # int-keyed lake, e.g. an edge lake, needs int64 keys or pa.array
    # raises). payload_schema stores the PHYSICAL (canonical) key names.
    from .pipelines.cdc import CANONICAL_KEYS

    key_field = lake.manifest.payload_schema.field(CANONICAL_KEYS[0])
    keys = list(a.key)
    if pa.types.is_integer(key_field.type):
        try:
            keys = [int(k) for k in keys]
        except ValueError as e:
            print(
                f"--key must be {key_field.type} for this lake: {e}",
                file=sys.stderr,
            )
            return 1
    t = lake.lookup(
        keys,
        turns=turns,
        columns=a.columns.split(",") if a.columns else None,
        version=a.version,
    )
    return _emit_table(t, a.out)


def _coerce_search_value(lake, column: str, op: str, value: str):
    """CLI value string -> the column's type (int/float/timestamp pass
    through for 'contains', which matches on the stringified column)."""
    import pyarrow as pa

    from .pipelines.cdc import CANONICAL_KEYS

    ren_in = dict(zip(lake.key_columns, CANONICAL_KEYS))
    try:
        f = lake.manifest.payload_schema.field(ren_in.get(column, column))
    except KeyError:
        raise KeyError(f"unknown column {column!r}") from None
    if op == "contains":
        return value
    try:
        if pa.types.is_integer(f.type):
            return int(value)
        if pa.types.is_floating(f.type):
            return float(value)
        if pa.types.is_timestamp(f.type):
            import pandas as pd

            return pd.Timestamp(value)
    except ValueError as e:
        raise ValueError(f"value for {column} must be {f.type}: {e}") from e
    return value


def cmd_search(a) -> int:
    """Predicate fetch on the serving path (the reference's searchNodes) —
    no Ray session; value strings are coerced to the column's type.
    Repeatable ``--and COL OP VAL`` triples AND further predicates."""
    import pyarrow as pa

    from .pipelines.cdc import LakeTable

    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1

    try:
        predicates = [
            (col, op, _coerce_search_value(lake, col, op, val))
            for col, op, val in [(a.column, a.op, a.value)] + (a.extra or [])
        ]
    except (ValueError, KeyError) as e:
        print(_emsg(e), file=sys.stderr)
        return 1
    try:
        t = lake.search_where(
            predicates,
            columns=a.columns.split(",") if a.columns else None,
            version=a.version,
            max_result_keys=a.max_result_keys,
        )
    except (ValueError, KeyError, pa.lib.ArrowException) as e:
        # ArrowException covers type mismatches the coercion above cannot
        # anticipate (bool/date/decimal/binary columns vs a string --value):
        # pc.equal raises ArrowNotImplementedError, which is NOT a ValueError
        print(_emsg(e), file=sys.stderr)
        return 1
    return _emit_table(t, a.out)


def cmd_search_any(a) -> int:
    """searchNodes(searchTerm): one substring OR-matched across the lake's
    string payload columns — no Ray session."""
    import pyarrow as pa

    from .pipelines.cdc import LakeTable

    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1
    try:
        t = lake.search_any(
            a.term,
            search_columns=(
                a.search_columns.split(",") if a.search_columns else None
            ),
            columns=a.columns.split(",") if a.columns else None,
            version=a.version,
            max_result_keys=a.max_result_keys,
        )
    except (ValueError, KeyError, pa.lib.ArrowException) as e:
        print(_emsg(e), file=sys.stderr)
        return 1
    return _emit_table(t, a.out)


def cmd_serve(a) -> int:
    """Serve the lake over HTTP (blocking; no Ray session) — see serve.py
    for the resolver-to-endpoint mapping."""
    from .serve import serve

    serve(
        a.lake_dir,
        edges_path=a.edges,
        host=a.host,
        port=a.port,
        transform_source=a.transform_source,
    )
    return 0


def cmd_monitor(a) -> int:
    """Poll lake health (no Ray session): one JSON line per poll with the
    manifest-derived sample + any threshold alerts — the pull-CLI face of
    monitor.RealtimeMonitor (the reference pushes the same rounds over
    WebSocket, realtime_performance_monitor.go:287-366)."""
    from .monitor import AlertThresholds, monitor_jsonl

    kw = {}
    if a.max_commit_lag_s is not None:
        kw["max_commit_lag_s"] = a.max_commit_lag_s
    if a.max_delta_files is not None:
        kw["max_delta_files_per_bucket"] = a.max_delta_files
    if a.max_bucket_skew is not None:
        kw["max_bucket_skew"] = a.max_bucket_skew
    for line in monitor_jsonl(
        a.lake_dir,
        polls=a.polls,
        interval_s=a.interval,
        thresholds=AlertThresholds(**kw),
    ):
        print(line, flush=True)
    return 0


def cmd_benchmark(a) -> int:
    """Run one registry benchmark synchronously and print its result —
    the CLI face of monitor.BenchmarkService (benchmark_service.go:143-250;
    'serving' is the sysbench oltp_point_select analogue, 'replay' measures
    the CDC write path in events/s)."""
    from .monitor import (
        BenchmarkConfig,
        BenchmarkService,
        ReplayTool,
        ServingProbeTool,
    )
    from .pipelines.cdc import LakeTable

    svc = BenchmarkService(default_timeout_s=a.timeout)
    try:
        if a.tool == "serving":
            import pyarrow as pa

            from .pipelines.cdc import CANONICAL_KEYS

            lake = _open_existing(a.path)
            if lake is None:
                return 1
            if a.keys:
                keys = a.keys.split(",")
                key_type = lake.manifest.payload_schema.field(
                    CANONICAL_KEYS[0]
                ).type
                if pa.types.is_integer(key_type):
                    try:
                        keys = [int(k) for k in keys]
                    except ValueError as e:
                        print(
                            f"--keys must be {key_type} for this lake: {e}",
                            file=sys.stderr,
                        )
                        return 1
            else:  # sample a handful of live keys from the lake head
                keys = lake.head(8).column(lake.key_columns[0]).to_pylist()
            svc.register_tool(ServingProbeTool(a.path, keys))
            rid = svc.execute_benchmark(
                BenchmarkConfig(
                    test_type="point_select", duration_s=a.duration
                ),
                "serving_probe",
            )
        else:  # replay
            _ensure_ray(a.num_cpus)
            svc.register_tool(ReplayTool(a.path, num_buckets=a.num_buckets))
            rid = svc.execute_benchmark(
                BenchmarkConfig(test_type="replay"), "cdc_replay"
            )
    except RuntimeError as e:
        # tool unavailable (empty lake -> no probe keys; replay dir gone):
        # a clean message, not a traceback — mirrors the HTTP route's 409
        print(_emsg(e), file=sys.stderr)
        return 1
    svc.wait(rid, timeout=a.timeout + 30)
    r = svc.get_result(rid)
    print(json.dumps(r.to_dict()))
    return 0 if r.status == "completed" else 1


def cmd_backfill_stats(a) -> int:
    """Record column statistics for pre-stats files from parquet footers —
    zero data IO, publishes a metadata-only commit (no Ray session).
    ``--strings`` follows up with the string-bounds pass (column-pruned
    data read of exactly the gap files, still no rewrite); it runs AFTER
    the footer pass because ``backfill_stats`` skips files that already
    carry a stats entry."""
    from .pipelines.cdc import CommitConflictError, LakeTable

    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1
    try:
        r = lake.commit_with_retry(lambda lk: lk.backfill_stats())
        if a.strings:
            r2 = lake.commit_with_retry(lambda lk: lk.backfill_string_stats())
            r = {"footer": r, "strings": r2}
    except CommitConflictError as e:
        print(str(e), file=sys.stderr)
        return 1
    print(json.dumps(r))
    return 0


def cmd_snapshot(a) -> int:
    """Time-travel read: export (or count) the lake state as of a commit."""
    from .pipelines.cdc import LakeTable

    _ensure_ray(a.num_cpus)
    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1
    try:
        snap = lake.snapshot(a.version)
    except KeyError as e:
        print(str(e), file=sys.stderr)
        return 1
    ds = snap.read_final()
    if a.out:
        ds.write_parquet(a.out)
        print(json.dumps({"version": a.version, "out": a.out}))
    else:
        print(
            json.dumps(
                {
                    "version": a.version,
                    "rows": ds.count(),
                    "num_buckets": snap.manifest.num_buckets,
                }
            )
        )
    return 0


def cmd_verify(a) -> int:
    """Replay-equivalence gate: the lake's merged state must equal the
    single-process oracle over the same changelog."""
    import pyarrow.compute as pc

    from .pipelines.cdc import LakeTable
    from .pipelines.oracle import replay_oracle

    _ensure_ray(a.num_cpus)
    lake = _open_existing(a.lake_dir)
    if lake is None:
        return 1

    def canonical(t):
        t = t.select(sorted(t.column_names))
        return t.take(
            pc.sort_indices(
                t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
        )

    got = canonical(lake.final_table())
    want = canonical(replay_oracle(a.changelog_dir, max_epoch=lake.manifest.applied_epoch))
    ok = got.equals(want)
    print(
        json.dumps(
            {"ok": ok, "lake_rows": got.num_rows, "oracle_rows": want.num_rows}
        )
    )
    return 0 if ok else 1


def cmd_analyze(a) -> int:
    """K5 analysis/report output (reference: ``analyze.go:347-460`` emits
    json/yaml/summary): manifest watermarks, cumulative lineage counters,
    per-bucket layout, commit history."""
    from .state.manifest import Manifest

    m = Manifest.load(a.lake_dir)
    if m is None:
        print(f"no lake at {a.lake_dir}", file=sys.stderr)
        return 1
    buckets = {
        k: {
            "files": len(v["files"]),
            "rows": v["rows"],
            "tombstones": v["tombstones"],
        }
        for k, v in sorted(m.data["buckets"].items(), key=lambda kv: int(kv[0]))
    }
    # A3 recommendations (the reference's analyzer emits threshold-driven
    # advice, ``analyze.go:347-460``) — derived from manifest stats only
    recs: list[str] = []
    if buckets:
        max_files = max(b["files"] for b in buckets.values())
        if max_files >= 8:
            recs.append(
                f"bucket has {max_files} delta files — run `compact` to fold "
                "them (read-amplification grows with file count)"
            )
        rows = [b["rows"] for b in buckets.values()]
        tombs = sum(b["tombstones"] for b in buckets.values())
        if tombs and tombs * 5 >= sum(rows):
            recs.append(
                f"{tombs} tombstones (>20% of rows) — run `compact "
                "--tombstone-lateness-us <bound>` to expire them"
            )
        mx, md = max(rows), sorted(rows)[len(rows) // 2]
        if md and mx >= 4 * md:
            recs.append(
                f"bucket skew: largest bucket {mx} rows vs median {md} — "
                "consider salt_groups/turn_shard_size or `split` to more "
                "buckets"
            )
        if len(buckets) < m.num_buckets // 2:
            recs.append(
                f"only {len(buckets)}/{m.num_buckets} buckets populated — "
                "key space is narrower than the bucket count assumes"
            )
    n_files = sum(len(v["files"]) for v in m.data["buckets"].values())
    n_stats = sum(
        len(v.get("stats") or {}) for v in m.data["buckets"].values()
    )
    if n_stats < n_files:
        recs.append(
            f"{n_files - n_stats}/{n_files} data files lack column "
            "statistics (written pre-stats) — run `backfill-stats` to "
            "recover numeric/timestamp bounds from footers with zero data "
            "IO; `compact` records exact bounds for every eligible column"
        )
    from .pipelines.cdc import string_stats_gaps

    sgaps = string_stats_gaps(m)
    n_sgap = sum(len(v) for v in sgaps.values())
    if n_sgap:
        recs.append(
            f"{n_sgap} data files in {len(sgaps)} buckets have no STRING "
            "column statistics (pre-stats or footer-backfilled — footer "
            "string bounds may be truncated, so the footer pass skips "
            "them) — run `backfill-stats --strings` (column-pruned read of "
            "exactly those files, no rewrite: keeps each delta file's "
            "narrow string range prunable) or `compact --string-stats` "
            "when folding those buckets' delta files is wanted anyway "
            "(note: merging UNIONS string ranges)"
        )
    report = {
        "lake": a.lake_dir,
        "format": m.data["format"],
        "version": m.version,
        "applied_epoch": m.applied_epoch,
        "applied_lsn": m.data["applied_lsn"],
        "num_buckets": m.num_buckets,
        "payload_columns": [f.name for f in m.payload_schema],
        "counters": m.data["counters"],
        "buckets": buckets,
        "commits": m.history_total(),
        # file-statistics coverage: files without stats (pre-stats commits)
        # can never be skipped by lookup/search — compact() re-records them
        "stats_files": n_stats,
        "data_files": n_files,
        "string_stats_gap_files": n_sgap,
        "recommendations": recs,
    }
    if a.format == "json":
        print(json.dumps(report, indent=2))
    elif a.format == "yaml":
        import yaml

        print(yaml.safe_dump(report, sort_keys=False), end="")
    else:  # summary
        c = m.data["counters"]
        rows = sum(b["rows"] for b in m.data["buckets"].values())
        files = sum(len(b["files"]) for b in m.data["buckets"].values())
        print(f"lake            {a.lake_dir}")
        print(f"version         v{m.version} ({m.history_total()} commits)")
        print(f"applied epoch   {m.applied_epoch} (lsn {m.data['applied_lsn']})")
        print(f"buckets         {m.num_buckets} ({files} data files, ~{rows} rows)")
        print(f"events applied  {c.get('raw_events', 0)}")
        for k in ("upserts", "deletes", "superseded", "late", "precompact_dropped"):
            print(f"  {k:<14}{c.get(k, 0)}")
        for r in recs:
            print(f"recommend       {r}")
    return 0


def cmd_rules(a) -> int:
    """Rule repository verbs: validate / list / save-priority / delete —
    the reference's config-rule CRUD (``config_rule_repository.go:48-71``)
    over the YAML file."""
    from .config import RuleSet

    rs = RuleSet.load_yaml(a.rules_yml)
    if a.rules_cmd == "validate":
        known = None
        if a.sf_dir:
            import os

            known = {
                f[: -len(".parquet")]
                for f in os.listdir(a.sf_dir)
                if f.endswith(".parquet")
            }
        problems = rs.validate(known_tables=known)
        print(json.dumps({"ok": not problems, "problems": problems}))
        return 0 if not problems else 1
    if a.rules_cmd == "list":
        for r in rs.ordered():
            kind = "node" if hasattr(r, "source_table") else "rel "
            print(f"{r.priority:>4}  {kind}  {r.name}")
        return 0
    if a.rules_cmd == "set-priority":
        rs.update_rule_priority(a.name, a.priority)
        rs.save_yaml(a.rules_yml)
        return 0
    if a.rules_cmd == "delete":
        if not rs.delete_rule(a.name):
            print(f"no rule named {a.name!r}", file=sys.stderr)
            return 1
        rs.save_yaml(a.rules_yml)
        return 0
    if a.rules_cmd == "run":
        from .config import RelationshipRule
        from .pipelines.rules import run_rules

        _ensure_ray(a.num_cpus)
        outputs = run_rules(a.sf_dir, rs)
        import os

        os.makedirs(a.out_dir, exist_ok=True)
        counts = {}
        rel_names = {r.name for r in rs.rules if isinstance(r, RelationshipRule)}
        for name, ds in outputs.items():
            if a.edge_lake and name in rel_names:
                # persist relationship outputs through the edge lake (same
                # epoch-fenced commit protocol as the transcripts lake)
                from .pipelines.graph_sink import EdgeLake

                elake = EdgeLake(os.path.join(a.edge_lake, name))
                c = elake.ingest(ds, epoch=elake.manifest.applied_epoch + 1)
                counts[name] = f"edge lake +{c.get('upserts', 0)} upserts"
            else:
                ds.write_parquet(os.path.join(a.out_dir, name))
                counts[name] = "written"
        print(json.dumps({"outputs": counts, "out_dir": a.out_dir}))
        return 0
    raise AssertionError(a.rules_cmd)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sql_graph_visualizer_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="replay a changelog into a lake (resumes)")
    r.add_argument("changelog_dir")
    r.add_argument("lake_dir")
    r.add_argument("--num-buckets", type=int, default=16)
    r.add_argument("--epochs-per-commit", type=int, default=None)
    r.add_argument("--shuffle", default="sort", choices=["sort", "hash", "spill"])
    r.add_argument("--commit-mode", default="delta", choices=["delta", "rewrite"])
    # mirror the library defaults (replay: compact at 8 files, split at
    # 1 GiB); 0 disables — passing None through would silently turn the
    # library's on-by-default auto-management off
    r.add_argument("--auto-compact-files", type=int, default=8)
    r.add_argument("--auto-split-bytes", type=int, default=1 << 30)
    r.set_defaults(fn=cmd_run)

    t = sub.add_parser("tail", help="follow a growing changelog")
    t.add_argument("changelog_dir")
    t.add_argument("lake_dir")
    t.add_argument("--num-buckets", type=int, default=16)
    t.add_argument("--idle-timeout", type=float, default=10.0)
    t.add_argument("--stop-after-epoch", type=int, default=None)
    t.add_argument("--shuffle", default="sort", choices=["sort", "hash", "spill"])
    t.add_argument("--auto-compact-files", type=int, default=8)
    t.add_argument("--auto-split-bytes", type=int, default=1 << 30)
    t.set_defaults(fn=cmd_tail)

    c = sub.add_parser("compact", help="fold delta files / expire tombstones")
    c.add_argument("lake_dir")
    c.add_argument("--min-files", type=int, default=2)
    c.add_argument("--tombstone-lateness-us", type=int, default=None)
    c.add_argument(
        "--string-stats",
        action="store_true",
        help="compact only buckets whose files lack string column stats "
        "(no-stats or footer-backfilled), recording exact string bounds",
    )
    c.set_defaults(fn=cmd_compact)

    s = sub.add_parser("split", help="rewrite the lake at k*n buckets")
    s.add_argument("lake_dir")
    s.add_argument("new_buckets", type=int)
    s.set_defaults(fn=cmd_split)

    v = sub.add_parser("vacuum", help="delete unreferenced version dirs")
    v.add_argument("lake_dir")
    v.add_argument(
        "--min-age-s",
        type=float,
        default=0.0,
        dest="min_age_s",
        help="retention window in seconds, measured from when a vacuum "
        "pass FIRST saw the dir de-referenced (run vacuum periodically: "
        "one pass starts the clocks, a later pass reclaims) — safe on a "
        "live server whose pinned reads finish within the window; "
        "0 = reclaim everything immediately",
    )
    v.set_defaults(fn=cmd_vacuum)

    ch = sub.add_parser("changes", help="export a commit's change feed")
    ch.add_argument("lake_dir")
    ch.add_argument("version", type=int)
    ch.add_argument("--out", default=None, help="write feed parquet here")
    ch.set_defaults(fn=cmd_changes)

    fe = sub.add_parser("feed", help="drain the change feed with a durable cursor")
    fe.add_argument("lake_dir")
    fe.add_argument("--cursor", required=True, help="consumer offset file (JSON)")
    fe.add_argument("--out", required=True, help="export dir (one v{N}/ per commit)")
    fe.add_argument("--start-after", type=int, default=0, dest="start_after")
    fe.add_argument("--max-polls", type=int, default=None, dest="max_polls")
    fe.set_defaults(fn=cmd_feed)

    lk = sub.add_parser("lookup", help="point lookup by key (no Ray session)")
    lk.add_argument("lake_dir")
    lk.add_argument("--key", action="append", required=True, help="repeatable")
    lk.add_argument("--turn", action="append", type=int, help="pairs with --key")
    lk.add_argument("--columns", help="comma-separated projection")
    lk.add_argument("--version", type=int, help="time-travel to a commit")
    lk.add_argument("--out", help="write parquet instead of printing rows")
    lk.set_defaults(fn=cmd_lookup)

    se = sub.add_parser(
        "search", help="predicate fetch by column (no Ray session)"
    )
    se.add_argument("lake_dir")
    se.add_argument("column")
    se.add_argument(
        "op", help="one of = == != < <= > >= contains"
    )
    se.add_argument("value")
    se.add_argument(
        "--and",
        dest="extra",
        action="append",
        nargs=3,
        metavar=("COL", "OP", "VAL"),
        help="additional ANDed predicate (repeatable)",
    )
    se.add_argument("--columns", help="comma-separated projection")
    se.add_argument("--version", type=int, help="time-travel to a commit")
    se.add_argument(
        "--max-result-keys", type=int, default=100_000, dest="max_result_keys"
    )
    se.add_argument("--out", help="write parquet instead of printing rows")
    se.set_defaults(fn=cmd_search)

    sa = sub.add_parser(
        "search-any",
        help="substring search across string columns (searchNodes; no Ray)",
    )
    sa.add_argument("lake_dir")
    sa.add_argument("term")
    sa.add_argument(
        "--search-columns",
        dest="search_columns",
        help="comma-separated; default: every string payload column",
    )
    sa.add_argument("--columns", help="comma-separated projection")
    sa.add_argument("--version", type=int, help="time-travel to a commit")
    sa.add_argument(
        "--max-result-keys", type=int, default=100_000, dest="max_result_keys"
    )
    sa.add_argument("--out", help="write parquet instead of printing rows")
    sa.set_defaults(fn=cmd_search_any)

    bf = sub.add_parser(
        "backfill-stats",
        help="record file statistics from parquet footers (no data IO)",
    )
    bf.add_argument("lake_dir")
    bf.add_argument(
        "--strings",
        action="store_true",
        help="also record exact string bounds for gap files (column-pruned "
        "data read, no rewrite — preserves per-file range locality)",
    )
    bf.set_defaults(fn=cmd_backfill_stats)

    sn = sub.add_parser("snapshot", help="time-travel read of a commit's state")
    sn.add_argument("lake_dir")
    sn.add_argument("version", type=int)
    sn.add_argument("--out", default=None, help="write snapshot parquet here")
    sn.set_defaults(fn=cmd_snapshot)

    ve = sub.add_parser("verify", help="compare lake state against the oracle")
    ve.add_argument("changelog_dir")
    ve.add_argument("lake_dir")
    ve.set_defaults(fn=cmd_verify)

    sv = sub.add_parser(
        "serve",
        help="HTTP JSON API over the no-Ray serving path (node/search/"
        "graph/neighbors/updates — the reference's GraphQL surface)",
    )
    sv.add_argument("lake_dir")
    sv.add_argument("--edges", default=None, help="edge lake dir for "
                    "/relationships /neighbors /expand")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8465)  # 8265 is Ray dashboard
    sv.add_argument("--transform-source", default=None,
                    help="changelog dir that `mutation { transformData }` "
                         "replays into the lake (detached cli run child)")
    sv.set_defaults(fn=cmd_serve)

    mo = sub.add_parser(
        "monitor",
        help="poll lake health: manifest-derived metrics + threshold "
        "alerts, one JSON line per poll (no Ray session)",
    )
    mo.add_argument("lake_dir")
    mo.add_argument("--polls", type=int, default=1)
    mo.add_argument("--interval", type=float, default=1.0)
    mo.add_argument("--max-commit-lag-s", type=float, default=None)
    mo.add_argument("--max-delta-files", type=int, default=None)
    mo.add_argument("--max-bucket-skew", type=float, default=None)
    mo.set_defaults(fn=cmd_monitor)

    be = sub.add_parser(
        "benchmark",
        help="run a registry benchmark: 'serving' probes lookup latency "
        "(no Ray), 'replay' measures CDC write throughput",
    )
    be.add_argument("tool", choices=["serving", "replay"])
    be.add_argument("path", help="lake dir (serving) or changelog dir (replay)")
    be.add_argument("--duration", type=float, default=5.0)
    be.add_argument("--keys", default=None, help="comma-separated probe keys")
    be.add_argument("--timeout", type=float, default=300.0)
    be.add_argument("--num-buckets", type=int, default=16)
    be.add_argument("--num-cpus", type=int, default=None)
    be.set_defaults(fn=cmd_benchmark)

    an = sub.add_parser("analyze", help="lake report (json|yaml|summary)")
    an.add_argument("lake_dir")
    an.add_argument("--format", default="summary", choices=["json", "yaml", "summary"])
    an.set_defaults(fn=cmd_analyze)

    ru = sub.add_parser("rules", help="rule repository verbs")
    rsub = ru.add_subparsers(dest="rules_cmd", required=True)
    for name in ("validate", "list", "set-priority", "delete", "run"):
        rp = rsub.add_parser(name)
        rp.add_argument("rules_yml")
        if name == "validate":
            rp.add_argument("--sf-dir", default=None)
        if name in ("set-priority", "delete"):
            rp.add_argument("name")
        if name == "set-priority":
            rp.add_argument("priority", type=int)
        if name == "run":
            rp.add_argument("sf_dir")
            rp.add_argument("out_dir")
            rp.add_argument("--edge-lake", default=None,
                            help="persist relationship outputs into edge "
                                 "lake tables under this directory")
        rp.set_defaults(fn=cmd_rules)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    rc = main()
    import ray

    if ray.is_initialized():
        ray.shutdown()
    sys.exit(rc)
