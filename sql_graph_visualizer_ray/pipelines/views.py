"""Incremental materialized views over a lake table.

A view is any per-bucket-computable aggregate of the live rows (every
grouping keyed by ``conv_id`` qualifies — bucket boundaries respect the
conv partitioning). Refresh is incremental at BUCKET granularity: the view
manifest fingerprints each bucket's file list, and a refresh recomputes only
buckets whose files changed since the last refresh — after a typical delta
commit that is the touched buckets, not the table. This is the engine's
materialized-view answer to the reference's recompute-the-world analyzer
runs (``/root/reference/cmd/sql-graph-cli/commands/analyze.go`` re-reads
every table on every invocation).

Same durability contract as the lake: per-bucket parquet written to a
staging dir, atomically renamed, then a manifest ``os.replace`` — a killed
refresh leaves the previous view state intact.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..state.manifest import _schema_from_str, _schema_to_str
from .cdc import CANONICAL_KEYS, LakeTable, _read_files_merged

VIEW_MANIFEST = "VIEW.json"


class BucketAggView:
    """Materialized per-bucket aggregate of a lake table.

    ``agg_fn(table) -> table`` runs over one bucket's LIVE rows (tombstones
    filtered, payload columns only) and must be bucket-local — true for any
    aggregate grouped by ``conv_id`` (or finer), because a conversation's
    rows live in exactly one bucket.
    """

    def __init__(self, lake: LakeTable, name: str, agg_fn: Callable[[pa.Table], pa.Table]):
        if lake.manifest.turn_shard_size is not None:
            # turn-sharded lakes spread one conv_id over several buckets
            # (bucket = hash(conv) ^ f(turn//shard)), so a conv_id-grouped
            # agg_fn would emit multiple partial rows per conv_id
            raise ValueError(
                "BucketAggView requires conv-partitioned buckets; this lake "
                f"uses turn_shard_size={lake.manifest.turn_shard_size}, which "
                "splits a conversation across buckets — per-bucket aggregates "
                "would be partial. Aggregate over read_final() instead."
            )
        self.lake = lake
        self.name = name
        self.agg_fn = agg_fn
        self.dir = os.path.join(lake.path, "_views", name)
        os.makedirs(self.dir, exist_ok=True)
        mpath = os.path.join(self.dir, VIEW_MANIFEST)
        if os.path.exists(mpath):
            with open(mpath) as f:
                self.state = json.load(f)
        else:
            self.state = {"buckets": {}}  # str(bucket) -> {"files": [...], "out": path}

    def refresh(self) -> dict:
        """Recompute only the buckets whose lake file lists changed.
        Returns {"recomputed": n, "reused": m}."""
        m = self.lake.manifest
        target = self.lake._event_read_schema()
        payload_cols = [f.name for f in m.payload_schema]
        by_bucket = self.lake.manifest.bucket_files(self.lake.path)
        # The payload schema is part of the fingerprint: a widening/add-column
        # commit touches only the event-bearing buckets' FILES, but agg_fn
        # sees the unified schema — reusing untouched buckets' partitions
        # would mix old- and new-schema view outputs (schema mismatch or
        # silently inconsistent aggregates on read). Schema change => full
        # recompute.
        schema_fp = m.payload_schema.to_string()
        schema_changed = self.state.get("schema") != schema_fp
        todo: dict[int, list[str]] = {}
        rels: dict[int, list[str]] = {}
        reused = 0
        for bk, files in by_bucket.items():
            rel = [os.path.relpath(f, self.lake.path) for f in files]
            rels[bk] = rel
            prev = self.state["buckets"].get(str(bk))
            if not schema_changed and prev is not None and prev["files"] == rel:
                reused += 1
            else:
                todo[bk] = files
        agg_fn = self.agg_fn
        out_dir = self.dir
        # agg_fn sees the lake's LOGICAL column names (edge lakes etc.)
        ren_out = dict(zip(CANONICAL_KEYS, m.key_columns))
        # generation-stamped filenames: new partitions land beside the live
        # ones and only become visible via the manifest os.replace below, so
        # a killed refresh leaves the previous view state fully intact
        gen = int(self.state.get("gen", 0)) + 1

        def _task(items: pa.Table) -> pa.Table:
            outs = []
            for bk in items.column("bucket").to_pylist():
                bk = int(bk)
                t = _read_files_merged(todo[bk], target)
                t = t.filter(pc.not_equal(t.column("op"), pa.scalar("D")))
                t = t.select(payload_cols)
                agg = agg_fn(
                    t.rename_columns(
                        [ren_out.get(c, c) for c in t.column_names]
                    )
                )
                name = f"bucket={bk:05d}.g{gen}.parquet"
                tmp = os.path.join(out_dir, name + ".tmp")
                pq.write_table(agg, tmp)
                os.replace(tmp, os.path.join(out_dir, name))
                outs.append(pa.table({"bucket": [bk], "rows": [agg.num_rows]}))
            return pa.concat_tables(outs)

        if todo:
            rd.from_items(
                [{"bucket": b} for b in sorted(todo)],
                override_num_blocks=len(todo),
            ).map_batches(_task, batch_format="pyarrow", batch_size=1).take_all()
        for bk in todo:
            self.state["buckets"][str(bk)] = {
                "files": rels[bk],
                "out": f"bucket={bk:05d}.g{gen}.parquet",
            }
        # drop view partitions for buckets that vanished (split rewrites)
        live = {str(b) for b in by_bucket}
        for bk in list(self.state["buckets"]):
            if bk not in live:
                del self.state["buckets"][bk]
        self.state["gen"] = gen
        self.state["schema"] = schema_fp
        # pin the view's OUTPUT schema so read() over an empty lake returns
        # a correctly-typed empty dataset (a zero-column table breaks
        # schema-bound consumers): probe agg_fn with an empty logical-name
        # table when no partition exists to take the schema from
        if not self.state["buckets"]:
            try:
                empty_in = pa.schema(
                    [
                        pa.field(ren_out.get(f.name, f.name), f.type)
                        for f in m.payload_schema
                    ]
                ).empty_table()
                self.state["out_schema"] = _schema_to_str(
                    agg_fn(empty_in).schema
                )
            except Exception:
                self.state.pop("out_schema", None)  # agg needs rows: no pin
        tmp = os.path.join(self.dir, VIEW_MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(self.state, f)
        os.replace(tmp, os.path.join(self.dir, VIEW_MANIFEST))
        # GC: partition files not referenced by the committed manifest
        # (previous generations, vanished buckets, crashed-refresh orphans).
        # Age-gated like the lake's own GC: a file younger than the publish
        # grace may still back an in-flight read() Dataset or a concurrent
        # peer's refresh — leave it for a later refresh to collect.
        from ..state.manifest import publish_grace_s

        now = time.time()
        grace = publish_grace_s()
        referenced = {b["out"] for b in self.state["buckets"].values()}
        for fn in os.listdir(self.dir):
            # ".parquet.tmp" are write-then-rename temps a crashed refresh
            # task left behind — never referenced, collect them too (same
            # age gate: a young .tmp may be a concurrent peer's in-flight
            # write about to be renamed)
            if (
                fn.endswith(".parquet") or fn.endswith(".parquet.tmp")
            ) and fn not in referenced:
                p = os.path.join(self.dir, fn)
                try:
                    if now - os.path.getmtime(p) > grace:
                        os.remove(p)
                except FileNotFoundError:
                    pass
        return {"recomputed": len(todo), "reused": reused}

    def read(self) -> rd.Dataset:
        """Streaming union of the per-bucket view partitions."""
        paths = [
            os.path.join(self.dir, b["out"]) for b in self.state["buckets"].values()
        ]
        if not paths:
            if "gen" in self.state:
                # refreshed over an empty lake: a legitimate empty view,
                # typed with the pinned agg output schema when available
                if self.state.get("out_schema"):
                    return rd.from_arrow(
                        _schema_from_str(self.state["out_schema"]).empty_table()
                    )
                return rd.from_arrow(pa.Table.from_pylist([]))
            raise RuntimeError("view has never been refreshed")
        return rd.read_parquet(paths)
