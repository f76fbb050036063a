"""The flagship pipeline: changelog replay -> LWW merge -> Parquet lake.

Ray-Data-first recast of the reference's transform-and-store loop
(``/root/reference/internal/application/services/transform/transform_service.go:46-191``
reads everything into heap, applies rules row-by-row, writes row-at-a-time
Cypher). Here each commit is a streaming Dataset pipeline:

    read_parquet(new epoch files, schema-grouped)        # prune at the read
      -> map_batches(normalize + per-batch LWW pre-compact, pyarrow)  # combiner
      -> map_batches(add stable hash bucket)
      -> union(lake state for touched buckets)
      -> groupby("_bucket").map_groups(merge + write partition, pyarrow)
      -> tiny counters table -> atomic manifest commit

Scale notes (designed for 256 nodes / 100 TB, tested on one node):
- The only all-to-all exchange is the ``groupby("_bucket")`` shuffle, and it
  runs *after* the per-batch combiner has collapsed duplicate keys, so shuffle
  bytes ~= live key versions, not raw event volume.
- Hot conv_ids are handled twice: (a) optional ``salt_groups`` runs an extra
  pre-shuffle compaction grouped by ``hash(conv_id, turn_idx) % (buckets*salt)``
  — every (conv_id, turn_idx) key still collapses to one row before the home-
  bucket shuffle, so a conversation receiving 10% of all events contributes at
  most its live-key count to its home bucket; (b) ``turn_shard_size`` in the
  table config splits giant conversations across home buckets permanently
  (stable, recorded in the manifest).
- Partition data never flows through the driver: merge tasks write their own
  Parquet partition files (deterministic staging paths — idempotent under Ray
  task retries) and return one counter row each; only that tiny counters table
  is collected.
- Tombstones are persisted in lake files (``_op='D'``) and filtered at read
  time, so a late event older than an applied delete can never resurrect a row
  (SURVEY.md §7.4).
"""

from __future__ import annotations

import base64
import os
from collections import defaultdict

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..schema import (
    CHANGE_EVENT_SCHEMA,
    TRANSCRIPT_COLUMNS,
    lake_schema,
    normalize_table,
    unify,
)
from ..sources.changelog import epoch_files
from ..stages.apply import LATE_COL, compact_with_lineage
from ..stages.partitioning import add_bucket_column, bucket_of
from ..state.manifest import Manifest, clean_uncommitted

_META_COLS = ("lsn", "epoch", "op")


def _event_schema_for(payload_schema: pa.Schema) -> pa.Schema:
    return pa.schema(
        [CHANGE_EVENT_SCHEMA.field(c) for c in _META_COLS] + list(payload_schema)
    )


class LakeTable:
    """A partitioned transcripts lake table rooted at ``path``."""

    def __init__(self, path: str, manifest: Manifest):
        self.path = path
        self.manifest = manifest

    @classmethod
    def open(
        cls,
        path: str,
        *,
        num_buckets: int = 16,
        turn_shard_size: int | None = None,
        payload_schema: pa.Schema | None = None,
    ) -> "LakeTable":
        """Open an existing table (manifest wins over kwargs) or create one."""
        m = Manifest.load(path)
        if m is None:
            from ..schema import TRANSCRIPT_SCHEMA

            os.makedirs(path, exist_ok=True)
            m = Manifest.new(
                num_buckets, payload_schema or TRANSCRIPT_SCHEMA, turn_shard_size
            )
            m.save_atomic(path)
        clean_uncommitted(path, m.version)
        return cls(path, m)

    # ------------------------------------------------------------------
    # Apply
    # ------------------------------------------------------------------
    def apply(
        self,
        changelog_dir: str,
        *,
        upto_epoch: int | None = None,
        max_epochs: int | None = None,
        salt_groups: int | None = None,
        batch_size: int = 131_072,
    ) -> dict:
        """Apply all unapplied epochs (bounded by upto_epoch/max_epochs) as ONE
        epoch-fenced commit. Returns the commit's lineage counters.

        Idempotent: already-applied epochs are skipped via the manifest
        watermark; a crash before the manifest publish leaves the table at the
        previous version and the next call re-applies cleanly.
        """
        m = self.manifest
        files = [
            (e, p)
            for e, p in epoch_files(changelog_dir)
            if e > m.applied_epoch and (upto_epoch is None or e <= upto_epoch)
        ]
        if max_epochs is not None:
            files = files[:max_epochs]
        if not files:
            return {"epochs": 0}

        # --- target schema: unify prior payload schema with incoming files
        file_schemas = {}
        raw_events = 0
        for _, p in files:
            md = pq.read_metadata(p)
            raw_events += md.num_rows
            file_schemas[p] = pq.read_schema(p)
        incoming_payload = [
            pa.schema([f for f in s if f.name not in _META_COLS])
            for s in file_schemas.values()
        ]
        payload = unify([m.payload_schema] + incoming_payload)
        event_schema = _event_schema_for(payload)
        num_buckets = m.num_buckets
        shard = m.turn_shard_size

        # --- read: group files by physical schema so each read is uniform,
        # normalize to the unified schema per batch, then union
        by_schema: dict[str, list[str]] = defaultdict(list)
        for p, s in file_schemas.items():
            by_schema[s.to_string()].append(p)

        def _normalize_and_compact(t: pa.Table) -> pa.Table:
            t = normalize_table(t, event_schema)
            return compact_with_lineage(t, keep_tombstones=True)  # combiner

        parts = []
        for paths in by_schema.values():
            ds = rd.read_parquet(paths)
            ds = ds.map_batches(
                _normalize_and_compact, batch_format="pyarrow", batch_size=batch_size
            )
            parts.append(ds)
        events = parts[0]
        for extra in parts[1:]:
            events = events.union(extra)

        # --- optional skew pre-pass: compact per fine-grained (conv,turn) salt
        # group before the home-bucket shuffle; output <=1 row per live key
        if salt_groups:
            fine = num_buckets * salt_groups

            def _fine_bucket(t: pa.Table) -> pa.Table:
                return add_bucket_column(t, fine, turn_shard_size=1)

            events = (
                events.map_batches(_fine_bucket, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(
                    lambda g: compact_with_lineage(g, keep_tombstones=True),
                    batch_format="pyarrow",
                )
            )

        def _home_bucket(t: pa.Table) -> pa.Table:
            return add_bucket_column(t, num_buckets, turn_shard_size=shard)

        events = events.map_batches(_home_bucket, batch_format="pyarrow")

        # --- lake state as event-shaped rows (epoch = -1 marks state)
        state_paths = self.manifest.bucket_paths(self.path)
        if state_paths:

            def _state_to_events(t: pa.Table) -> pa.Table:
                n = t.num_rows
                t = t.rename_columns(
                    [
                        {"_lsn": "lsn", "_op": "op"}.get(c, c)
                        for c in t.column_names
                    ]
                )
                t = t.append_column(
                    "epoch", pa.array([-1] * n, type=pa.int32())
                )
                target = event_schema.append(
                    pa.field(LATE_COL, pa.int64())
                ).append(pa.field("_bucket", pa.int32()))
                return normalize_table(t, target)

            state = rd.read_parquet(state_paths).map_batches(
                _state_to_events, batch_format="pyarrow"
            )
            events = events.union(state)

        # --- per-bucket merge + partition write (data stays in workers)
        new_version = m.version + 1
        staging = os.path.join(self.path, "_staging", f"v{new_version}")
        os.makedirs(staging, exist_ok=True)
        lake_cols = lake_schema(payload)

        def _merge_and_write(group: pa.Table) -> pa.Table:
            bucket = int(group.column("_bucket")[0].as_py())
            ev_mask = pc.not_equal(group.column("epoch"), pa.scalar(-1, pa.int32()))
            events_in = int(pc.sum(pc.cast(ev_mask, pa.int64())).as_py() or 0)
            state_in = group.num_rows - events_in
            if events_in == 0:
                # untouched bucket: keep previous partition file, no rewrite
                return pa.table(
                    {
                        "bucket": [bucket],
                        "wrote": [False],
                        "rows": [state_in],
                        "tombstones": [0],
                        "events_in": [0],
                        "state_in": [state_in],
                        "upserts": [0],
                        "deletes": [0],
                        "superseded": [0],
                        "late": [0],
                        "max_lsn": [-1],
                    }
                )
            merged = compact_with_lineage(group, keep_tombstones=True)
            late = int(pc.sum(merged.column(LATE_COL)).as_py() or 0)
            from_events = pc.not_equal(
                merged.column("epoch"), pa.scalar(-1, pa.int32())
            )
            is_tomb = pc.equal(merged.column("op"), pa.scalar("D"))
            upserts = int(
                pc.sum(
                    pc.cast(pc.and_(from_events, pc.invert(is_tomb)), pa.int64())
                ).as_py()
                or 0
            )
            deletes = int(
                pc.sum(pc.cast(pc.and_(from_events, is_tomb), pa.int64())).as_py()
                or 0
            )
            max_lsn = int(
                pc.max(
                    merged.filter(from_events).column("lsn")
                ).as_py()
                or -1
            )
            out = merged.rename_columns(
                [{"lsn": "_lsn", "op": "_op"}.get(c, c) for c in merged.column_names]
            )
            out = normalize_table(out, lake_cols)
            part_dir = os.path.join(staging, f"bucket={bucket:05d}")
            os.makedirs(part_dir, exist_ok=True)
            tmp = os.path.join(part_dir, "data.parquet.tmp")
            pq.write_table(out, tmp)
            os.replace(tmp, os.path.join(part_dir, "data.parquet"))
            tomb = int(pc.sum(pc.cast(is_tomb, pa.int64())).as_py() or 0)
            return pa.table(
                {
                    "bucket": [bucket],
                    "wrote": [True],
                    "rows": [out.num_rows],
                    "tombstones": [tomb],
                    "events_in": [events_in],
                    "state_in": [state_in],
                    "upserts": [upserts],
                    "deletes": [deletes],
                    "superseded": [events_in + state_in - merged.num_rows],
                    "late": [late],
                    "max_lsn": [max_lsn],
                }
            )

        counters = (
            events.groupby("_bucket")
            .map_groups(_merge_and_write, batch_format="pyarrow")
            .take_all()
        )  # tiny: one row per touched bucket

        # --- atomic publish: staging -> v{N}, then manifest
        final_dir = os.path.join(self.path, f"v{new_version}")
        if os.path.exists(final_dir):  # crashed previous attempt
            import shutil

            shutil.rmtree(final_dir)
        os.replace(staging, final_dir)

        applied_epoch = max(e for e, _ in files)
        applied_lsn = max(
            [int(r["max_lsn"]) for r in counters] + [m.data["applied_lsn"]]
        )
        commit_counters = {
            "raw_events": raw_events,
            "events_in": sum(int(r["events_in"]) for r in counters),
            "upserts": sum(int(r["upserts"]) for r in counters),
            "deletes": sum(int(r["deletes"]) for r in counters),
            "superseded": sum(int(r["superseded"]) for r in counters),
            "late": sum(int(r["late"]) for r in counters),
            "precompact_dropped": raw_events
            - sum(int(r["events_in"]) for r in counters),
            "epochs": len(files),
        }
        for r in counters:
            if r["wrote"]:
                m.data["buckets"][str(int(r["bucket"]))] = {
                    "path": f"v{new_version}/bucket={int(r['bucket']):05d}/data.parquet",
                    "rows": int(r["rows"]),
                    "tombstones": int(r["tombstones"]),
                }
        m.data["version"] = new_version
        m.data["applied_epoch"] = applied_epoch
        m.data["applied_lsn"] = applied_lsn
        m.data["payload_schema"] = base64.b64encode(
            payload.serialize().to_pybytes()
        ).decode()
        cum = m.data["counters"]
        for k, v in commit_counters.items():
            cum[k] = cum.get(k, 0) + v
        m.data["history"].append(
            {"version": new_version, "applied_epoch": applied_epoch, **commit_counters}
        )
        m.save_atomic(self.path)
        return commit_counters

    # ------------------------------------------------------------------
    # Read views
    # ------------------------------------------------------------------
    def read_final(self) -> rd.Dataset:
        """Streaming read view of live rows (tombstones filtered, hidden
        columns dropped)."""
        paths = self.manifest.bucket_paths(self.path)
        payload_cols = [f.name for f in self.manifest.payload_schema]
        if not paths:
            return rd.from_arrow(self.manifest.payload_schema.empty_table())

        def _live(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t.column("_op"), pa.scalar("D")))
            return t.select(payload_cols)

        return rd.read_parquet(paths).map_batches(_live, batch_format="pyarrow")

    def final_table(self) -> pa.Table:
        """Driver-side materialized final state, canonically sorted — for
        tests / small results only."""
        ds = self.read_final()
        refs = ds.to_arrow_refs()
        import ray as _ray

        tables = [t for t in _ray.get(refs) if t.num_rows > 0]
        t = (
            pa.concat_tables(tables, promote_options="permissive")
            if tables
            else self.manifest.payload_schema.empty_table()
        )
        if t.num_rows == 0:
            return t
        return t.take(
            pc.sort_indices(
                t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
        )


def replay(
    changelog_dir: str,
    lake_dir: str,
    *,
    num_buckets: int = 16,
    turn_shard_size: int | None = None,
    salt_groups: int | None = None,
    epochs_per_commit: int | None = None,
) -> LakeTable:
    """Replay a full changelog into a (possibly pre-existing) lake table,
    committing every ``epochs_per_commit`` epochs (None = single commit)."""
    lake = LakeTable.open(
        lake_dir, num_buckets=num_buckets, turn_shard_size=turn_shard_size
    )
    while True:
        c = lake.apply(
            changelog_dir, max_epochs=epochs_per_commit, salt_groups=salt_groups
        )
        if c.get("epochs", 0) == 0:
            break
        if epochs_per_commit is None:
            break
    return lake
