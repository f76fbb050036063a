"""Persisted relationship lake (K2): edges as a first-class lake table.

The reference stores relationships through its Neo4j repository
(``/root/reference/internal/infrastructure/persistence/neo4j/repository.go:57-95``
— MERGE by (source, target, type), i.e. keyed upsert). Here the edge store is
a second ``LakeTable`` under the same manifest/commit protocol as the
transcripts lake, with its NATIVE merge key ``(source_id, target_id)``
declared via the manifest's ``key_columns`` indirection — the LWW kernels
are key-name- and key-type-agnostic, so the lake machinery is shared
untouched. Re-ingesting the same edge set is a LWW no-op, newer epochs
overwrite edge properties, and ``op="D"`` rows tombstone-delete edges with
the same late-data protection the transcripts lake has.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .cdc import LakeTable

EDGE_PAYLOAD_SCHEMA = pa.schema(
    [
        ("source_id", pa.int64()),
        ("target_id", pa.int64()),
        ("relation_type", pa.string()),
        ("direction", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

EDGE_COLUMNS = ["source_id", "target_id", "relation_type", "direction"]


def _edge_events(
    t: pa.Table, epoch: int, *, use_row_ts: bool = False
) -> pa.Table:
    """Edge rows -> change events. ``lsn`` is a stable hash of the edge
    CONTENT (key + op + relation_type + direction): a retried/duplicated
    ingest collapses in the LWW merge, and — crucially — two CONFLICTING
    events for the same edge within ONE epoch (e.g. an 'I' and a 'D')
    resolve to a DETERMINISTIC winner. A Dataset carries no row order, so
    "later in the input" is undefined within an epoch; hashing only the
    key would leave the (ts, lsn) sort key identical for both rows and the
    stable-sort winner would be post-shuffle row order — nondeterministic,
    and the forward and reverse lakes (independent shuffles) could pick
    DIFFERENT winners, silently diverging at the same applied_epoch.
    Callers that need real ordering between conflicting events put them in
    separate epochs (or use ``use_row_ts``). ``ts`` is the ingest epoch —
    the documented "a later epoch's version wins" ordering — and a ``ts``
    column on the input is deliberately IGNORED unless ``use_row_ts=True``
    (the sync/rebuild path, which must preserve each stored version's
    original timestamp): silently honoring caller ts on the ingest path
    would let a stale source timestamp beat a later epoch's correction."""
    n = t.num_rows
    src = pc.cast(t.column("source_id"), pa.int64())
    tgt = pc.cast(t.column("target_id"), pa.int64())
    op = (
        t.column("op")
        if "op" in t.column_names
        else pa.array(["I"] * n, pa.string())
    )
    h = (
        pd.util.hash_array(src.to_numpy(zero_copy_only=False))
        * np.uint64(0x9E3779B97F4A7C15)
        ^ pd.util.hash_array(tgt.to_numpy(zero_copy_only=False))
    )
    for col in (
        op,
        t.column("relation_type"),
        t.column("direction"),
    ):
        # to_numpy, not to_pylist: no per-cell Python list round-trip on
        # the ingest hot path (hash_array takes the object ndarray as-is)
        arr = (
            col.combine_chunks().to_numpy(zero_copy_only=False)
            if isinstance(col, pa.ChunkedArray)
            else col.to_numpy(zero_copy_only=False)
        )
        h = (h * np.uint64(0x100000001B3)) ^ pd.util.hash_array(arr)
    h = h.view(np.int64) & 0x7FFFFFFFFFFFFFFF  # non-negative int64 lsn
    ts = (
        t.column("ts").cast(pa.timestamp("us"))
        if use_row_ts and "ts" in t.column_names
        else pa.array(np.full(n, int(epoch), dtype=np.int64), pa.timestamp("us"))
    )
    return pa.table(
        {
            "lsn": pa.array(h, pa.int64()),
            "op": op,
            "source_id": src,
            "target_id": tgt,
            "relation_type": t.column("relation_type"),
            "direction": t.column("direction"),
            "ts": ts,
        }
    )


def _dedupe_sorted_edges(t: pa.Table) -> pa.Table:
    """Canonical serving-path edge set: one row per (source_id, target_id),
    sorted ascending — shared by ``neighbors`` and ``expand`` so the
    dedup/sort contract lives in one place."""
    if t.num_rows:
        df = t.to_pandas().drop_duplicates(["source_id", "target_id"])
        t = pa.Table.from_pandas(df, preserve_index=False).cast(t.schema)
    if t.num_rows == 0:
        return t
    return t.take(
        pc.sort_indices(
            t,
            sort_keys=[("source_id", "ascending"), ("target_id", "ascending")],
        )
    )


def _degree_agg(group_col: str):
    """Per-bucket degree aggregate for ``EdgeLake.degree_view`` — a
    module-level factory (the view ships it to Ray tasks) producing the
    (node_id, degree) shape from either lake orientation."""

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by(group_col).aggregate([(group_col, "count")])
        out = pa.table(
            {
                "node_id": g.column(group_col).cast(pa.int64()),
                "degree": g.column(f"{group_col}_count").cast(pa.int64()),
            }
        )
        return out.take(pc.sort_indices(out, sort_keys=[("node_id", "ascending")]))

    return agg


class EdgeLake:
    """Edge lake table: ``ingest`` relationship-rule outputs per epoch,
    ``read_edges`` streams the merged live edge set.

    ``reverse_index=True`` maintains a second lake at ``<path>_rev`` keyed
    ``(target_id, source_id)`` — the standard adjacency double-write that
    makes INCOMING-neighbor fetches O(keys) (home-bucket lookup) instead
    of an O(lake-files) predicate scan. Costs 2× edge storage and 2× ingest
    IO; both lakes share the epoch fence, so a crash between the two
    commits heals on the next (idempotent) ingest of the same epoch."""

    def __init__(
        self, path: str, *, num_buckets: int = 16, reverse_index: bool = False
    ):
        self.lake = LakeTable.open(
            path,
            num_buckets=num_buckets,
            payload_schema=EDGE_PAYLOAD_SCHEMA,
            key_columns=("source_id", "target_id"),
        )
        self.reverse = (
            LakeTable.open(
                path.rstrip("/") + "_rev",
                num_buckets=num_buckets,
                payload_schema=EDGE_PAYLOAD_SCHEMA,
                key_columns=("target_id", "source_id"),
            )
            if reverse_index
            else None
        )

    @property
    def manifest(self):
        return self.lake.manifest

    def ingest(
        self,
        edges: rd.Dataset,
        *,
        epoch: int,
        shuffle: str = "sort",
        commit_mode: str = "delta",
        auto_compact_files: int | None = 8,
        auto_split_bytes: int | None = 1 << 30,
    ) -> dict:
        """Commit one epoch of edges: columns (source_id, target_id,
        relation_type, direction[, op]). ``op`` defaults to "I"; "D" rows
        tombstone the edge. Epoch-fenced and idempotent like ``apply``.

        Auto-management defaults mirror ``replay``/``tail``: after a data
        commit, buckets holding >= ``auto_compact_files`` files compact and
        buckets past ``auto_split_bytes`` split — on BOTH lakes when the
        reverse index is on, so a naive long-lived edge ingest loop keeps
        per-bucket files and bytes bounded out of the box (None/0
        disables)."""
        ep = int(epoch)
        heal = False
        if self.reverse is not None:
            # PRE-ingest lockstep guard. Allowed states: in step (normal),
            # or re-ingesting exactly the forward lake's last epoch while
            # the reverse lags (the crash-between-double-writes heal). A
            # resume that SKIPS the missed epoch (rev < fwd and ep > fwd)
            # must refuse here: applying the later epoch to the reverse
            # would advance its watermark past the hole and the read-time
            # equality guard could never see it again — permanent silent
            # incompleteness. This guard also bounds the lag to one epoch.
            fwd0 = self.lake.manifest.applied_epoch
            rev0 = self.reverse.manifest.applied_epoch
            heal = rev0 < fwd0 == ep
            if rev0 != fwd0 and not heal:
                raise RuntimeError(
                    f"reverse index out of step (reverse at epoch {rev0}, "
                    f"forward at {fwd0}, ingesting {ep}) — re-ingest epoch "
                    f"{fwd0} or run sync_reverse()"
                )
        if ep <= self.lake.manifest.applied_epoch and not heal:
            # the epoch fence would no-op inside apply_dataset anyway, but
            # only AFTER the events pipeline ran; short-circuit here so an
            # idempotent re-ingest (the documented crash-recovery re-run)
            # skips the full source scan + hashing it would throw away
            return {"epochs": 0}
        events = edges.map_batches(
            lambda t: _edge_events(t, ep), batch_format="pyarrow"
        )
        if self.reverse is not None and not heal:
            # the reverse apply re-reads its input: materialize the
            # normalized events ONCE so the upstream source scan and
            # hashing do not execute twice (2x storage/write is the
            # intended cost of the index; 2x source compute is not)
            events = events.materialize()
        out = self.lake.apply_dataset(
            events, epoch=ep, shuffle=shuffle, commit_mode=commit_mode
        )
        if self.reverse is not None:
            if heal:
                # Heal by REBUILDING from the forward lake's committed
                # state, never from the caller's events: the forward apply
                # above no-opped (epoch fence), so if this "re-ingest of
                # epoch fwd" carries different rows than the original
                # commit, applying them to the reverse would leave both
                # lakes at the same epoch with silently divergent
                # adjacency. sync_reverse() is derived-state repair — it
                # converges to the source of truth regardless of input.
                self.sync_reverse()
            else:
                # forward first (the source of truth), then the reverse
                # index. Same epoch => a crash in between leaves the
                # reverse one epoch behind, and re-running this ingest
                # heals it via the rebuild branch above (or an explicit
                # sync_reverse()) before any further epoch may land.
                self.reverse.apply_dataset(
                    events, epoch=ep, shuffle=shuffle, commit_mode=commit_mode
                )
        if out.get("epochs", 0):
            for lk in filter(None, (self.lake, self.reverse)):
                if auto_compact_files:
                    lk.compact(min_files=auto_compact_files)
                if auto_split_bytes:
                    lk.maybe_auto_split(auto_split_bytes)
        return out

    def _reverse_ready(self) -> "LakeTable":
        """The reverse lake, verified in step with the forward lake — a
        lagging index (crash between the double-writes resumed past the
        gap, or reverse_index enabled on an already-populated lake) must
        refuse loudly rather than silently serve incomplete adjacency."""
        fwd = self.lake.manifest.applied_epoch
        rev = self.reverse.manifest.applied_epoch
        if rev != fwd:
            raise RuntimeError(
                f"reverse index at epoch {rev} but forward lake at {fwd} — "
                "re-ingest the missing epochs or run sync_reverse()"
            )
        return self.reverse

    def sync_reverse(self) -> dict:
        """Rebuild the reverse index from the forward lake's LIVE edge set —
        the repair for a lagging/newly-enabled index. The reverse lake is
        derived state: it is deleted and re-created at the forward lake's
        applied epoch (original per-edge ``ts`` preserved, so subsequent
        incremental double-writes merge identically on both sides)."""
        if self.reverse is None:
            raise ValueError("open this EdgeLake with reverse_index=True")
        import shutil

        rev_path = self.reverse.path
        nb = self.reverse.manifest.num_buckets
        shutil.rmtree(rev_path, ignore_errors=True)
        self.reverse = LakeTable.open(
            rev_path,
            num_buckets=nb,
            payload_schema=EDGE_PAYLOAD_SCHEMA,
            key_columns=("target_id", "source_id"),
        )
        ep = self.lake.manifest.applied_epoch
        if ep < 0:
            return {"synced_edges": 0}
        # keep_tombstones: the rebuilt index must remember deletes with
        # their timestamps, or a late pre-delete event double-written later
        # would resurrect the edge on the reverse side only
        state = self.lake.read_final(keep_tombstones=True)
        events = state.map_batches(
            lambda t: _edge_events(t, ep, use_row_ts=True),
            batch_format="pyarrow",
        )
        c = self.reverse.apply_dataset(events, epoch=ep)
        return {"synced_edges": int(c.get("upserts", 0))}

    def neighbors(
        self,
        node_id: int,
        *,
        direction: str = "both",
        max_result_keys: int = 100_000,
    ) -> pa.Table:
        """One node's adjacent edges on the NO-RAY serving path — the
        click-to-expand fetch the reference serves from Neo4j
        (``/root/reference/internal/infrastructure/persistence/neo4j/repository.go``
        ``FetchNodes`` / the visualizer's neighborhood queries).

        Outgoing edges ride the keyed ``lookup`` (source_id is the first
        merge key: home bucket + stats + row-group pruning, O(matching row
        groups)). Incoming edges use the reverse index's keyed lookup when
        the lake was opened with ``reverse_index=True`` (O(keys), the
        100 TB path), else the predicate ``search`` on target_id (manifest
        file stats + one streaming scan — O(range-matching files)).
        ``direction`` is ``out`` / ``in`` / ``both``; a self-loop appears
        once. ``max_result_keys`` bounds the search-fallback incoming fetch
        (a hub past it raises toward the batch path — raise the cap or use
        the reverse index for unbounded-degree serving)."""
        if direction not in ("out", "in", "both"):
            raise ValueError(f"direction must be out|in|both, got {direction!r}")
        parts = []
        if direction in ("out", "both"):
            parts.append(self.lake.lookup([int(node_id)], columns=EDGE_COLUMNS))
        if direction in ("in", "both"):
            if self.reverse is not None:
                parts.append(
                    self._reverse_ready().lookup(
                        [int(node_id)], columns=EDGE_COLUMNS
                    ).select(EDGE_COLUMNS)
                )
            else:
                parts.append(
                    self.lake.search(
                        "target_id", "==", int(node_id),
                        columns=EDGE_COLUMNS,
                        max_result_keys=max_result_keys,
                    )
                )
        # a self-loop matches both orientations — _dedupe keeps one copy
        return _dedupe_sorted_edges(pa.concat_tables(parts))

    def expand(
        self,
        seed_ids,
        *,
        hops: int = 1,
        direction: str = "out",
        max_frontier: int = 100_000,
    ) -> pa.Table:
        """K-hop neighborhood expansion from ``seed_ids`` — the visualizer's
        expand-around-a-node interaction, generalized. Each hop is ONE
        batched keyed lookup (home buckets + stats + row-group pruning of
        the whole frontier in a single scan), never a full-lake pass, so
        cost is O(edges touched), not O(lake x hops).

        ``direction="in"``/``"both"`` needs the reverse index (open with
        ``reverse_index=True``) — a keyed reverse lookup is the only
        O(frontier) way in; without it this raises rather than silently
        degrading to per-hop full scans. Frontiers beyond ``max_frontier``
        raise: that is a batch traversal (use ``read_final``/
        ``connected_components``), not a serving fetch. Returns the visited
        edge set, canonically sorted, each edge once."""
        if direction not in ("out", "in", "both"):
            raise ValueError(f"direction must be out|in|both, got {direction!r}")
        if direction != "out" and self.reverse is None:
            raise ValueError(
                "expand(direction=in|both) needs the reverse index — open "
                "this EdgeLake with reverse_index=True (or traverse with "
                "read_edges()/connected_components on the batch path)"
            )
        visited: set[int] = set()
        frontier = {int(x) for x in seed_ids}
        parts: list[pa.Table] = []
        for _ in range(hops):
            frontier -= visited
            if not frontier:
                break
            if len(frontier) > max_frontier:
                raise ValueError(
                    f"frontier grew past {max_frontier} nodes — that is a "
                    "batch traversal; use read_edges()/connected_components"
                )
            visited |= frontier
            fl = sorted(frontier)
            step = []
            if direction in ("out", "both"):
                step.append(self.lake.lookup(fl, columns=EDGE_COLUMNS))
            if direction in ("in", "both"):
                step.append(
                    self._reverse_ready()
                    .lookup(fl, columns=EDGE_COLUMNS)
                    .select(EDGE_COLUMNS)
                )
            t = pa.concat_tables(step)
            parts.append(t)
            nxt = set()
            if direction in ("out", "both"):
                nxt |= set(t.column("target_id").to_pylist())
            if direction in ("in", "both"):
                nxt |= set(t.column("source_id").to_pylist())
            frontier = nxt
        if not parts:
            return pa.schema(
                [EDGE_PAYLOAD_SCHEMA.field(c) for c in EDGE_COLUMNS]
            ).empty_table()
        return _dedupe_sorted_edges(pa.concat_tables(parts))

    def degree_view(self, direction: str = "out"):
        """Incremental degree-per-node materialized view over the edge lake
        — the graph-analytics generalization of the transcripts lake's
        turns-per-conv view (``BucketAggView``): after a delta commit, a
        ``refresh()`` recomputes ONLY the buckets the commit touched.

        ``out`` aggregates the forward lake by ``source_id`` (bucket-local:
        the forward lake hash-partitions on source_id, so one node's
        outgoing edges live in exactly one bucket). ``in`` aggregates the
        REVERSE lake by ``target_id`` — without the reverse index an
        in-degree per-bucket aggregate would emit partial rows for the same
        target across buckets, so it requires ``reverse_index=True``.

        Output schema: (node_id int64, degree int64). Reference analogue:
        degree is what the reference's visualization sizes nodes by, but it
        recomputes it per request from Neo4j
        (``/root/reference/internal/interfaces/graphql/schema.resolvers.go``);
        here it is a persisted, incrementally-maintained table."""
        from .views import BucketAggView

        if direction == "out":
            return BucketAggView(self.lake, "degree_out", _degree_agg("source_id"))
        if direction == "in":
            if self.reverse is None:
                raise ValueError(
                    "degree_view('in') needs reverse_index=True — in-degree "
                    "is only bucket-local on the reverse (target-keyed) lake"
                )
            self._reverse_ready()  # same divergence guard as serving reads
            return BucketAggView(
                self.reverse, "degree_in", _degree_agg("target_id")
            )
        raise ValueError(f"direction must be 'out' or 'in', got {direction!r}")

    def read_edges(self) -> rd.Dataset:
        """Streaming live-edge view: (source_id, target_id, relation_type,
        direction) — the lake's native schema, column-pruned past ``ts``."""
        return self.lake.read_final(columns=EDGE_COLUMNS)

    def edges_table(self) -> pa.Table:
        """Materialized, canonically sorted edge set (tests / small results)."""
        import ray

        tables = [
            t for t in ray.get(self.read_edges().to_arrow_refs()) if t.num_rows
        ]
        if not tables:
            return pa.schema(
                [EDGE_PAYLOAD_SCHEMA.field(c) for c in EDGE_COLUMNS]
            ).empty_table()
        t = pa.concat_tables(tables, promote_options="permissive")
        return t.take(
            pc.sort_indices(
                t,
                sort_keys=[("source_id", "ascending"), ("target_id", "ascending")],
            )
        )
