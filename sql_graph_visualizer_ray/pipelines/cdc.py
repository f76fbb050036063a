"""The flagship pipeline: changelog replay -> LWW merge -> Parquet lake.

Ray-Data-first recast of the reference's transform-and-store loop
(``/root/reference/internal/application/services/transform/transform_service.go:46-191``
reads everything into heap, applies rules row-by-row, writes row-at-a-time
Cypher). Here each commit is a streaming Dataset pipeline:

    read_parquet(new epoch files, schema-grouped, fused)  # prune at the read
      -> map_batches(normalize [+ per-batch LWW combiner], pyarrow)
      -> map_batches(add stable hash bucket)
      -> EXCHANGE on _bucket:  "sort" groupby | "hash" aggregator actors |
                               "spill" per-bucket disk runs (no AllToAll)
      -> per-bucket merge task: LWW-compact the commit's DELTA and write it
           as a NEW per-bucket delta file (default ``commit_mode="delta"``) —
           per-commit IO is proportional to the delta, never the table
      -> tiny counters table -> atomic manifest commit

    Reads LWW-merge a bucket's base + delta files on the fly (merge-on-read);
    ``compact()`` is the separate compaction commit that k-way-merges a
    bucket's files back into one base (size-tiered via ``min_files``).
    ``commit_mode="rewrite"`` keeps the old copy-on-write behavior (merge
    state into every touched bucket at commit time) for comparison — at 100 TB
    it makes every commit's IO proportional to table size, which is why delta
    is the default.

Scale notes (designed for 256 nodes / 100 TB, tested on one node):
- Exchange volume ~ the commit's DELTA: lake state never rides the shuffle
  (state is already bucket-partitioned; each merge task reads its own), and
  the optional combiner collapses duplicate keys before the exchange.
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
  time, so a late event older than an applied delete can never resurrect a row;
  ``compact_tombstones(allowed_lateness_us=...)`` physically drops them once
  the lateness watermark has passed (SURVEY.md §7.4).
"""

from __future__ import annotations

import base64
import functools
import json
import os
from collections import defaultdict

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..schema import (
    CHANGE_EVENT_SCHEMA,
    lake_schema,
    normalize_table,
    unify,
)
from ..sources.changelog import epoch_files
from ..stages.apply import LATE_COL, compact_with_lineage
from ..stages.partitioning import add_bucket_column, bucket_of
from ..state.manifest import Manifest, clean_uncommitted

_META_COLS = ("lsn", "epoch", "op")

#: physical names of the two merge-key columns inside every lake file and
#: kernel. A lake whose manifest declares different LOGICAL ``key_columns``
#: (e.g. the edge lake's (source_id, target_id)) is renamed to/from these at
#: the LakeTable boundary — the name indirection lives in the manifest, the
#: way Iceberg resolves columns through field ids rather than names.
CANONICAL_KEYS = ("conv_id", "turn_idx")

#: schema of the one-row-per-bucket lineage-counter tables the merge stages
#: return. Pinned so a zero-row batch (Ray can hand one to a merge task)
#: yields an empty table of the SAME schema instead of crashing
#: ``pa.concat_tables([])`` or emitting a schema-less block.
_COUNTER_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("wrote", pa.bool_()),
        ("rows", pa.int64()),
        ("tombstones", pa.int64()),
        ("events_in", pa.int64()),
        ("state_in", pa.int64()),
        ("upserts", pa.int64()),
        ("deletes", pa.int64()),
        ("superseded", pa.int64()),
        ("late", pa.int64()),
        ("max_lsn", pa.int64()),
        ("stats_json", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Per-file column statistics (manifest-level data skipping)
#
# Every write task records min/max per stat-eligible column of the file it
# writes; the JSON rides the counter row back to the driver and lands in the
# manifest bucket entry ({"stats": {relpath: {col: [min, max]}}}). Readers on
# the NO-RAY serving path (lookup / search) and the keyed batch path
# (read_final(keys=)) consult these to skip whole files WITHOUT opening their
# footers — the Iceberg/Delta data-skipping pattern. Parquet row-group stats
# still prune within the files that survive. A file with no stats entry
# (pre-stats lake, non-eligible column, oversized string bound) is always
# scanned — pruning is only ever an optimization, never a correctness input.
#
# Cost: ~200 B of JSON per file (measured) — the same O(live files) scaling
# the manifest's file list already has, a ~3x constant on manifest size.
# GRAFT_STAT_COLUMNS_MAX bounds the per-file column count; auto-compaction
# bounds files per bucket, so manifest size stays O(buckets x tier), never
# O(commits) or O(rows).
# ---------------------------------------------------------------------------

#: string min/max longer than this are NOT recorded (a wide text column's
#: bounds would bloat the manifest for near-zero pruning power). Iceberg
#: truncates-and-rounds instead; omission is simpler and equally safe.
_STAT_STRING_CAP = 64

#: hidden/meta columns never get stats
_STAT_SKIP = {"_lsn", "_op", "_bucket"}


def _stat_max_columns() -> int:
    """Manifest-size guard: stats are recorded for at most this many columns
    per file (key/ts columns first, then payload order)."""
    return int(os.environ.get("GRAFT_STAT_COLUMNS_MAX", "16"))


def _stat_columns(names) -> list[str]:
    """Stat-candidate columns in recording order: key/ts columns first
    (they are what lookup/search prune on), then payload order, meta
    columns dropped, capped at ``_stat_max_columns()``. The single source
    of truth for which columns MAY carry stats — the write path
    (``_column_stats``), the footer backfill (``_footer_stats``), gap
    detection (``string_stats_gaps``) and the string backfill all derive
    from it, so eligibility can never desynchronize between what a gap
    scan flags and what a backfill records."""
    names = [n for n in names if n not in _STAT_SKIP]
    prio = [n for n in ("conv_id", "turn_idx", "ts") if n in names]
    return (prio + [n for n in names if n not in prio])[: _stat_max_columns()]


def _stat_string_columns(lake_cols: pa.Schema) -> list[str]:
    """The string-typed subset of the stat candidates (cap applied)."""
    return [
        n
        for n in _stat_columns(lake_cols.names)
        if pa.types.is_string(lake_cols.field(n).type)
        or pa.types.is_large_string(lake_cols.field(n).type)
    ]


def _stat_encode(v, typ: pa.DataType):
    """A column value as a JSON-safe, correctly-ordered scalar: timestamps
    become int64 micros (their physical order), non-finite floats raise (the
    caller drops that column's stats). String order is safe as-is: UTF-8
    byte order == code-point order, so Python str comparison agrees with
    Arrow's."""
    if v is None:
        return None
    if pa.types.is_timestamp(typ):
        return pa.scalar(v, typ).cast(pa.int64()).as_py()
    if isinstance(v, float) and not (v == v and abs(v) != float("inf")):
        raise ValueError("non-finite float bound")
    if isinstance(v, str) and len(v) > _STAT_STRING_CAP:
        raise ValueError("string bound over cap")
    if not isinstance(v, (int, float, str, bool)):
        raise ValueError(f"non-JSON-scalar bound {type(v).__name__}")
    return v


def _stat_eligible(typ: pa.DataType) -> bool:
    return (
        pa.types.is_integer(typ)
        or pa.types.is_floating(typ)
        or pa.types.is_boolean(typ)
        or pa.types.is_timestamp(typ)
        or pa.types.is_string(typ)
        or pa.types.is_large_string(typ)
    )


def _column_stats(t: pa.Table) -> dict[str, list]:
    """{column: [min, max]} for the stat-eligible columns of a written lake
    file; ``[None, None]`` marks an all-null column (provably matches no
    comparison predicate). Key/ts columns are prioritized under the column
    cap since they are what lookup/search prune on."""
    if t.num_rows == 0:
        return {}
    out: dict[str, list] = {}
    for name in _stat_columns(t.column_names):
        typ = t.schema.field(name).type
        if not _stat_eligible(typ):
            continue
        col = t.column(name)
        if (pa.types.is_string(typ) or pa.types.is_large_string(typ)) and (
            col.nbytes > _STAT_STRING_CAP * t.num_rows
        ):
            # avg width already over the bound cap: the min/max would be
            # discarded anyway — skip the full memcmp scan of a wide text
            # column on every commit (its cost, not the bounds, is what
            # matters here; a rare short-bounded wide column just loses an
            # optimization, never correctness)
            continue
        try:
            mm = pc.min_max(col).as_py()
            out[name] = [
                _stat_encode(mm["min"], typ),
                _stat_encode(mm["max"], typ),
            ]
        except (ValueError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
            continue  # unencodable bound: omit — file is simply not skippable
    return out


def _stats_reject(colstats, op: str, value_enc) -> bool:
    """True iff a file's [min, max] for a column PROVES no row satisfies
    ``col op value``. Nulls never satisfy any of the supported predicates
    (readers apply fill_null(False)), so null counts are irrelevant and an
    all-null column ([None, None]) rejects every op."""
    if colstats is None or value_enc is None:
        return False
    mn, mx = colstats
    if mn is None and mx is None:
        return True  # all-null column: nothing to match
    try:
        if op in ("=", "=="):
            return value_enc < mn or value_enc > mx
        if op == "!=":
            return mn == mx == value_enc
        if op == "<":
            return mn >= value_enc
        if op == "<=":
            return mn > value_enc
        if op == ">":
            return mx <= value_enc
        if op == ">=":
            return mx < value_enc
    except TypeError:
        return False  # cross-type comparison: cannot prove anything
    return False  # contains / unknown op: stats cannot prune


def string_stats_gaps(manifest) -> dict[int, list[str]]:
    """Manifest-only gap scan (see ``LakeTable.string_stats_gaps``): bucket
    -> live files whose stats never attempted string bounds. Usable by the
    CLI ``analyze`` report without opening a lake or a Ray session."""
    lake_cols = lake_schema(manifest.payload_schema)
    if not _stat_string_columns(lake_cols):
        return {}
    gaps: dict[int, list[str]] = {}
    for key, entry in manifest.data["buckets"].items():
        stats = entry.get("stats") or {}
        footer = set(entry.get("footer_stats") or [])
        bad = [r for r in entry["files"] if r not in stats or r in footer]
        if bad:
            gaps[int(key)] = bad
    return gaps


def _footer_stats(path: str) -> dict[str, list]:
    """Per-column [min, max] recovered from a parquet file's FOOTER
    row-group statistics — zero data IO, for backfilling stats on files
    written before stats support.

    Sound-by-construction subset: string columns are SKIPPED (parquet
    writers may truncate string bounds, and the footer does not always
    say so — a truncated max used as exact would wrongly skip files);
    numeric/timestamp/boolean bounds are exact by definition. A column
    qualifies only if every non-empty row group carries statistics; a
    column that is all-null in every row group records ``[None, None]``
    (the all-null marker), exactly like the write-time path."""
    md = pq.read_metadata(path)
    fschema = md.schema.to_arrow_schema()  # same footer, no second read
    out: dict[str, list] = {}
    if md.num_row_groups == 0:
        return out
    # row-group column chunks are LEAF (physical) columns — a nested field
    # earlier in the schema shifts every later leaf, so the top-level field
    # index is NOT a valid chunk index. Resolve by path_in_schema: for a
    # top-level primitive column the leaf path IS the column name; nested
    # leaves carry dotted paths and simply never match.
    leaf_idx = {
        md.row_group(0).column(i).path_in_schema: i
        for i in range(md.row_group(0).num_columns)
    }
    for name in _stat_columns(fschema.names):
        if name not in leaf_idx:
            continue
        typ = fschema.field(name).type
        if (
            not _stat_eligible(typ)
            or pa.types.is_string(typ)
            or pa.types.is_large_string(typ)
        ):
            continue
        idx = leaf_idx[name]
        mn = mx = None
        ok = True
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            if rgm.num_rows == 0:
                continue
            st = rgm.column(idx).statistics
            if st is None:
                ok = False
                break
            if st.null_count == rgm.num_rows:
                continue  # all-null row group: no bounds, no rows to miss
            if not st.has_min_max:
                ok = False
                break
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        if not ok:
            continue
        try:
            out[name] = [_stat_encode(mn, typ), _stat_encode(mx, typ)]
        except (ValueError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
            continue
    return out


def _stats_range_hits(colstats, values_enc) -> bool:
    """True unless the file's [min, max] proves NONE of ``values_enc`` occur
    (the lookup-side membership prune)."""
    if colstats is None:
        return True
    mn, mx = colstats
    if mn is None and mx is None:
        return False
    try:
        return any(mn <= v <= mx for v in values_enc)
    except TypeError:
        return True


def _row_group_rows() -> int:
    """Parquet row-group size for lake data files. Files are key-sorted, so
    row-group conv_id statistics are the pruning unit for ``lookup`` /
    ``read_final(keys=)``: a point lookup reads ~one group, not the file.
    64k rows keeps groups big enough for scan-side compression/IO while a
    multi-GB 100 TB-scale bucket file still splits into thousands of
    skippable groups (pyarrow's 1M-row default would make the group the
    file at small scale — no pruning at all). $GRAFT_ROW_GROUP_ROWS tunes."""
    return int(os.environ.get("GRAFT_ROW_GROUP_ROWS", str(64 * 1024)))


def _prunable_isin(field: str, values: pa.Array):
    """Membership filter that parquet row-group statistics can actually
    prune: pyarrow (≤16) evaluates ``isin`` (SetLookup) only against data,
    never against min/max stats, so a point lookup with ``isin`` reads the
    whole file. An OR of equalities IS stat-simplifiable — measured 44 ms
    vs 162 ms on a 318k-row, 5-group bucket file for one key. Falls back
    to ``isin`` for large sets, where most groups match anyway and a deep
    OR tree would cost more to evaluate than it saves."""
    if len(values) <= 32:
        import operator

        return functools.reduce(
            operator.or_, [pc.field(field) == v.as_py() for v in values]
        )
    return pc.field(field).isin(values)


class CommitConflictError(RuntimeError):
    """Another writer committed this version first. The losing writer's
    in-memory manifest is untouched and no published file was harmed —
    ``reload()`` and retry (its staging/spill output is version-addressed
    garbage that the next ``clean_uncommitted`` removes)."""


def _event_schema_for(payload_schema: pa.Schema) -> pa.Schema:
    return pa.schema(
        [CHANGE_EVENT_SCHEMA.field(c) for c in _META_COLS] + list(payload_schema)
    )


def _read_files_merged(
    paths: list[str], target: pa.Schema, row_filter=None
) -> pa.Table:
    """Read one bucket's lake files (base + deltas), normalize each to the
    unified ``target`` event schema (old-schema files null-fill/cast — this is
    what keeps a post-evolution lake readable when a commit touched only some
    buckets), and LWW-merge when there is more than one file. Tombstones are
    retained (callers filter).

    ``row_filter`` (a ``pyarrow.compute.Expression`` over physical column
    names) pushes down into the parquet read: data files are key-sorted by
    ``lww_compact``, so conv_id row-group statistics are tight and a point
    predicate skips every non-matching row group. Safe for LWW because the
    filter is key-exact — every version of a matching key passes, every
    version of a non-matching key is dropped — so winner selection is
    unchanged."""
    from ..stages.apply import lww_compact

    tabs = []
    want = {
        {"lsn": "_lsn", "op": "_op"}.get(n, n) for n in target.names
    }  # prune at the file read: only target columns leave storage
    for p in paths:
        cols = [c for c in pq.read_schema(p).names if c in want]
        t = pq.read_table(p, columns=cols, filters=row_filter)
        t = t.rename_columns(
            [{"_lsn": "lsn", "_op": "op"}.get(c, c) for c in t.column_names]
        )
        tabs.append(normalize_table(t, target))
    merged = tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)
    if len(tabs) > 1:
        merged = lww_compact(merged, keep_tombstones=True)
    return merged


class LakeTable:
    """A partitioned transcripts lake table rooted at ``path``."""

    def __init__(self, path: str, manifest: Manifest, *, readonly: bool = False):
        self.path = path
        self.manifest = manifest
        # True for time-travel snapshots: reads only, commits refused
        self.readonly = readonly

    def _publish_version_dir(self, staging: str, new_version: int) -> None:
        """CAS publish: the rename of ``v{N}`` into place IS the atomic
        claim on version number N (optimistic concurrency, Iceberg-style —
        no lock server; POSIX/shared-FS rename atomicity is the primitive).
        Each attempt's ``staging`` dir is writer-unique (uuid-suffixed), so
        concurrent writers never share scratch space.

        If ``v{N}`` already exists there are three cases, distinguished by
        the ON-DISK manifest and the dir's age: manifest version >= N means
        another writer committed N first — ``CommitConflictError`` with
        this writer's manifest and the published lake both untouched (every
        commit path mutates ``self.manifest`` only AFTER this claim
        succeeds); manifest < N but the dir is younger than the publish
        grace window means a peer is likely BETWEEN its rename and its
        manifest save — also a conflict (destroying it would corrupt the
        peer's commit; a false positive just retries until the grace
        expires); manifest < N and older than the grace means a crashed
        attempt's garbage — remove it and claim. On conflict this writer's
        own staging dir is deleted before raising."""
        import shutil
        import time

        from ..state.manifest import newest_mtime, publish_grace_s

        final_dir = os.path.join(self.path, f"v{new_version}")

        def _conflict(msg: str):
            shutil.rmtree(staging, ignore_errors=True)
            return CommitConflictError(msg)

        for _ in range(2):
            if os.path.exists(final_dir):
                on_disk = Manifest.load(self.path)
                if on_disk is not None and on_disk.version >= new_version:
                    raise _conflict(
                        f"v{new_version} was committed by another writer "
                        f"(lake is at v{on_disk.version}); reload() and retry"
                    )
                try:
                    # whole-tree mtime: the dir's own mtime goes stale while
                    # a peer writes into existing bucket subdirs
                    age = time.time() - newest_mtime(final_dir)
                except OSError:
                    continue  # vanished — a peer just cleaned or claimed it
                if age <= publish_grace_s():
                    raise _conflict(
                        f"v{new_version} appears to be publishing right now "
                        f"(dir age {age:.0f}s within grace); reload() and "
                        "retry"
                    )
                shutil.rmtree(final_dir, ignore_errors=True)
            try:
                os.replace(staging, final_dir)
                return
            except OSError:
                continue  # lost a race on the rename itself; re-examine
        raise _conflict(
            f"could not claim v{new_version} (concurrent writers); "
            "reload() and retry"
        )

    def reload(self) -> "LakeTable":
        """Re-read the on-disk manifest (after a ``CommitConflictError``)."""
        m = Manifest.load(self.path)
        if m is None:
            raise FileNotFoundError(f"no manifest in {self.path}")
        self.manifest = m
        return self

    def commit_with_retry(
        self, fn, *, max_attempts: int = 8, on_conflict=None
    ):
        """Run ``fn(lake)`` — any commit call (``apply``, ``compact``,
        ``split_buckets``, ...) — under the optimistic-concurrency protocol:
        on ``CommitConflictError`` the manifest is ``reload()``-ed and the
        call retried, up to ``max_attempts``. Returns ``fn``'s result; the
        last conflict re-raises when attempts run out. ``on_conflict`` (if
        given) is called with the exception before each retry — hook for
        metrics/backoff. This is the one-liner a second concurrent writer
        calls instead of hand-rolling the reload/retry loop."""
        if max_attempts < 1:
            raise ValueError(f"max_attempts must be >= 1, got {max_attempts}")
        for attempt in range(max_attempts):
            try:
                return fn(self)
            except CommitConflictError as e:
                if attempt + 1 >= max_attempts:
                    raise  # out of attempts: no hook, no wasted reload
                if on_conflict is not None:
                    on_conflict(e)
                self.reload()

    def _check_writable(self) -> None:
        if self.readonly:
            raise RuntimeError(
                f"lake snapshot at v{self.manifest.version} is read-only; "
                "open the live table to commit"
            )

    @classmethod
    def open(
        cls,
        path: str,
        *,
        num_buckets: int = 16,
        turn_shard_size: int | None = None,
        payload_schema: pa.Schema | None = None,
        key_columns: tuple[str, str] | None = None,
    ) -> "LakeTable":
        """Open an existing table (manifest wins over kwargs) or create one.

        ``key_columns`` names the two merge-key columns as the CALLER sees
        them (``payload_schema``, ingested events and every read view use
        these names); physical files keep the canonical names, so all merge
        kernels and shuffle paths are shared untouched.
        """
        m = Manifest.load(path)
        if m is None:
            from ..schema import TRANSCRIPT_SCHEMA

            os.makedirs(path, exist_ok=True)
            kc = tuple(key_columns or CANONICAL_KEYS)
            payload = payload_schema or TRANSCRIPT_SCHEMA
            if kc != CANONICAL_KEYS:
                missing = [c for c in kc if c not in payload.names]
                if missing:
                    raise ValueError(
                        f"key_columns {missing} not in payload schema"
                    )
                clash = [c for c in CANONICAL_KEYS if c in payload.names]
                if clash:
                    raise ValueError(
                        f"payload schema may not use the reserved physical "
                        f"key names {clash} alongside key_columns={list(kc)}"
                    )
                ren = dict(zip(kc, CANONICAL_KEYS))
                payload = pa.schema(
                    [
                        pa.field(ren.get(f.name, f.name), f.type)
                        for f in payload
                    ]
                )
            m = Manifest.new(num_buckets, payload, turn_shard_size, kc)
            m.save_atomic(path)
        clean_uncommitted(path, m.version)
        cls._clean_external_spill()
        return cls(path, m)

    @staticmethod
    def _clean_external_spill() -> None:
        """GC crashed attempts' spill runs under $GRAFT_SPILL_DIR (the
        default spill base lives in ``_staging`` and is covered by
        ``clean_uncommitted``; an external NVMe/scratch base is not).
        Age-gated by the same publish grace, on the NEWEST mtime in each
        spill tree (the root dir's mtime goes stale while a live peer keeps
        writing into existing subdirs), so an in-flight spill is never
        collected."""
        import shutil
        import time

        from ..state.manifest import newest_mtime, publish_grace_s

        base = os.environ.get("GRAFT_SPILL_DIR")
        if not base or not os.path.isdir(base):
            return
        now = time.time()
        for n in os.listdir(base):
            if not n.startswith("spill_v"):
                continue
            p = os.path.join(base, n)
            try:
                if now - newest_mtime(p) > publish_grace_s():
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass

    # -- logical <-> physical key-name indirection ----------------------
    @property
    def key_columns(self) -> tuple[str, str]:
        return self.manifest.key_columns

    def _to_physical(self, t: pa.Table) -> pa.Table:
        """Rename logical key columns to the canonical physical names."""
        kc = self.manifest.key_columns
        if kc == CANONICAL_KEYS:
            return t
        ren = dict(zip(kc, CANONICAL_KEYS))
        return t.rename_columns([ren.get(c, c) for c in t.column_names])

    def _to_logical(self, t: pa.Table) -> pa.Table:
        """Rename canonical physical key columns back to the logical names."""
        kc = self.manifest.key_columns
        if kc == CANONICAL_KEYS:
            return t
        ren = dict(zip(CANONICAL_KEYS, kc))
        return t.rename_columns([ren.get(c, c) for c in t.column_names])

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
        shuffle: str = "sort",
        precompact: bool | None = None,
        merge_actors: bool = False,
        commit_mode: str = "delta",
    ) -> dict:
        """Apply all unapplied epochs (bounded by upto_epoch/max_epochs) as ONE
        epoch-fenced commit. Returns the commit's lineage counters.

        ``commit_mode="delta"`` (default) writes each touched bucket's
        LWW-compacted delta as a NEW file; persisted state is never read or
        rewritten, so commit IO ~ delta size. ``"rewrite"`` merges state into
        every touched bucket at commit time (copy-on-write, commit IO ~ table
        size) — kept for comparison and as the building block of compaction.

        ``precompact`` runs the per-batch LWW combiner before the exchange.
        Default: on for the in-object-store shuffles (volume through the
        all-to-all is what hurts), off for ``shuffle="spill"`` (local spill
        writes are cheap and the per-bucket merge compacts exactly once —
        re-compacting near-duplicate-free batches is pure overhead).

        Idempotent: already-applied epochs are skipped via the manifest
        watermark; a crash before the manifest publish leaves the table at the
        previous version and the next call re-applies cleanly.
        """
        self._check_writable()
        # the shuffle strategy must be chosen BEFORE any dataset is created:
        # Ray snapshots DataContext per dataset at creation time
        from ray.data.context import DataContext, ShuffleStrategy

        ctx = DataContext.get_current()
        prev_strategy = ctx.shuffle_strategy
        if shuffle == "hash":
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            return self._apply_inner(
                changelog_dir,
                upto_epoch=upto_epoch,
                max_epochs=max_epochs,
                salt_groups=salt_groups,
                batch_size=batch_size,
                shuffle=shuffle,
                precompact=(shuffle != "spill") if precompact is None else precompact,
                merge_actors=merge_actors,
                commit_mode=commit_mode,
            )
        finally:
            ctx.shuffle_strategy = prev_strategy

    def _apply_inner(
        self,
        changelog_dir: str,
        *,
        upto_epoch: int | None,
        max_epochs: int | None,
        salt_groups: int | None,
        batch_size: int,
        shuffle: str,
        precompact: bool,
        merge_actors: bool,
        commit_mode: str,
    ) -> dict:
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
            # one footer read per file: row count AND schema come from the
            # same metadata object (this prologue is serial driver work —
            # with thousands of epoch files, 2N footer reads were half IO
            # for nothing)
            md = pq.read_metadata(p)
            raw_events += md.num_rows
            file_schemas[p] = md.schema.to_arrow_schema()
        ren_in = dict(zip(m.key_columns, CANONICAL_KEYS))
        incoming_payload = [
            pa.schema(
                [
                    pa.field(ren_in.get(f.name, f.name), f.type)
                    for f in s
                    if f.name not in _META_COLS
                ]
            )
            for s in file_schemas.values()
        ]
        payload = unify([m.payload_schema] + incoming_payload)
        event_schema = _event_schema_for(payload)

        # --- read: group files by physical schema so each read is uniform,
        # normalize to the unified schema per batch, then union
        by_schema: dict[str, list[str]] = defaultdict(list)
        for p, s in file_schemas.items():
            by_schema[s.to_string()].append(p)

        def _normalize_and_compact(t: pa.Table) -> pa.Table:
            t = t.rename_columns(
                [ren_in.get(c, c) for c in t.column_names]
            )
            t = normalize_table(t, event_schema)
            if precompact:
                t = compact_with_lineage(t, keep_tombstones=True)  # combiner
            return t

        parts = []
        for paths in by_schema.values():
            # one block per file: avoids the SplitBlocks sub-operator so the
            # normalize/compact map FUSES with the read — each file is read,
            # normalized, combined and bucketed in a single task with no
            # intermediate object-store round-trip of the raw events
            ds = rd.read_parquet(paths, override_num_blocks=len(paths))
            ds = ds.map_batches(
                _normalize_and_compact, batch_format="pyarrow", batch_size=batch_size
            )
            parts.append(ds)
        events = parts[0]
        for extra in parts[1:]:
            events = events.union(extra)

        return self._commit_events(
            events,
            payload=payload,
            raw_events=raw_events,
            applied_epoch=max(e for e, _ in files),
            n_epochs=len(files),
            salt_groups=salt_groups,
            batch_size=batch_size,
            shuffle=shuffle,
            merge_actors=merge_actors,
            commit_mode=commit_mode,
        )

    # ------------------------------------------------------------------
    # Dataset ingest (sinks / source adapters feed events directly)
    # ------------------------------------------------------------------
    def apply_dataset(
        self,
        events: rd.Dataset,
        *,
        epoch: int,
        batch_size: int = 131_072,
        shuffle: str = "sort",
        salt_groups: int | None = None,
        commit_mode: str = "delta",
    ) -> dict:
        """Commit an already-built change-event Dataset as epoch ``epoch``
        under the same epoch-fenced manifest protocol as ``apply``.

        The Dataset must carry the meta columns (lsn int64, op string; an
        ``epoch`` column is overwritten) plus payload columns. Idempotent:
        a commit at or below the applied watermark is a no-op — re-running a
        failed sink pipeline cannot double-apply.
        """
        self._check_writable()
        m = self.manifest
        if epoch <= m.applied_epoch:
            return {"epochs": 0}
        if shuffle == "hash":
            raise ValueError(
                "apply_dataset: the hash shuffle strategy must be set before "
                "the input Dataset is created — use apply() or shuffle="
                "'sort'/'spill'"
            )
        ren_in = dict(zip(m.key_columns, CANONICAL_KEYS))
        incoming = pa.schema(
            [
                pa.field(ren_in.get(n, n), t)
                for n, t in zip(events.schema().names, events.schema().types)
                if n not in _META_COLS
            ]
        )
        payload = unify([m.payload_schema, incoming])
        event_schema = _event_schema_for(payload)
        ep = epoch

        def _norm(t: pa.Table) -> pa.Table:
            import numpy as np

            t = t.rename_columns([ren_in.get(c, c) for c in t.column_names])
            if "epoch" in t.column_names:
                t = t.drop_columns(["epoch"])
            t = t.append_column(
                "epoch", pa.array(np.full(t.num_rows, ep, dtype=np.int32))
            )
            return normalize_table(t, event_schema)

        events = events.map_batches(
            _norm, batch_format="pyarrow", batch_size=batch_size
        )
        return self._commit_events(
            events,
            payload=payload,
            raw_events=None,  # filled from the merge counters (no precompact)
            applied_epoch=epoch,
            n_epochs=1,
            salt_groups=salt_groups,
            batch_size=batch_size,
            shuffle=shuffle,
            merge_actors=False,
            commit_mode=commit_mode,
        )

    def _commit_events(
        self,
        events: rd.Dataset,
        *,
        payload: pa.Schema,
        raw_events: int | None,
        applied_epoch: int,
        n_epochs: int,
        salt_groups: int | None,
        batch_size: int,
        shuffle: str,
        merge_actors: bool,
        commit_mode: str,
    ) -> dict:
        m = self.manifest
        num_buckets = m.num_buckets
        shard = m.turn_shard_size

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

        # --- per-bucket merge + partition write (data stays in workers).
        # Lake state is NOT shipped through the shuffle: state files are
        # already bucket-partitioned, so each merge task reads its own
        # bucket's state directly — exchange volume stays proportional to
        # the DELTA, not delta + table size (critical once the lake is far
        # larger than a commit's events).
        state_by_bucket = self.manifest.bucket_files(self.path)
        new_version = m.version + 1
        # writer-unique scratch: concurrent committers must never share
        # a staging dir (the publish rename moves the WHOLE dir)
        import uuid as _uuid

        staging = os.path.join(
            self.path, "_staging", f"v{new_version}-{_uuid.uuid4().hex[:8]}"
        )
        os.makedirs(staging, exist_ok=True)
        lake_cols = lake_schema(payload)
        delta_mode = commit_mode == "delta"

        def _load_state(bucket: int, target: pa.Schema) -> pa.Table | None:
            paths = state_by_bucket.get(bucket)
            if not paths:
                return None
            import numpy as np

            st = _read_files_merged(paths, target)
            # epoch = -1 marks state rows (distinguishes them from this
            # commit's events in the lineage counters)
            return st.set_column(
                st.schema.get_field_index("epoch"),
                "epoch",
                pa.array(np.full(st.num_rows, -1, dtype=np.int32)),
            )

        def _merge_core(ev: pa.Table, bucket: int) -> pa.Table:
            """LWW-compact one bucket's event rows (delta mode), or merge them
            with the bucket's persisted state (rewrite mode); write the
            partition file, return a one-row counter table."""
            events_in = ev.num_rows
            st = None if delta_mode else _load_state(bucket, ev.schema)
            state_in = st.num_rows if st is not None else 0
            group = pa.concat_tables([ev, st]) if st is not None else ev
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
            # from the PRE-merge event rows: a commit whose events were all
            # superseded by state must still advance the lsn watermark, and
            # a legitimate max lsn of 0 must not coerce to -1
            _v = pc.max(ev.column("lsn")).as_py()
            max_lsn = -1 if _v is None else int(_v)
            out = merged.rename_columns(
                [{"lsn": "_lsn", "op": "_op"}.get(c, c) for c in merged.column_names]
            )
            out = normalize_table(out, lake_cols)
            fname = "delta.parquet" if delta_mode else "data.parquet"
            part_dir = os.path.join(staging, f"bucket={bucket:05d}")
            os.makedirs(part_dir, exist_ok=True)
            tmp = os.path.join(part_dir, fname + ".tmp")
            pq.write_table(out, tmp, row_group_size=_row_group_rows())
            os.replace(tmp, os.path.join(part_dir, fname))
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
                    "stats_json": [json.dumps(_column_stats(out))],
                },
                schema=_COUNTER_SCHEMA,
            )

        if shuffle == "spill":
            # Disk-mediated exchange (the 100 TB path): phase A streams
            # normalized events into per-bucket compressed Parquet spill
            # files; phase B merges each bucket independently, reading its
            # spill files (and state) inside the task. No AllToAll operator,
            # both phases run at full task parallelism, the only barrier is
            # between phases. Task retries may duplicate spilled events —
            # harmless, because LWW winner selection per (conv_id, turn_idx,
            # ts, lsn) is idempotent under duplicated input.
            # spill location: defaults under the lake's staging dir; on a
            # real cluster point $GRAFT_SPILL_DIR at node-local NVMe (or a
            # shared scratch FS) — the merge tasks must be able to read every
            # spill file, which on multi-node means shared storage.
            # $GRAFT_SPILL_FORMAT=ipc swaps snappy Parquet for uncompressed
            # Arrow IPC runs: ~5x cheaper encode single-threaded but ~6x the
            # bytes. Measured at 16-way concurrency the pipeline is memory-
            # bandwidth-bound and parquet wins 3x (8.4s vs 27.5s on the 8M
            # scale fixture) — compression trades plentiful CPU for scarce
            # bandwidth. Default stays parquet; ipc is for bandwidth-rich
            # spill targets
            spill_fmt = os.environ.get("GRAFT_SPILL_FORMAT", "parquet")
            spill_ext = ".arrow" if spill_fmt == "ipc" else ".parquet"
            spill_base = os.environ.get("GRAFT_SPILL_DIR") or os.path.join(
                self.path, "_staging"
            )
            # writer-unique (same uuid suffix as staging): concurrent
            # committers never read each other's spill runs, and a crashed
            # attempt's runs can never be concatenated into a retry (which
            # after schema evolution would mix schemas)
            spill_root = os.path.join(
                spill_base, f"spill_{os.path.basename(staging)}"
            )

            def _spill(batch: pa.Table) -> pa.Table:
                import uuid

                token = uuid.uuid4().hex
                col = batch.column("_bucket")
                for bk in pc.unique(col).to_pylist():
                    sub = batch.filter(pc.equal(col, bk))
                    d = os.path.join(spill_root, f"bucket={int(bk):05d}")
                    os.makedirs(d, exist_ok=True)
                    tmp = os.path.join(d, f"part-{token}{spill_ext}.tmp")
                    if spill_fmt == "ipc":
                        import pyarrow.ipc as _ipc

                        with _ipc.new_file(tmp, sub.schema) as w:
                            w.write_table(sub)
                    else:
                        pq.write_table(sub, tmp)
                    os.replace(tmp, os.path.join(d, f"part-{token}{spill_ext}"))
                return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

            events.map_batches(
                _spill, batch_format="pyarrow", batch_size=batch_size
            ).take_all()  # inter-phase barrier

            present = (
                sorted(int(n.split("=")[1]) for n in os.listdir(spill_root))
                if os.path.isdir(spill_root)
                else []
            )

            def _read_and_merge(bk: int) -> pa.Table:
                d = os.path.join(spill_root, f"bucket={bk:05d}")

                def _read(path: str) -> pa.Table:
                    if path.endswith(".arrow"):
                        import pyarrow.ipc as _ipc

                        with _ipc.open_file(path) as r:
                            return r.read_all()
                    return pq.read_table(path)

                ev = pa.concat_tables(
                    [
                        _read(os.path.join(d, f))
                        for f in sorted(os.listdir(d))
                        if f.endswith(spill_ext)
                    ]
                )
                return _merge_core(ev, bk)

            if present:
                items = rd.from_items(
                    [{"bucket": int(b)} for b in present],
                    override_num_blocks=len(present),
                )
                if merge_actors:
                    # stateful actor pool (T1/T2): per-actor setup once,
                    # whole buckets per call, cumulative per-actor lineage
                    # counters. Opt-in: pool spin-up (~1s/actor) only pays
                    # off on long-lived ingest loops with many commits /
                    # thousands of buckets, not single small commits.
                    import ray as _ray

                    from ..stages.actors import SpillMergeActor

                    cpus = int(_ray.cluster_resources().get("CPU", 8))
                    counters_ds = items.map_batches(
                        SpillMergeActor,
                        fn_constructor_args=(
                            _read_and_merge,
                            _COUNTER_SCHEMA.empty_table().append_column(
                                "actor_merged_total",
                                pa.array([], pa.int64()),
                            ),
                        ),
                        batch_format="pyarrow",
                        batch_size=1,
                        concurrency=(1, max(1, min(len(present), cpus))),
                    )
                else:

                    def _merge_items(t: pa.Table) -> pa.Table:
                        if t.num_rows == 0:  # zero-row batch: same schema out
                            return _COUNTER_SCHEMA.empty_table()
                        return pa.concat_tables(
                            [
                                _read_and_merge(int(bk))
                                for bk in t.column("bucket").to_pylist()
                            ]
                        )

                    counters_ds = items.map_batches(
                        _merge_items, batch_format="pyarrow", batch_size=1
                    )
                counters = counters_ds.take_all()
                self.last_stats = counters_ds.stats()
            else:
                counters = []
            import shutil as _shutil

            _shutil.rmtree(spill_root, ignore_errors=True)
        else:

            def _merge_and_write(group: pa.Table) -> pa.Table:
                if group.num_rows == 0:  # empty hash partition: schema out
                    return _COUNTER_SCHEMA.empty_table()
                bucket = int(group.column("_bucket")[0].as_py())
                return _merge_core(group, bucket)

            # hash shuffle (Ray 2.49 HASH_SHUFFLE strategy, set before
            # dataset creation in apply()) streams events into per-partition
            # aggregator actors with no global barrier. The sort-based
            # strategy (default) materializes a full map/reduce exchange
            # first; it benchmarks faster at this scale.
            if shuffle == "hash":
                # one aggregator actor per partition: size to the CLUSTER,
                # not the bucket count — 64 actors on a 4-CPU cluster thrash;
                # each hash partition may hold many buckets, map_groups still
                # sees whole buckets one at a time
                import ray as _ray

                cpus = int(_ray.cluster_resources().get("CPU", 8))
                grouped = events.groupby(
                    "_bucket", num_partitions=min(num_buckets, max(2, cpus))
                )
            else:
                grouped = events.groupby("_bucket")
            counters_ds = grouped.map_groups(
                _merge_and_write, batch_format="pyarrow"
            )
            counters = counters_ds.take_all()  # tiny: one row per bucket
            self.last_stats = counters_ds.stats()  # per-operator observability

        # --- atomic publish: claim v{N} (CAS vs concurrent writers), then
        # manifest
        self._publish_version_dir(staging, new_version)

        applied_lsn = max(
            [int(r["max_lsn"]) for r in counters] + [m.data["applied_lsn"]]
        )
        events_in = sum(int(r["events_in"]) for r in counters)
        if raw_events is None:  # Dataset ingest: no pre-read row count
            raw_events = events_in
        commit_counters = {
            "raw_events": raw_events,
            "events_in": events_in,
            "upserts": sum(int(r["upserts"]) for r in counters),
            "deletes": sum(int(r["deletes"]) for r in counters),
            "superseded": sum(int(r["superseded"]) for r in counters),
            "late": sum(int(r["late"]) for r in counters),
            "precompact_dropped": raw_events - events_in,
            "epochs": n_epochs,
        }
        for r in counters:
            if r["wrote"]:
                key = str(int(r["bucket"]))
                st = json.loads(r["stats_json"]) if r["stats_json"] else {}
                if delta_mode:
                    relpath = f"v{new_version}/bucket={int(r['bucket']):05d}/delta.parquet"
                    entry = m.data["buckets"].setdefault(
                        key, {"files": [], "rows": 0, "tombstones": 0}
                    )
                    entry["files"].append(relpath)
                    # pre-merge totals (files may hold superseded versions of
                    # the same key); exact live counts exist after compact()
                    entry["rows"] += int(r["rows"])
                    entry["tombstones"] += int(r["tombstones"])
                    if st:
                        entry.setdefault("stats", {})[relpath] = st
                else:
                    relpath = f"v{new_version}/bucket={int(r['bucket']):05d}/data.parquet"
                    m.data["buckets"][key] = {
                        "files": [relpath],
                        "rows": int(r["rows"]),
                        "tombstones": int(r["tombstones"]),
                        **({"stats": {relpath: st}} if st else {}),
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
        m.append_history(
            {
                "version": new_version,
                "applied_epoch": applied_epoch,
                "mode": "delta" if delta_mode else "rewrite",
                **commit_counters,
            }
        )
        m.save_atomic(self.path)
        return commit_counters

    # ------------------------------------------------------------------
    # Compaction commits (merge-on-read counterpart; SURVEY.md §7.4)
    # ------------------------------------------------------------------
    def _event_read_schema(self) -> pa.Schema:
        """Unified event-format schema lake files are normalized to on read:
        current payload + (lsn, op)."""
        return pa.schema(
            list(self.manifest.payload_schema)
            + [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
        )

    def _compact_impl(
        self, todo: dict[int, list[str]], *, watermark_us: int | None
    ) -> list[dict]:
        """Rewrite each bucket in ``todo`` as ONE merged base file (optionally
        dropping tombstones older than ``watermark_us``); atomic manifest
        commit. Per-bucket tasks — data never flows through the driver."""
        m = self.manifest
        target = self._event_read_schema()
        lake_cols = lake_schema(m.payload_schema)
        new_version = m.version + 1
        # writer-unique scratch: concurrent committers must never share
        # a staging dir (the publish rename moves the WHOLE dir)
        import uuid as _uuid

        staging = os.path.join(
            self.path, "_staging", f"v{new_version}-{_uuid.uuid4().hex[:8]}"
        )
        os.makedirs(staging, exist_ok=True)

        def _task(items: pa.Table) -> pa.Table:
            outs = []
            for bk in items.column("bucket").to_pylist():
                bk = int(bk)
                merged = _read_files_merged(todo[bk], target)
                dropped = 0
                if watermark_us is not None:
                    is_dead_tomb = pc.and_(
                        pc.equal(merged.column("op"), pa.scalar("D")),
                        pc.less(
                            pc.cast(merged.column("ts"), pa.int64()),
                            pa.scalar(watermark_us, pa.int64()),
                        ),
                    )
                    # null-safe: a tombstone with null ts is the GREATEST
                    # value under the LWW order (nulls sort last) and must be
                    # kept — Kleene logic would null the mask and drop it
                    kept = merged.filter(
                        pc.fill_null(pc.invert(is_dead_tomb), True)
                    )
                    dropped = merged.num_rows - kept.num_rows
                    merged = kept
                out = merged.rename_columns(
                    [
                        {"lsn": "_lsn", "op": "_op"}.get(c, c)
                        for c in merged.column_names
                    ]
                )
                out = out.append_column(
                    "_bucket", pa.array([bk] * out.num_rows, pa.int32())
                )
                out = normalize_table(out, lake_cols)
                part_dir = os.path.join(staging, f"bucket={bk:05d}")
                os.makedirs(part_dir, exist_ok=True)
                tmp = os.path.join(part_dir, "data.parquet.tmp")
                pq.write_table(out, tmp, row_group_size=_row_group_rows())
                os.replace(tmp, os.path.join(part_dir, "data.parquet"))
                tomb = int(
                    pc.sum(
                        pc.cast(
                            pc.equal(out.column("_op"), pa.scalar("D")), pa.int64()
                        )
                    ).as_py()
                    or 0
                )
                outs.append(
                    pa.table(
                        {
                            "bucket": [bk],
                            "rows": [out.num_rows],
                            "tombstones": [tomb],
                            "dropped": [dropped],
                            "files_in": [len(todo[bk])],
                            "stats_json": [json.dumps(_column_stats(out))],
                        }
                    )
                )
            return pa.concat_tables(outs)

        counters = (
            rd.from_items(
                [{"bucket": b} for b in sorted(todo)],
                override_num_blocks=len(todo),
            )
            .map_batches(_task, batch_format="pyarrow", batch_size=1)
            .take_all()
        )
        self._publish_version_dir(staging, new_version)
        for r in counters:
            relpath = f"v{new_version}/bucket={int(r['bucket']):05d}/data.parquet"
            st = json.loads(r["stats_json"]) if r["stats_json"] else {}
            m.data["buckets"][str(int(r["bucket"]))] = {
                "files": [relpath],
                "rows": int(r["rows"]),
                "tombstones": int(r["tombstones"]),
                **({"stats": {relpath: st}} if st else {}),
            }
        m.data["version"] = new_version
        return counters

    def compact(self, *, min_files: int = 2, buckets: list[int] | None = None) -> dict:
        """Size-tiered compaction commit: k-way LWW-merge a bucket's base +
        delta files into one base file. Only buckets with >= ``min_files``
        files (or those listed) rewrite — commit IO ~ the compacted buckets.
        Applies no epochs, so it interleaves with ``apply``/``tail`` freely.
        """
        self._check_writable()
        m = self.manifest
        todo = {
            b: fs
            for b, fs in m.bucket_files(self.path).items()
            if (buckets is None or b in buckets) and len(fs) >= min_files
        }
        if not todo:
            return {"compacted_buckets": 0, "files_merged": 0}
        counters = self._compact_impl(todo, watermark_us=None)
        files_merged = sum(int(r["files_in"]) for r in counters)
        m.append_history(
            {
                "version": m.version,
                "compaction": True,
                "buckets_compacted": len(counters),
                "files_merged": files_merged,
            }
        )
        m.save_atomic(self.path)
        return {"compacted_buckets": len(counters), "files_merged": files_merged}

    def backfill_stats(self) -> dict:
        """Record column statistics for live files that lack them (written
        before stats support) from parquet FOOTER metadata — zero data IO,
        unlike ``compact()``. String columns stay uncovered (footer string
        bounds may be truncated; a compact records exact ones); numeric/
        timestamp/boolean bounds are exact and immediately enable file
        skipping in ``lookup``/``search``/``read_final(keys=)``.

        Published as a metadata-only commit: an empty version dir claims
        the version number (same rename-CAS as data commits, so concurrent
        writers stay safe), then the manifest updates atomically."""
        self._check_writable()
        m = self.manifest
        # compute first, mutate the manifest only AFTER the version claim
        # succeeds (the commit-protocol contract a losing CAS writer relies
        # on: its in-memory manifest must be untouched for reload/retry)
        updates: dict[str, dict[str, dict]] = {}
        for key, entry in m.data["buckets"].items():
            stats = entry.get("stats") or {}
            for rel in entry["files"]:
                if rel in stats:
                    continue
                st = _footer_stats(os.path.join(self.path, rel))
                if st:
                    updates.setdefault(key, {})[rel] = st
        added = sum(len(v) for v in updates.values())
        if not added:
            return {"files_backfilled": 0}
        import uuid as _uuid

        new_version = m.version + 1
        staging = os.path.join(
            self.path, "_staging", f"v{new_version}-{_uuid.uuid4().hex[:8]}"
        )
        os.makedirs(staging, exist_ok=True)
        self._publish_version_dir(staging, new_version)
        for key, per_file in updates.items():
            entry = m.data["buckets"][key]
            entry.setdefault("stats", {}).update(per_file)
            # mark footer-sourced entries: their string columns were never
            # ATTEMPTED (footer string bounds may be truncated), so they are
            # rewrite candidates for ``compact_for_string_stats`` — unlike
            # write-time stats, where a missing string column means
            # attempted-and-ineligible. The marker self-clears when a
            # compaction replaces the bucket entry.
            fl = set(entry.get("footer_stats") or [])
            fl.update(per_file)
            entry["footer_stats"] = sorted(fl)
        m.data["version"] = new_version
        m.append_history({"version": new_version, "stats_backfill": added})
        m.save_atomic(self.path)
        return {"files_backfilled": added}

    def backfill_string_stats(self) -> dict:
        """Record exact STRING column bounds for the live files
        ``string_stats_gaps`` flags, by reading ONLY those files' string
        columns (column-pruned scan: data IO ~ the gap files' string bytes,
        no rewrite). This preserves the per-commit file layout — and with
        it the range locality that makes string stats prune at all: a
        time/entity-ordered ingest gives each delta file a NARROW string
        range, whereas ``compact_for_string_stats`` folds a bucket's delta
        files into one and thereby UNIONS their ranges (hash bucketing
        mixes commits, so the merged file's range is usually full and
        prunes nothing). Measured in tools/bench_string_stats.py. Width/
        encodability rules match the write-time path (``_column_stats``
        cap semantics); a file whose string columns are all over-cap still
        counts as ATTEMPTED (its footer marker clears — a rewrite could
        record nothing more). Published as a metadata-only commit exactly
        like ``backfill_stats``."""
        self._check_writable()
        m = self.manifest
        gaps = self.string_stats_gaps()
        if not gaps:
            return {"files_backfilled": 0}
        str_cols = _stat_string_columns(lake_schema(m.payload_schema))
        updates: dict[str, dict[str, dict]] = {}
        for bk, rels in gaps.items():
            key = str(bk)
            entry_stats = self.manifest.data["buckets"][key].get("stats") or {}
            for rel in rels:
                path = os.path.join(self.path, rel)
                have = pq.read_schema(path).names
                cols = [c for c in str_cols if c in have]
                st: dict[str, list] = {}
                if cols:
                    st = _column_stats(pq.read_table(path, columns=cols))
                if rel not in entry_stats:
                    # the file was never footer-backfilled: fold in the
                    # numeric/timestamp footer bounds NOW (zero data IO).
                    # Otherwise a string-first ordering would leave a
                    # string-only stats entry that ``backfill_stats``
                    # permanently skips (it treats any existing entry as
                    # complete), silently disabling numeric file skipping.
                    st = {**_footer_stats(path), **st}
                updates.setdefault(key, {})[rel] = st
        import uuid as _uuid

        new_version = m.version + 1
        staging = os.path.join(
            self.path, "_staging", f"v{new_version}-{_uuid.uuid4().hex[:8]}"
        )
        os.makedirs(staging, exist_ok=True)
        self._publish_version_dir(staging, new_version)
        n_files = 0
        for key, per_file in updates.items():
            entry = m.data["buckets"][key]
            stats = entry.setdefault("stats", {})
            footer = set(entry.get("footer_stats") or [])
            for rel, st in per_file.items():
                stats.setdefault(rel, {}).update(st)
                footer.discard(rel)  # strings now attempted
                n_files += 1
            if footer:
                entry["footer_stats"] = sorted(footer)
            else:
                entry.pop("footer_stats", None)
        m.data["version"] = new_version
        m.append_history(
            {"version": new_version, "stats_backfill": n_files, "strings": True}
        )
        m.save_atomic(self.path)
        return {"files_backfilled": n_files}

    def string_stats_gaps(self) -> dict[int, list[str]]:
        """Per bucket, the live files whose statistics never ATTEMPTED
        string bounds: files with no stats entry at all, plus files whose
        stats came from the footer backfill (``backfill_stats`` skips
        strings — parquet writers may silently truncate string bounds).
        Files written by the data path (apply/compact) that merely LACK a
        string column's bounds were attempted-and-ineligible (over-cap
        width, unencodable) and are NOT gaps — rewriting them records
        nothing new. Empty when no stat-eligible string column sits inside
        the stat-column priority cap (a rewrite could add nothing)."""
        return string_stats_gaps(self.manifest)

    def compact_for_string_stats(self) -> dict:
        """Targeted compaction of exactly the buckets ``string_stats_gaps``
        flags, with ``min_files=1`` so even single-file buckets rewrite —
        the rewrite (write-time ``_column_stats``), not the merge, is the
        point: it records the exact string bounds the zero-IO footer
        backfill deliberately leaves out, re-enabling file skipping for
        ``search``/``lookup`` on string key columns."""
        gaps = self.string_stats_gaps()
        if not gaps:
            return {"compacted_buckets": 0, "files_merged": 0}
        return self.compact(min_files=1, buckets=sorted(gaps))

    def compact_tombstones(self, *, allowed_lateness_us: int) -> dict:
        """Drop tombstones the lateness watermark has passed (full compaction
        of every bucket).

        A tombstone must outlive every event it could still mask: a future
        event can only resurrect a deleted key if its ``ts`` is older than
        the delete's, and such late events are bounded by
        ``allowed_lateness_us`` (the same bound the late-data lineage counter
        reports against). Watermark = max applied event ts − allowed
        lateness; tombstones with ``ts`` < watermark can never be outranked
        by an admissible future event and are physically removed.

        Returns {dropped, watermark_us}; ``dropped`` counts tombstones
        relative to the LWW-merged view (superseded duplicate versions across
        delta files collapse in the merge, not in this counter).
        """
        self._check_writable()
        m = self.manifest
        paths = m.bucket_paths(self.path)
        if not paths:
            return {"dropped": 0, "watermark_us": None}
        # watermark from Parquet footer statistics — no data read.
        # Chunk index resolved by LEAF path, not top-level field index (a
        # nested payload column would shift every later leaf).
        max_ts = 0
        for p in paths:
            md = pq.read_metadata(p)
            if md.num_row_groups == 0:
                continue
            ts_idx = next(
                i
                for i in range(md.row_group(0).num_columns)
                if md.row_group(0).column(i).path_in_schema == "ts"
            )
            for rg in range(md.num_row_groups):
                stats = md.row_group(rg).column(ts_idx).statistics
                if stats is not None and stats.max is not None:
                    v = stats.max
                    v_us = (
                        int(v.timestamp() * 1_000_000)
                        if hasattr(v, "timestamp")
                        else int(v)
                    )
                    max_ts = max(max_ts, v_us)
        watermark = max_ts - allowed_lateness_us
        counters = self._compact_impl(
            m.bucket_files(self.path), watermark_us=watermark
        )
        dropped = sum(int(r["dropped"]) for r in counters)
        m.append_history(
            {
                "version": m.version,
                "compaction": True,
                "tombstones_dropped": dropped,
                "watermark_us": watermark,
            }
        )
        m.save_atomic(self.path)
        return {"dropped": dropped, "watermark_us": watermark}

    def bucket_bytes(self) -> dict[int, int]:
        """Physical bytes per bucket: sum of the manifest's live file sizes.
        Metadata-only (one os.stat per live file — file count is bounded by
        buckets x compaction tier, never data volume)."""
        return {
            b: sum(os.path.getsize(p) for p in fs)
            for b, fs in self.manifest.bucket_files(self.path).items()
        }

    def maybe_auto_split(
        self, max_bucket_bytes: int, *, max_factor: int = 8
    ) -> dict:
        """Automatic bucket-count evolution: when the largest bucket's
        physical size exceeds ``max_bucket_bytes``, split by the smallest
        power-of-two factor that brings it back under (capped at
        ``max_factor`` per call — repeated triggers converge geometrically).

        This is the trigger merge-on-read needs to stay scale-safe: a merge
        task holds one whole bucket in memory, so bucket size — not table
        size — is the per-task memory bound, and hash splitting (``h % kn``
        preserves ``h % n``) keeps the rewrite local per old bucket. Returns
        ``{"split": 0}`` when under the threshold."""
        sizes = self.bucket_bytes()
        if not sizes:
            return {"split": 0}
        biggest = max(sizes.values())
        if biggest <= max_bucket_bytes:
            return {"split": 0}
        k = 2
        while k < max_factor and biggest // k > max_bucket_bytes:
            k *= 2
        return self.split_buckets(self.manifest.num_buckets * k)

    def split_buckets(self, new_num_buckets: int) -> dict:
        """Bucket-count evolution: rewrite the lake at a finer partitioning.

        ``new_num_buckets`` must be a multiple of the current count: because
        ``h % (k*n) ≡ b (mod n)`` for every row of bucket ``b = h % n``, each
        old bucket's rows land only in the k new buckets ``{b, b+n, ...,
        b+(k-1)n}`` — the split is LOCAL per old bucket (no shuffle, no
        cross-bucket reads), which is what makes re-bucketing a 100 TB table
        a per-bucket streaming rewrite instead of an all-to-all.
        """
        self._check_writable()
        m = self.manifest
        old = m.num_buckets
        if new_num_buckets % old != 0:
            raise ValueError(
                f"new_num_buckets {new_num_buckets} must be a multiple of {old}"
            )
        if new_num_buckets == old:
            return {"split": 0}
        shard = m.turn_shard_size
        target = self._event_read_schema()
        lake_cols = lake_schema(m.payload_schema)
        todo = m.bucket_files(self.path)
        new_version = m.version + 1
        # writer-unique scratch: concurrent committers must never share
        # a staging dir (the publish rename moves the WHOLE dir)
        import uuid as _uuid

        staging = os.path.join(
            self.path, "_staging", f"v{new_version}-{_uuid.uuid4().hex[:8]}"
        )
        os.makedirs(staging, exist_ok=True)

        def _task(items: pa.Table) -> pa.Table:
            outs = []
            for bk in items.column("bucket").to_pylist():
                merged = _read_files_merged(todo[int(bk)], target)
                merged = add_bucket_column(merged, new_num_buckets, shard)
                col = merged.column("_bucket")
                for nb in pc.unique(col).to_pylist():
                    sub = merged.filter(pc.equal(col, nb))
                    out = sub.rename_columns(
                        [
                            {"lsn": "_lsn", "op": "_op"}.get(c, c)
                            for c in sub.column_names
                        ]
                    )
                    out = normalize_table(out, lake_cols)
                    part_dir = os.path.join(staging, f"bucket={int(nb):05d}")
                    os.makedirs(part_dir, exist_ok=True)
                    tmp = os.path.join(part_dir, "data.parquet.tmp")
                    pq.write_table(out, tmp, row_group_size=_row_group_rows())
                    os.replace(tmp, os.path.join(part_dir, "data.parquet"))
                    tomb = int(
                        pc.sum(
                            pc.cast(
                                pc.equal(out.column("_op"), pa.scalar("D")),
                                pa.int64(),
                            )
                        ).as_py()
                        or 0
                    )
                    outs.append(
                        pa.table(
                            {
                                "bucket": [int(nb)],
                                "rows": [out.num_rows],
                                "tombstones": [tomb],
                                "stats_json": [json.dumps(_column_stats(out))],
                            }
                        )
                    )
            return pa.concat_tables(outs)

        counters = (
            rd.from_items(
                [{"bucket": b} for b in sorted(todo)],
                override_num_blocks=max(1, len(todo)),
            )
            .map_batches(_task, batch_format="pyarrow", batch_size=1)
            .take_all()
        )
        self._publish_version_dir(staging, new_version)
        m.data["buckets"] = {}
        for r in counters:
            relpath = f"v{new_version}/bucket={int(r['bucket']):05d}/data.parquet"
            st = json.loads(r["stats_json"]) if r["stats_json"] else {}
            m.data["buckets"][str(int(r["bucket"]))] = {
                "files": [relpath],
                "rows": int(r["rows"]),
                "tombstones": int(r["tombstones"]),
                **({"stats": {relpath: st}} if st else {}),
            }
        m.data["num_buckets"] = new_num_buckets
        m.data["version"] = new_version
        m.append_history(
            {
                "version": new_version,
                "split_buckets": {"from": old, "to": new_num_buckets},
            }
        )
        m.save_atomic(self.path)
        return {"split": 1, "from": old, "to": new_num_buckets}

    # ------------------------------------------------------------------
    # Change feed (CDC out)
    # ------------------------------------------------------------------
    def changes(self, version: int) -> rd.Dataset:
        """The change feed of commit ``version``: every row that commit wrote
        (upserts with full payload, deletes as op='D' rows). Under delta
        commits this is a pure metadata lookup — the commit's per-bucket
        delta files ARE its change feed, so a downstream consumer can follow
        the lake commit-by-commit without any reprocessing (the engine's
        Debezium-out counterpart to the adapter's Debezium-in).

        Only DELTA commits have a feed; compaction, split and
        ``commit_mode="rewrite"`` commits rewrite existing rows (a rewrite
        commit's per-bucket files contain the merged prior state, not just
        that commit's changes), so serving them here would replay
        pre-existing rows as changes — raises KeyError for all three.
        Metadata-only commits (``stats_backfill``) changed zero rows and
        raise too; the feed cursor skips them like compactions."""
        files, shape = self._changes_files(version)
        return rd.read_parquet(files, override_num_blocks=len(files)).map_batches(
            shape, batch_format="pyarrow"
        )

    def _changes_files(self, version: int):
        """Shared by ``changes`` (Ray dataset) and ``changes_table``
        (no-Ray serving): the commit's delta file list plus the batch
        shaping function, with the unservable-commit guards."""
        entry = self.manifest.history_entry(self.path, version)
        if (
            entry is None
            or entry.get("compaction")
            or "split_buckets" in entry
            or "stats_backfill" in entry
        ):
            raise KeyError(
                f"no change feed for v{version}: not a data commit "
                "(compaction/split/stats-backfill rewrote or changed no "
                "rows, or never committed)"
            )
        prefix = f"v{version}/"
        files = [
            os.path.join(self.path, f)
            for b in self.manifest.data["buckets"].values()
            for f in b["files"]
            if f.startswith(prefix)
        ]
        # mode recorded since manifest v3 history; older entries: a delta
        # commit's files are delta.parquet, a rewrite's are data.parquet
        mode = entry.get("mode")
        if mode is None and files:
            mode = "delta" if files[0].endswith("delta.parquet") else "rewrite"
        if mode == "rewrite":
            raise KeyError(
                f"no change feed for v{version}: rewrite commit — its files "
                "hold the merged prior state (a full-state snapshot), not a "
                "delta; commit with commit_mode='delta' to get a feed"
            )
        if not files:
            raise KeyError(
                f"change feed for v{version} was compacted away (run "
                "consumers before compact(), or raise the compaction "
                "min_files threshold)"
            )
        payload_cols = [f.name for f in self.manifest.payload_schema]
        ren_out = dict(zip(CANONICAL_KEYS, self.manifest.key_columns))

        def shape(t: pa.Table) -> pa.Table:
            t = t.rename_columns(
                [{"_lsn": "lsn", "_op": "op"}.get(c, c) for c in t.column_names]
            )
            keep = [c for c in payload_cols if c in t.column_names]
            t = t.select(["op", "lsn"] + keep)
            return t.rename_columns(
                [ren_out.get(c, c) for c in t.column_names]
            )

        return files, shape

    def changes_table(self, version: int) -> pa.Table:
        """NO-RAY change feed of one commit, for the serving layer
        (``serve.py`` ``/updates`` long-poll — the reference's
        ``GraphUpdates`` subscription shape): same rows and guards as
        ``changes`` but read on the caller's thread with one pq.read_table.
        Delta commits are bounded (one commit's rows), so this is a
        serving-sized read, not a batch scan."""
        files, shape = self._changes_files(version)
        tables = [shape(pq.read_table(f)) for f in files]
        return pa.concat_tables(tables, promote_options="permissive")

    def data_commits_after(self, after: int):
        """Ascending data-commit versions strictly newer than ``after`` —
        the servable (delta) feed positions. The SINGLE source of truth for
        which commits carry data: ``feed.ChangeFeedCursor`` delegates here,
        and the HTTP ``/updates`` long-poll calls it directly — a new
        metadata-only commit marker added to this filter covers both."""
        for h in self.manifest.history_after(self.path, int(after)):
            if (
                not h.get("compaction")
                and "split_buckets" not in h
                and "stats_backfill" not in h
            ):
                yield int(h["version"])

    def head(self, n: int, *, columns: list[str] | None = None) -> pa.Table:
        """Bounded NO-RAY merged read: the first ``n`` live rows in bucket
        order, LWW-merged exactly like ``read_final`` but on the caller's
        thread, stopping as soon as ``n`` rows are accumulated (a small
        ``n`` on a large lake opens only the first bucket or two). This is
        the serving-layer ``graph(limit)`` primitive — use ``read_final``
        for unbounded batch reads."""
        from ..stages.apply import lww_compact

        n = int(n)
        payload, payload_cols, ren_out = self._projection(columns)
        out_names = [ren_out.get(c, c) for c in payload_cols]
        empty = pa.schema(
            [pa.field(ren_out.get(f.name, f.name), f.type) for f in payload]
        ).empty_table().select(out_names)
        if n <= 0:
            return empty
        phys_target = pa.schema(
            list(payload)
            + [pa.field("_lsn", pa.int64()), pa.field("_op", pa.string())]
        )
        by_bucket = self.manifest.bucket_files(self.path)
        parts: list[pa.Table] = []
        have = 0
        for bk in sorted(by_bucket):
            paths = by_bucket[bk]
            if not paths:
                continue
            t = pq.read_table(paths, schema=phys_target)
            t = t.rename_columns(
                [{"_lsn": "lsn", "_op": "op"}.get(c, c) for c in t.column_names]
            )
            if len(paths) > 1:
                t = lww_compact(t, keep_tombstones=True)
            t = t.filter(pc.not_equal(t.column("op"), pa.scalar("D")))
            if t.num_rows:
                parts.append(t)
                have += t.num_rows
            if have >= n:
                break
        if not parts:
            return empty
        t = pa.concat_tables(parts, promote_options="permissive")
        t = t.select(payload_cols).rename_columns(out_names)
        sort_keys = [
            (k, "ascending") for k in self.manifest.key_columns if k in out_names
        ]
        if sort_keys:
            t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        return t.slice(0, n)

    # ------------------------------------------------------------------
    # Read views (merge-on-read)
    # ------------------------------------------------------------------
    def snapshot(self, version: int) -> "LakeTable":
        """A read-only view of the table as of commit ``version`` (time
        travel). Pure metadata: loads the per-commit ``_snapshot.json`` the
        commit pinned into its version dir — no data is copied, and the
        snapshot's files stay valid until ``vacuum()`` removes de-referenced
        version dirs (same retention contract as Iceberg/Delta). Raises
        KeyError for unknown / vacuumed versions."""
        if version == self.manifest.version:
            return self
        return LakeTable(
            self.path, Manifest.load_snapshot(self.path, version), readonly=True
        )

    def _projection(
        self, columns: list[str] | None
    ) -> tuple[pa.Schema, list[str], dict[str, str]]:
        """Resolve a logical (native-key-name) column selection into the
        pruned physical payload schema, the output column list, and the
        physical→native rename map. Shared by ``read_final`` and ``lookup``.

        The merge itself always needs the key/order columns (conv_id,
        turn_idx, ts) in addition to the requested payload columns, so a
        2-column read of a wide lake never pays for the wide columns."""
        m = self.manifest
        payload = m.payload_schema
        payload_cols = [f.name for f in payload]
        ren_in = dict(zip(m.key_columns, CANONICAL_KEYS))
        ren_out = dict(zip(CANONICAL_KEYS, m.key_columns))
        if columns is not None:
            phys = [ren_in.get(c, c) for c in columns]
            unknown = set(phys) - set(payload_cols)
            if unknown:
                raise KeyError(
                    f"unknown columns {sorted(ren_out.get(c, c) for c in unknown)}"
                )
            payload_cols = [c for c in payload_cols if c in set(phys)]
            need = set(payload_cols) | {"conv_id", "turn_idx", "ts"}
            payload = pa.schema([f for f in payload if f.name in need])
        return payload, payload_cols, ren_out

    def _buckets_for_keys(
        self, keys, turns, by_bucket: dict[int, list[str]]
    ) -> dict[int, list]:
        """Route requested keys to their home buckets: ``{bucket: unique
        keys}``. On a turn-sharded lake with no turn bound a conversation
        spans several buckets, so every bucket qualifies (callers still push
        the key predicate into each read)."""
        import numpy as np

        m = self.manifest
        uniq_keys = list(dict.fromkeys(keys))
        if m.turn_shard_size and turns is None:
            return {b: uniq_keys for b in by_bucket}
        if m.turn_shard_size:
            b_ids = bucket_of(
                np.asarray(keys, dtype=object),
                np.asarray(turns, dtype=np.int64),
                m.num_buckets,
                m.turn_shard_size,
            )
            routed = zip(keys, b_ids)
        else:
            b_ids = bucket_of(
                np.asarray(uniq_keys, dtype=object),
                np.zeros(len(uniq_keys), dtype=np.int64),
                m.num_buckets,
            )
            routed = zip(uniq_keys, b_ids)
        need = defaultdict(list)
        for k, b in routed:
            need[int(b)].append(k)
        return {b: list(dict.fromkeys(ks)) for b, ks in need.items()}

    def lookup(
        self,
        keys,
        *,
        turns=None,
        columns: list[str] | None = None,
        version: int | None = None,
    ) -> pa.Table:
        """Point lookup of live rows by key — the CDC-serving primitive.

        ``keys`` is a sequence of values for the first key column (e.g.
        conv_ids); with ``turns`` (a parallel sequence for the second key
        column) the match is exact ``(key, turn)`` pairs, otherwise every
        live row of each requested key is returned.

        Cost is O(requested keys), never O(lake): each key hashes to its
        home bucket (``bucket_of`` — the same stable siphash the writer
        uses), only those buckets' files are opened, and a key-exact
        predicate pushes down into the parquet read so row-group statistics
        (files are key-sorted) skip everything else. On a 100 TB lake with
        4k buckets a single-conversation lookup reads ~1/4000th of the
        files and, within them, only the matching row groups. Runs on the
        caller's process — this is the latency-sensitive serving path, not
        a batch scan (use ``read_final`` for those).

        On a ``turn_shard_size`` lake a conversation spans several buckets;
        without ``turns`` the lookup falls back to scanning every bucket's
        files but still pushes the key predicate into each read. Returns a
        canonically sorted ``pyarrow.Table`` with native column names.
        ``version`` time-travels like ``read_final``.

        Reference analogue: the direct-id node fetch
        (``/root/reference/internal/application/services/direct_database_service.go``
        ``GetNodeByID``), made key-partition-aware."""
        import pandas as pd

        if version is not None and version != self.manifest.version:
            return self.snapshot(version).lookup(keys, turns=turns, columns=columns)
        m = self.manifest
        keys = list(keys)
        if turns is not None:
            turns = [int(t) for t in turns]
            if len(turns) != len(keys):
                raise ValueError("turns must parallel keys (one turn per key)")
        payload, payload_cols, ren_out = self._projection(columns)
        by_bucket = m.bucket_files(self.path)
        out_names = [ren_out.get(c, c) for c in payload_cols]
        empty = pa.schema(
            [pa.field(ren_out.get(f.name, f.name), f.type) for f in payload]
        ).empty_table().select(out_names)
        if not by_bucket or not keys:
            return empty

        need_buckets = self._buckets_for_keys(keys, turns, by_bucket)
        key_type = m.payload_schema.field("conv_id").type
        # manifest file stats: skip whole delta files whose conv_id (and
        # turn_idx, when given) range provably misses every requested key —
        # no footer open, no scanner setup. On a merge-on-read bucket with
        # k delta files this divides the per-file scanner cost by the
        # fraction of files the keys actually touch. Stats are fetched per
        # VISITED bucket (``bucket_stats``), so the serving path never pays
        # an O(lake-files) dict build for a few-bucket lookup.
        turn_vals = sorted(set(turns)) if turns is not None else None
        paths: list[str] = []
        for bk, bucket_keys in sorted(need_buckets.items()):
            fstats = m.bucket_stats(self.path, bk)
            for p in by_bucket.get(bk, ()):
                st = fstats.get(p, {})
                if _stats_range_hits(st.get("conv_id"), bucket_keys) and (
                    turn_vals is None
                    or _stats_range_hits(st.get("turn_idx"), turn_vals)
                ):
                    paths.append(p)
        if not paths:
            return empty
        # ONE batched dataset read across every surviving file: a single
        # Arrow scanner amortizes per-file setup (the old per-bucket walk
        # paid it 64x on a 100-key lookup — measured 1.6x slower), fragments
        # written under older schemas cast/null-fill against the explicit
        # schema exactly like normalize_table (int widen + column add
        # covered by tests on evolved lakes), and row-group statistics still
        # prune per fragment. LWW winner selection is per (conv_id,
        # turn_idx) and a key's rows all share a home bucket (or shard —
        # either way they are all in the pooled read), so one global compact
        # is row-identical to the per-bucket merges it replaces.
        from ..stages.apply import lww_compact

        phys_target = pa.schema(
            list(payload)
            + [pa.field("_lsn", pa.int64()), pa.field("_op", pa.string())]
        )
        uniq_keys = list(dict.fromkeys(keys))
        expr = _prunable_isin("conv_id", pa.array(uniq_keys, type=key_type))
        if turns is not None:
            expr = expr & _prunable_isin(
                "turn_idx", pa.array(turn_vals, type=pa.int64())
            )
        t = pq.read_table(paths, schema=phys_target, filters=expr)
        t = t.rename_columns(
            [{"_lsn": "lsn", "_op": "op"}.get(c, c) for c in t.column_names]
        )
        if len(paths) > 1:
            t = lww_compact(t, keep_tombstones=True)
        t = t.filter(pc.not_equal(t.column("op"), pa.scalar("D")))
        if turns is not None and t.num_rows:
            # the pushdown keeps the (keys × turns) cross product; narrow to
            # the exact requested pairs with one vectorized MultiIndex probe
            mi = pd.MultiIndex.from_arrays(
                [
                    t.column("conv_id").to_numpy(zero_copy_only=False),
                    t.column("turn_idx").to_numpy(zero_copy_only=False),
                ]
            )
            t = t.filter(pa.array(mi.isin(list(zip(keys, turns)))))
        if t.num_rows == 0:
            return empty
        t = t.select(payload_cols).rename_columns(out_names)
        sort_keys = [(k, "ascending") for k in m.key_columns if k in out_names]
        return t.take(pc.sort_indices(t, sort_keys=sort_keys)) if sort_keys else t

    _SEARCH_OPS = {
        "=": pc.equal,
        "==": pc.equal,
        "!=": pc.not_equal,
        "<": pc.less,
        "<=": pc.less_equal,
        ">": pc.greater,
        ">=": pc.greater_equal,
    }

    def _candidate_pairs(
        self,
        paths: list[str],
        pred_cols: list[str],
        filter_expr,
        max_result_keys: int,
        what: str,
    ) -> set[tuple]:
        """Phase-1 candidate discovery shared by ``search``/``search_any``:
        ONE streaming dataset scanner over the surviving files (single
        scanner setup, parallel fragment IO, row-group statistics pruning
        per fragment), key columns only in the output. The distinct-key cap
        applies INCREMENTALLY per batch, so a runaway predicate aborts
        before materializing the candidate set. The explicit scan schema
        pins the manifest's CURRENT types: pre-widen fragments cast, files
        missing a predicate column read as null there (null never matches a
        filter), so per-file schema probing is unnecessary."""
        import pyarrow.dataset as pads

        m = self.manifest
        names = list(dict.fromkeys(["conv_id", "turn_idx"] + pred_cols))
        scan_schema = pa.schema([m.payload_schema.field(c) for c in names])
        ds = pads.dataset(paths, format="parquet", schema=scan_schema)
        seen: set[tuple] = set()
        for batch in ds.scanner(
            columns=["conv_id", "turn_idx"], filter=filter_expr
        ).to_batches():
            if batch.num_rows == 0:
                continue
            dfp = batch.to_pandas().drop_duplicates()
            seen.update(zip(dfp["conv_id"], dfp["turn_idx"]))
            # the cap bounds DISTINCT candidate keys, not physical rows:
            # merge-on-read dedups per-commit rewrites, so a physical-row
            # cap would spuriously reject the same logical result on an
            # un-compacted delta lake
            if len(seen) > max_result_keys:
                raise ValueError(
                    f"{what} matched more than {max_result_keys} candidate "
                    "keys — that is a batch scan, not a serving fetch; use "
                    "read_final().filter(...) instead"
                )
        return seen

    def search(
        self,
        column: str,
        op: str,
        value,
        *,
        columns: list[str] | None = None,
        version: int | None = None,
        max_result_keys: int = 100_000,
    ) -> pa.Table:
        """Predicate fetch on the NO-RAY serving path — the reference's
        ``searchNodes`` analogue
        (``/root/reference/internal/interfaces/graphql/schema.resolvers.go``,
        ``neo4j/repository.go:239-299``), re-expressed against the lake.

        Two key-exact phases keep LWW merge-on-read correct under a NON-key
        predicate (filtering inside the merged read would resurrect a
        superseded old version whenever the latest version stops matching):

        1. candidate discovery — every bucket file is scanned with ONLY the
           key columns read; comparison ops push into the parquet scan so
           row-group statistics prune (key/sorted/low-cardinality columns
           skip most groups); files whose stats prove the column all-null
           are skipped without a footer open. Files merely MISSING the
           column after schema evolution are still scanned — the pinned
           scan schema reads the column as null there and null never
           matches, so correctness holds; they are not stats-skipped
           because "no stats entry" cannot be distinguished from
           "never backfilled" without opening the footer.
        2. the candidate (key, turn) pairs go through ``lookup`` (merged,
           key-pruned) and the predicate re-applies POST-merge, which also
           drops candidates whose matching version was superseded.

        Serving contract: bounded result sets — past ``max_result_keys``
        DISTINCT candidate keys this raises and points at
        ``read_final().filter`` (the distributed batch path); the bound is
        compaction-independent (physical rewrites of the same key count
        once). ``op`` is one of ``= == != < <= > >= contains`` (comparisons
        push to stats; ``contains`` evaluates on the one predicate column
        in memory)."""
        return self.search_where(
            [(column, op, value)],
            columns=columns,
            version=version,
            max_result_keys=max_result_keys,
        )

    def search_where(
        self,
        predicates,
        *,
        columns: list[str] | None = None,
        version: int | None = None,
        max_result_keys: int = 100_000,
    ) -> pa.Table:
        """Conjunctive predicate fetch: ``predicates`` is a list of
        ``(column, op, value)`` triples ANDed together (``WHERE a AND b``)
        on the same no-Ray serving path as ``search`` — which is the
        single-predicate wrapper around this.

        Phase 1: manifest file stats skip a file when ANY conjunct's
        [min, max] provably misses (a conjunction fails if one conjunct
        provably fails); survivors pool into one streaming dataset scan
        with the whole conjunction as the scanner filter. Phase 2: merged
        key-exact ``lookup`` of the candidates, conjunction re-applied
        POST-merge (superseded versions never resurface)."""
        if version is not None and version != self.manifest.version:
            return self.snapshot(version).search_where(
                predicates, columns=columns, max_result_keys=max_result_keys
            )
        if not predicates:
            raise ValueError("search_where needs at least one predicate")
        m = self.manifest
        ren_in = dict(zip(m.key_columns, CANONICAL_KEYS))
        compiled = []  # (native, phys, op, value, value_enc)
        for column, op, value in predicates:
            if op != "contains" and op not in self._SEARCH_OPS:
                raise ValueError(
                    f"unsupported op {op!r}; use one of "
                    f"{sorted(self._SEARCH_OPS)} or 'contains'"
                )
            phys_col = ren_in.get(column, column)
            if phys_col not in m.payload_schema.names:
                raise KeyError(f"unknown column {column!r}")
            col_type = m.payload_schema.field(phys_col).type
            # an ISO string against a timestamp column: parse it up front —
            # the scanner filter otherwise raises (Arrow has no
            # equal(timestamp, string) kernel) even though the stats encode
            # below handles it. Comparison ops only: ``contains`` matches on
            # the STRINGIFIED column and must keep the raw string.
            if (
                pa.types.is_timestamp(col_type)
                and isinstance(value, str)
                and op != "contains"
            ):
                try:
                    value = (
                        pc.cast(pa.array([value], pa.string()), col_type)[0]
                        .as_py()
                    )
                except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError) as e:
                    raise ValueError(
                        f"cannot parse {value!r} as {col_type} for "
                        f"column {column!r}: {e}"
                    ) from e
            # encode the QUERY value into the stats' comparison domain
            # (timestamps -> int64 micros); the stored-bound string cap
            # does NOT apply here — a long query string compares fine
            # against exact stored bounds. Unencodable => no skipping.
            try:
                if pa.types.is_timestamp(col_type):
                    value_enc = (
                        pa.scalar(value, col_type).cast(pa.int64()).as_py()
                    )
                elif isinstance(value, (int, float, str, bool)):
                    value_enc = value
                else:
                    value_enc = None
            except (
                pa.ArrowInvalid,
                pa.ArrowNotImplementedError,
                pa.ArrowTypeError,
            ):
                value_enc = None
            compiled.append((column, phys_col, op, value, value_enc))

        # phase 1: candidate (conv_id, turn_idx) pairs, key columns only —
        # stats first (no footer opened for a provably-missing file), then
        # one streaming scan (``_candidate_pairs``: pre-widen fragments
        # cast, files physically missing a column read null and the
        # conjunction fails there).
        by_bucket = m.bucket_files(self.path)
        # a first-key equality conjunct routes phase 1 to the key's home
        # bucket (same hash the writer used) — one bucket's files instead
        # of the lake's. The routing value is cast to the key column's
        # STORED type first (mirroring lookup): a cross-typed query value
        # (float 5.0 vs int64 keys) hashes differently raw but Arrow's
        # ``==`` numeric-promotes, so routing on the raw value would
        # silently miss rows the unrouted scan finds. Uncastable values
        # skip routing and take the full scan.
        for _, ph, op, value, _ in compiled:
            if ph == "conv_id" and op in ("=", "=="):
                try:
                    route_val = pa.scalar(
                        value, m.payload_schema.field("conv_id").type
                    ).as_py()
                except (
                    pa.ArrowInvalid,
                    pa.ArrowTypeError,
                    pa.ArrowNotImplementedError,
                    OverflowError,
                ):
                    break
                need = self._buckets_for_keys([route_val], None, by_bucket)
                by_bucket = {
                    b: fs for b, fs in by_bucket.items() if need.get(b)
                }
                break
        # stats fetched per VISITED bucket (bucket_stats): after the
        # equality routing above this is O(one bucket), not an O(lake-files)
        # dict build on the serving path; unrouted searches visit every
        # bucket and pay the same total as the full-lake dict would
        paths = []
        for bk in sorted(by_bucket):
            fstats = m.bucket_stats(self.path, bk)
            for p in by_bucket[bk]:
                if not any(
                    _stats_reject(fstats.get(p, {}).get(ph), op, enc)
                    for _, ph, op, _, enc in compiled
                ):
                    paths.append(p)

        def _pred_expr(ph, op, value):
            if op == "contains":
                return pc.match_substring(pc.field(ph).cast(pa.string()), value)
            return self._SEARCH_OPS[op](pc.field(ph), value)

        import functools as _ft
        import operator as _opr

        expr = _ft.reduce(
            _opr.and_,
            [_pred_expr(ph, op, v) for _, ph, op, v, _ in compiled],
        )
        desc = " AND ".join(
            f"{c} {op} {v!r}" for c, _, op, v, _ in compiled
        )
        seen = (
            self._candidate_pairs(
                paths,
                [ph for _, ph, _, _, _ in compiled],
                expr,
                max_result_keys,
                f"search({desc})",
            )
            if paths
            else set()
        )

        def _mask(t: pa.Table):
            mask = None
            for column, _, op, value, _ in compiled:
                col = t.column(column)  # lookup returns native names
                if op == "contains":
                    mc = pc.match_substring(col.cast(pa.string()), value)
                else:
                    mc = self._SEARCH_OPS[op](col, value)
                mc = pc.fill_null(mc, False)
                mask = mc if mask is None else pc.and_(mask, mc)
            return mask

        return self._serve_candidates(
            seen, columns, [c for c, *_ in compiled], _mask
        )

    def _serve_candidates(
        self, seen: set[tuple], columns, pred_cols_native: list[str], mask_fn
    ) -> pa.Table:
        """Phase 2 shared by ``search``/``search_any``: merged key-exact
        ``lookup`` of the candidate pairs, predicate re-applied POST-merge
        (drops candidates whose matching version was superseded), then the
        requested projection restored (predicate columns that only rode
        along for the re-filter are trimmed)."""
        if not seen:
            return self.lookup([], columns=columns)
        import pandas as pd

        pairs_pd = pd.DataFrame(list(seen), columns=["conv_id", "turn_idx"])
        want_cols = None
        if columns is not None:
            want_cols = list(dict.fromkeys(list(columns) + pred_cols_native))
        t = self.lookup(
            pairs_pd["conv_id"].tolist(),
            turns=pairs_pd["turn_idx"].tolist(),
            columns=want_cols,
        )
        t = t.filter(pc.fill_null(mask_fn(t), False))
        if columns is not None:
            keep = set(columns)
            t = t.select([c for c in t.column_names if c in keep])
        return t

    def search_any(
        self,
        term: str,
        *,
        search_columns: list[str] | None = None,
        columns: list[str] | None = None,
        version: int | None = None,
        max_result_keys: int = 100_000,
    ) -> pa.Table:
        """Substring search across MULTIPLE payload string columns on the
        no-Ray serving path — the exact ``searchNodes(searchTerm)`` shape of
        the reference (one term OR-matched over node properties,
        ``/root/reference/internal/interfaces/graphql/schema.resolvers.go``
        ``searchNodes`` → ``neo4j/repository.go`` ``SearchNodes``), where
        ``search`` is the single-column comparison fetch.

        Same two key-exact phases as ``search`` (candidate keys from a
        key-columns-only scan; merged ``lookup``; predicate re-applied
        POST-merge so a superseded old version can never resurface), with
        the row predicate = OR of ``contains(term)`` over
        ``search_columns`` (default: every string payload column except the
        key). Files recording every searched column as all-null are skipped
        via manifest stats; files physically missing a searched column
        (pre-evolution) are still scanned — the column reads as null there
        and matches nothing (stats can't distinguish "column absent" from
        "stats not recorded", so skipping on absence would be unsafe).
        Bounded by ``max_result_keys`` exactly like ``search``."""
        if version is not None and version != self.manifest.version:
            return self.snapshot(version).search_any(
                term,
                search_columns=search_columns,
                columns=columns,
                max_result_keys=max_result_keys,
            )
        m = self.manifest
        ren_in = dict(zip(m.key_columns, CANONICAL_KEYS))
        if search_columns is None:
            phys_search = [
                f.name
                for f in m.payload_schema
                if (
                    pa.types.is_string(f.type)
                    or pa.types.is_large_string(f.type)
                )
                and f.name != "conv_id"  # the key is an id, not a property
            ]
        else:
            phys_search = [ren_in.get(c, c) for c in search_columns]
            unknown = set(phys_search) - set(m.payload_schema.names)
            if unknown:
                ren_out = dict(zip(CANONICAL_KEYS, m.key_columns))
                raise KeyError(
                    f"unknown columns {sorted(ren_out.get(c, c) for c in unknown)}"
                )
        if not phys_search:
            raise ValueError("no string columns to search")

        def _or_contains(t: pa.Table, cols: list[str]):
            mask = None
            for c in cols:
                mc = pc.fill_null(
                    pc.match_substring(t.column(c).cast(pa.string()), term),
                    False,
                )
                mask = mc if mask is None else pc.or_(mask, mc)
            return mask

        by_bucket = m.bucket_files(self.path)
        fstats = m.file_stats(self.path)
        # stats-skip files whose EVERY searched column is recorded all-null;
        # survivors pool into one streaming scan where a column physically
        # missing from a fragment reads as null and matches nothing
        paths = [
            p
            for bk in sorted(by_bucket)
            for p in by_bucket[bk]
            if not (
                fstats.get(p) is not None
                and all(
                    fstats[p].get(c) == [None, None] for c in phys_search
                )
            )
        ]
        import functools as _ft
        import operator as _op

        expr = _ft.reduce(
            _op.or_,
            [
                pc.match_substring(pc.field(c).cast(pa.string()), term)
                for c in phys_search
            ],
        )
        seen = (
            self._candidate_pairs(
                paths,
                phys_search,
                expr,
                max_result_keys,
                f"search_any({term!r})",
            )
            if paths
            else set()
        )
        native_search = [
            dict(zip(CANONICAL_KEYS, m.key_columns)).get(c, c)
            for c in phys_search
        ]
        return self._serve_candidates(
            seen, columns, native_search,
            lambda t: _or_contains(t, native_search),
        )

    def read_final(
        self,
        columns: list[str] | None = None,
        *,
        keys=None,
        version: int | None = None,
        keep_tombstones: bool = False,
    ) -> rd.Dataset:
        """Streaming read view of live rows: each bucket's base + delta files
        are normalized to the current payload schema (null-fill/cast — keeps
        post-evolution lakes readable when a commit touched only some
        buckets) and LWW-merged on the fly; tombstones filtered, hidden
        columns dropped. One task per bucket — read parallelism scales with
        the bucket count, and single-file buckets skip the merge entirely.

        ``columns`` prunes the OUTPUT projection; the merge itself always
        reads the key/order columns (conv_id, turn_idx, ts, lsn, op) plus the
        requested payload columns, so a 2-column read of a wide lake never
        pays for the wide columns.

        ``keys`` restricts the scan to the given first-key values and gives
        the BATCH path the same O(keys) property as ``lookup``: only the
        keys' home buckets become read tasks, and a key-exact predicate is
        pushed into each parquet read — selecting 1M conversations from a
        1B-conversation lake reads ~keys/num_buckets of the buckets and only
        their matching row groups, not the lake. (Turn-sharded lakes scan
        every bucket but still push the key predicate.)

        ``version`` time-travels: reads the table as of that commit (see
        ``snapshot``).

        ``keep_tombstones`` keeps delete rows and the ``op``/``lsn`` meta
        columns in the output — for consumers that REPLAY the state forward
        (e.g. a change-feed ``resync``): without the tombstones' timestamps
        a later out-of-order delta event would resurrect deleted rows."""
        if version is not None and version != self.manifest.version:
            return self.snapshot(version).read_final(
                columns, keys=keys, keep_tombstones=keep_tombstones
            )
        m = self.manifest
        payload, payload_cols, ren_out = self._projection(columns)
        by_bucket = m.bucket_files(self.path)
        if keys is not None:
            need = self._buckets_for_keys(list(keys), None, by_bucket)
            by_bucket = {
                b: paths
                for b, paths in by_bucket.items()
                if b in need and need[b]
            }
            key_type = m.payload_schema.field("conv_id").type
            key_arrays = {
                b: pa.array(ks, type=key_type) for b, ks in need.items() if ks
            }
            key_lists = {b: list(ks) for b, ks in need.items() if ks}
            # stats only for the buckets the keys route to — never O(lake)
            fstats = {}
            for b in need:
                fstats.update(m.bucket_stats(self.path, b))
        else:
            key_arrays = None
            key_lists = None
            fstats = {}
        if not by_bucket:
            fields = [
                pa.field(ren_out.get(f.name, f.name), f.type)
                for f in payload
                if f.name in payload_cols
            ]
            if keep_tombstones:
                fields += [
                    pa.field("lsn", pa.int64()),
                    pa.field("op", pa.string()),
                ]
            return rd.from_arrow(pa.schema(fields).empty_table())
        target = pa.schema(
            list(payload) + [pa.field("lsn", pa.int64()), pa.field("op", pa.string())]
        )

        def _merge_read(items: pa.Table) -> pa.Table:
            outs = []
            for bk in items.column("bucket").to_pylist():
                expr = (
                    _prunable_isin("conv_id", key_arrays[int(bk)])
                    if key_arrays is not None
                    else None
                )
                paths = by_bucket[int(bk)]
                if key_lists is not None and fstats:
                    # manifest file stats: skip delta files whose conv_id
                    # range provably misses every requested key
                    paths = [
                        p
                        for p in paths
                        if _stats_range_hits(
                            fstats.get(p, {}).get("conv_id"), key_lists[int(bk)]
                        )
                    ]
                t = (
                    _read_files_merged(paths, target, row_filter=expr)
                    if paths
                    else target.empty_table()
                )
                if keep_tombstones:
                    t = t.select(payload_cols + ["lsn", "op"])
                else:
                    t = t.filter(pc.not_equal(t.column("op"), pa.scalar("D")))
                    t = t.select(payload_cols)
                outs.append(
                    t.rename_columns([ren_out.get(c, c) for c in t.column_names])
                )
            return pa.concat_tables(outs)

        return rd.from_items(
            [{"bucket": b} for b in sorted(by_bucket)],
            override_num_blocks=len(by_bucket),
        ).map_batches(_merge_read, batch_format="pyarrow", batch_size=1)

    def final_table(self, *, version: int | None = None) -> pa.Table:
        """Driver-side materialized final state, canonically sorted — for
        tests / small results only."""
        if version is not None and version != self.manifest.version:
            return self.snapshot(version).final_table()
        ds = self.read_final()
        refs = ds.to_arrow_refs()
        import ray as _ray

        tables = [t for t in _ray.get(refs) if t.num_rows > 0]
        t = (
            pa.concat_tables(tables, promote_options="permissive")
            if tables
            else self._to_logical(self.manifest.payload_schema.empty_table())
        )
        if t.num_rows == 0:
            return t
        k1, k2 = self.manifest.key_columns
        t = _promote_big_binary(t)
        return t.take(
            pc.sort_indices(
                t, sort_keys=[(k1, "ascending"), (k2, "ascending")]
            )
        )


#: string/binary columns this close to the int32 offset limit promote to
#: their large_ (64-bit-offset) variants before a full-table take — a
#: driver-side sort of a multi-GB text column would otherwise die with
#: Arrow's opaque "offset overflow while concatenating arrays"
_SORT_PROMOTE_BYTES = (1 << 31) - (1 << 27)


def _promote_big_binary(t: pa.Table) -> pa.Table:
    big = {
        f.name
        for f in t.schema
        if (pa.types.is_string(f.type) or pa.types.is_binary(f.type))
        and t.column(f.name).nbytes >= _SORT_PROMOTE_BYTES
    }
    if not big:
        return t
    def widen(f: pa.Field) -> pa.Field:
        if f.name not in big:
            return f
        wide = pa.large_binary() if pa.types.is_binary(f.type) else pa.large_string()
        return pa.field(f.name, wide)
    return t.cast(pa.schema([widen(f) for f in t.schema]))


def replay(
    changelog_dir: str,
    lake_dir: str,
    *,
    num_buckets: int = 16,
    turn_shard_size: int | None = None,
    salt_groups: int | None = None,
    epochs_per_commit: int | None = None,
    shuffle: str = "sort",
    merge_actors: bool = False,
    commit_mode: str = "delta",
    auto_compact_files: int | None = 8,
    auto_split_bytes: int | None = 1 << 30,
) -> LakeTable:
    """Replay a full changelog into a (possibly pre-existing) lake table,
    committing every ``epochs_per_commit`` epochs (None = single commit).
    ``auto_compact_files`` triggers a size-tiered ``compact()`` after any
    commit that leaves a bucket with at least that many files;
    ``auto_split_bytes`` splits the bucket count when any bucket outgrows
    that physical size (see ``LakeTable.maybe_auto_split``). Both are ON
    by default (compact at 8 files, split at 1 GiB) so an out-of-the-box
    ingest loop keeps per-bucket file counts and bytes bounded; pass
    ``None``/0 to disable."""
    lake = LakeTable.open(
        lake_dir, num_buckets=num_buckets, turn_shard_size=turn_shard_size
    )
    while True:
        c = lake.apply(
            changelog_dir,
            max_epochs=epochs_per_commit,
            salt_groups=salt_groups,
            shuffle=shuffle,
            merge_actors=merge_actors,
            commit_mode=commit_mode,
        )
        if auto_compact_files and c.get("epochs", 0):
            lake.compact(min_files=auto_compact_files)
        if auto_split_bytes and c.get("epochs", 0):
            lake.maybe_auto_split(auto_split_bytes)
        if c.get("epochs", 0) == 0:
            break
        if epochs_per_commit is None:
            break
    return lake
