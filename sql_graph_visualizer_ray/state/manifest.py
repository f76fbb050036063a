"""Per-partition checkpoint manifest with atomic, epoch-fenced commits.

Replaces the reference's destructive full refresh (``MATCH (n) DETACH DELETE n``
before every run, ``/root/reference/cmd/main.go:165-177``) with idempotent
incremental commits:

- Each commit writes its touched bucket partitions to ``_staging/v{N}/``,
  renames the version directory into place, then atomically replaces
  ``MANIFEST.json`` (write tmp + ``os.replace``). The manifest is the single
  source of truth; data directories not reachable from it are garbage.
- The manifest records, per bucket, the current data path + rows + lineage
  counters, plus the global applied-epoch / applied-LSN watermark. A killed
  job resumes by reading the manifest and replaying only epochs beyond the
  watermark — retried Ray tasks overwrite their own deterministic staging
  files, so no commit can double-apply (exactly-once effect).
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import time
from typing import Any

import pyarrow as pa

MANIFEST_NAME = "MANIFEST.json"
SNAPSHOT_NAME = "_snapshot.json"


def _schema_to_str(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def _schema_from_str(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


class Manifest:
    """In-memory view of a lake table's MANIFEST.json."""

    def __init__(self, data: dict[str, Any]):
        self.data = data

    # -- constructors -----------------------------------------------------
    @classmethod
    def new(
        cls,
        num_buckets: int,
        payload_schema: pa.Schema,
        turn_shard_size: int | None,
        key_columns: tuple[str, str] | None = None,
    ) -> "Manifest":
        return cls(
            {
                "format": "graft-cdc-lake/2",
                "version": 0,
                "num_buckets": num_buckets,
                "turn_shard_size": turn_shard_size,
                # logical names of the two merge-key columns; physical files
                # always store them under the canonical (conv_id, turn_idx)
                # names and LakeTable renames at its read/ingest boundary
                "key_columns": list(key_columns or ("conv_id", "turn_idx")),
                "applied_epoch": -1,
                "applied_lsn": -1,
                "payload_schema": _schema_to_str(payload_schema),
                # str(bucket) -> {files: [relpath...], rows, tombstones}
                # files[0] may be a compacted base; the rest are per-commit
                # delta files, LWW-merged on read (merge-on-read)
                "buckets": {},
                "counters": {},  # cumulative lineage counters
                "history": [],  # one entry per commit
            }
        )

    @classmethod
    def load(cls, lake_dir: str) -> "Manifest | None":
        p = os.path.join(lake_dir, MANIFEST_NAME)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            data = json.load(f)
        # upgrade format/1 (single data file per bucket) in place
        for b in data.get("buckets", {}).values():
            if "path" in b and "files" not in b:
                b["files"] = [b.pop("path")]
        return cls(data)

    # -- accessors --------------------------------------------------------
    @property
    def version(self) -> int:
        return self.data["version"]

    @property
    def num_buckets(self) -> int:
        return self.data["num_buckets"]

    @property
    def turn_shard_size(self) -> int | None:
        return self.data["turn_shard_size"]

    @property
    def applied_epoch(self) -> int:
        return self.data["applied_epoch"]

    @property
    def payload_schema(self) -> pa.Schema:
        return _schema_from_str(self.data["payload_schema"])

    @property
    def key_columns(self) -> tuple[str, str]:
        """Logical merge-key column names (pre-key_columns manifests are
        transcripts lakes on the canonical names)."""
        kc = self.data.get("key_columns")
        return tuple(kc) if kc else ("conv_id", "turn_idx")

    def bucket_paths(self, lake_dir: str) -> list[str]:
        """All data files of all buckets (base + deltas), flattened."""
        return [
            os.path.join(lake_dir, f)
            for b in self.data["buckets"].values()
            for f in b["files"]
        ]

    def file_stats(self, lake_dir: str) -> dict[str, dict]:
        """absolute file path -> {column: [min, max]} for every live file
        that recorded write-time column statistics (see cdc._column_stats).
        Files without an entry (pre-stats lakes, unencodable bounds) simply
        cannot be skipped — readers must treat absence as 'scan'.

        Full-lake view — right for ``search``, which walks every bucket
        anyway. Point reads should use ``bucket_stats`` (O(one bucket), not
        O(lake) dict building on the latency-sensitive path)."""
        out: dict[str, dict] = {}
        for b in self.data["buckets"].values():
            for rel, st in (b.get("stats") or {}).items():
                out[os.path.join(lake_dir, rel)] = st
        return out

    def bucket_stats(self, lake_dir: str, bucket: int) -> dict[str, dict]:
        """``file_stats`` restricted to one bucket's files."""
        e = self.data["buckets"].get(str(bucket)) or {}
        return {
            os.path.join(lake_dir, rel): st
            for rel, st in (e.get("stats") or {}).items()
        }

    def bucket_files(self, lake_dir: str) -> dict[int, list[str]]:
        """bucket id -> absolute file paths, base first then deltas in commit
        order (the order never matters for LWW correctness — merge order is
        (ts, lsn) — but it keeps reads deterministic)."""
        return {
            int(k): [os.path.join(lake_dir, f) for f in v["files"]]
            for k, v in self.data["buckets"].items()
        }

    # -- commit protocol --------------------------------------------------
    # -- commit history: bounded in-manifest, rolled to side segments ----
    #
    # One entry per commit would make the manifest grow without bound and
    # be REWRITTEN on every commit (1M commits ~ 150 MB json per save).
    # The manifest keeps the newest <= 2*GRAFT_HISTORY_KEEP entries; once a
    # full extra batch accumulates, the oldest batch rolls into a write-once
    # `_history/seg-<first>-<last>.jsonl` file, named by version range so
    # point lookups open exactly one segment.
    # Readers go through history_entry / history_after, never the raw list.

    def append_history(self, entry: dict) -> None:
        # every commit is wall-clock stamped so monitors can compute commit
        # lag / commit rate from history alone (monitor.LakeStatsCollector);
        # stamped here, once, rather than at each of the five commit sites
        entry.setdefault("wall_ts", round(time.time(), 3))
        self.data["history"].append(entry)
        self.data["history_total"] = int(self.data.get("history_total", 0)) + 1

    def history_total(self) -> int:
        return int(self.data.get("history_total", len(self.data["history"])))

    def _roll_history(self, lake_dir: str) -> None:
        keep = int(os.environ.get("GRAFT_HISTORY_KEEP", "256"))
        hist = self.data["history"]
        # Roll only once the tail has a full extra batch (2*keep): rolling at
        # keep+1 would emit ONE single-entry segment file per commit in steady
        # state — a million-commit lake would hold a million tiny files and
        # every history_after() listdir would parse them all. Batched rolls
        # write one ~keep-entry segment per `keep` commits instead.
        if len(hist) < 2 * keep:
            return
        roll, self.data["history"] = hist[:-keep], hist[-keep:]
        d = os.path.join(lake_dir, "_history")
        os.makedirs(d, exist_ok=True)
        first = int(roll[0].get("version", 0))
        last = int(roll[-1].get("version", 0))
        p = os.path.join(d, f"seg-{first:012d}-{last:012d}.jsonl")
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            for e in roll:
                f.write(json.dumps(e) + "\n")
        os.replace(tmp, p)

    @staticmethod
    def _segments(lake_dir: str) -> list[tuple[int, int, str]]:
        d = os.path.join(lake_dir, "_history")
        if not os.path.isdir(d):
            return []
        out = []
        for n in sorted(os.listdir(d)):
            if n.startswith("seg-") and n.endswith(".jsonl"):
                _, a, b = n[: -len(".jsonl")].split("-")
                out.append((int(a), int(b), os.path.join(d, n)))
        return out

    def history_entry(self, lake_dir: str, version: int) -> dict | None:
        """The history entry for a commit version, wherever it lives. Every
        entry's version is unique (compaction commits bump the manifest
        version like any data commit), so the first match IS the entry;
        returning on first match is just the cheap scan order."""
        for h in self.data["history"]:
            if h.get("version") == version:
                return h
        for a, b, p in self._segments(lake_dir):
            if a <= version <= b:
                with open(p) as f:
                    for line in f:
                        e = json.loads(line)
                        if e.get("version") == version:
                            return e
        return None

    def history_after(self, lake_dir: str, min_version: int):
        """All history entries with version > min_version, oldest first
        (rolled segments, then the in-manifest tail), STRICTLY ascending.

        The ascending guard is load-bearing dedup: a crash between a
        history roll (segment os.replace'd) and the manifest publish
        leaves the rolled entries both in the orphan segment and in the
        reloaded manifest's tail — and the next roll writes a second,
        overlapping segment. Yielding only versions above the last yielded
        one collapses those overlaps at read time, so feed cursors and
        monitor rate windows never double-count a commit."""
        last = int(min_version)
        for a, b, p in self._segments(lake_dir):
            if b > last:
                with open(p) as f:
                    for line in f:
                        e = json.loads(line)
                        if e.get("version", 0) > last:
                            last = int(e["version"])
                            yield e
        for h in self.data["history"]:
            if h.get("version", 0) > last:
                last = int(h["version"])
                yield h

    def save_atomic(self, lake_dir: str) -> None:
        self._roll_history(lake_dir)
        self._write_snapshot(lake_dir)
        p = os.path.join(lake_dir, MANIFEST_NAME)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)

    def _write_snapshot(self, lake_dir: str) -> None:
        """Pin this version's table state inside its own version directory
        (Iceberg-style per-commit metadata) so reads can time-travel to any
        still-on-disk commit. Written BEFORE the manifest publish: a crash in
        between leaves the snapshot as garbage that ``clean_uncommitted``
        removes with the version dir. Commits never mutate published files,
        so a snapshot's file list stays valid until ``vacuum`` deletes the
        de-referenced version dirs it points into."""
        vdir = os.path.join(lake_dir, f"v{self.version}")
        if not os.path.isdir(vdir):  # v0 (creation) has no version dir
            return
        snap = {
            k: self.data[k]
            for k in (
                "format",
                "version",
                "num_buckets",
                "turn_shard_size",
                "payload_schema",
                "buckets",
            )
        }
        snap["key_columns"] = list(self.key_columns)
        p = os.path.join(vdir, SNAPSHOT_NAME)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
        os.replace(tmp, p)

    @classmethod
    def load_snapshot(cls, lake_dir: str, version: int) -> "Manifest":
        """The table state as of commit ``version`` (time travel). Raises
        KeyError if that commit predates snapshot support or its version dir
        was vacuumed."""
        p = os.path.join(lake_dir, f"v{version}", SNAPSHOT_NAME)
        if not os.path.exists(p):
            raise KeyError(
                f"no snapshot for v{version}: the commit predates snapshot "
                "support, never existed, or was removed by vacuum()"
            )
        with open(p) as f:
            snap = json.load(f)
        snap.setdefault("applied_epoch", -1)
        snap.setdefault("applied_lsn", -1)
        snap.setdefault("counters", {})
        snap.setdefault("history", [])
        return cls(snap)


#: how long an unpublished staging/version dir must sit untouched before a
#: cleaner may assume its writer is dead. Must exceed the longest commit's
#: publish window; tune via $GRAFT_PUBLISH_GRACE_S (tests set it to 0).
PUBLISH_GRACE_S = 300.0


def publish_grace_s() -> float:
    v = os.environ.get("GRAFT_PUBLISH_GRACE_S")
    return float(v) if v is not None else PUBLISH_GRACE_S


def newest_mtime(path: str) -> float:
    """Newest mtime anywhere in the tree under ``path`` (root included).

    Staleness decisions MUST look at the whole tree, not the root dir:
    writing a parquet file into an EXISTING bucket subdir never touches the
    root's mtime, so a commit whose write phase outlasts the publish grace
    would look abandoned to a peer's GC while still in flight. Cost is one
    stat per entry — bounded by the files of one commit attempt."""
    newest = os.path.getmtime(path)  # propagate OSError: caller decides
    for dirpath, dirnames, filenames in os.walk(path):
        for n in dirnames + filenames:
            try:
                newest = max(
                    newest, os.path.getmtime(os.path.join(dirpath, n))
                )
            except OSError:
                continue  # entry vanished mid-walk — a peer is active
    return newest


def clean_uncommitted(lake_dir: str, committed_version: int) -> None:
    """Delete staging entries and any version dir newer than the manifest —
    leftovers of a crash between data rename and manifest publish.

    Age-gated for multi-writer safety: only trees whose NEWEST file is
    older than the publish grace window are collected (``newest_mtime`` —
    the root dir's own mtime goes stale during long writes into existing
    subdirs), so opening a lake never destroys a LIVE peer writer's
    in-flight staging or just-renamed version dir. A genuinely crashed
    attempt is collected by whoever opens or commits after the grace
    expires."""
    import time

    if not os.path.isdir(lake_dir):
        return
    now = time.time()
    grace = publish_grace_s()

    def _stale(path: str) -> bool:
        try:
            return now - newest_mtime(path) > grace
        except OSError:
            return False  # vanished underneath us — someone else cleaned it

    for name in os.listdir(lake_dir):
        full = os.path.join(lake_dir, name)
        if name == "_staging":
            for sub in os.listdir(full):
                p = os.path.join(full, sub)
                if _stale(p):
                    shutil.rmtree(p, ignore_errors=True)
        elif (
            name.startswith("v")
            and name[1:].isdigit()
            and int(name[1:]) > committed_version
            and _stale(full)
        ):
            shutil.rmtree(full, ignore_errors=True)


# marker file a retention-window vacuum drops into a de-referenced version
# dir the first time it sees it; its content is that wall-clock time, and
# the dir is reclaimed once now - marked_at >= min_age_s
_DEREF_MARKER = "_dereferenced_at"


def vacuum(lake_dir: str, manifest: Manifest, *, min_age_s: float = 0.0) -> int:
    """Remove version dirs no bucket references anymore. Returns count removed.

    With delta commits every version dir stays referenced until a compaction
    commit rewrites the buckets — run ``LakeTable.compact()`` first to
    de-reference old versions.

    Snapshot-isolation: a reader (``read_final``, a ``GraphServer``
    request's pinned ``lake_view``, a ``snapshot()`` time-travel handle)
    pins the FILE LIST of the manifest version it opened; commits never
    mutate published files (new versions only), so concurrent commits are
    safe — but ``vacuum`` deletes de-referenced version dirs, which breaks
    any reader still holding a pre-compaction view. ``min_age_s`` is the
    Iceberg/Delta-style retention window for exactly that interplay, and it
    is measured from **when vacuum first observed the dir de-referenced**
    (a marker file it drops on first sight), NOT from the dir's publish
    time — a dir published hours ago but de-referenced by a compaction one
    second ago still gets the full window. Run vacuum periodically:
    the first pass after a compaction only starts the clocks; a later pass
    reclaims dirs whose window has elapsed. The guarantee: a reader that
    pinned its manifest while the dir was still referenced has at least
    ``min_age_s`` seconds (from the marking pass) to finish. The default
    0.0 keeps the aggressive reclaim-everything behavior for offline
    maintenance (and ignores markers entirely)."""
    live = {
        f.split("/", 1)[0]
        for b in manifest.data["buckets"].values()
        for f in b["files"]
    }
    now = time.time()
    removed = 0
    for name in os.listdir(lake_dir):
        if not (
            name.startswith("v")
            and name[1:].isdigit()
            and int(name[1:]) <= manifest.version
            and name not in live
        ):
            continue
        path = os.path.join(lake_dir, name)
        if min_age_s > 0:
            marker = os.path.join(path, _DEREF_MARKER)
            try:
                with open(marker, "x") as f:
                    f.write(repr(now))
                continue  # first sighting: the retention clock starts now
            except FileExistsError:
                try:
                    with open(marker) as f:
                        marked_at = float(f.read())
                except (OSError, ValueError):
                    marked_at = now  # unreadable marker: restart the clock
                    try:
                        with open(marker, "w") as f:
                            f.write(repr(now))
                    except OSError:
                        pass
                if now - marked_at < min_age_s:
                    continue  # inside the retention window
            except OSError:
                continue  # dir raced away under a concurrent vacuum
        shutil.rmtree(path, ignore_errors=True)
        removed += 1
    return removed
