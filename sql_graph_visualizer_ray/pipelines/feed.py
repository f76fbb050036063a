"""Durable change-feed consumer (CDC-out): a pull cursor over the lake's
commit-by-commit delta feed.

The reference pushes graph updates to subscribers over WebSockets
(``/root/reference/internal/interfaces/websocket`` — serving layer, out of
scope per SURVEY.md); the data-engine counterpart is a durable PULL
consumer, shaped like a Kafka consumer group of one: ``poll()`` hands the
next unconsumed commit's delta Dataset, ``ack()`` advances a crash-safe
offset. Delivery is at-least-once — a crash between poll and ack
re-delivers the same commit; every fed row carries ``(conv_id, turn_idx,
lsn)`` so downstream effects can be made idempotent exactly the way the
lake's own LWW merge is.

The cursor file belongs to the CONSUMER, not the lake: any number of
independent consumers follow one lake, each at its own offset, with no
lake-side registration (the lake's delta files ARE the feed — serving a
consumer costs no lake IO at all, it is a metadata lookup).

Operational coupling to compaction: ``compact()`` folds delta files into
their base, destroying commit-granular feeds older than the fold. A
consumer that fell behind a compaction gets a loud ``KeyError`` from
``poll()`` (never silent data loss); run consumers ahead of compaction or
raise its ``min_files`` threshold.
"""

from __future__ import annotations

import json
import os

import ray.data as rd

from .cdc import LakeTable


class ChangeFeedCursor:
    """Crash-safe consumer offset over ``LakeTable.changes``.

    ``path`` is the consumer's durable state file (JSON, atomically
    replaced on ``ack``). A missing file starts from the beginning of the
    lake's history (``start_after`` overrides, e.g. to begin at the current
    head: ``ChangeFeedCursor(p, start_after=lake.manifest.version)``).
    """

    def __init__(self, path: str, *, start_after: int = 0):
        self.path = path
        if os.path.exists(path):
            with open(path) as f:
                self.acked = int(json.load(f)["acked_version"])
        else:
            self.acked = int(start_after)

    # -- consuming -----------------------------------------------------
    def _data_commits(self, lake: LakeTable):
        # one source of truth for "which commits carry servable data":
        # LakeTable.data_commits_after — adding a new metadata-only commit
        # marker there keeps the cursor and the HTTP /updates long-poll in
        # agreement. It yields ascending, so poll can stop at the FIRST
        # qualifying entry: drain() of an N-commit backlog stays O(N)
        # history entries total, not O(N^2).
        yield from lake.data_commits_after(self.acked)

    def lag(self, lake: LakeTable) -> int:
        """Unconsumed data commits between the cursor and the lake head."""
        return sum(1 for _ in self._data_commits(lake))

    def poll(self, lake: LakeTable) -> tuple[int, rd.Dataset] | None:
        """Next unconsumed commit as ``(version, delta Dataset)``; ``None``
        at the head. Compaction/split commits are skipped (they rewrite
        rows rather than change them). Two pending situations RAISE rather
        than skip, because skipping would silently lose changes: a
        ``commit_mode="rewrite"`` commit (its files are a full-state
        snapshot, not a delta — ``skip()`` past it deliberately and
        re-sync from ``read_final(version=...)``), and a feed that was
        compacted away (the consumer fell behind compaction)."""
        for v in self._data_commits(lake):
            return v, lake.changes(v)
        return None

    def skip(self, version: int) -> None:
        """Deliberately advance past an unservable commit (rewrite, or a
        compacted-away feed) WITHOUT consuming it. The consumer must
        re-sync its derived state from a snapshot read
        (``lake.read_final(version=version)``) — that is the documented
        contract, not a footgun: ``poll`` refuses to hide the gap."""
        self.ack(version)

    def resync(
        self, lake: LakeTable, out_dir: str, *, version: int | None = None
    ) -> int:
        """Recover from an unservable gap in ONE call: export the lake's
        FULL state as of ``version`` (default: the current head) to
        ``out_dir/v{N}`` and ack past it.

        This is the documented recovery for the two situations ``poll``
        refuses to paper over — the consumer fell behind a compaction
        (its pending delta feeds were folded away) or hit a
        ``commit_mode="rewrite"`` commit. Instead of hand-coding
        skip + snapshot export, the consumer calls ``resync`` and resumes
        ``poll``-ing deltas from there.

        The delivery is atomic like ``drain``'s (staging dir + rename) and
        carries a ``_FULL_STATE`` marker file so downstream knows to
        REPLACE its derived state rather than apply a delta; superseded
        older ``v*`` deliveries in ``out_dir`` are removed (their content
        is contained in the snapshot). The export KEEPS tombstones and the
        ``op``/``lsn`` meta columns: without the deletes' timestamps, a
        late (out-of-order) event in a subsequent delta would resurrect a
        deleted row in the consumer's LWW replay. Returns the synced
        version."""
        import shutil

        v = int(version if version is not None else lake.manifest.version)
        if v <= self.acked:
            raise ValueError(
                f"resync to v{v} does not advance the cursor (at {self.acked})"
            )
        ds = lake.read_final(version=v, keep_tombstones=True)
        _deliver(ds, out_dir, v, full_state=True)
        for n in os.listdir(out_dir):  # superseded delta deliveries
            if n.startswith("v") and n[1:].isdigit() and int(n[1:]) < v:
                shutil.rmtree(os.path.join(out_dir, n), ignore_errors=True)
            # crashed-drain staging dirs for versions the cursor is now past:
            # poll never re-delivers <= acked, so nothing else cleans them
            if (
                n.startswith("_v")
                and n.endswith(".writing")
                and n[2 : -len(".writing")].isdigit()
                and int(n[2 : -len(".writing")]) <= v
            ):
                shutil.rmtree(os.path.join(out_dir, n), ignore_errors=True)
        self.ack(v)
        return v

    def ack(self, version: int) -> None:
        """Durably advance past ``version`` (write-tmp + atomic replace)."""
        if version <= self.acked:
            raise ValueError(
                f"ack({version}) does not advance the cursor (at {self.acked})"
            )
        self.acked = int(version)
        d = os.path.dirname(self.path)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"acked_version": self.acked}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)


def _deliver(ds, out_dir: str, v: int, *, full_state: bool = False) -> None:
    """Atomic (re)delivery shared by ``drain`` and ``resync``: write to the
    ``_v{N}.writing`` staging dir, then rename into ``v{N}``. A crash
    between write and ack re-delivers the commit; naive write_parquet into
    the existing dir would APPEND a second copy of every row — the staging
    swap makes re-delivery overwrite instead. ``resync``'s crashed-staging
    GC keys off the SAME staging name, so the contract lives here in one
    place. ``full_state`` adds the ``_FULL_STATE`` marker (downstream must
    REPLACE derived state, not apply a delta)."""
    import shutil

    tmp = os.path.join(out_dir, f"_v{v}.writing")
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    if full_state:
        with open(os.path.join(tmp, "_FULL_STATE"), "w") as f:
            f.write(json.dumps({"version": v}))
    final = os.path.join(out_dir, f"v{v}")
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)


def drain(
    lake: LakeTable, cursor: ChangeFeedCursor, out_dir: str, *, max_polls: int | None = None
) -> list[int]:
    """Consume every pending commit to partitioned parquet
    (``out_dir/v{N}/``), acking after each successful write — the restart-
    safe export loop a downstream system would run from cron. Returns the
    versions delivered this call."""
    delivered: list[int] = []
    while max_polls is None or len(delivered) < max_polls:
        nxt = cursor.poll(lake)
        if nxt is None:
            break
        v, ds = nxt
        _deliver(ds, out_dir, v)
        cursor.ack(v)
        delivered.append(v)
    return delivered
