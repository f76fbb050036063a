"""Continuous-ingest tail: follow a growing changelog directory.

This is the engine's binlog/WAL-tail stage. The reference never implemented
change detection — "Streaming Data: Real-time database change detection" is
an explicit roadmap item (``/root/reference/README.md:782``); its engine is
wipe-and-reload (``/root/reference/cmd/main.go:165-177``). Here the tail is a
poll loop over epoch files: every new complete epoch file becomes part of the
next epoch-fenced commit, so the lake table follows the source with
exactly-once semantics and no full refresh. A real deployment would swap the
directory poll for a Debezium/binlog consumer that writes the same epoch
files; everything downstream is unchanged.

The loop itself is driver-side control flow (tiny); all data movement stays
inside the streaming Dataset pipelines of ``LakeTable.apply``.
"""

from __future__ import annotations

import time

from .cdc import LakeTable


def tail(
    changelog_dir: str,
    lake_dir: str,
    *,
    num_buckets: int = 16,
    turn_shard_size: int | None = None,
    poll_interval: float = 0.5,
    idle_timeout: float = 10.0,
    stop_after_epoch: int | None = None,
    max_commits: int | None = None,
    auto_compact_files: int | None = 8,
    auto_split_bytes: int | None = 1 << 30,
    **apply_kw,
) -> LakeTable:
    """Apply new epochs as they appear until ``stop_after_epoch`` is reached
    (or the directory stays idle for ``idle_timeout`` seconds).

    ``auto_compact_files`` / ``auto_split_bytes`` are ON by default
    (compact at 8 files per bucket, split buckets past 1 GiB) so a naive
    long-running tail keeps per-bucket file counts and bytes bounded with
    no tuning; pass ``None``/0 to disable either.

    Each poll that finds >=1 new epoch produces ONE epoch-fenced commit
    (micro-batching: a burst of epochs lands in a single commit). Safe to
    kill at any point and restart — the manifest watermark resumes the tail.
    Commits run under ``commit_with_retry``: a concurrent writer winning the
    version CAS (an operator's CLI compact/split against the live lake)
    costs this loop a reload-and-retry, not its life.

    Writer contract (standard WAL semantics): epoch files must be published
    atomically (write tmp + rename) and IN EPOCH ORDER — the watermark is a
    high-water mark, so an epoch appearing after a later epoch was applied
    would be skipped.
    """
    lake = LakeTable.open(
        lake_dir, num_buckets=num_buckets, turn_shard_size=turn_shard_size
    )
    idle = 0.0
    commits = 0
    while True:
        counters = lake.commit_with_retry(
            # bound the apply at the stop epoch: a changelog that already
            # holds later epochs must not be applied past the requested
            # stop point in the first micro-batch
            lambda lk: lk.apply(
                changelog_dir, upto_epoch=stop_after_epoch, **apply_kw
            )
        )
        if counters.get("epochs", 0):
            idle = 0.0
            commits += 1
            if auto_compact_files:
                # size-tiered background compaction folded into the ingest
                # loop: delta file counts stay bounded while the tail runs
                lake.commit_with_retry(
                    lambda lk: lk.compact(min_files=auto_compact_files)
                )
            if auto_split_bytes:
                # bucket-size management folded into the ingest loop: a
                # bucket outgrowing the per-task memory bound splits before
                # the next commit (see LakeTable.maybe_auto_split)
                lake.commit_with_retry(
                    lambda lk: lk.maybe_auto_split(auto_split_bytes)
                )
            if max_commits is not None and commits >= max_commits:
                break
        if (
            stop_after_epoch is not None
            and lake.manifest.applied_epoch >= stop_after_epoch
        ):
            break
        if not counters.get("epochs", 0):
            idle += poll_interval
            if idle >= idle_timeout:
                break
            time.sleep(poll_interval)
    return lake
