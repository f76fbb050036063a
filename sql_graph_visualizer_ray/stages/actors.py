"""Stateful actor-pool stages for the CDC apply pipeline (T1/T2).

The reference's GraphAggregate is one mutable in-heap accumulator every rule
writes into (``/root/reference/internal/domain/aggregates/graph/graph_aggregate.go:23-28``);
its ``AddNode`` upsert is a linear-scan overwrite
(``graph_aggregate.go:46-59``). The scale-correct recast is a pool of
stateful workers, each owning the merge of whole key partitions:

- ``BucketMergeActor`` is a callable CLASS passed to
  ``map_batches(Cls, concurrency=(lo, hi))`` — construction cost (config,
  schemas, state-path index) is paid once per actor in ``__init__``; each
  ``__call__`` merges one or more complete buckets (LWW + tombstones) and
  writes their partition files. Per-actor ``merged_buckets`` /
  ``rows_written`` counters ride back on the counter rows for lineage.

Design note (LSM memtable): a cross-batch in-actor memtable (absorb many
batches, spill compacted runs on overflow) needs an end-of-stream flush
hook, which Ray Data's map_batches actor protocol does not provide — an
actor's unflushed buffer would be lost at pool teardown. The engine instead
gets LSM behavior from its pipeline structure: per-batch compaction
(combiner) -> per-bucket spill runs -> single k-way merge per bucket, all of
it restart-safe because every stage's output is idempotent under retry.
"""

from __future__ import annotations

import pyarrow as pa


class BucketMergeActor:
    """Actor-pool merge worker: one whole bucket (or several) per call.

    ``merge_fn`` is the serialized per-bucket merge closure built by the
    pipeline (it captures the state-path index, target schemas and staging
    dir). The actor adds what a task pool cannot: per-actor reusable
    resources and cumulative counters, initialized once.
    """

    def __init__(self, merge_fn, bucket_column: str = "_bucket"):
        self.merge_fn = merge_fn
        self.bucket_column = bucket_column
        self.merged_buckets = 0
        self.rows_in = 0

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = group.column(self.bucket_column)
        buckets = pc.unique(col).to_pylist()
        outs = []
        for bk in buckets:
            sub = (
                group
                if len(buckets) == 1
                else group.filter(pc.equal(col, bk))
            )
            outs.append(self.merge_fn(sub, int(bk)))
            self.merged_buckets += 1
            self.rows_in += sub.num_rows
        out = pa.concat_tables(outs)
        n = out.num_rows
        return out.append_column(
            "actor_merged_total", pa.array([self.merged_buckets] * n, pa.int64())
        )


class SpillMergeActor:
    """Actor-pool worker for the spill exchange's merge phase: each call
    receives bucket IDs, reads that bucket's spill runs + persisted state
    inside the task, k-way merges them, writes the partition file.

    ``read_and_merge`` is the pipeline-built closure (spill root, state
    index, staging dir). The pool form lets a 256-node cluster pin
    ``concurrency=(nodes, 4*nodes)`` workers that amortize filesystem client
    setup across thousands of buckets.
    """

    def __init__(self, read_and_merge):
        self.read_and_merge = read_and_merge
        self.merged_buckets = 0

    def __call__(self, items: pa.Table) -> pa.Table:
        outs = []
        for bk in items.column("bucket").to_pylist():
            outs.append(self.read_and_merge(int(bk)))
            self.merged_buckets += 1
        out = pa.concat_tables(outs)
        n = out.num_rows
        return out.append_column(
            "actor_merged_total", pa.array([self.merged_buckets] * n, pa.int64())
        )


def taskify(make):
    """Wrap a zero-arg stage factory (a callable class, often a closure
    class holding a broadcast ``ObjectRef``) as a stateless ``map_batches``
    task function with ONE cached instance per worker process: Ray
    deserializes the closure once per worker, so the factory (and any
    ``ray.get`` inside its ``__init__``) runs once per process, per
    execution. Same setup-once amortization as an actor pool, none of the
    pool's startup latency — which measurably dominates lightweight stages
    at small scale (see textfns module docstring for the measurements).
    Keep REAL actor pools for heavy state (e.g. multimodal model weights)
    or when per-actor lifetime state must accumulate (SpillMergeActor)."""
    cache: list = []

    def fn(batch):
        if not cache:
            cache.append(make())
        return cache[0](batch)

    if hasattr(make, "__name__"):
        fn.__name__ = make.__name__
    return fn
