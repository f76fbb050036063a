"""Stateful actor-pool stages for the CDC apply pipeline (T1/T2).

The reference's GraphAggregate is one mutable in-heap accumulator every rule
writes into (``/root/reference/internal/domain/aggregates/graph/graph_aggregate.go:23-28``);
its ``AddNode`` upsert is a linear-scan overwrite
(``graph_aggregate.go:46-59``). The scale-correct recast is a pool of
stateful workers, each owning the merge of whole key partitions:

- ``SpillMergeActor`` is a callable CLASS passed to
  ``map_batches(Cls, concurrency=(lo, hi))`` — construction cost (config,
  schemas, state-path index) is paid once per actor in ``__init__``; each
  ``__call__`` merges one or more complete buckets (LWW + tombstones) and
  writes their partition files. The per-actor ``merged_buckets`` counter
  rides back on the counter rows for lineage.

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


class SpillMergeActor:
    """Actor-pool worker for the spill exchange's merge phase: each call
    receives bucket IDs, reads that bucket's spill runs + persisted state
    inside the task, k-way merges them, writes the partition file.

    ``read_and_merge`` is the pipeline-built closure (spill root, state
    index, staging dir). ``empty_result`` is a zero-row table with the
    counter schema, returned when Ray hands the actor a zero-row batch
    (``pa.concat_tables([])`` would raise). The pool form lets a 256-node
    cluster pin ``concurrency=(nodes, 4*nodes)`` workers that amortize
    filesystem client setup across thousands of buckets.
    """

    def __init__(self, read_and_merge, empty_result: pa.Table | None = None):
        self.read_and_merge = read_and_merge
        self.empty_result = empty_result
        self.merged_buckets = 0

    def __call__(self, items: pa.Table) -> pa.Table:
        outs = []
        for bk in items.column("bucket").to_pylist():
            outs.append(self.read_and_merge(int(bk)))
            self.merged_buckets += 1
        if not outs:
            if self.empty_result is not None:
                return self.empty_result
            raise ValueError("empty batch and no empty_result schema given")
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
