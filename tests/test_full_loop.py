"""End-to-end production loop: incremental producer → tail ingest →
change-feed consumer → compaction, with the exported deltas LWW-replaying
to the oracle state.

This is the wiring a real deployment runs continuously — each piece has
its own tests; this one pins that they compose: EpochWriter's atomic
epoch publication, tail()'s watermark micro-batching, ChangeFeedCursor's
at-least-once export between commits, and compact() folding files only
AFTER the consumer has drained them.
"""

import glob
import os

import duckdb
import pyarrow.parquet as pq
import pytest

from sql_graph_visualizer_ray.pipelines.cdc import LakeTable
from sql_graph_visualizer_ray.pipelines.feed import ChangeFeedCursor, drain
from sql_graph_visualizer_ray.pipelines.oracle import replay_oracle
from sql_graph_visualizer_ray.pipelines.streaming import tail
from sql_graph_visualizer_ray.sources.adapter import EpochWriter
from sql_graph_visualizer_ray.sources.changelog import (
    ChangelogSpec,
    epoch_files,
    materialize,
)

from test_delta_compaction import canonical

SPEC = ChangelogSpec(n_events=8_000, n_convs=200, n_epochs=4, seed=91)


def test_producer_tail_feed_compact_loop(tmp_path):
    src = materialize("unit-loop", SPEC)
    live = str(tmp_path / "live")
    lake_dir = str(tmp_path / "lake")
    out = str(tmp_path / "export")
    writer = EpochWriter(live)
    cursor = ChangeFeedCursor(str(tmp_path / "cursor.json"))

    delivered = []
    for e, path in epoch_files(src):
        # producer publishes one epoch (atomic tmp+rename inside)
        writer.write_epoch(pq.read_table(path).drop_columns(["epoch"]))
        # tail catches up to exactly this epoch and commits
        lake = tail(
            live,
            lake_dir,
            num_buckets=8,
            stop_after_epoch=e,
            idle_timeout=5.0,
            poll_interval=0.05,
        )
        # consumer drains the new commit(s) BEFORE compaction can fold them
        delivered += drain(lake, cursor, out)
        if e == 1:
            # mid-stream compaction: folds drained deltas; the cursor is
            # already past them so the feed contract is intact
            lake.compact(min_files=2)
    assert lake.manifest.applied_epoch == SPEC.n_epochs - 1
    assert cursor.lag(lake) == 0
    assert len(delivered) >= SPEC.n_epochs  # one data commit per epoch

    # the exported deltas, LWW-replayed by an independent engine (DuckDB),
    # reconstruct the lake's final live state == the changelog oracle
    files = sorted(glob.glob(os.path.join(out, "v*", "*.parquet")))
    assert files
    con = duckdb.connect()
    replayed = con.execute(
        f"""
        WITH ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY ts DESC, lsn DESC) rn
          FROM read_parquet({files!r}))
        SELECT conv_id, turn_idx, role, text, tool, ts FROM ranked
        WHERE rn = 1 AND op <> 'D' ORDER BY conv_id, turn_idx
        """
    ).arrow()
    want = replay_oracle(src)
    got = canonical(replayed.select(want.column_names))
    assert got.equals(canonical(want)), "exported feed diverged from oracle"
    # and the lake itself agrees
    assert canonical(lake.final_table()).equals(canonical(want))
