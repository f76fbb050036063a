"""Single-process reference applier (plain pyarrow, no Ray).

The reference's tests assert only counts (SURVEY.md §5); this oracle is the
byte-for-byte substitute: replay the whole changelog in one process with the
same LWW kernel and produce the final transcripts table. Tests compare the
distributed pipeline's output against this, and the driver's DuckDB oracle SQL
expresses the same thing relationally.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import TRANSCRIPT_COLUMNS, normalize_table, unify
from ..sources.changelog import epoch_files
from ..stages.apply import lww_compact


def replay_oracle(changelog_dir: str, max_epoch: int | None = None) -> pa.Table:
    """Final table state after replaying every change event (≤ max_epoch).

    Handles schema evolution the same way the engine does: unify all file
    schemas permissively, normalize each file, then LWW-merge.
    """
    files = [p for e, p in epoch_files(changelog_dir) if max_epoch is None or e <= max_epoch]
    schemas = [pq.read_schema(p) for p in files]
    target = unify(schemas)
    tables = [normalize_table(pq.read_table(p), target) for p in files]
    merged = lww_compact(pa.concat_tables(tables), keep_tombstones=False)
    cols = [c for c in TRANSCRIPT_COLUMNS if c in merged.column_names] + [
        c for c in merged.column_names if c not in TRANSCRIPT_COLUMNS and c not in ("lsn", "epoch", "op")
    ]
    return merged.select(cols)
