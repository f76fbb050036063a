"""Query-deadline execution (S2).

The reference guards every repository query with a context deadline
(``/root/reference/internal/infrastructure/persistence/mysql/repository.go:50-60``
``context.WithTimeout``). A Ray Data pipeline is lazy and streaming, so the
deadline wraps CONSUMPTION: batches are pulled with a wall-clock budget and
the streaming executor is shut down the moment it expires (closing the
iterator releases the executor and its in-flight tasks — nothing keeps
running in the background).
"""

from __future__ import annotations

import time

import pyarrow as pa

import ray.data as rd


class QueryTimeoutError(TimeoutError):
    """Raised when a bounded query exceeds its deadline."""

    def __init__(self, seconds: float, rows_so_far: int):
        super().__init__(
            f"query exceeded {seconds:.3f}s deadline ({rows_so_far} rows consumed)"
        )
        self.seconds = seconds
        self.rows_so_far = rows_so_far


def collect_with_timeout(
    ds: rd.Dataset, timeout_s: float, *, batch_size: int = 65_536
) -> pa.Table:
    """Materialize ``ds`` driver-side unless the deadline passes first.

    The deadline is checked between batches — granularity is one batch, the
    same granularity the reference's row-scan loop had between ``rows.Next()``
    calls. On expiry the batch iterator is closed (tearing down the streaming
    executor) and ``QueryTimeoutError`` carries the partial row count.
    """
    deadline = time.monotonic() + timeout_s
    tables: list[pa.Table] = []
    rows = 0
    it = ds.iter_batches(batch_size=batch_size, batch_format="pyarrow")
    try:
        for batch in it:
            tables.append(batch)
            rows += batch.num_rows
            if time.monotonic() > deadline:
                raise QueryTimeoutError(timeout_s, rows)
    finally:
        close = getattr(it, "close", None)
        if close is not None:
            close()
    if not tables:
        schema = ds.schema()  # None for a schemaless empty dataset
        return pa.Table.from_batches(
            [], schema=schema.base_schema if schema is not None else pa.schema([])
        )
    return pa.concat_tables(tables, promote_options="permissive")
