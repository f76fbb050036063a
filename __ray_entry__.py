"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replay at sf0.001; ``queries()`` exposes one
callable per implemented operator/pipeline from SURVEY.md §2 (+ the
training-data operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL for
every SQL-expressible query (same column names and value types — integer
cents for money, deterministic tie-breaks for top-k).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full changelog replay -> LWW-merged transcripts lake
    -> final-state read view, at sf0.001. Returns a pandas DataFrame (the
    driver contract allows Dataset | DataFrame; the merged final state is
    driver-small at sf0.001)."""
    from sql_graph_visualizer_ray.pipelines.queries import cdc_lww_merge

    return cdc_lww_merge("/root/testdata/sf0.001").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from sql_graph_visualizer_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from sql_graph_visualizer_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql("/root/testdata/sf0.01")
