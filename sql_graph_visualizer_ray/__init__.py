"""sql_graph_visualizer_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the data-processing capabilities of
``peter7775/sql-graph-visualizer`` (reference at ``/root/reference``, Go) as an
idiomatic Ray Data engine:

- change-event tail -> keyed last-writer-wins merge -> partitioned Parquet lake
  tables (the reference's ``AddNode`` upsert, ``graph_aggregate.go:46-59``,
  generalized to an LSM-style keyed merge with tombstones),
- rule-driven projection / relationship transforms (``transform_rule_aggregate.go``),
- schema evolution by Arrow schema unification,
- exactly-once resume via epoch-fenced commits and a per-partition manifest,
- plus the large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) a 100 TB pipeline needs.

Nothing here calls ``ray.init()``; the host (driver, bench.py, or the test
fixture) owns the Ray session.
"""

__version__ = "0.1.0"


def _settle_fsspec_http_import() -> None:
    """Make ``fsspec.implementations.http`` import-stable for threads.

    Ray Data's path resolution lazily runs ``from
    fsspec.implementations.http import HTTPFileSystem`` on (some) dataset
    creations, catching only ``ModuleNotFoundError``. In environments
    without ``aiohttp`` that import FAILS anew on every attempt (Python
    evicts failed modules), and two driver threads creating datasets
    concurrently can race the partial module teardown — surfacing as
    ``ImportError: cannot import name 'HTTPFileSystem'``, which Ray does
    not catch. Concurrent writers (see ``tests/test_concurrency.py``) hit
    this reliably.

    Settle it once at package import: if the real module imports, done; if
    not, register a minimal stub whose ``HTTPFileSystem`` raises on USE.
    Local/shared-FS reads (all this engine does) never instantiate it;
    a genuine http:// read gets a clear error instead of a flaky race."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import sys
        import types

        try:
            import fsspec.implementations
        except ImportError:
            return  # no fsspec at all: Ray's ModuleNotFoundError path is fine

        stub = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # noqa: D401
            def __init__(self, *a, **kw):
                raise ImportError(
                    "fsspec HTTP support needs aiohttp, which is not "
                    "installed in this environment"
                )

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub
        fsspec.implementations.http = stub


_settle_fsspec_http_import()
