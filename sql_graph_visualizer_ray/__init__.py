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
