"""Priority-ordered execution of a YAML-loaded RuleSet.

The reference's transform service walks its configured rules in two passes —
all node rules, then all relationship rules joining the node sets the first
pass accumulated (``/root/reference/internal/application/services/transform/
transform_service.go:87-186``); rule priority orders work inside each pass
(``config_rule_repository.go:65-71`` UpdateRulePriority). Here each rule
compiles to a streaming Dataset pipeline and the "accumulated node set" is a
dict of per-type Datasets — nothing materializes until a sink consumes it.
"""

from __future__ import annotations

import ray.data as rd

from ..config import NodeRule, RelationshipRule, RuleSet
from .relational import (
    apply_node_rule,
    apply_relationship_rule,
    compile_predicate,
    read_table,
    union_nodes,
)


def _rule_columns(sf_dir: str, r: NodeRule, tf) -> list[str] | None:
    """Column-pruned read set for a node rule: mapped source columns,
    filter columns, ``col:`` refs in computed properties, and the table
    filter's WHERE columns — intersected with the file's actual schema so
    the documented missing-column tolerance (mappings silently skip)
    survives the pruning. Returns None (read everything) only if the
    intersection is empty, which keeps a misconfigured rule failing the
    same way it did unpruned."""
    import os

    import pyarrow.parquet as pq

    need = set(r.field_mappings)
    need |= {p.column for p in r.filters}
    for c in r.computed:
        need |= {
            p[4:]
            for p in c.parts
            if isinstance(p, str) and p.startswith("col:")
        }
    need |= {p.column for p in tf.where_for(r.source_table)}
    have = set(
        pq.read_schema(os.path.join(sf_dir, f"{r.source_table}.parquet")).names
    )
    cols = sorted(need & have)
    return cols or None


def run_rules(
    sf_dir: str, rs: RuleSet, *, num_partitions: int | None = None
) -> dict[str, rd.Dataset]:
    """Execute every rule in priority order; returns rule name -> output
    Dataset (nodes for node rules, edges for relationship rules).

    The rule set's ``tables:`` filter applies at extraction, mirroring the
    reference (filtered tables are never read —
    ``mysql/repository.go:285-309``; per-table WHERE / row limits go into
    the extraction query, ``models/config.go:74-81``): node rules over an
    excluded table are silently skipped, and relationship rules whose
    endpoint node sets were entirely filtered away are skipped with them."""
    problems = rs.validate()
    if problems:
        raise ValueError("invalid rule set: " + "; ".join(problems))
    tf = rs.tables
    node_sets: dict[str, list[rd.Dataset]] = {}
    outputs: dict[str, rd.Dataset] = {}
    for r in rs.ordered():
        if isinstance(r, NodeRule):
            if not tf.allows(r.source_table):
                continue
            src_ds = read_table(
                sf_dir, r.source_table, columns=_rule_columns(sf_dir, r, tf)
            )
            preds = tf.where_for(r.source_table)
            if preds:
                src_ds = src_ds.map_batches(
                    compile_predicate(preds), batch_format="pyarrow"
                )
            if tf.row_limit_per_table is not None:
                src_ds = src_ds.limit(tf.row_limit_per_table)
            out = apply_node_rule(src_ds, r)
            outputs[r.name] = out
            node_sets.setdefault(r.target_type, []).append(out)
        else:
            assert isinstance(r, RelationshipRule)
            if r.source_type not in node_sets or r.target_type not in node_sets:
                continue  # an endpoint's source tables were filtered out
            src = union_nodes(node_sets[r.source_type])
            tgt = union_nodes(node_sets[r.target_type])
            outputs[r.name] = apply_relationship_rule(
                src, tgt, r, num_partitions=num_partitions
            )
    return outputs
