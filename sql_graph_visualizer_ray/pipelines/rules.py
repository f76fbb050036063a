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
from .relational import apply_node_rule, apply_relationship_rule, read_table, union_nodes


def run_rules(
    sf_dir: str, rs: RuleSet, *, num_partitions: int = 4
) -> dict[str, rd.Dataset]:
    """Execute every rule in priority order; returns rule name -> output
    Dataset (nodes for node rules, edges for relationship rules)."""
    problems = rs.validate()
    if problems:
        raise ValueError("invalid rule set: " + "; ".join(problems))
    node_sets: dict[str, list[rd.Dataset]] = {}
    outputs: dict[str, rd.Dataset] = {}
    for r in rs.ordered():
        if isinstance(r, NodeRule):
            out = apply_node_rule(read_table(sf_dir, r.source_table), r)
            outputs[r.name] = out
            node_sets.setdefault(r.target_type, []).append(out)
        else:
            assert isinstance(r, RelationshipRule)
            src = union_nodes(node_sets[r.source_type])
            tgt = union_nodes(node_sets[r.target_type])
            outputs[r.name] = apply_relationship_rule(
                src, tgt, r, num_partitions=num_partitions
            )
    return outputs
