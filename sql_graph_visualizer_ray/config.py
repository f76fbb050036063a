"""Declarative transform rules — the engine's primary user-extension surface.

Mirrors the reference's YAML ``transform_rules``
(``/root/reference/internal/domain/valueobjects/transform/rule_type.go:27-40``,
parsed at ``/root/reference/internal/domain/repositories/configrule/config_rule_repository.go:73-141``):
a rule is either a *node* rule (projection + rename + computed properties over
one source table) or a *relationship* rule (key-equality join between two node
sets). Where the reference pushes SQL strings at MySQL, we express the same
semantics as declarative specs compiled to vectorized Arrow kernels inside
``map_batches`` — no SQL engine in the hot path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Predicate:
    """column <op> value — compiled to a pyarrow.compute filter.

    op: ``== != < <= > >= in not_null is_null``
    (the reference pushes these into rule SQL WHERE clauses, e.g.
    ``/root/reference/config/config.yml:189,251``).
    """

    column: str
    op: str
    value: object = None


@dataclass(frozen=True)
class Computed:
    """A computed property (the reference's in-SQL scalar functions, M10).

    kind: ``concat`` (parts = literals and ``col:`` refs),
    ``arith`` (left op right, cols or literals).
    """

    name: str
    kind: str
    parts: tuple = ()
    op: str = ""


@dataclass(frozen=True)
class NodeRule:
    """Projection + rename + tag — the reference's ``transformToNode``
    (``transform_rule_aggregate.go:71-87``): copy ``row[src] -> out[dst]`` per
    field mapping, tag ``node_type``; missing source columns are skipped
    silently (matching reference behavior)."""

    name: str
    source_table: str
    target_type: str
    field_mappings: dict[str, str]  # src col -> output property
    key_property: str = "id"
    filters: tuple[Predicate, ...] = ()
    computed: tuple[Computed, ...] = ()
    limit: int | None = None
    priority: int = 1


@dataclass(frozen=True)
class RelationshipRule:
    """Key-equality join between two node sets — the reference's
    ``createRelationshipsFromExistingNodes`` nested-loop join
    (``transform_service.go:361-444``) re-expressed as a hash join.

    Dangling edges (an endpoint key with no matching node) are dropped, as in
    ``AddRelationship`` (``graph_aggregate.go:73-133``); ``collect_dangling``
    routes them to a dead-letter output instead of a silent warning."""

    name: str
    relation_type: str
    direction: str = "outgoing"
    source_type: str = ""  # node_type of the source side
    target_type: str = ""
    source_id: str = "id"  # property identifying the source node
    target_id: str = "id"
    source_match: str = "id"  # property on source nodes used for key equality
    target_match: str = "id"
    properties: dict[str, str] = field(default_factory=dict)
    priority: int = 2


# ---------------------------------------------------------------------------
# YAML rule repository (S8 + rule CRUD)
#
# Mirrors the reference's `transform_rules:` YAML section
# (``/root/reference/config/config.yml:156-511``) and its rule repository
# (``config_rule_repository.go:73-141`` parse, ``:48-71`` SaveRule /
# DeleteRule / UpdateRulePriority). Rules execute in ascending ``priority``
# (ties broken by name), node rules always before relationship rules —
# the reference's two-pass transform loop (``transform_service.go:87-186``).
# ---------------------------------------------------------------------------


def _predicate_from_dict(d: dict) -> Predicate:
    return Predicate(column=d["column"], op=d["op"], value=d.get("value"))


def _computed_from_dict(d: dict) -> Computed:
    return Computed(
        name=d["name"],
        kind=d["kind"],
        parts=tuple(d.get("parts", ())),
        op=d.get("op", ""),
    )


def rule_from_dict(d: dict) -> "NodeRule | RelationshipRule":
    """One YAML mapping -> a typed rule (``rule_type: node | relationship``)."""
    kind = d.get("rule_type", "node")
    if kind == "node":
        return NodeRule(
            name=d["name"],
            source_table=d["source_table"],
            target_type=d["target_type"],
            field_mappings=dict(d.get("field_mappings", {})),
            key_property=d.get("key_property", "id"),
            filters=tuple(_predicate_from_dict(p) for p in d.get("filters", ())),
            computed=tuple(_computed_from_dict(c) for c in d.get("computed", ())),
            limit=d.get("limit"),
            priority=int(d.get("priority", 1)),
        )
    if kind == "relationship":
        return RelationshipRule(
            name=d["name"],
            relation_type=d["relation_type"],
            direction=d.get("direction", "outgoing"),
            source_type=d.get("source_type", ""),
            target_type=d.get("target_type", ""),
            source_id=d.get("source_id", "id"),
            target_id=d.get("target_id", "id"),
            source_match=d.get("source_match", "id"),
            target_match=d.get("target_match", "id"),
            properties=dict(d.get("properties", {})),
            priority=int(d.get("priority", 2)),
        )
    raise ValueError(f"unknown rule_type {kind!r} in rule {d.get('name')!r}")


def rule_to_dict(r: "NodeRule | RelationshipRule") -> dict:
    if isinstance(r, NodeRule):
        d = {
            "name": r.name,
            "rule_type": "node",
            "source_table": r.source_table,
            "target_type": r.target_type,
            "field_mappings": dict(r.field_mappings),
            "priority": r.priority,
        }
        if r.key_property != "id":
            d["key_property"] = r.key_property
        if r.filters:
            d["filters"] = [
                {"column": p.column, "op": p.op, "value": p.value} for p in r.filters
            ]
        if r.computed:
            d["computed"] = [
                {"name": c.name, "kind": c.kind, "parts": list(c.parts), "op": c.op}
                for c in r.computed
            ]
        if r.limit is not None:
            d["limit"] = r.limit
        return d
    return {
        "name": r.name,
        "rule_type": "relationship",
        "relation_type": r.relation_type,
        "direction": r.direction,
        "source_type": r.source_type,
        "target_type": r.target_type,
        "source_id": r.source_id,
        "target_id": r.target_id,
        "source_match": r.source_match,
        "target_match": r.target_match,
        "properties": dict(r.properties),
        "priority": r.priority,
    }


_PRED_OPS = {"==", "!=", "<", "<=", ">", ">=", "in", "not_null", "is_null"}


@dataclass(frozen=True)
class TableFilter:
    """Config-level table selection + per-table row predicates/limits — the
    reference's ``DataFilteringConfig``
    (``/root/reference/internal/domain/models/config.go:74-81``): blacklist
    beats whitelist, both case-insensitive
    (``mysql/repository.go:285-319`` applyTableFiltering/isInList),
    ``row_limit_per_table`` and per-table WHERE conditions apply at
    extraction time, BEFORE any rule-level filter. Where the reference
    carries WHERE as raw SQL strings, we use the same declarative
    ``Predicate`` specs the rules use — they compile to pyarrow filters."""

    whitelist: tuple[str, ...] = ()
    blacklist: tuple[str, ...] = ()
    row_limit_per_table: int | None = None
    where: dict[str, tuple[Predicate, ...]] = field(default_factory=dict)

    def allows(self, table: str) -> bool:
        t = table.lower()
        if t in {b.lower() for b in self.blacklist}:
            return False
        if self.whitelist:
            return t in {w.lower() for w in self.whitelist}
        return True

    def select(self, tables: "list[str]") -> "list[str]":
        return [t for t in tables if self.allows(t)]

    def where_for(self, table: str) -> tuple[Predicate, ...]:
        t = table.lower()
        for name, preds in self.where.items():
            if name.lower() == t:
                return preds
        return ()


def _table_filter_from_dict(d: dict) -> TableFilter:
    return TableFilter(
        whitelist=tuple(d.get("whitelist", ())),
        blacklist=tuple(d.get("blacklist", ())),
        row_limit_per_table=d.get("row_limit_per_table"),
        where={
            t: tuple(_predicate_from_dict(p) for p in preds)
            for t, preds in (d.get("where") or {}).items()
        },
    )


def _table_filter_to_dict(tf: TableFilter) -> dict:
    d: dict = {}
    if tf.whitelist:
        d["whitelist"] = list(tf.whitelist)
    if tf.blacklist:
        d["blacklist"] = list(tf.blacklist)
    if tf.row_limit_per_table is not None:
        d["row_limit_per_table"] = tf.row_limit_per_table
    if tf.where:
        d["where"] = {
            t: [{"column": p.column, "op": p.op, "value": p.value} for p in preds]
            for t, preds in tf.where.items()
        }
    return d


class RuleSet:
    """Ordered, persistable collection of transform rules.

    CRUD surface mirrors the reference's ConfigRuleRepository
    (``config_rule_repository.go:48-71``): save (add-or-replace by name),
    delete, update priority — all persisted by ``save_yaml``.
    """

    def __init__(
        self,
        rules: "list[NodeRule | RelationshipRule] | None" = None,
        tables: "TableFilter | None" = None,
    ):
        self.rules: list[NodeRule | RelationshipRule] = list(rules or [])
        self.tables: TableFilter = tables or TableFilter()

    # -- persistence ------------------------------------------------------
    @classmethod
    def load_yaml(cls, path: str) -> "RuleSet":
        import yaml

        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        if isinstance(doc, list):  # top-level-list rules file
            entries: list = doc
            tables = None
        else:
            entries = doc.get("transform_rules", [])
            tables = (
                _table_filter_from_dict(doc["tables"])
                if doc.get("tables")
                else None
            )
        return cls([rule_from_dict(d) for d in entries], tables=tables)

    def save_yaml(self, path: str) -> None:
        import yaml

        tmp = path + ".tmp"
        doc: dict = {"transform_rules": [rule_to_dict(r) for r in self.rules]}
        tf = _table_filter_to_dict(self.tables)
        if tf:
            doc["tables"] = tf
        with open(tmp, "w") as f:
            yaml.safe_dump(doc, f, sort_keys=False)
        os.replace(tmp, path)

    # -- CRUD -------------------------------------------------------------
    def get(self, name: str) -> "NodeRule | RelationshipRule | None":
        return next((r for r in self.rules if r.name == name), None)

    def save_rule(self, rule: "NodeRule | RelationshipRule") -> None:
        self.rules = [r for r in self.rules if r.name != rule.name] + [rule]

    def delete_rule(self, name: str) -> bool:
        before = len(self.rules)
        self.rules = [r for r in self.rules if r.name != name]
        return len(self.rules) != before

    def update_rule_priority(self, name: str, priority: int) -> None:
        import dataclasses

        r = self.get(name)
        if r is None:
            raise KeyError(name)
        self.save_rule(dataclasses.replace(r, priority=priority))

    # -- execution order / validation ------------------------------------
    def ordered(self) -> "list[NodeRule | RelationshipRule]":
        """Execution order: node rules (ascending priority, then name), then
        relationship rules likewise — relationship rules join the node sets
        the node pass produced, so the two-pass split is load-bearing."""
        nodes = sorted(
            (r for r in self.rules if isinstance(r, NodeRule)),
            key=lambda r: (r.priority, r.name),
        )
        rels = sorted(
            (r for r in self.rules if isinstance(r, RelationshipRule)),
            key=lambda r: (r.priority, r.name),
        )
        return nodes + rels

    def validate(self, known_tables: "set[str] | None" = None) -> list[str]:
        """Returns a list of problems (empty = valid) — the CLI's
        ``config validate`` (``/root/reference/cmd/sql-graph-cli/commands``)."""
        problems: list[str] = []
        seen: set[str] = set()
        node_types = {r.target_type for r in self.rules if isinstance(r, NodeRule)}
        for r in self.rules:
            if r.name in seen:
                problems.append(f"duplicate rule name {r.name!r}")
            seen.add(r.name)
            if isinstance(r, NodeRule):
                if not r.field_mappings:
                    problems.append(f"node rule {r.name!r} has no field_mappings")
                if known_tables is not None and r.source_table not in known_tables:
                    problems.append(
                        f"node rule {r.name!r} references unknown table "
                        f"{r.source_table!r}"
                    )
                for p in r.filters:
                    if p.op not in _PRED_OPS:
                        problems.append(
                            f"rule {r.name!r} filter op {p.op!r} not in {_PRED_OPS}"
                        )
            else:
                for side, t in (("source", r.source_type), ("target", r.target_type)):
                    if not t:
                        # run_rules would silently skip the rule (no node
                        # set keyed "") — a misconfiguration, not a valid
                        # table-filtered endpoint
                        problems.append(
                            f"relationship rule {r.name!r} has an empty "
                            f"{side}_type"
                        )
                    elif t not in node_types:
                        problems.append(
                            f"relationship rule {r.name!r} {side}_type {t!r} "
                            "matches no node rule"
                        )
        known_lower = (
            {k.lower() for k in known_tables} if known_tables is not None else None
        )
        for t, preds in self.tables.where.items():
            for p in preds:
                if p.op not in _PRED_OPS:
                    problems.append(
                        f"tables.where[{t!r}] op {p.op!r} not in {_PRED_OPS}"
                    )
            # case-insensitive like where_for (the reference's isInList):
            # a config that EXECUTES fine must also validate fine
            if known_lower is not None and t.lower() not in known_lower:
                problems.append(f"tables.where references unknown table {t!r}")
        if (
            self.tables.row_limit_per_table is not None
            and self.tables.row_limit_per_table <= 0
        ):
            problems.append("tables.row_limit_per_table must be positive")
        return problems
