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
