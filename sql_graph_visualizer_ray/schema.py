"""Canonical Arrow schemas + schema-evolution policy.

The reference discovers schemas dynamically from ``INFORMATION_SCHEMA``
(``/root/reference/internal/infrastructure/persistence/mysql/repository.go:222-259``)
and silently tolerates missing columns
(``/root/reference/internal/domain/aggregates/transform/transform_rule_aggregate.go:77-84``).
We make the same tolerance explicit: every batch is normalized to a *target*
schema computed by Arrow schema unification with permissive promotion
(column-add -> null-fill; int widen allowed; narrowing forbidden).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Transcript payload (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

#: Public columns of the maintained lake table, in canonical order.
TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# ---------------------------------------------------------------------------
# Change events (binlog/WAL-tail stand-in; FIXTURES.md §2)
# ---------------------------------------------------------------------------

#: Replay-order / fencing columns prepended to the payload.
CHANGE_EVENT_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("epoch", pa.int32()),
        ("op", pa.string()),  # "I" | "U" | "D"
    ]
    + list(TRANSCRIPT_SCHEMA)
)

#: Hidden columns persisted in lake files (never exposed in the read view).
#: _lsn: winner's lsn (tie-break vs future equal-ts events);
#: _op:  "I"/"U" live row, "D" tombstone (retained so a late, older-ts event
#:       replayed after the delete cannot resurrect the row — see
#:       SURVEY.md §7.4 "Tombstone compaction").
LAKE_HIDDEN_COLUMNS = ["_lsn", "_op", "_bucket"]


def lake_schema(payload_schema: pa.Schema) -> pa.Schema:
    """Schema of a lake partition file for a given (possibly evolved) payload."""
    return pa.schema(
        list(payload_schema)
        + [("_lsn", pa.int64()), ("_op", pa.string()), ("_bucket", pa.int32())]
    )


# ---------------------------------------------------------------------------
# Evolution policy
# ---------------------------------------------------------------------------


def unify(schemas: list[pa.Schema]) -> pa.Schema:
    """Unify schemas permissively (column add, int32->int64 widen).

    Raises on incompatible changes (e.g. string -> int), which is the
    "narrowing forbidden" half of the policy.
    """
    return pa.unify_schemas(list(schemas), promote_options="permissive")


def normalize_table(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``target``: missing columns null-filled, compatible
    casts applied, column order canonicalized. Zero-copy when already
    conforming."""
    if table.schema == target:
        return table
    n = table.num_rows
    cols = []
    for field in target:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(cols, schema=target)
