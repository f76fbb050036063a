"""Edge cases of the join/sizing layer: empty join sides, broadcast-join
schema stability, metadata-only partition sizing, lineage-kernel contract."""

import os

import pyarrow as pa
import pytest

import ray.data as rd

from sql_graph_visualizer_ray.pipelines.relational import (
    _plan_size_estimate,
    broadcast_join,
    hash_join,
    sized_partitions,
)
from sql_graph_visualizer_ray.stages.apply import compact_with_lineage


def test_hash_join_empty_side_short_circuits(ray_session):
    """Ray 2.49's hash join crashes when a side is entirely empty (empty
    shuffle partitions lose their schema); an inner join must instead
    return an empty result with the joined schema."""
    r = rd.from_arrow(pa.table({"k": [1] * 3, "w": [7, 8, 9], "v": [1, 2, 3]}))
    le = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    out = hash_join(le, r, on="k")
    # column naming mirrors Ray's join: right key folds away, collisions
    # get the _r suffix
    assert out.schema().names == ["k", "v", "w", "v_r"]
    assert out.count() == 0
    # and the other side too
    assert hash_join(r, le, on="k").count() == 0


def test_broadcast_left_join_schema_stable(ray_session):
    """A left-join batch with unmatched keys must not upcast the small
    side's int columns to float64 (pandas NaN fill) — nulls, same type."""
    big = rd.from_arrow(pa.table({"k": [1, 2, 99, 100], "x": [0.1, 0.2, 0.3, 0.4]}))
    small = rd.from_arrow(pa.table({"k": [1, 2], "iv": pa.array([10, 20], pa.int64())}))
    j = broadcast_join(big, small, left_key="k", right_key="k", how="left")
    sch = j.schema().base_schema
    assert sch.field("iv").type == pa.int64()
    rows = sorted(j.take_all(), key=lambda r: r["k"])
    assert [r["iv"] for r in rows] == [10, 20, None, None]


def test_sized_partitions_never_executes_lazy_input(ray_session, tmp_path):
    """Partition sizing must come from plan metadata only — Dataset.
    size_bytes() on a lazy map_batches pipeline would materialize BOTH
    join sides before the join starts."""
    marker = str(tmp_path / "executed")

    def probe(t: pa.Table) -> pa.Table:
        open(marker, "w").write("x")
        return t

    base = rd.from_arrow(pa.table({"k": list(range(100))}))
    lazy = base.map_batches(probe, batch_format="pyarrow")
    assert _plan_size_estimate(lazy) is not None  # sized from the input op
    assert sized_partitions(lazy, lazy) >= 2
    assert not os.path.exists(marker), "sizing executed the lazy pipeline"


def test_compact_with_lineage_rejects_tombstone_drop():
    """Dropping winning tombstones can drop the row carrying the late
    count; the lineage variant forbids it (use lww_compact instead)."""
    t = pa.table(
        {
            "conv_id": ["a"],
            "turn_idx": [0],
            "ts": pa.array([1], pa.timestamp("us")),
            "lsn": [1],
            "op": ["D"],
        }
    )
    with pytest.raises(ValueError, match="keep_tombstones"):
        compact_with_lineage(t, keep_tombstones=False)


def test_empty_side_edge_rule_keeps_string_schema(ray_session):
    """An edge rule whose node-set filter matched nothing must emit
    STRING-typed relation_type/direction (untyped pa.array([]) infers
    null) so unions with non-empty rules' outputs stay schema-stable."""
    import pyarrow as pa

    from sql_graph_visualizer_ray.config import RelationshipRule
    from sql_graph_visualizer_ray.pipelines.relational import (
        apply_relationship_rule,
    )

    src_empty = rd.from_arrow(pa.table({"id": pa.array([], pa.int64())}))
    src_full = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64())}))
    dst = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64())}))
    rule = RelationshipRule(name="r", relation_type="REL")
    empty_out = apply_relationship_rule(src_empty, dst, rule)
    assert empty_out.count() == 0
    # the consumer contract: unioning an empty rule's output with a
    # non-empty rule's must neither crash nor poison the string columns
    full_out = apply_relationship_rule(src_full, dst, rule)
    u = full_out.union(empty_out).materialize()
    sch = u.schema().base_schema
    assert sch.field("relation_type").type == pa.string()
    assert sch.field("direction").type == pa.string()
    assert u.count() == 2
    # and the typed-constants guarantee at the batch level: a zero-row
    # block through the tag path keeps string columns (no null inference)
    zero = pa.table(
        {
            "relation_type": pa.array(["REL"] * 0, pa.string()),
            "direction": pa.array(["outgoing"] * 0, pa.string()),
        }
    )
    assert zero.schema.field("relation_type").type == pa.string()


def test_cooccurrence_hot_group_decomposition_parity(ray_session):
    """A hot group (one group owning most items) must produce EXACTLY the
    same counted pair set in the decomposed regime (group_cap forced tiny,
    the group fans into bounded chunk-pair tasks) as in the unchunked
    regime (cap above every group) — and both must equal a brute-force
    pandas oracle. This pins the chunk-pair routing to the unchunked
    semantics, the same parity proof style as the MinHash miner."""
    import itertools

    import pandas as pd

    from sql_graph_visualizer_ray.pipelines.relational import (
        cooccurrence_pairs,
    )

    rows = []
    # hot group 'H': 500 items (12_4750 pairs if unbounded in one task)
    rows += [{"g": "H", "item": i * 3 + 1} for i in range(500)]
    # normal groups, overlapping items so cross-group counts exceed 1
    for gi in range(20):
        rows += [{"g": f"g{gi}", "item": (gi * 7 + k * 11) % 90} for k in range(8)]
    # duplicate (group, item) rows must not inflate counts in either regime
    rows += rows[:40]
    ds = rd.from_items(rows)

    def run(cap):
        return (
            cooccurrence_pairs(
                ds, group_col="g", item_col="item", group_cap=cap, num_parts=8
            )
            .to_pandas()
            .sort_values(["item_a", "item_b"])
            .reset_index(drop=True)
        )

    decomposed = run(64)     # H (500 items) fans into ceil(500/64)=8 chunks
    unchunked = run(10_000)  # every group under the cap: original path

    # brute-force oracle
    df = pd.DataFrame(rows).drop_duplicates()
    want: dict[tuple, int] = {}
    for _, sub in df.groupby("g"):
        for a, b in itertools.combinations(sorted(set(sub["item"])), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    oracle = (
        pd.DataFrame(
            [(a, b, n) for (a, b), n in want.items()],
            columns=["item_a", "item_b", "n_shared"],
        )
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        decomposed, unchunked.astype(decomposed.dtypes.to_dict())
    )
    pd.testing.assert_frame_equal(
        decomposed.astype({"n_shared": "int64"}),
        oracle.astype({"item_a": decomposed.item_a.dtype,
                       "item_b": decomposed.item_b.dtype,
                       "n_shared": "int64"}),
    )
