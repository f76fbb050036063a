"""Rule-driven relational transforms: nodes, relationships, joins, aggregates.

Ray-Data-native recast of the reference's two-pass transform loop
(``/root/reference/internal/application/services/transform/transform_service.go:87-186``:
node rules first, then relationship rules that join against the accumulated
node set). Here each rule compiles to a streaming Dataset pipeline; the "graph
aggregate" is never one in-memory object — node sets are Datasets, and edge
rules join them with either a broadcast lookup (small side) or Ray's
hash-partitioned ``Dataset.join`` (both sides large).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..config import Computed, NodeRule, Predicate, RelationshipRule

# ---------------------------------------------------------------------------
# Predicate / expression compilation (vectorized — no per-row Python)
# ---------------------------------------------------------------------------


def compile_predicate(preds: tuple[Predicate, ...]):
    def apply(t: pa.Table) -> pa.Table:
        mask = None
        for p in preds:
            col = t.column(p.column)
            if p.op == "==":
                m = pc.equal(col, pa.scalar(p.value))
            elif p.op == "!=":
                m = pc.not_equal(col, pa.scalar(p.value))
            elif p.op == "<":
                m = pc.less(col, pa.scalar(p.value))
            elif p.op == "<=":
                m = pc.less_equal(col, pa.scalar(p.value))
            elif p.op == ">":
                m = pc.greater(col, pa.scalar(p.value))
            elif p.op == ">=":
                m = pc.greater_equal(col, pa.scalar(p.value))
            elif p.op == "in":
                m = pc.is_in(col, value_set=pa.array(list(p.value)))
            elif p.op == "not_null":
                m = pc.is_valid(col)
            elif p.op == "is_null":
                m = pc.is_null(col)
            else:
                raise ValueError(f"unknown predicate op {p.op!r}")
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask) if mask is not None else t

    return apply


def compile_computed(c: Computed):
    """CONCAT / arithmetic computed columns (reference pushes these into rule
    SQL, e.g. CONCAT at ``/root/reference/config/config.yml:161``)."""

    def apply(t: pa.Table) -> pa.Array:
        if c.kind == "concat":
            arrs = []
            for part in c.parts:
                if isinstance(part, str) and part.startswith("col:"):
                    arrs.append(pc.cast(t.column(part[4:]), pa.string()))
                else:
                    arrs.append(pa.array([str(part)] * t.num_rows, pa.string()))
            return pc.binary_join_element_wise(*arrs, "")
        if c.kind == "arith":
            left, right = c.parts

            def val(x):
                return (
                    t.column(x[4:])
                    if isinstance(x, str) and x.startswith("col:")
                    else pa.scalar(x)
                )

            fn = {"+": pc.add, "-": pc.subtract, "*": pc.multiply, "/": pc.divide}[c.op]
            return fn(val(left), val(right))
        raise ValueError(f"unknown computed kind {c.kind!r}")

    return apply


# ---------------------------------------------------------------------------
# Node rules (M1/M3/M4/M9/M10)
# ---------------------------------------------------------------------------


def apply_node_rule(source: rd.Dataset, rule: NodeRule) -> rd.Dataset:
    """Project + rename + tag ``node_type`` per the rule — one zero-copy
    ``map_batches``. Missing mapped columns are skipped silently, matching
    ``transform_rule_aggregate.go:77-84``."""
    pred = compile_predicate(rule.filters)
    computed = [(c.name, compile_computed(c)) for c in rule.computed]
    mappings = dict(rule.field_mappings)
    ttype = rule.target_type

    def project(t: pa.Table) -> pa.Table:
        t = pred(t)
        cols, names = [], []
        for src, dst in mappings.items():
            if src in t.column_names:  # silent-skip of missing columns
                cols.append(t.column(src))
                names.append(dst)
        for name, fn in computed:
            cols.append(fn(t))
            names.append(name)
        cols.append(pa.array([ttype] * t.num_rows, pa.string()))
        names.append("node_type")
        return pa.Table.from_arrays(cols, names=names)

    out = source.map_batches(project, batch_format="pyarrow")
    if rule.limit is not None:
        out = out.limit(rule.limit)
    return out


def union_nodes(node_sets: list[rd.Dataset]) -> rd.Dataset:
    """Bag union of per-rule node outputs (the reference appends every rule's
    records into one aggregate, ``transform_service.go:87-139``)."""
    out = node_sets[0]
    for other in node_sets[1:]:
        out = out.union(other)
    return out


# ---------------------------------------------------------------------------
# Joins (J1/J2/J4) — broadcast for small sides, hash join for large
# ---------------------------------------------------------------------------


class _BroadcastJoiner:
    """Actor-pool stage: the small side is ``ray.put`` once and fetched in
    ``__init__`` (once per actor), then each batch does a vectorized hash
    lookup — no shuffle of the big side. This is the scale-correct form of the
    reference's O(N*M) nested loop (``transform_service.go:392-440``)."""

    def __init__(self, small_ref, left_key: str, how: str, suffix: str = "_r"):
        self.small = ray.get(small_ref)  # pandas DataFrame indexed by join key
        self.left_key = left_key
        self.how = how
        self.suffix = suffix
        # Arrow types of the small side's (non-index) columns, pinned once:
        # a left join batch with unmatched keys would otherwise upcast the
        # small side's int columns to float64 (pandas NaN fill), giving
        # per-block schema drift across batches
        self.right_types = {
            f.name: f.type
            for f in pa.Schema.from_pandas(self.small, preserve_index=False)
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        left = batch.to_pandas()
        joined = left.merge(
            self.small,
            left_on=self.left_key,
            right_index=True,
            how=self.how if self.how != "anti" else "left",
            suffixes=("", self.suffix),
            indicator=self.how == "anti",
        )
        if self.how == "anti":
            joined = joined[joined["_merge"] == "left_only"].drop(columns=["_merge"])
            joined = joined[list(left.columns)]
            return pa.Table.from_pandas(joined, preserve_index=False).cast(
                batch.schema
            )
        # pin every output column's type: left columns keep the batch's
        # types, small-side columns their broadcast types (NaN -> null)
        left_types = {f.name: f.type for f in batch.schema}
        fields = []
        for name in joined.columns:
            if name in left_types:
                fields.append(pa.field(name, left_types[name]))
            else:
                base = name
                if name.endswith(self.suffix) and name[: -len(self.suffix)] in self.right_types:
                    base = name[: -len(self.suffix)]
                fields.append(pa.field(name, self.right_types[base]))
        return pa.Table.from_pandas(
            joined, schema=pa.schema(fields), preserve_index=False
        )


def broadcast_join(
    big: rd.Dataset,
    small: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    how: str = "inner",
    concurrency=None,
) -> rd.Dataset:
    """Join ``big`` (streamed) against ``small`` (materialized once, broadcast
    via the object store). ``how``: inner | left | anti (semi-anti on keys).

    Runs as stateless TASKS with a per-worker cache cell (the closure is
    deserialized once per worker, so the ``ray.get`` of the broadcast side
    runs once per process) — the setup-once amortization of an actor pool
    without its startup latency. ``concurrency`` is accepted for explicit
    throttling; ``None`` lets the scheduler use every core."""
    small_df = small.to_pandas()
    small_df = small_df.set_index(right_key)
    ref = ray.put(small_df)
    cache: list = []

    def join_batch(batch: pa.Table) -> pa.Table:
        if not cache:
            cache.append(_BroadcastJoiner(ref, left_key, how))
        return cache[0](batch)

    kw = {} if concurrency is None else {"concurrency": concurrency}
    return big.map_batches(join_batch, batch_format="pyarrow", **kw)


def _plan_size_estimate(ds: rd.Dataset) -> int | None:
    """Byte-size estimate from PLAN METADATA ONLY — never executes.

    ``Dataset.size_bytes()`` silently falls back to ``plan.execute()`` when
    the final operator's metadata can't size it (any ``map_batches`` does
    this), which would MATERIALIZE both join sides in the sizing step right
    before a streaming join. Instead, walk the logical plan: an operator
    with known metadata contributes its size; an unsized transform falls
    back to the sum of its inputs' sizes — an upper bound under projection,
    which is the safe direction for partition sizing."""

    def walk(op) -> int | None:
        try:
            sz = op.infer_metadata().size_bytes
        except Exception:
            sz = None
        if sz is not None:
            return int(sz)
        deps = getattr(op, "input_dependencies", None)
        if not deps:
            return None
        total = 0
        for dep in deps:
            s = walk(dep)
            if s is None:
                return None
            total += s
        return total

    try:
        return walk(ds._logical_plan.dag)
    except Exception:
        return None


def sized_partitions(
    *datasets: rd.Dataset, per_partition_bytes: int = 64 << 20
) -> int:
    """Join/shuffle fan-in proportional to the DATA, clamped to the
    CLUSTER: bytes/64MB partitions, at least 2, at most 4x cluster CPUs.
    A fixed constant is wrong at both ends — 4 partitions starve a 256-node
    cluster, while hundreds of partitions on a laptop pay Ray's
    per-partition aggregator startup (~seconds) for nothing. Sizes come
    from plan metadata only (``_plan_size_estimate`` — never executes the
    inputs); falls back to CPU count when unknown (same sizing rule as the
    cdc hash exchange and the dedup text join)."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    sizes = [_plan_size_estimate(d) for d in datasets]
    if any(s is None for s in sizes):
        return max(2, cpus)
    size = sum(sizes)
    if not size:
        return 2
    return int(np.clip(size // per_partition_bytes, 2, 4 * cpus))


def _has_exchange(ds: rd.Dataset) -> bool:
    """True when the plan contains an all-to-all/join operator — ``limit``
    cannot early-stop through those, so an emptiness probe would execute
    the entire upstream. Name-based check on the logical plan; unknown
    shapes conservatively count as expensive (materializing is always
    safe, re-executing is the thing to avoid)."""

    def walk(op) -> bool:
        name = type(op).__name__.lower()
        if any(
            k in name
            for k in ("sort", "aggregate", "shuffle", "repartition", "join", "zip")
        ):
            return True
        return any(
            walk(d) for d in (getattr(op, "input_dependencies", None) or [])
        )

    try:
        return walk(ds._logical_plan.dag)
    except Exception:
        return True


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
    left_schema_hint: pa.Schema | None = None,
    right_schema_hint: pa.Schema | None = None,
) -> rd.Dataset:
    """Both-sides-large join via Ray's hash-partitioned ``Dataset.join``.
    ``num_partitions=None`` sizes the exchange to the inputs/cluster.

    Inner joins probe each side for one row first: Ray 2.49's hash join
    crashes when a side is entirely empty (the empty shuffle partitions
    lose their schema and the Acero kernel can't resolve the key field),
    so an empty side short-circuits to an empty result with the joined
    schema — e.g. a relationship rule whose node-set filter matched
    nothing returns zero edges instead of erroring. Map-only inputs
    early-stop the probe under ``limit(1)`` (~one block); an input whose
    plan contains an EXCHANGE (sort/aggregate/shuffle/join — limit cannot
    stop early through those) is materialized first so the probe and the
    join share one execution instead of running that upstream twice.
    Outer joins can't short-circuit this way; callers with
    legitimately-empty outer sides must guard themselves."""
    rkey = right_on or on
    if join_type == "inner":
        if _has_exchange(left):
            left = left.materialize()
        if _has_exchange(right):
            right = right.materialize()
    if join_type == "inner" and (
        not left.limit(1).take(1) or not right.limit(1).take(1)
    ):

        def _sch(ds: rd.Dataset, hint: pa.Schema | None) -> pa.Schema:
            # Ray cannot know the schema of an EMPTY mapped dataset (zero
            # blocks survive materialization) — the *_schema_hint params
            # exist for exactly this: callers that know their projection's
            # output schema pass it so the short-circuit can type the empty
            # result. Otherwise: a clear error beats Acero's deep crash.
            s = ds.schema(fetch_if_missing=True)
            if s is not None:
                return s.base_schema
            if hint is not None:
                return hint
            raise ValueError(
                "hash_join: an empty input's schema is unknowable (empty "
                "mapped Dataset) — pass left/right_schema_hint or supply a "
                "typed empty Dataset (rd.from_arrow(schema.empty_table()))"
            )

        lsch = _sch(left, left_schema_hint)
        rsch = _sch(right, right_schema_hint)
        lnames = set(lsch.names)
        fields = list(lsch)
        for f in rsch:
            if f.name == rkey:
                continue  # right key folds into the left key column
            name = f.name + "_r" if f.name in lnames else f.name
            fields.append(pa.field(name, f.type))
        return rd.from_arrow(pa.schema(fields).empty_table())
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions or sized_partitions(left, right),
        on=(on,),
        right_on=(rkey,),
        right_suffix="_r",
    )


def apply_relationship_rule(
    source_nodes: rd.Dataset,
    target_nodes: rd.Dataset,
    rule: RelationshipRule,
    *,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Build typed edges by matching two node sets on key properties
    (J1, ``transform_service.go:361-444``). Node sets are per-type Datasets —
    the reference keeps one heap bag and linear-scans it per endpoint lookup
    (O(E*N), ``graph_aggregate.go:108-133``); typed sets make this a single
    hash exchange. Non-matching endpoints produce no edge — the inner join IS
    the reference's dangling-edge drop (``graph_aggregate.go:98-106``)."""

    def side(ds: rd.Dataset, id_prop: str, match_prop: str, prefix: str):
        def project(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    f"{prefix}_id": t.column(id_prop),
                    f"{prefix}_match": t.column(match_prop),
                }
            )

        # projection schema hint: an EMPTY node set's mapped schema is
        # unknowable to Ray, but ours is a pure column selection — derive
        # it from the input so hash_join's empty-side short-circuit can
        # still type its result (a rule whose filter matched nothing)
        hint = None
        in_sch = ds.schema(fetch_if_missing=True)
        if in_sch is not None:
            b = in_sch.base_schema
            if id_prop in b.names and match_prop in b.names:
                hint = pa.schema(
                    [
                        (f"{prefix}_id", b.field(id_prop).type),
                        (f"{prefix}_match", b.field(match_prop).type),
                    ]
                )
        return ds.map_batches(project, batch_format="pyarrow"), hint

    src, lhint = side(source_nodes, rule.source_id, rule.source_match, "source")
    dst, rhint = side(target_nodes, rule.target_id, rule.target_match, "target")
    joined = hash_join(
        src, dst, on="source_match", right_on="target_match",
        num_partitions=num_partitions,
        left_schema_hint=lhint, right_schema_hint=rhint,
    )

    def tag(t: pa.Table) -> pa.Table:
        # constants pinned to pa.string(): a zero-row block (empty-side
        # join short-circuit) would otherwise infer null-typed columns and
        # break unions with non-empty rules' edge outputs
        return pa.table(
            {
                "source_id": t.column("source_id"),
                "target_id": t.column("target_id"),
                "relation_type": pa.array(
                    [rule.relation_type] * t.num_rows, pa.string()
                ),
                "direction": pa.array(
                    [rule.direction] * t.num_rows, pa.string()
                ),
            }
        )

    return joined.map_batches(tag, batch_format="pyarrow")


def lookup_by_keys(
    ds: rd.Dataset, key_col: str, keys: list
) -> rd.Dataset:
    """J3 direct-id lookup: fetch the rows whose ``key_col`` is in a known id
    set (the reference resolves relationship endpoints by direct node-id
    lookup, ``graph_aggregate.go:108-133``). The id set is a broadcast
    vectorized ``is_in`` semi-join — no shuffle, the big side streams."""
    value_set = pa.array(sorted(set(keys)))

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(key_col), value_set=value_set))

    return ds.map_batches(pick, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Coarse hash partitioning + self-join similarity pairs (J5)
# ---------------------------------------------------------------------------

#: coarse partition count for keyed windows / per-group work — sized so the
#: shuffle has enough parallelism while per-partition Python dispatch stays
#: negligible (the exact per-key split happens in C-level pandas groupby
#: INSIDE each partition)
NUM_PARTS = 64


def arrow_out(fn):
    """Wrap a pandas-in/pandas-out batch fn so the BLOCK it emits is Arrow.

    Any map stage whose output feeds an AllToAll (``groupby``/``sort``)
    must emit Arrow blocks: Ray's sort shuffle over pandas blocks pays a
    measured ~1.2 s PER BLOCK fixed cost (46-block aggregate of 92k tiny
    rows: 58.7 s with pandas blocks, 4.0 s with Arrow — BASELINE.md round
    5), which dwarfs the actual data movement. The fn keeps its pandas
    vectorization; only the handoff format changes."""
    import functools

    @functools.wraps(fn)
    def wrapped(b):
        return pa.Table.from_pandas(fn(b), preserve_index=False)

    return wrapped


def with_hash_part(
    ds: rd.Dataset, col: str, num_parts: int = NUM_PARTS
) -> rd.Dataset:
    """Append ``_part = stable_hash(col) % num_parts`` — the coarse exchange
    key for keyed windows and partial-count folds (shared by the events
    windows and several aggregation pipelines)."""

    def add(t: pa.Table) -> pa.Table:
        import pandas as pd

        h = pd.util.hash_array(
            np.asarray(t.column(col).to_numpy(zero_copy_only=False))
        )
        return t.append_column(
            "_part", pa.array((h % num_parts).astype(np.int32))
        )

    return ds.map_batches(add, batch_format="pyarrow")


def cooccurrence_pairs(
    ds: rd.Dataset,
    *,
    group_col: str,
    item_col: str,
    group_cap: int = 4096,
    num_parts: int = NUM_PARTS,
) -> rd.Dataset:
    """All (item_a < item_b) pairs sharing a group, counted across groups.

    SKEW SAFETY: a group with k items emits k*(k-1)/2 pairs, so a hot group
    would pin its whole O(k^2) triangle on one task. Pass 1 counts per-group
    distinct items with the composite-key shape of
    ``events.distinct_users_per_type``: per-batch (group, item) dedup, a
    hash exchange on the COMPOSITE pair (a hot group's items spread over
    ALL parts — no single task ever holds its raw row set), per-part
    partial counts, then a skew-free sum (each group contributes at most
    ``num_parts`` partial rows). Only groups past ``group_cap`` reach the
    driver. Pass 2 routes rows: normal groups take the coarse
    hash-partition path (per-group vectorized triangles inside a pandas
    groupby, every group <= group_cap items); each HOT group's items hash
    into C = ceil(k/group_cap) sub-chunks and every chunk PAIR (i <= j)
    becomes its own bounded task (<= 2*group_cap items, <= group_cap^2
    pairs) — the same triangle chunk-pair decomposition as
    ``similarity.lsh_near_dup_pairs`` / ``dedup._mine_candidates_skew_safe``,
    at the cost of replicating each hot member C times. Every unordered
    pair lands in EXACTLY one task (two chunk members meet only in their
    chunks' one pair task), so the emitted pair set is identical to the
    unchunked form — pinned by a cap-parity test
    (``tests/test_relational.py``). A second small groupby counts pair
    weights."""

    import pandas as pd

    sel = ds.select_columns([group_col, item_col])

    # ---- pass 1: hot groups (distinct items > group_cap) ----
    def batch_distinct(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(ignore_index=True)
        h = pd.util.hash_pandas_object(b[[group_col, item_col]], index=False)
        return b.assign(_part=(h.to_numpy() % num_parts).astype("int64"))

    def part_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop_duplicates([group_col, item_col])
            .groupby(group_col, sort=False, as_index=False)
            .size()
            .rename(columns={"size": "partial_n"})
        )
        out["partial_n"] = out["partial_n"].astype("int64")
        return out

    def keep_hot(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("n_items"), pa.scalar(group_cap)))

    from ray.data.aggregate import Sum

    hot_rows = (
        sel.map_batches(arrow_out(batch_distinct), batch_format="pandas")
        .groupby("_part")
        .map_groups(arrow_out(part_counts), batch_format="pandas")
        .groupby(group_col)
        .aggregate(Sum("partial_n", alias_name="n_items"))
        .map_batches(keep_hot, batch_format="pyarrow")
        .take_all()  # only the over-cap groups — small by construction
    )
    hot_id_map = {r[group_col]: i for i, r in enumerate(hot_rows)}
    C_by_hot = np.array(
        [-(-int(r["n_items"]) // group_cap) for r in hot_rows], dtype=np.int64
    )
    enc = int(C_by_hot.max()) + 1 if len(C_by_hot) else 1  # chunk-key radix

    # ---- pass 2: one routed exchange ----
    # normal rows -> _gkey = stable_hash(group) % num_parts (coarse path);
    # hot rows    -> C copies, _gkey = num_parts + (hot_id*enc + i)*enc + j
    def route(t: pa.Table) -> pa.Table:
        groups = np.asarray(t.column(group_col).to_numpy(zero_copy_only=False))
        items = np.asarray(
            t.column(item_col).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        keys = (pd.util.hash_array(groups) % num_parts).astype(np.int64)
        if hot_id_map:
            hid = pd.Series(groups).map(hot_id_map)
            is_hot = hid.notna().to_numpy()
        else:
            is_hot = np.zeros(len(items), dtype=bool)
        out_k = [keys[~is_hot]]
        out_g = [groups[~is_hot]]
        out_i = [items[~is_hot]]
        if is_hot.any():
            hid_h = hid.to_numpy()[is_hot].astype(np.int64)
            it_h = items[is_hot]
            C_arr = C_by_hot[hid_h]
            c = (pd.util.hash_array(it_h) % C_arr.astype(np.uint64)).astype(
                np.int64
            )
            idx = np.repeat(np.arange(len(it_h)), C_arr)
            starts = np.cumsum(C_arr) - C_arr
            i_seq = np.arange(int(C_arr.sum())) - np.repeat(starts, C_arr)
            c_rep = np.repeat(c, C_arr)
            lo = np.minimum(i_seq, c_rep)
            hi = np.maximum(i_seq, c_rep)
            out_k.append(num_parts + (np.repeat(hid_h, C_arr) * enc + lo) * enc + hi)
            out_g.append(np.repeat(groups[is_hot], C_arr))
            out_i.append(it_h[idx])
        return pa.table(
            {
                "_gkey": pa.array(np.concatenate(out_k), pa.int64()),
                group_col: pa.array(
                    np.concatenate(out_g), t.schema.field(group_col).type
                ),
                item_col: pa.array(np.concatenate(out_i), pa.int64()),
            }
        )

    def emit_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"item_a": pa.array([], pa.int64()), "item_b": pa.array([], pa.int64())}
        )
        key = int(g["_gkey"].iloc[0])
        if key < num_parts:  # coarse partition: per-group triangles
            outs_a: list[np.ndarray] = []
            outs_b: list[np.ndarray] = []
            for _, sub in g.groupby(group_col, sort=False):
                items = np.unique(sub[item_col].to_numpy())
                if len(items) < 2:
                    continue
                ia, ib = np.triu_indices(len(items), k=1)
                outs_a.append(items[ia])
                outs_b.append(items[ib])
            if not outs_a:
                return empty
            return pa.table(
                {
                    "item_a": pa.array(np.concatenate(outs_a), pa.int64()),
                    "item_b": pa.array(np.concatenate(outs_b), pa.int64()),
                }
            )
        # hot chunk-pair task: exactly one group, chunks i and j present.
        # Duplicated (group, item) rows route identically, so np.unique
        # inside the task dedupes them just like the coarse path.
        rel = key - num_parts
        hot_id, i, j = rel // (enc * enc), (rel // enc) % enc, rel % enc
        C = np.uint64(C_by_hot[hot_id])
        items = np.unique(g[item_col].to_numpy().astype(np.int64))
        c = (pd.util.hash_array(items) % C).astype(np.int64)
        if i == j:  # within-chunk: upper triangle
            side = items[c == i]
            if len(side) < 2:
                return empty
            ia, ib = np.triu_indices(len(side), k=1)
            a, b = side[ia], side[ib]
        else:  # cross-chunk: full bipartite, sides disjoint by residue
            sa, sb = items[c == i], items[c == j]
            if not len(sa) or not len(sb):
                return empty
            a_ = np.repeat(sa, len(sb))
            b_ = np.tile(sb, len(sa))
            a, b = np.minimum(a_, b_), np.maximum(a_, b_)
        return pa.table(
            {
                "item_a": pa.array(a, pa.int64()),
                "item_b": pa.array(b, pa.int64()),
            }
        )

    pairs = (
        sel.map_batches(route, batch_format="pyarrow")
        .groupby("_gkey")
        .map_groups(emit_pairs, batch_format="pandas")
    )
    from ray.data.aggregate import Count

    return pairs.groupby(["item_a", "item_b"]).aggregate(Count(alias_name="n_shared"))


# ---------------------------------------------------------------------------
# Table readers with pruning (S1/S3/M8/M9)
# ---------------------------------------------------------------------------


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """read_parquet with column pruning — the engine's ExecuteQuery/
    ExtractTableData equivalent (``mysql/repository.go:50-86``, ``:421-450``);
    predicates are applied by the caller as vectorized filters."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
