"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows (SURVEY.md §2.9 — the reference has no
streaming dataflow either, only poll-loop monitoring at
``/root/reference/internal/application/services/performance/realtime_performance_monitor.go:287-303``).
Windows are COARSE-partitioned: the Ray exchange moves ``hash(user) % P``
partitions (one Python dispatch per partition, not per key), and the window
logic inside each partition is vectorized numpy/pandas across ALL of the
partition's users at once. The partitioning assumption (all of a key's
events co-located) is exactly the engine's conv_id bucketing assumption —
and every operator that relies on it carries a ``max_rows_per_task``
escape hatch (``_heavy_chunk_plan``) for keys that outgrow one task:
sessionize time-chunks + exact seam merge, the as-of join time-chunks +
driver prefix-scanned carry-ins, the range join time-chunks with
window-width overlap. Operators whose kernel is associative (last-per-key,
per-key aggregates, distinct counts, top-k) need no hatch at all: they
pre-reduce per batch, so no task ever holds a key's full history.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

# NUM_PARTS / with_hash_part live in relational (shared with
# cooccurrence_pairs); re-exported here for the window operators' callers
from .relational import (  # noqa: F401
    NUM_PARTS,
    arrow_out,
    read_table,
    with_hash_part,
)

#: combiner-stage batch size. Ray's map_batches default is 1024 rows, which
#: defeats per-batch pre-aggregation on a big table (a groupby over ~#keys
#: rows reduces nothing and pays the pandas fixed cost once per 1024 rows —
#: measured 54 s for one combiner pass over 2M rows vs ~1 s at 256Ki). The
#: events projections here are narrow (3-5 numeric/ts columns), so a 256Ki
#: batch is ~10 MB — safe per worker.
COMBINE_BATCH = 256 * 1024


def _sessions_frame(g: pd.DataFrame, gap: np.timedelta64) -> pd.DataFrame:
    """Vectorized sessionize over one partition's (possibly many) users.

    One sort + one cython groupby-agg; session ids come from a single cumsum
    over the session-start mask, rebased per user (no per-user Python)."""
    g = g.sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True
    )
    ts = g["ts"].to_numpy()
    user = g["user_id"].to_numpy()
    n = len(g)
    new_user = np.ones(n, dtype=bool)
    new_user[1:] = user[1:] != user[:-1]
    new_session = new_user.copy()
    if n > 1:
        new_session[1:] |= (ts[1:] - ts[:-1]) > gap
    sid_global = np.cumsum(new_session)
    # rebase to 1..k within each user: forward-fill the user's base id
    base = np.maximum.accumulate(np.where(new_user, sid_global - 1, 0))
    g = g.assign(session_id=(sid_global - base).astype("int64"))
    out = g.groupby(["user_id", "session_id"], sort=False, as_index=False).agg(
        n_events=("event_id", "size"),
        session_start=("ts", "min"),
        session_end=("ts", "max"),
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out[
        ["user_id", "session_id", "n_events", "session_start", "session_end"]
    ]


def sessionize(
    sf_dir: str, *, gap_minutes: int = 30, max_rows_per_task: int | None = None
) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Output one row per session:
    (user_id, session_id, n_events, session_start, session_end).
    Tie-break ordering within a user: (ts, event_id) — deterministic and
    matched by the oracle SQL's window ORDER BY.

    ``max_rows_per_task`` is the mega-key escape hatch (the keyed-window
    analogue of the CDC lake's ``turn_shard_size``): by default all of a
    user's events land in one coarse partition task; a user owning half the
    corpus pins one worker. With the bound set, a cheap combiner stats pass
    finds users whose event count exceeds the bound, a fine time histogram
    packs each such user's events into contiguous ts-range chunks of at most
    ``max_rows_per_task`` rows, each chunk sessionizes independently, and the
    chunk-seam sessions (first/last per chunk — 2 rows per chunk, driver-side
    by pigeonhole: at most ``2 * total_rows / bound``) are merged exactly:
    a session can only span a sorted split at the seam. Interior sessions are
    renumbered distributed via a broadcast (user, chunk) -> id-offset map.
    Known limit: ``> max_rows_per_task`` events at ONE fine-bucket timestamp
    cannot be split (order ties) and stay in one task, documented like the
    conv-bucketing tie limit."""
    gap = np.timedelta64(gap_minutes * 60, "s")
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    if max_rows_per_task is None:

        def per_part(g: pd.DataFrame) -> pd.DataFrame:
            return _sessions_frame(g, gap)

        return (
            with_hash_part(ds, "user_id")
            .groupby("_part")
            .map_groups(per_part, batch_format="pandas")
        )
    return _sessionize_bounded(ds, gap, int(max_rows_per_task))


def _plan_chunks(buckets: list[tuple[int, int]], bound: int) -> list[int]:
    """Greedy-pack contiguous fine buckets into chunks of at most ``bound``
    rows. Returns the bucket indices where a NEW chunk starts (first chunk
    implicit). A single bucket larger than ``bound`` becomes its own chunk —
    the unsplittable-tie case."""
    cuts: list[int] = []
    cur = 0
    for b, c in sorted(buckets):
        if cur and cur + c > bound:
            cuts.append(b)
            cur = 0
        cur += c
    return cuts


def _heavy_chunk_plan(ds: rd.Dataset, bound: int, *, spill_us: int = 0, spill_mask=None):
    """Plan bounded time-chunks for mega keys — the shared machinery of the
    bounded keyed-window operators (``sessionize``, as-of attribution,
    range join).

    ``spill_us``/``spill_mask`` implement OVERLAP chunking for bounded-
    lookback joins: rows selected by ``spill_mask(batch) -> bool mask``
    (e.g. the clicks of a range join) are DUPLICATED into every later
    chunk whose range intersects ``(ts, ts + spill_us]``, so a window
    crossing a chunk seam still sees its left-side rows locally. The
    duplication factor is ``spill_us / chunk_ts_width + 1`` — bounded in
    practice (chunks hold ``bound`` rows, so a chunk narrower than the
    window means the window itself covers > bound rows of that user);
    output stays duplicate-free as long as the operator emits results
    where the NON-spilled side lives (each such row is in exactly one
    chunk).

    Pass A (combiner): per-user counts; heavy = count > ``bound``
    (pigeonhole: at most total_rows / bound such users). Pass B
    (combiner): fine time histogram over ONLY the heavy users' events,
    greedy-packed (``_plan_chunks``) into contiguous ts-range chunks of at
    most ``bound`` rows. Returns ``None`` when no user exceeds the bound,
    else ``(assign, part_to_chunk)``: ``assign`` is a pandas-batch fn
    adding ``_part`` (light users hash into 0..NUM_PARTS-1; each heavy
    (user, chunk) gets its own part id >= NUM_PARTS), and
    ``part_to_chunk`` maps those ids back to (user_id, chunk_idx). Chunk
    boundaries fall between distinct timestamps, so equal-ts ties never
    split (> bound events at ONE timestamp stay in one task — the
    documented unsplittable-tie limit)."""
    B = COMBINE_BATCH

    # ---- pass A: per-user counts (combiner), heavy = count > bound --------
    def partial_stats(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("user_id", sort=False, as_index=False).agg(
            n=("event_id", "size"), ts_lo=("ts", "min"), ts_hi=("ts", "max")
        )

    stats = (
        ds.map_batches(arrow_out(partial_stats), batch_format="pandas", batch_size=B)
        .groupby("user_id")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("ts_lo", alias_name="ts_lo"),
            Max("ts_hi", alias_name="ts_hi"),
        )
    )
    heavy = stats.filter(expr=f"n > {bound}").take_all()
    if not heavy:
        return None

    def _us(t) -> int:
        return int(pd.Timestamp(t).value // 1000)

    spec: dict[int, tuple[int, int]] = {}  # uid -> (lo_us, fine_us)
    for r in heavy:
        uid, n = int(r["user_id"]), int(r["n"])
        lo, hi = _us(r["ts_lo"]), _us(r["ts_hi"])
        k = -(-n // bound)  # chunks needed; 16x finer buckets for packing slack
        fine = max(1, (hi - lo + 1) // max(16, k * 16) + 1)
        spec[uid] = (lo, fine)

    # ---- pass B: fine time histogram for heavy users only ------------------
    heavy_ids = np.array(sorted(spec), dtype=np.int64)
    lo_map = {u: s[0] for u, s in spec.items()}
    fine_map = {u: s[1] for u, s in spec.items()}

    def partial_hist(b: pd.DataFrame) -> pd.DataFrame:
        m = b["user_id"].isin(heavy_ids)
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "bucket": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            }
        )
        if not m.any():
            return empty
        sub = b[m]
        ts_us = sub["ts"].astype("datetime64[us]").to_numpy().astype("int64")
        lo = sub["user_id"].map(lo_map).to_numpy(dtype="int64")
        fw = sub["user_id"].map(fine_map).to_numpy(dtype="int64")
        h = pd.DataFrame(
            {"user_id": sub["user_id"].to_numpy(), "bucket": (ts_us - lo) // fw}
        )
        out = h.groupby(["user_id", "bucket"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "n"}).astype("int64")

    hist = (
        ds.map_batches(arrow_out(partial_hist), batch_format="pandas", batch_size=B)
        .groupby(["user_id", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    per_user_buckets: dict[int, list[tuple[int, int]]] = {}
    for r in hist:
        per_user_buckets.setdefault(int(r["user_id"]), []).append(
            (int(r["bucket"]), int(r["n"]))
        )

    # cut thresholds in epoch-us; chunk_idx = searchsorted(cuts, ts, right)
    cuts_map: dict[int, np.ndarray] = {}
    part_base: dict[int, int] = {}
    part_to_chunk: dict[int, tuple[int, int]] = {}
    next_part = NUM_PARTS
    for uid in sorted(per_user_buckets):
        lo, fine = spec[uid]
        cut_buckets = _plan_chunks(per_user_buckets[uid], bound)
        cuts_map[uid] = np.array([lo + b * fine for b in cut_buckets], dtype="int64")
        part_base[uid] = next_part
        for c in range(len(cut_buckets) + 1):
            part_to_chunk[next_part + c] = (uid, c)
        next_part += len(cut_buckets) + 1

    # partition light users by hash, heavy by (user, chunk)
    def assign(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(np.asarray(b["user_id"].to_numpy()))
        part = (h % NUM_PARTS).astype("int64")
        u = b["user_id"].to_numpy()
        ts_us = b["ts"].astype("datetime64[us]").to_numpy().astype("int64")
        spill = (
            np.asarray(spill_mask(b), dtype=bool)
            if spill_us and spill_mask is not None
            else None
        )
        extra: list[pd.DataFrame] = []
        for uid, cuts in cuts_map.items():  # few heavy users by pigeonhole
            m = u == uid
            if not m.any():
                continue
            part[m] = part_base[uid] + np.searchsorted(
                cuts, ts_us[m], side="right"
            )
            if spill is None or len(cuts) == 0:
                continue
            sm = m & spill
            if not sm.any():
                continue
            idx = np.flatnonzero(sm)
            t = ts_us[idx]
            k0 = np.searchsorted(cuts, t, side="right")
            k1 = np.searchsorted(cuts, t + np.int64(spill_us), side="right")
            for off in range(1, int((k1 - k0).max() or 0) + 1):
                mm = k1 >= k0 + off
                if not mm.any():
                    break
                dup = b.iloc[idx[mm]].assign(
                    _part=(part_base[uid] + k0[mm] + off).astype("int64")
                )
                extra.append(dup)
        out = b.assign(_part=part)
        if extra:
            out = pd.concat([out, *extra], ignore_index=True)
        return out

    return assign, part_to_chunk


def _sessionize_bounded(
    ds: rd.Dataset, gap: np.timedelta64, bound: int
) -> rd.Dataset:
    """Skew-safe sessionize: heavy users are time-split into bounded chunks
    (``_heavy_chunk_plan``), sessionized per chunk, and seam-merged exactly
    (see ``sessionize``). Re-reading the pruned (event_id, ts, user_id)
    projection per pass streams and beats materializing the corpus at
    100 TB."""
    gap_td = pd.Timedelta(gap)
    B = COMBINE_BATCH
    plan = _heavy_chunk_plan(ds, bound)
    if plan is None:
        def per_part(g: pd.DataFrame) -> pd.DataFrame:
            return _sessions_frame(g, gap)

        return (
            with_hash_part(ds, "user_id")
            .groupby("_part")
            .map_groups(per_part, batch_format="pandas")
        )
    assign, part_to_chunk = plan

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        pval = int(g["_part"].iloc[0])
        out = _sessions_frame(g, gap)
        if pval < NUM_PARTS:
            return out.assign(
                chunk_idx=np.int64(-1),
                local_idx=out["session_id"],
                n_local=np.int64(-1),
            )
        uid, chunk = part_to_chunk[pval]
        return out.assign(
            chunk_idx=np.int64(chunk),
            local_idx=out["session_id"],
            n_local=np.int64(len(out)),
        )

    # session-level rows (post-window aggregation: one row per session, the
    # output size) are materialized ONCE — the seam pass and the renumber
    # pass both consume them, and without the pin each consumer would
    # re-execute the event read + sort exchange from scratch
    sess = (
        ds.map_batches(arrow_out(assign), batch_format="pandas", batch_size=B)
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
        .materialize()
    )

    FINAL = ["user_id", "session_id", "n_events", "session_start", "session_end"]

    # seam descriptors: first+last session per heavy chunk — 2 rows per
    # chunk, driver-side total bounded by 2 * total_rows / bound
    def seam_rows(b: pd.DataFrame) -> pd.DataFrame:
        return b[
            (b["chunk_idx"] >= 0)
            & ((b["local_idx"] == 1) | (b["local_idx"] == b["n_local"]))
        ]

    bdesc: dict[tuple[int, int], dict] = {}
    for r in sess.map_batches(
        seam_rows, batch_format="pandas", batch_size=B
    ).take_all():
        key = (int(r["user_id"]), int(r["chunk_idx"]))
        d = bdesc.setdefault(key, {"n_local": int(r["n_local"])})
        if int(r["local_idx"]) == 1:
            d["first"] = r
        if int(r["local_idx"]) == int(r["n_local"]):
            d["last"] = r

    # driver walk: merge chunk seams, assign final ids. Invariant: count ==
    # highest assigned id == number of final sessions so far (open included).
    merged_rows: list[tuple] = []
    base_id: dict[tuple[int, int], int] = {}
    first_merged: dict[tuple[int, int], bool] = {}
    for uid in sorted({u for u, _ in bdesc}):
        chunks = sorted(c for u, c in bdesc if u == uid)
        count = 0
        open_s: dict | None = None
        for c in chunks:
            d = bdesc[(uid, c)]
            f, l = d["first"], d["last"]
            if (
                open_s is not None
                and pd.Timestamp(f["session_start"]) - open_s["end"] <= gap_td
            ):
                first_merged[(uid, c)] = True
                open_s["end"] = pd.Timestamp(f["session_end"])
                open_s["n"] += int(f["n_events"])
                base_id[(uid, c)] = count - 1
                if d["n_local"] > 1:
                    merged_rows.append(
                        (uid, open_s["id"], open_s["n"], open_s["start"], open_s["end"])
                    )
                    count += d["n_local"] - 1
                    open_s = {
                        "id": count,
                        "start": pd.Timestamp(l["session_start"]),
                        "end": pd.Timestamp(l["session_end"]),
                        "n": int(l["n_events"]),
                    }
            else:
                if open_s is not None:
                    merged_rows.append(
                        (uid, open_s["id"], open_s["n"], open_s["start"], open_s["end"])
                    )
                first_merged[(uid, c)] = False
                base_id[(uid, c)] = count
                count += d["n_local"]
                open_s = {
                    "id": count,
                    "start": pd.Timestamp(l["session_start"]),
                    "end": pd.Timestamp(l["session_end"]),
                    "n": int(l["n_events"]),
                }
        if open_s is not None:
            merged_rows.append(
                (uid, open_s["id"], open_s["n"], open_s["start"], open_s["end"])
            )

    adj = pd.DataFrame(
        [
            (u, c, base_id[(u, c)], first_merged[(u, c)])
            for (u, c) in base_id
        ],
        columns=["user_id", "chunk_idx", "base_id", "first_merged"],
    ).astype({"user_id": "int64", "chunk_idx": "int64", "base_id": "int64"})

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        """Light sessions pass through; heavy-chunk sessions drop the seam
        rows owned by the driver walk and shift onto their final ids."""
        light = b[b["chunk_idx"] < 0][FINAL]
        hv = b[b["chunk_idx"] >= 0]
        if hv.empty:
            return light
        m = hv.merge(adj, on=["user_id", "chunk_idx"], how="left")
        keep = (m["local_idx"] < m["n_local"]) & ~(
            (m["local_idx"] == 1) & m["first_merged"].fillna(False).astype(bool)
        )
        m = m[keep]
        m = m.assign(session_id=(m["base_id"] + m["local_idx"]).astype("int64"))
        return pd.concat([light, m[FINAL]], ignore_index=True)

    out = sess.map_batches(finalize, batch_format="pandas", batch_size=B)
    if merged_rows:
        mdf = pd.DataFrame(merged_rows, columns=FINAL)
        mdf = mdf.astype(
            {
                "user_id": "int64",
                "session_id": "int64",
                "n_events": "int64",
                "session_start": "datetime64[us]",
                "session_end": "datetime64[us]",
            }
        )
        out = out.union(rd.from_pandas(mdf))
    return out


def tumbling_window_counts(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour windows per event_type: (hour, event_type, n_events).

    Pre-aggregation pattern: per-batch partial counts inside map_batches, then
    a small groupby over partials — the shuffle moves (hour,type,count) rows,
    not events."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(hour=b["ts"].dt.floor("h"))
        out = (
            # dropna=False: SQL GROUP BY keeps a NULL group; pandas' default
            # would silently drop null-keyed rows and diverge from the oracle
            b.groupby(["hour", "event_type"], sort=False, observed=True, dropna=False)
            .size()
            .rename("partial_n")
            .reset_index()
        )
        return out

    partials = read_table(sf_dir, "events", columns=["ts", "event_type"]).map_batches(
        arrow_out(partial), batch_format="pandas", batch_size=COMBINE_BATCH
    )
    agg = partials.groupby(["hour", "event_type"]).aggregate(
        Sum("partial_n", alias_name="n_events")
    )
    return agg


def last_event_per_user(sf_dir: str) -> rd.Dataset:
    """D1 generalized to the events table: last-writer-wins per user by
    (ts, event_id) — the reference's duplicate-key overwrite
    (``graph_aggregate.go:46-51``).

    Keep-last is an ASSOCIATIVE reduction (the max row under the (ts,
    event_id) order), so unlike the windowed operators it needs no
    partition-holds-the-whole-key assumption: a per-batch keep-last
    reduces each batch to <= #users rows, then a small per-key fold picks
    the winner of winners. Skew-immune by construction — a user owning
    half the corpus just contributes one partial row per batch."""

    def keep_last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = g.drop_duplicates("user_id", keep="last")
        return out[["event_id", "ts", "user_id", "event_type", "value"]]

    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    partials = ds.map_batches(
        arrow_out(keep_last), batch_format="pandas", batch_size=COMBINE_BATCH
    )
    return (
        with_hash_part(partials, "user_id")
        .groupby("_part")
        .map_groups(keep_last, batch_format="pandas")
    )


def user_activity_summary(sf_dir: str, *, min_events: int = 5) -> rd.Dataset:
    """Grouped aggregate + HAVING (A1): per-user event count, first/last ts,
    integer-cents value sum; HAVING n_events >= min_events.

    Combiner-first: every piece is associative (count = sum of partial
    counts, min/max/sum fold), so the per-batch partial reduces each batch
    to <= #distinct-users rows BEFORE the shuffle — the exchange moves
    partials, not events, and a mega-user costs nothing extra (partial
    merge is a reduction, no single task ever holds one user's raw rows)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # half-AWAY-FROM-ZERO to match SQL round() — np.round is banker's
        # (half-to-even): value=0.125 -> 12.5 cents must round to 13, not
        # 12. The int cast goes through pandas, NOT ndarray.astype: a NULL
        # value must raise loudly (IntCastingNaNError) — numpy would
        # silently turn NaN into INT64_MIN and poison the sum
        v = b["value"].to_numpy() * 100.0
        cents = pd.Series(np.sign(v) * np.floor(np.abs(v) + 0.5), index=b.index)
        b = b.assign(value_cents=cents.astype("int64"))
        # dropna=False: SQL GROUP BY keeps a NULL group (same reason as the
        # tumbling-window combiner)
        return b.groupby(
            "user_id", sort=False, as_index=False, dropna=False
        ).agg(
            n_events=("event_id", "size"),
            first_ts=("ts", "min"),
            last_ts=("ts", "max"),
            value_cents=("value_cents", "sum"),
        )

    ds = read_table(
        sf_dir, "events", columns=["user_id", "event_id", "ts", "value"]
    ).map_batches(arrow_out(partial), batch_format="pandas", batch_size=COMBINE_BATCH)
    agg = ds.groupby("user_id").aggregate(
        Sum("n_events", alias_name="n_events"),
        Min("first_ts", alias_name="first_ts"),
        Max("last_ts", alias_name="last_ts"),
        Sum("value_cents", alias_name="value_cents"),
    )
    return agg.filter(expr=f"n_events >= {min_events}")


ASOF_COLS = ["purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"]


def _asof_frame(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized as-of join over one partition's (possibly many) users:
    one ``pd.merge_asof(..., by="user_id")`` pass (backward = last right
    row with ts <= left ts; right side sorted (ts, event_id) makes the
    tie-break deterministic: latest ts wins, then highest event_id)."""
    p = (
        g[g["event_type"] == "purchase"]
        .sort_values(["ts", "event_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    c = (
        g[g["event_type"] == "click"]
        .sort_values(["ts", "event_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    if p.empty:
        return pd.DataFrame(
            {
                "purchase_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "purchase_ts": pd.Series([], dtype="datetime64[us]"),
                "click_id": pd.Series([], dtype="int64"),
                "click_ts": pd.Series([], dtype="datetime64[us]"),
            }
        )
    if c.empty:
        joined = p.assign(click_id=np.int64(-1), click_ts=pd.Timestamp(0))
    else:
        joined = pd.merge_asof(
            p,
            c[["ts", "event_id", "user_id"]].rename(
                columns={"ts": "click_ts", "event_id": "click_id"}
            ),
            left_on="ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
        )
        # sentinel instead of NULL: purchases with no prior click get
        # (click_id=-1, epoch ts) on BOTH engine and oracle sides, so the
        # value-hash comparison never depends on NULL string renderings
        joined["click_id"] = joined["click_id"].fillna(-1)
        joined["click_ts"] = joined["click_ts"].fillna(pd.Timestamp(0))
    return pd.DataFrame(
        {
            "purchase_id": joined["event_id"].astype("int64"),
            "user_id": joined["user_id"].astype("int64"),
            "purchase_ts": joined["ts"].astype("datetime64[us]"),
            "click_id": joined["click_id"].astype("int64"),
            "click_ts": joined["click_ts"].astype("datetime64[us]"),
        }
    )


def asof_purchase_attribution(
    sf_dir: str, *, max_rows_per_task: int | None = None
) -> rd.Dataset:
    """As-of join: each 'purchase' event attributed to the user's most recent
    'click' at-or-before it. A custom operator Ray Data lacks, built as
    groupby(user).map_groups with pandas merge_asof — the as-of window is
    partition-local by user, so no global sort is needed. Deterministic
    tie-breaks: latest ts wins, then highest event_id.

    Output: (purchase_id, user_id, purchase_ts, click_id, click_ts).

    ``max_rows_per_task`` is the mega-key escape hatch (same plan machinery
    as the bounded ``sessionize``): a heavy user is time-split into bounded
    chunks, each chunk as-of joins locally, and the ONLY cross-chunk state
    a purchase can need is the latest click of the PRECEDING chunks — one
    (click_id, click_ts) per chunk, prefix-scanned on the driver
    (pigeonhole-bounded) and substituted into the chunk's locally-unmatched
    purchases. Exact: a click in the same chunk always beats any earlier
    chunk's click (chunks are disjoint ascending ts ranges)."""
    ev = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    ).filter(expr="event_type == 'purchase' or event_type == 'click'")
    if max_rows_per_task is None:
        return (
            with_hash_part(ev, "user_id")
            .groupby("_part")
            .map_groups(_asof_frame, batch_format="pandas")
        )
    return _asof_bounded(ev, int(max_rows_per_task))


def _asof_bounded(ev: rd.Dataset, bound: int) -> rd.Dataset:
    """Skew-safe as-of attribution (see ``asof_purchase_attribution``)."""
    B = COMBINE_BATCH
    plan = _heavy_chunk_plan(ev, bound)
    if plan is None:
        return (
            with_hash_part(ev, "user_id")
            .groupby("_part")
            .map_groups(_asof_frame, batch_format="pandas")
        )
    assign, part_to_chunk = plan

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        pval = int(g["_part"].iloc[0])
        out = _asof_frame(g)
        if pval < NUM_PARTS:
            return out.assign(chunk_idx=np.int64(-1))
        uid, chunk = part_to_chunk[pval]
        out = out.assign(chunk_idx=np.int64(chunk))
        # sidecar row (purchase_id = -2): this chunk's LAST click — the
        # carry-in candidate for later chunks; -1 marks a clickless chunk
        c = g[g["event_type"] == "click"]
        if len(c):
            last = c.sort_values(["ts", "event_id"]).iloc[-1]
            cid, cts = np.int64(last["event_id"]), pd.Timestamp(last["ts"])
        else:
            cid, cts = np.int64(-1), pd.Timestamp(0)
        side = pd.DataFrame(
            {
                "purchase_id": [np.int64(-2)],
                "user_id": [np.int64(uid)],
                "purchase_ts": [pd.Timestamp(0)],
                "click_id": [cid],
                "click_ts": [cts],
                "chunk_idx": [np.int64(chunk)],
            }
        ).astype({"purchase_ts": "datetime64[us]", "click_ts": "datetime64[us]"})
        return pd.concat([out, side], ignore_index=True)

    # attribution rows are output-sized: materialize ONCE for the sidecar
    # extraction and the final substitution pass (same rationale as the
    # bounded sessionize's session-level pin)
    joined = (
        ev.map_batches(arrow_out(assign), batch_format="pandas", batch_size=B)
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
        .materialize()
    )

    def sidecars(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["purchase_id"] == -2]

    last_click: dict[tuple[int, int], tuple] = {}
    for r in joined.map_batches(
        sidecars, batch_format="pandas", batch_size=B
    ).take_all():
        last_click[(int(r["user_id"]), int(r["chunk_idx"]))] = (
            int(r["click_id"]),
            pd.Timestamp(r["click_ts"]),
        )
    # prefix scan per user: carry[(u, c)] = latest click of chunks < c.
    # Chunks are ascending disjoint ts ranges, so the carry-in is simply
    # the last click of the most recent preceding chunk that has one.
    carry: dict[tuple[int, int], tuple] = {}
    for uid in sorted({u for u, _ in last_click}):
        best = (-1, pd.Timestamp(0))
        for c in sorted(c for u, c in last_click if u == uid):
            carry[(uid, c)] = best
            cid, cts = last_click[(uid, c)]
            if cid != -1:
                best = (cid, cts)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["purchase_id"] != -2]
        m = (b["chunk_idx"] >= 0) & (b["click_id"] == -1)
        if m.any():
            sub = b.loc[m]
            keys = list(zip(sub["user_id"].astype(int), sub["chunk_idx"].astype(int)))
            fills = [carry.get(k, (-1, pd.Timestamp(0))) for k in keys]
            b = b.copy()
            b.loc[m, "click_id"] = np.array([f[0] for f in fills], dtype="int64")
            b.loc[m, "click_ts"] = pd.Series(
                [f[1] for f in fills], index=sub.index, dtype="datetime64[us]"
            )
        return b[ASOF_COLS]

    return joined.map_batches(finalize, batch_format="pandas", batch_size=B)


def range_join_click_errors(
    sf_dir: str,
    *,
    window_minutes: int = 5,
    max_rows_per_task: int | None = None,
) -> rd.Dataset:
    """Range (interval) join: every 'error' within ``window_minutes`` AFTER a
    'click' by the same user. Like the as-of join, the interval predicate is
    partition-local by user — per-group numpy searchsorted finds each
    click's error window in O(log n); no global sort, no cross-user work.

    Output: (click_id, error_id, user_id, gap_us).

    Coarse-partitioned and vectorized ACROSS users: (user, ts) is encoded as
    one monotone int64 composite key — ``user_rank * span + (ts - ts_min)``
    with ``span`` wide enough that windows never cross users — so a single
    pair of searchsorted calls finds every click's error window for every
    user in the partition at once.

    ``max_rows_per_task`` is the mega-key escape hatch, here via OVERLAP
    chunking (``_heavy_chunk_plan(spill_us=window)``): a heavy user's
    events are time-split into bounded chunks and the CLICKS within one
    window of a chunk seam are duplicated into the chunks their window
    reaches, so every (click, error) pair is computable where the error
    lives — each error is in exactly one chunk, so the output is
    duplicate-free with NO seam merge at all.
    """
    win_us = np.int64(window_minutes * 60 * 1_000_000)
    ev = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    ).filter(expr="event_type == 'click' or event_type == 'error'")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["event_type"] == "click"]
        e = g[g["event_type"] == "error"]
        empty = pd.DataFrame(
            {
                "click_id": pd.Series([], dtype="int64"),
                "error_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "gap_us": pd.Series([], dtype="int64"),
            }
        )
        if c.empty or e.empty:
            return empty
        cu = c["user_id"].to_numpy()
        eu = e["user_id"].to_numpy()
        cts = c["ts"].astype("datetime64[us]").to_numpy().astype("int64")
        ets = e["ts"].astype("datetime64[us]").to_numpy().astype("int64")
        users = np.unique(np.concatenate([cu, eu]))
        ts_min = min(cts.min(), ets.min())
        span = np.int64(max(cts.max(), ets.max()) - ts_min) + win_us + 2
        if len(users) * int(span) >= 2**62:
            # explicit raise, not assert: stripped asserts under python -O
            # would turn int64 overflow into silently wrong join output
            raise OverflowError(
                "range-join composite key would overflow int64: "
                f"{len(users)} users x {int(span)}us span in one partition; "
                "raise NUM_PARTS or narrow the ts range"
            )
        comp_e = np.searchsorted(users, eu) * span + (ets - ts_min)
        order = np.argsort(comp_e, kind="stable")
        comp_e = comp_e[order]
        e_ids = e["event_id"].to_numpy()[order]
        e_ts = ets[order]
        comp_c = np.searchsorted(users, cu) * span + (cts - ts_min)
        lo = np.searchsorted(comp_e, comp_c, side="left")
        hi = np.searchsorted(comp_e, comp_c + win_us, side="right")
        n_per = hi - lo
        total = int(n_per.sum())
        if total == 0:
            return empty
        # expand [lo, hi) ranges without a Python loop
        starts = np.repeat(lo, n_per)
        offs = np.arange(total) - np.repeat(
            np.cumsum(n_per) - n_per, n_per
        )
        err_idx = starts + offs
        return pd.DataFrame(
            {
                "click_id": np.repeat(c["event_id"].to_numpy(), n_per).astype(
                    "int64"
                ),
                "error_id": e_ids[err_idx].astype("int64"),
                "user_id": np.repeat(cu, n_per).astype("int64"),
                "gap_us": (e_ts[err_idx] - np.repeat(cts, n_per)).astype("int64"),
            }
        )

    if max_rows_per_task is not None:
        plan = _heavy_chunk_plan(
            ev,
            int(max_rows_per_task),
            spill_us=int(win_us),
            spill_mask=lambda b: (b["event_type"] == "click").to_numpy(),
        )
        if plan is not None:
            assign, _ = plan
            return (
                ev.map_batches(
                    arrow_out(assign),
                    batch_format="pandas",
                    batch_size=COMBINE_BATCH,
                )
                .groupby("_part")
                .map_groups(per_part, batch_format="pandas")
            )
    return (
        with_hash_part(ev, "user_id")
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )


def distinct_users_per_type(sf_dir: str) -> rd.Dataset:
    """A1 COUNT(DISTINCT): distinct users per event type, exact and
    skew-proof in two stages. Stage 1 dedups (type, user) pairs inside each
    batch, then hash-partitions by the COMPOSITE (type, user) — a pair's
    duplicates all land in one part, and a hot type spreads over all parts
    instead of one task holding its whole distinct set (the nunique-per-
    group shape this replaces). Stage 2 dedups within the part and emits
    per-type partial counts (<= #types rows); the final groupby sums
    partials. No task ever holds more than ~|distinct pairs| / NUM_PARTS
    rows regardless of type skew."""
    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def batch_distinct(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(ignore_index=True)
        h = pd.util.hash_pandas_object(
            b[["event_type", "user_id"]], index=False
        ).to_numpy()
        return b.assign(_part=(h % NUM_PARTS).astype("int64"))

    def part_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop_duplicates(["event_type", "user_id"])
            # dropna=False: SQL GROUP BY keeps the NULL group — same reason
            # as tumbling_window_counts / user_activity_summary
            .groupby("event_type", sort=False, as_index=False, dropna=False)
            .size()
            .rename(columns={"size": "partial_n"})
        )
        out["partial_n"] = out["partial_n"].astype("int64")
        # pin the key dtype: a partition whose only group is the NULL one
        # would otherwise emit event_type as float64 NaN and break Arrow
        # block schema unification (double vs string)
        out["event_type"] = out["event_type"].astype("string")
        return out

    partials = (
        ev.map_batches(
            arrow_out(batch_distinct),
            batch_format="pandas",
            batch_size=COMBINE_BATCH,
        )
        .groupby("_part")
        .map_groups(arrow_out(part_counts), batch_format="pandas")
    )
    return partials.groupby("event_type").aggregate(
        Sum("partial_n", alias_name="n_users")
    )
