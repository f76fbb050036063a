"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows (SURVEY.md §2.9 — the reference has no
streaming dataflow either, only poll-loop monitoring at
``/root/reference/internal/application/services/performance/realtime_performance_monitor.go:287-303``).
Windows are COARSE-partitioned: the Ray exchange moves ``hash(user) % P``
partitions (one Python dispatch per partition, not per key), and the window
logic inside each partition is vectorized numpy/pandas across ALL of the
partition's users at once. The partitioning assumption (all of a key's
events co-located) is exactly the engine's conv_id bucketing assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

# NUM_PARTS / with_hash_part live in relational (shared with
# cooccurrence_pairs); re-exported here for the window operators' callers
from .relational import NUM_PARTS, read_table, with_hash_part  # noqa: F401


def sessionize(sf_dir: str, *, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Output one row per session:
    (user_id, session_id, n_events, session_start, session_end).
    Tie-break ordering within a user: (ts, event_id) — deterministic and
    matched by the oracle SQL's window ORDER BY.

    One sort + one cython groupby-agg per partition; session ids come from a
    single cumsum over the session-start mask, rebased per user (no per-user
    Python)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
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

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return (
        with_hash_part(ds, "user_id")
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )


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
        partial, batch_format="pandas"
    )
    agg = partials.groupby(["hour", "event_type"]).aggregate(
        Sum("partial_n", alias_name="n_events")
    )
    return agg


def last_event_per_user(sf_dir: str) -> rd.Dataset:
    """D1 generalized to the events table: last-writer-wins per user by
    (ts, event_id) — the reference's duplicate-key overwrite
    (``graph_aggregate.go:46-51``) as a coarse-partitioned keep-last (one
    sort + drop_duplicates per partition, vectorized over all its users)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = g.drop_duplicates("user_id", keep="last")
        return out[["event_id", "ts", "user_id", "event_type", "value"]]

    ds = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    return (
        with_hash_part(ds, "user_id")
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )


def user_activity_summary(sf_dir: str, *, min_events: int = 5) -> rd.Dataset:
    """Grouped aggregate + HAVING (A1): per-user event count, first/last ts,
    integer-cents value sum; HAVING n_events >= min_events."""

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(value_cents=np.round(b["value"] * 100).astype("int64"))
        return b[["user_id", "event_id", "ts", "value_cents"]]

    ds = read_table(
        sf_dir, "events", columns=["user_id", "event_id", "ts", "value"]
    ).map_batches(to_cents, batch_format="pandas")
    agg = ds.groupby("user_id").aggregate(
        Count(alias_name="n_events"),
        Min("ts", alias_name="first_ts"),
        Max("ts", alias_name="last_ts"),
        Sum("value_cents", alias_name="value_cents"),
    )
    return agg.filter(expr=f"n_events >= {min_events}")


def asof_purchase_attribution(sf_dir: str) -> rd.Dataset:
    """As-of join: each 'purchase' event attributed to the user's most recent
    'click' at-or-before it. A custom operator Ray Data lacks, built as
    groupby(user).map_groups with pandas merge_asof — the as-of window is
    partition-local by user, so no global sort is needed. Deterministic
    tie-breaks: latest ts wins, then highest event_id.

    Output: (purchase_id, user_id, purchase_ts, click_id, click_ts).

    Coarse-partitioned: one ``pd.merge_asof(..., by="user_id")`` per
    partition handles ALL of its users in a single vectorized pass (the
    backward direction picks the last right row with ts <= left ts; sorting
    the right side by (ts, event_id) makes the tie-break deterministic and
    identical to the oracle's ORDER BY cts DESC, cid DESC).
    """
    from .relational import read_table

    ev = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    ).filter(expr="event_type == 'purchase' or event_type == 'click'")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
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

    return (
        with_hash_part(ev, "user_id")
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )


def range_join_click_errors(sf_dir: str, *, window_minutes: int = 5) -> rd.Dataset:
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
    """
    from .relational import read_table

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

    return (
        with_hash_part(ev, "user_id")
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )


def distinct_users_per_type(sf_dir: str) -> rd.Dataset:
    """A1 COUNT(DISTINCT): distinct users per event type, pre-reduced inside
    each batch (drop_duplicates) so the shuffle moves (type, user) pairs at
    most once per batch, then an exact per-group nunique."""
    from .relational import read_table

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def batch_distinct(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(ignore_index=True)

    def group_count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users": np.array([g["user_id"].nunique()], dtype="int64"),
            }
        )

    return (
        ev.map_batches(batch_distinct, batch_format="pandas")
        .groupby("event_type")
        .map_groups(group_count, batch_format="pandas")
    )
