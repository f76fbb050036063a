"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows (SURVEY.md §2.9 — the reference has no
streaming dataflow either, only poll-loop monitoring at
``/root/reference/internal/application/services/performance/realtime_performance_monitor.go:287-303``).
Windows are expressed as groupby(key).map_groups over ts-sorted groups; the
partitioning assumption (all of a key's events in one group) is exactly the
engine's conv_id partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .relational import read_table


def sessionize(sf_dir: str, *, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Output one row per session:
    (user_id, session_id, n_events, session_start, session_end).
    Tie-break ordering within a user: (ts, event_id) — deterministic and
    matched by the oracle SQL's window ORDER BY."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            deltas = g["ts"].to_numpy()[1:] - g["ts"].to_numpy()[:-1]
            new_session[1:] = deltas > gap
        sid = np.cumsum(new_session)
        g = g.assign(session_id=sid)
        out = (
            g.groupby("session_id", sort=True)
            .agg(
                n_events=("event_id", "size"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
            )
            .reset_index()
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["session_id"] = out["session_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (
        read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def tumbling_window_counts(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour windows per event_type: (hour, event_type, n_events).

    Pre-aggregation pattern: per-batch partial counts inside map_batches, then
    a small groupby over partials — the shuffle moves (hour,type,count) rows,
    not events."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(hour=b["ts"].dt.floor("h"))
        out = (
            b.groupby(["hour", "event_type"], sort=False, observed=True)
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
    (``graph_aggregate.go:46-51``) as a grouped keep-last."""

    def keep_last(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["ts", "event_id"], kind="mergesort").tail(1)

    return (
        read_table(
            sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        .groupby("user_id")
        .map_groups(keep_last, batch_format="pandas")
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
    """
    from .relational import read_table

    ev = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    ).filter(expr="event_type == 'purchase' or event_type == 'click'")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        p = (
            g[g["event_type"] == "purchase"]
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        c = (
            g[g["event_type"] == "click"]
            .sort_values(["ts", "event_id"])
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
                c[["ts", "event_id"]].rename(
                    columns={"ts": "click_ts", "event_id": "click_id"}
                ),
                left_on="ts",
                right_on="click_ts",
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

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas")


def range_join_click_errors(sf_dir: str, *, window_minutes: int = 5) -> rd.Dataset:
    """Range (interval) join: every 'error' within ``window_minutes`` AFTER a
    'click' by the same user. Like the as-of join, the interval predicate is
    partition-local by user — per-group numpy searchsorted finds each
    click's error window in O(log n); no global sort, no cross-user work.

    Output: (click_id, error_id, user_id, gap_us).
    """
    from .relational import read_table

    win_us = np.int64(window_minutes * 60 * 1_000_000)
    ev = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    ).filter(expr="event_type == 'click' or event_type == 'error'")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        e = g[g["event_type"] == "error"].sort_values(["ts", "event_id"])
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
        ets = e["ts"].astype("datetime64[us]").to_numpy().astype("int64")
        cts = c["ts"].astype("datetime64[us]").to_numpy().astype("int64")
        lo = np.searchsorted(ets, cts, side="left")
        hi = np.searchsorted(ets, cts + win_us, side="right")
        n_per = hi - lo
        if n_per.sum() == 0:
            return empty
        click_rep = np.repeat(c["event_id"].to_numpy(), n_per)
        click_ts_rep = np.repeat(cts, n_per)
        err_idx = np.concatenate(
            [np.arange(a, b) for a, b in zip(lo, hi) if b > a]
        )
        return pd.DataFrame(
            {
                "click_id": click_rep.astype("int64"),
                "error_id": e["event_id"].to_numpy()[err_idx].astype("int64"),
                "user_id": np.repeat(
                    c["user_id"].to_numpy(), n_per
                ).astype("int64"),
                "gap_us": (ets[err_idx] - click_ts_rep).astype("int64"),
            }
        )

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas")


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
