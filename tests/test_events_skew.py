"""Mega-key escape hatch for keyed windows (VERDICT r4 item 5): a user whose
events exceed ``max_rows_per_task`` is time-split into bounded chunks,
sessionized per chunk, and seam-merged exactly. These tests pin the bounded
path to the plain path and to a DuckDB window oracle on an adversarial
fixture where one user owns half the corpus — the keyed-window analogue of
the CDC lake's ``turn_shard_size`` skew tests."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_graph_visualizer_ray.pipelines.events import _plan_chunks, sessionize

GAP_MIN = 10


def _write_events(tmp_path, df: pd.DataFrame) -> str:
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    t = pa.table(
        {
            "event_id": pa.array(df["event_id"], pa.int64()),
            "ts": pa.array(df["ts"].astype("datetime64[us]")),
            "user_id": pa.array(df["user_id"], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def _skew_frame() -> pd.DataFrame:
    """User 1 owns ~50%% of events (2,000 of 4,040) with a mix of intra-gap
    steps and occasional > gap jumps so sessions both span and break across
    any time cut; 40 light users carry 51 events each including exact-ts
    ties (unsplittable within a fine bucket)."""
    rng = np.random.default_rng(7)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    # heavy user: steps of 1..9 min, with a 25-min (> GAP_MIN) jump every ~37
    ts = t0
    for i in range(2000):
        step = int(rng.integers(60, 9 * 60))
        if i % 37 == 36:
            step = 25 * 60
        ts = ts + np.timedelta64(step, "s")
        rows.append((i, ts, 1))
    # light users: bursts with ties and occasional session breaks
    eid = 2000
    for uid in range(2, 42):
        ts = t0 + np.timedelta64(int(rng.integers(0, 3600)), "s")
        for j in range(51):
            if j % 17 == 16:
                ts = ts + np.timedelta64(GAP_MIN * 60 + 61, "s")
            elif j % 5 != 0:  # every 5th event ties the previous timestamp
                ts = ts + np.timedelta64(int(rng.integers(30, 300)), "s")
            rows.append((eid, ts, uid))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    return df.sample(frac=1.0, random_state=3).reset_index(drop=True)


def _oracle(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("events", df)
    out = con.execute(
        "WITH flagged AS ("
        "  SELECT user_id, event_id, ts, "
        f"  CASE WHEN ts - lag(ts) OVER w > INTERVAL {GAP_MIN} MINUTE "
        "       OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "numbered AS ("
        "  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, "
        "  event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM flagged) "
        "SELECT user_id, session_id, COUNT(*) AS n_events, "
        "MIN(ts) AS session_start, MAX(ts) AS session_end "
        "FROM numbered GROUP BY user_id, session_id"
    ).df()
    con.close()
    return out


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["session_start"] = df["session_start"].astype("datetime64[us]")
    df["session_end"] = df["session_end"].astype("datetime64[us]")
    for c in ("user_id", "session_id", "n_events"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["user_id", "session_id"], ignore_index=True)[
        ["user_id", "session_id", "n_events", "session_start", "session_end"]
    ]


def test_bounded_sessionize_matches_plain_and_oracle(ray_session, tmp_path):
    df = _skew_frame()
    sf = _write_events(tmp_path, df)
    plain = _canon(sessionize(sf, gap_minutes=GAP_MIN).to_pandas())
    bounded = _canon(
        sessionize(sf, gap_minutes=GAP_MIN, max_rows_per_task=150).to_pandas()
    )
    oracle = _canon(_oracle(df))
    pd.testing.assert_frame_equal(plain, oracle)
    pd.testing.assert_frame_equal(bounded, oracle)
    # sanity: the heavy user really did exceed the bound (escape hatch live)
    assert (df["user_id"] == 1).sum() > 150


def test_bounded_sessionize_chain_merge_single_session(ray_session, tmp_path):
    """One user, every gap < GAP_MIN, bound forces ~20 chunks: every chunk's
    single session must chain-merge into exactly one final session."""
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    n = 1000
    ts = t0 + np.arange(n) * np.timedelta64(60, "s")
    df = pd.DataFrame(
        {"event_id": np.arange(n), "ts": ts, "user_id": np.int64(5)}
    )
    sf = _write_events(tmp_path, df)
    got = _canon(
        sessionize(sf, gap_minutes=GAP_MIN, max_rows_per_task=50).to_pandas()
    )
    assert len(got) == 1
    r = got.iloc[0]
    assert (
        int(r["n_events"]) == n
        and r["session_start"] == pd.Timestamp(ts[0])
        and r["session_end"] == pd.Timestamp(ts[-1])
        and int(r["session_id"]) == 1
    )


def test_bounded_sessionize_no_heavy_users_falls_back(ray_session, tmp_path):
    df = _skew_frame()
    sf = _write_events(tmp_path, df)
    hi = _canon(
        sessionize(sf, gap_minutes=GAP_MIN, max_rows_per_task=10**6).to_pandas()
    )
    pd.testing.assert_frame_equal(hi, _canon(_oracle(df)))


@pytest.mark.parametrize("bound", [1, 7, 100])
def test_plan_chunks_respects_bound(bound):
    rng = np.random.default_rng(bound)
    buckets = [(int(b), int(rng.integers(1, 12))) for b in rng.choice(500, 60, False)]
    cuts = _plan_chunks(buckets, bound)
    assert cuts == sorted(set(cuts))
    # replay the packing: no chunk exceeds the bound unless it is a single
    # bucket bigger than the bound (the unsplittable-tie case)
    edges = sorted(cuts) + [10**9]
    sizes: list[list[int]] = [[] for _ in edges]
    for b, c in sorted(buckets):
        sizes[np.searchsorted(sorted(cuts), b, side="right")].append(c)
    for chunk in sizes:
        assert not chunk or sum(chunk) <= bound or len(chunk) == 1


def _asof_oracle(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("events", df)
    out = con.execute(
        "WITH p AS (SELECT event_id, ts, user_id FROM events "
        "           WHERE event_type = 'purchase'), "
        "c AS (SELECT event_id, ts, user_id FROM events "
        "      WHERE event_type = 'click') "
        "SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts, "
        "COALESCE(pick.cid, -1) AS click_id, "
        "COALESCE(pick.cts, TIMESTAMP '1970-01-01') AS click_ts "
        "FROM p LEFT JOIN LATERAL ("
        "  SELECT c.event_id AS cid, c.ts AS cts FROM c "
        "  WHERE c.user_id = p.user_id AND c.ts <= p.ts "
        "  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) pick ON TRUE"
    ).df()
    con.close()
    return out


ASOF_EMPTY = {
    "purchase_id": "int64",
    "user_id": "int64",
    "purchase_ts": "datetime64[us]",
    "click_id": "int64",
    "click_ts": "datetime64[us]",
}


def _asof_canon(df: pd.DataFrame) -> pd.DataFrame:
    if len(df.columns) == 0:  # Ray to_pandas of an all-empty dataset
        df = pd.DataFrame({c: pd.Series([], dtype=t) for c, t in ASOF_EMPTY.items()})
    df = df.copy()
    for c in ("purchase_ts", "click_ts"):
        df[c] = df[c].astype("datetime64[us]")
    for c in ("purchase_id", "user_id", "click_id"):
        df[c] = df[c].astype("int64")
    return df.sort_values("purchase_id", ignore_index=True)[
        ["purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"]
    ]


def test_bounded_asof_matches_plain_and_oracle(ray_session, tmp_path):
    """Mega-user as-of: user 1 owns most of the corpus with clicks SPARSE
    (one click per ~150 events), so with bound=200 most chunks have no
    click at all and an attribution must walk several chunk seams back to
    the carry-in click — plus a purchase BEFORE any click (sentinel), a
    click-ts tie (highest event_id wins), and light users as control."""
    rng = np.random.default_rng(17)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    ts = t0
    # heavy user 1: purchase at index 0 (no prior click ever -> sentinel)
    for i in range(3000):
        ts = ts + np.timedelta64(int(rng.integers(30, 200)), "s")
        kind = "click" if (i % 150 == 100) else "purchase"
        rows.append((i, ts, 1, kind))
    # a click-ts TIE for the heavy user: two clicks at one timestamp
    tie_ts = ts + np.timedelta64(60, "s")
    rows.append((4000, tie_ts, 1, "click"))
    rows.append((4001, tie_ts, 1, "click"))
    rows.append((4002, tie_ts + np.timedelta64(5, "s"), 1, "purchase"))
    # light users
    eid = 5000
    for uid in range(2, 30):
        ts2 = t0 + np.timedelta64(int(rng.integers(0, 3600)), "s")
        for j in range(20):
            ts2 = ts2 + np.timedelta64(int(rng.integers(60, 900)), "s")
            rows.append((eid, ts2, uid, "click" if j % 3 else "purchase"))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df = df.sample(frac=1.0, random_state=2).reset_index(drop=True)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(df["event_id"], pa.int64()),
                "ts": pa.array(df["ts"].astype("datetime64[us]")),
                "user_id": pa.array(df["user_id"], pa.int64()),
                "event_type": pa.array(df["event_type"], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    from sql_graph_visualizer_ray.pipelines.events import (
        asof_purchase_attribution,
    )

    plain = _asof_canon(asof_purchase_attribution(str(d)).to_pandas())
    bounded = _asof_canon(
        asof_purchase_attribution(str(d), max_rows_per_task=200).to_pandas()
    )
    oracle = _asof_canon(_asof_oracle(df))
    pd.testing.assert_frame_equal(plain, oracle)
    pd.testing.assert_frame_equal(bounded, oracle)
    # the adversarial shapes actually occurred
    assert (oracle["click_id"] == -1).any()  # pre-first-click sentinel
    tie_row = oracle[oracle["purchase_id"] == 4002].iloc[0]
    assert int(tie_row["click_id"]) == 4001  # ts tie -> highest event_id


def test_bounded_range_join_matches_plain_and_oracle(ray_session, tmp_path):
    """Mega-user range join with OVERLAP chunking: user 1's events are so
    dense (every ~20 s) that a 10-minute window spans several 25-row
    chunks — seam-adjacent clicks must duplicate into later chunks for
    their cross-seam (click, error) pairs to be found, and the output must
    still be duplicate-free."""
    rng = np.random.default_rng(23)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    ts = t0
    for i in range(3000):
        ts = ts + np.timedelta64(int(rng.integers(5, 40)), "s")
        rows.append((i, ts, 1, "click" if i % 4 else "error"))
    eid = 5000
    for uid in range(2, 20):
        ts2 = t0 + np.timedelta64(int(rng.integers(0, 3600)), "s")
        for j in range(30):
            ts2 = ts2 + np.timedelta64(int(rng.integers(30, 600)), "s")
            rows.append((eid, ts2, uid, "click" if j % 3 else "error"))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(df["event_id"], pa.int64()),
                "ts": pa.array(df["ts"].astype("datetime64[us]")),
                "user_id": pa.array(df["user_id"], pa.int64()),
                "event_type": pa.array(df["event_type"], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    from sql_graph_visualizer_ray.pipelines.events import (
        range_join_click_errors,
    )

    W = 10

    def canon(x: pd.DataFrame) -> pd.DataFrame:
        x = x.copy()
        for c in x.columns:
            x[c] = x[c].astype("int64")
        return x.sort_values(
            ["click_id", "error_id"], ignore_index=True
        )[["click_id", "error_id", "user_id", "gap_us"]]

    plain = canon(range_join_click_errors(str(d), window_minutes=W).to_pandas())
    bounded = canon(
        range_join_click_errors(
            str(d), window_minutes=W, max_rows_per_task=25
        ).to_pandas()
    )
    con = duckdb.connect()
    con.register("events", df)
    oracle = canon(
        con.execute(
            "SELECT c.event_id AS click_id, e.event_id AS error_id, "
            "c.user_id, CAST(epoch_us(e.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us "
            "FROM events c JOIN events e ON c.user_id = e.user_id "
            "AND c.event_type = 'click' AND e.event_type = 'error' "
            f"AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL {W} MINUTE"
        ).df()
    )
    con.close()
    # no duplicate pairs from the overlap duplication
    assert not bounded.duplicated(["click_id", "error_id"]).any()
    pd.testing.assert_frame_equal(plain, oracle)
    pd.testing.assert_frame_equal(bounded, oracle)
    # density check: the window really does span multiple 25-row chunks
    heavy = df[df["user_id"] == 1].sort_values("ts")
    med_gap = heavy["ts"].diff().dt.total_seconds().median()
    assert med_gap * 25 < W * 60  # window wider than a chunk


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

# small ts domain -> heavy tie pressure; tiny bounds -> many chunks; the
# chunk planner, seam merger, and renumberer all get hammered with shapes
# a hand fixture wouldn't think of
_streams = hst.lists(
    hst.tuples(hst.integers(1, 3), hst.integers(0, 120)),  # (user, ts seconds)
    min_size=5,
    max_size=60,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=_streams, bound=hst.sampled_from([3, 5, 8]))
def test_bounded_sessionize_property(ray_session, tmp_path_factory, stream, bound):
    """Property: for ANY event stream and ANY bound, the bounded sessionize
    equals the plain one (which is oracle-pinned elsewhere). gap=1 minute
    over a 2-minute ts domain forces both session breaks and chain merges
    across chunk seams."""
    d = tmp_path_factory.mktemp("hyp")
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(stream), dtype=np.int64),
            "ts": [t0 + np.timedelta64(s, "s") for _, s in stream],
            "user_id": np.array([u for u, _ in stream], dtype=np.int64),
        }
    )
    sf = _write_events(d, df)
    plain = _canon(sessionize(sf, gap_minutes=1).to_pandas())
    bounded = _canon(
        sessionize(sf, gap_minutes=1, max_rows_per_task=bound).to_pandas()
    )
    pd.testing.assert_frame_equal(bounded, plain)


_typed_streams = hst.lists(
    hst.tuples(
        hst.integers(1, 2),  # user
        hst.integers(0, 90),  # ts seconds
        hst.sampled_from(["click", "purchase", "error"]),
    ),
    min_size=5,
    max_size=50,
)


def _write_typed(tmp_path, stream) -> tuple[str, pd.DataFrame]:
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(stream), dtype=np.int64),
            "ts": [t0 + np.timedelta64(s, "s") for _, s, _ in stream],
            "user_id": np.array([u for u, _, _ in stream], dtype=np.int64),
            "event_type": [k for _, _, k in stream],
        }
    )
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(df["event_id"], pa.int64()),
                "ts": pa.array(df["ts"].astype("datetime64[us]")),
                "user_id": pa.array(df["user_id"], pa.int64()),
                "event_type": pa.array(df["event_type"], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d), df


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=_typed_streams, bound=hst.sampled_from([3, 6]))
def test_bounded_asof_property(ray_session, tmp_path_factory, stream, bound):
    """Property: bounded as-of == plain as-of for any stream/bound — ties,
    clickless chunks, multi-seam carry-ins included."""
    from sql_graph_visualizer_ray.pipelines.events import (
        asof_purchase_attribution,
    )

    sf, _ = _write_typed(tmp_path_factory.mktemp("hyp_asof"), stream)
    plain = _asof_canon(asof_purchase_attribution(sf).to_pandas())
    bounded = _asof_canon(
        asof_purchase_attribution(sf, max_rows_per_task=bound).to_pandas()
    )
    pd.testing.assert_frame_equal(bounded, plain)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=_typed_streams, bound=hst.sampled_from([3, 6]))
def test_bounded_range_join_property(ray_session, tmp_path_factory, stream, bound):
    """Property: bounded (overlap-chunked) range join == plain for any
    stream/bound — the 1-minute window over a 90-second domain guarantees
    windows wider than chunks, i.e. multi-chunk click spill."""
    from sql_graph_visualizer_ray.pipelines.events import (
        range_join_click_errors,
    )

    def canon(x: pd.DataFrame) -> pd.DataFrame:
        if len(x.columns) == 0:  # Ray to_pandas of an all-empty dataset
            x = pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("click_id", "error_id", "user_id", "gap_us")}
            )
        x = x.copy()
        for c in x.columns:
            x[c] = x[c].astype("int64")
        return x.sort_values(
            ["click_id", "error_id"], ignore_index=True
        ).reset_index(drop=True)

    sf, _ = _write_typed(tmp_path_factory.mktemp("hyp_rj"), stream)
    plain = canon(range_join_click_errors(sf, window_minutes=1).to_pandas())
    bounded = canon(
        range_join_click_errors(
            sf, window_minutes=1, max_rows_per_task=bound
        ).to_pandas()
    )
    assert not bounded.duplicated(["click_id", "error_id"]).any()
    pd.testing.assert_frame_equal(bounded, plain)
