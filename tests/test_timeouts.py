"""Query deadlines (S2): a bounded query returns its result inside the
budget and raises QueryTimeoutError (with partial progress) past it."""

import time

import pytest

import ray.data as rd

from sql_graph_visualizer_ray.stages.timeouts import (
    QueryTimeoutError,
    collect_with_timeout,
)


def test_fast_query_completes(ray_session):
    ds = rd.range(10_000)
    t = collect_with_timeout(ds, timeout_s=60.0)
    assert t.num_rows == 10_000


def test_slow_query_times_out(ray_session):
    def slow(batch):
        time.sleep(0.5)
        return batch

    ds = rd.range(100_000, override_num_blocks=50).map_batches(
        slow, batch_size=2_000
    )
    t0 = time.monotonic()
    with pytest.raises(QueryTimeoutError) as ei:
        collect_with_timeout(ds, timeout_s=1.0, batch_size=2_000)
    assert time.monotonic() - t0 < 30  # deadline enforced, not a full run
    assert ei.value.rows_so_far < 100_000


def test_timeout_query_entry_matches_plain(ray_session):
    from sql_graph_visualizer_ray.pipelines.queries import (
        orders_custkey_lookup,
        orders_lookup_with_timeout,
    )

    sf = "/root/testdata/sf0.001"
    got = orders_lookup_with_timeout(sf).to_pandas()
    want = orders_custkey_lookup(sf).to_pandas()
    key = ["o_orderkey"]
    assert got.sort_values(key, ignore_index=True).equals(
        want.sort_values(key, ignore_index=True)
    )
