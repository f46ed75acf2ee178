"""dim_side (broadcast-vs-bucket) parity: every query that joins a
customer/orders dimension must produce identical results whether the
dimension is broadcast (under the budget) or routed through
bucket_hash_join (VERDICT r02 #3). A tiny forced budget exercises the
bucketed path on the same inputs."""

import pandas as pd
import pytest

from georay import relational as rel

QUERIES = [
    ("top_orders", lambda sf: rel.top_orders(sf), ["o_totalprice", "o_orderkey"]),
    ("region_revenue", lambda sf: rel.region_revenue(sf), ["r_name"]),
    (
        "priority_line_counts",
        lambda sf: rel.priority_line_counts(sf),
        ["l_returnflag"],
    ),
    (
        "top_orders_per_segment",
        lambda sf: rel.top_orders_per_segment(sf),
        ["c_mktsegment", "rnk"],
    ),
    (
        "order_price_quantiles",
        lambda sf: rel.order_price_quantiles(sf),
        ["c_mktsegment"],
    ),
]


def _run(fn, sf, budget, monkeypatch):
    monkeypatch.setenv("GEORAY_BROADCAST_BUDGET", str(budget))
    df = fn(sf).to_pandas()
    return df.sort_values(df.columns.tolist()).reset_index(drop=True)


@pytest.mark.parametrize("name,fn,_sort", QUERIES, ids=[q[0] for q in QUERIES])
def test_bucket_path_matches_broadcast(name, fn, _sort, ray_session, sf_dir, monkeypatch):
    broadcast = _run(fn, sf_dir, 1 << 40, monkeypatch)
    bucketed = _run(fn, sf_dir, 1, monkeypatch)
    pd.testing.assert_frame_equal(broadcast, bucketed)


def test_dim_side_decision(sf_dir, monkeypatch):
    monkeypatch.setenv("GEORAY_BROADCAST_BUDGET", str(1 << 40))
    mode, payload = rel.dim_side(sf_dir, "customer", columns=["c_custkey"])
    assert mode == "broadcast" and hasattr(payload, "to_numpy")
    monkeypatch.setenv("GEORAY_BROADCAST_BUDGET", "1")
    mode, payload = rel.dim_side(sf_dir, "customer", columns=["c_custkey"])
    assert mode == "bucket" and hasattr(payload, "map_batches")
