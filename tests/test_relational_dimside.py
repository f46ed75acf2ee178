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


def test_mad_outliers_order_statistics(ray_session):
    # hand-computable group: supplier 1 prices [1, 2, 3, 4, 100] ->
    # med=3 (med2=600 cents), devs |x-3| = [2,1,0,1,97] -> MAD=1
    # (mad4=400), fence |x-3| > 1.5 -> {1, 100} = 2 outliers.
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from georay.relational import mad_outliers

    t = pa.table(
        {
            "l_suppkey": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
            "l_extendedprice": pa.array([1.0, 2.0, 3.0, 4.0, 100.0, 7.0]),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        rows = mad_outliers(d).take_all()
    assert [
        (r["suppkey"], r["n"], r["med2_cents"], r["mad4_cents"], r["n_outliers"])
        for r in rows
    ] == [(1, 5, 600, 400, 2), (2, 1, 1400, 0, 0)]


def test_mad_outliers_even_count_interpolation(ray_session):
    # even group: [10, 20, 30, 40] -> med2 = 2000+3000 = 5000 (med 25),
    # devs = [15,5,5,15] -> sorted dev2 = [1000,1000,3000,3000],
    # mad4 = 1000+3000 = 4000 (MAD 10), fence |x-25| > 15 -> none.
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from georay.relational import mad_outliers

    t = pa.table(
        {
            "l_suppkey": pa.array([5, 5, 5, 5], pa.int64()),
            "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0]),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        rows = mad_outliers(d).take_all()
    assert [
        (r["suppkey"], r["n"], r["med2_cents"], r["mad4_cents"], r["n_outliers"])
        for r in rows
    ] == [(5, 4, 5000, 4000, 0)]
