"""Global rank: agreement with a driver-side stable sort, tie
handling, partition independence, exact NTILE group sizes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from georay.rank import rank_by


def _mk(n, card, seed=2):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "v": pa.array(rng.integers(0, card, n), pa.int64()),
        }
    )


def _run(tbl, blocks, **kw):
    import ray.data

    ds = ray.data.from_arrow(tbl).repartition(blocks)
    return rank_by(ds, "v", "id", **kw).to_pandas().sort_values("rnk").reset_index(drop=True)


def test_rank_matches_stable_sort(ray_session):
    t = _mk(10_000, 300)
    out = _run(t, 9)
    exp = t.to_pandas().sort_values(["v", "id"]).reset_index(drop=True)
    assert (out["id"].to_numpy() == exp["id"].to_numpy()).all()
    assert (out["rnk"].to_numpy() == np.arange(1, 10_001)).all()


def test_rank_heavy_ties(ray_session):
    # one hot value dominating: ties must co-locate and stay id-ordered
    t = pa.table(
        {
            "id": pa.array(range(5_000), pa.int64()),
            "v": pa.array([7] * 4_000 + list(range(1_000)), pa.int64()),
        }
    )
    out = _run(t, 7)
    exp = t.to_pandas().sort_values(["v", "id"]).reset_index(drop=True)
    assert (out["id"].to_numpy() == exp["id"].to_numpy()).all()


def test_rank_partition_invariant(ray_session):
    t = _mk(4_000, 50, seed=9)
    a = _run(t, 2)
    b = _run(t, 23)
    assert a.equals(b)


def test_ntile_exact_sql_sizes(ray_session):
    out = _run(_mk(10_003, 300), 5, ntile=10)
    sizes = out.groupby("ntile_10").size().tolist()
    assert sizes == [1001, 1001, 1001] + [1000] * 7
    # tiles follow rank order
    assert (np.diff(out["ntile_10"].to_numpy()) >= 0).all()
