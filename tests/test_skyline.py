"""part_skyline: the vectorized local sweep + fan-in merge must equal
brute-force pairwise dominance, including duplicate points and
same-price/same-size tie handling."""

import numpy as np
import pyarrow as pa

from georay.relational import _skyline_take


def _brute(rows):
    out = []
    for i, (k, s, p) in enumerate(rows):
        dominated = any(
            (q[2] <= p and q[1] >= s and (q[2] < p or q[1] > s))
            for j, q in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append((k, s, p))
    return sorted(out)


def _table(rows):
    return pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_size": pa.array([r[1] for r in rows], pa.int32()),
            "p_retailprice": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def _run_kernel(rows):
    t = _skyline_take(_table(rows))
    return sorted(
        zip(
            t["p_partkey"].to_pylist(),
            t["p_size"].to_pylist(),
            t["p_retailprice"].to_pylist(),
        )
    )


def test_skyline_kernel_random_matches_brute():
    rng = np.random.default_rng(3)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        rows = [
            (i, int(rng.integers(1, 8)), float(rng.integers(1, 10)))
            for i in range(n)
        ]
        assert _run_kernel(rows) == _brute(rows)


def test_skyline_duplicates_and_ties_kept():
    # duplicate frontier points never dominate each other: both stay
    rows = [(0, 5, 1.0), (1, 5, 1.0), (2, 4, 1.0), (3, 5, 2.0), (4, 6, 3.0)]
    got = _run_kernel(rows)
    assert got == _brute(rows)
    assert (0, 5, 1.0) in got and (1, 5, 1.0) in got
    assert (2, 4, 1.0) not in got  # same price, smaller size -> dominated
    assert (3, 5, 2.0) not in got  # same size, higher price -> dominated


def test_skyline_merge_is_prune_safe(ray_session):
    # splitting into blocks, pruning each, and merging must equal the
    # global skyline (dominance transitivity)
    import ray

    from georay.relational import _skyline_merge

    rng = np.random.default_rng(9)
    rows = [
        (i, int(rng.integers(1, 10)), float(rng.integers(1, 12)))
        for i in range(120)
    ]
    blocks = [_skyline_take(_table(rows[i::4])) for i in range(4)]
    merged = ray.get(_skyline_merge.remote(*blocks))
    got = sorted(
        zip(
            merged["p_partkey"].to_pylist(),
            merged["p_size"].to_pylist(),
            merged["p_retailprice"].to_pylist(),
        )
    )
    assert got == _brute(rows)
