"""Round-5 operators: band join (price_band_pairs) and split-drift
(term_drift) — goldens with hand-checkable inputs plus a brute-force
cross-check, including the band-boundary and strict-epsilon edges."""

import itertools

import numpy as np
import pyarrow as pa
import pytest


def _orders(tmp_path, prices):
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "o_orderkey": pa.array(range(1, len(prices) + 1), pa.int64()),
            "o_custkey": pa.array([1] * len(prices), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(prices)),
            "o_totalprice": pa.array(prices, pa.float64()),
            "o_orderdate": pa.array([0] * len(prices), pa.timestamp("us")),
            "o_orderpriority": pa.array(["5-LOW"] * len(prices)),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _pairs(ds):
    return {
        (r["key_lo"], r["key_hi"], r["diff_micro"]) for r in ds.take_all()
    }


def test_band_join_boundary_and_strictness(ray_session, tmp_path):
    from georay.relational import price_band_pairs

    # eps = 2.0 -> bands [0,2), [2,4), ...
    # keys:      1    2    3    4    5     6
    prices = [1.9, 3.7, 1.0, 3.0, 3.7, 100.0]
    sf = _orders(tmp_path, prices)
    got = _pairs(price_band_pairs(sf))
    assert got == {
        (1, 2, 1_800_000),  # straddles the band boundary (ghost path)
        (2, 4, 700_000),
        (1, 4, 1_100_000),  # also straddles the boundary
        (2, 5, 0),  # exact-equal values pair exactly once
        (1, 5, 1_800_000),  # key 5 duplicates key 2's price
        (4, 5, 700_000),
        # (1,3) diff 0.9 -> included
        (1, 3, 900_000),
        # (3,4) diff exactly 2.0 -> EXCLUDED (strict <)
    } | {(1, 3, 900_000)}
    assert (3, 4, 2_000_000) not in got


def test_band_join_matches_bruteforce(ray_session, tmp_path):
    from georay.relational import price_band_pairs

    rng = np.random.default_rng(17)
    prices = np.round(rng.uniform(0.0, 40.0, 300), 2).tolist()
    sf = _orders(tmp_path, prices)
    got = _pairs(price_band_pairs(sf))
    v = np.rint(np.asarray(prices) * 1e6).astype(np.int64)
    want = set()
    for i, j in itertools.combinations(range(len(prices)), 2):
        d = abs(int(v[i]) - int(v[j]))
        if d < 2_000_000:
            want.add((i + 1, j + 1, d))
    assert got == want


def test_band_join_empty_and_singleton(ray_session, tmp_path):
    from georay.relational import price_band_pairs

    sf = _orders(tmp_path, [5.0])
    assert price_band_pairs(sf).count() == 0


def test_term_drift_exact_formula(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import ray.data
    from georay.textops import term_drift

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "cat cat cat dog",  # even split
                    "cat dog dog dog",  # odd split
                    "cat cat bird",  # even
                    "dog",  # odd
                ]
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([1] * 4, pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    rows = {r["term"]: r for r in term_drift(ds, min_count=2).take_all()}
    # split A (even doc_id): cat*5 dog*1 bird*1 -> na=7
    # split B (odd doc_id):  cat*1 dog*4        -> nb=5
    # vocab v=3
    assert rows["cat"]["cnt_a"] == 5 and rows["cat"]["cnt_b"] == 1
    assert rows["dog"]["cnt_a"] == 1 and rows["dog"]["cnt_b"] == 4
    na, nb, v = 7, 5, 3
    for term in ("cat", "dog"):
        ca, cb = rows[term]["cnt_a"], rows[term]["cnt_b"]
        want = ((ca + 1) * 1_000_000 * (nb + v)) // ((cb + 1) * (na + v))
        assert rows[term]["drift_micro"] == want
    # bird: cnt 1 < min_count 2 -> filtered out
    assert "bird" not in rows


def test_term_drift_partition_invariance(ray_session):
    import ray.data
    from georay.textops import term_drift

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        (r["term"], r["drift_micro"]) for r in term_drift(ds).take_all()
    )
    b = sorted(
        (r["term"], r["drift_micro"])
        for r in term_drift(ds.repartition(7)).take_all()
    )
    assert a == b and len(a) > 0
