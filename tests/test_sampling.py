"""Sampling: determinism under repartitioning, uniformity, weighted
inclusion ordering, Bernoulli-split disjointness."""

import numpy as np
import pyarrow as pa
import pytest

from georay.sampling import sample_without_replacement, split_sample


@pytest.fixture(scope="module")
def ds(ray_session):
    import ray.data

    t = pa.table(
        {
            "id": pa.array(range(10_000), pa.int64()),
            "w": pa.array(
                [100.0 if i < 100 else 1.0 for i in range(10_000)], pa.float64()
            ),
        }
    )
    return ray.data.from_arrow(t)


def _ids(res):
    return sorted(r["id"] for r in res.take_all())


def test_uniform_sample_size_and_determinism(ds):
    s1 = _ids(sample_without_replacement(ds, 50, "id", seed=7))
    s2 = _ids(sample_without_replacement(ds.repartition(13), 50, "id", seed=7))
    assert len(s1) == 50 and len(set(s1)) == 50
    assert s1 == s2  # partitioning-independent
    assert _ids(sample_without_replacement(ds, 50, "id", seed=8)) != s1


def test_uniform_sample_is_roughly_uniform(ds):
    ids = _ids(sample_without_replacement(ds, 1000, "id", seed=3))
    # mean of a 1000-of-10000 uniform draw: ~5000 +- ~270 (3 sigma)
    assert abs(np.mean(ids) - 5000) < 300
    assert sum(1 for i in ids if i < 100) < 30  # no bias toward any range


def test_weighted_sample_prefers_heavy_rows(ds):
    ids = _ids(sample_without_replacement(ds, 100, "id", seed=5, weight_col="w"))
    heavy = sum(1 for i in ids if i < 100)
    # 100 rows carry weight 100 each = 10100/19900 of total mass;
    # far above the 1% a uniform draw would give them
    assert heavy > 30


def test_zero_weight_rows_never_sampled(ray_session):
    import ray.data

    t = pa.table(
        {
            "id": pa.array(range(100), pa.int64()),
            "w": pa.array([0.0] * 50 + [1.0] * 50, pa.float64()),
        }
    )
    ids = _ids(
        sample_without_replacement(ray.data.from_arrow(t), 50, "id", weight_col="w")
    )
    assert all(i >= 50 for i in ids)


def test_split_sample_disjoint_and_complete(ds):
    a = set(_ids(split_sample(ds, 0.3, "id", seed=11)))
    # same seed, complement fraction: rows with u >= 0.3
    b = {
        r["id"]
        for r in ds.map_batches(
            lambda t: t, batch_format="pyarrow"
        ).take_all()
    } - a
    assert len(a) + len(b) == 10_000
    assert abs(len(a) - 3000) < 200  # ~binomial(10000, 0.3)
    # determinism: re-running yields the identical split
    assert a == set(_ids(split_sample(ds, 0.3, "id", seed=11)))


# ------------------------------------------------- stratified / domain mix


@pytest.fixture(scope="module")
def grouped_ds(ray_session):
    import ray.data

    t = pa.table(
        {
            "id": pa.array(range(5_000), pa.int64()),
            "grp": pa.array(["g%d" % (i % 4) for i in range(5_000)], pa.string()),
        }
    )
    return ray.data.from_arrow(t)


def test_stratified_sample_k_per_group(grouped_ds):
    from georay.sampling import stratified_sample

    out = stratified_sample(grouped_ds, 25, "grp", "id", seed=7).to_pandas()
    sizes = out.groupby("grp").size()
    assert set(sizes.index) == {"g0", "g1", "g2", "g3"}
    assert (sizes == 25).all()
    # membership respects the group column
    assert (out["id"].to_numpy() % 4 == out["grp"].str[1:].astype(int)).all()


def test_stratified_sample_partition_invariant(grouped_ds):
    from georay.sampling import stratified_sample

    a = stratified_sample(grouped_ds, 10, "grp", "id", seed=7).to_pandas()
    b = stratified_sample(
        grouped_ds.repartition(37), 10, "grp", "id", seed=7
    ).to_pandas()
    key = lambda d: sorted(map(tuple, d[["grp", "id"]].to_numpy()))
    assert key(a) == key(b)


def test_stratified_sample_small_group_returns_all(ray_session):
    import ray.data

    from georay.sampling import stratified_sample

    t = pa.table(
        {
            "id": pa.array(range(30), pa.int64()),
            "grp": pa.array(["a"] * 3 + ["b"] * 27, pa.string()),
        }
    )
    out = stratified_sample(ray.data.from_arrow(t), 10, "grp", "id").to_pandas()
    sizes = out.groupby("grp").size()
    assert sizes["a"] == 3 and sizes["b"] == 10


def test_domain_mix_fraction_and_determinism(grouped_ds):
    from georay.sampling import domain_mix

    w = {"g0": 1.0, "g1": 0.5, "g2": 0.0, "g3": 0.25}
    run = lambda ds: domain_mix(ds, w.__getitem__, "grp", "id", seed=11).to_pandas()
    a = run(grouped_ds)
    b = run(grouped_ds.repartition(13))
    assert sorted(a["id"]) == sorted(b["id"])
    sizes = a.groupby("grp").size()
    assert sizes.get("g2", 0) == 0  # weight 0 keeps nothing
    assert sizes["g0"] == 1250  # weight 1 keeps everything
    assert abs(sizes["g1"] / 1250 - 0.5) < 0.06
    assert abs(sizes["g3"] / 1250 - 0.25) < 0.06


def test_domain_cap(ray_session):
    """At most `cap` rows survive per group, chosen by (rank desc,
    key asc), rk is the within-group rank, partition-invariant."""
    import ray.data

    from georay.sampling import domain_cap

    t = pa.table(
        {
            "doc_id": pa.array(list(range(12)), pa.int64()),
            "source": pa.array(["a"] * 6 + ["b"] * 4 + ["c"] * 2),
            "n_chars": pa.array([5, 9, 9, 1, 7, 3, 4, 4, 4, 2, 8, 8], pa.int64()),
        }
    )

    def run(blocks):
        ds = ray.data.from_arrow(t).repartition(blocks)
        df = domain_cap(ds, "source", "doc_id", "n_chars", cap=3).to_pandas()
        return sorted(zip(df["source"], df["rk"], df["doc_id"]))

    got = run(3)
    # a: n_chars desc -> ids 1(9),2(9),4(7); ties 9 broken by lower id
    # b: 6(4),7(4),8(4) by id; c: only 2 rows survive a cap of 3
    assert got == [
        ("a", 1, 1), ("a", 2, 2), ("a", 3, 4),
        ("b", 1, 6), ("b", 2, 7), ("b", 3, 8),
        ("c", 1, 10), ("c", 2, 11),
    ]
    assert run(7) == got
