"""HyperLogLog: accuracy bounds, merge associativity, Ray ops."""

import numpy as np
import pytest

from georay import sketch


def test_estimate_accuracy_levels():
    rng = np.random.default_rng(7)
    for n in (100, 5_000, 200_000):
        regs = sketch.empty_registers()
        vals = rng.integers(0, 1 << 62, n * 2, dtype=np.int64)
        uniq = np.unique(vals)[:n]
        sketch.update_registers(regs, sketch.hash64(uniq))
        est = sketch.estimate(regs)
        assert abs(est - n) / n < 0.05, (n, est)


def test_merge_equals_union():
    a_vals = np.arange(0, 60_000, dtype=np.int64)
    b_vals = np.arange(30_000, 90_000, dtype=np.int64)  # 50% overlap
    ra, rb, ru = (sketch.empty_registers() for _ in range(3))
    sketch.update_registers(ra, sketch.hash64(a_vals))
    sketch.update_registers(rb, sketch.hash64(b_vals))
    sketch.update_registers(ru, sketch.hash64(np.union1d(a_vals, b_vals)))
    merged = sketch.merge_registers(ra, rb)
    assert np.array_equal(merged, ru)  # max-merge == union, exactly
    assert abs(sketch.estimate(merged) - 90_000) / 90_000 < 0.05


def test_string_and_int_hashing_deterministic():
    h1 = sketch.hash64(np.array([1, 2, 3], dtype=np.int64))
    h2 = sketch.hash64(np.array([1, 2, 3], dtype=np.int64))
    assert np.array_equal(h1, h2)
    s1 = sketch.hash64(np.array(["a", "b"], dtype=object))
    s2 = sketch.hash64(np.array(["a", "b"], dtype=object))
    assert np.array_equal(s1, s2)


def test_approx_distinct_dataset(ray_session, sf_dir):
    import duckdb
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = sketch.approx_distinct(ds, "user_id")
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_grouped_approx_distinct_vs_exact(ray_session, sf_dir):
    import duckdb
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in sketch.grouped_approx_distinct(ds, "event_type", "user_id").take_all()
    }
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) / max(exact[k], 1) < 0.07, (k, approx[k], exact[k])


def test_approx_quantiles_within_bin_width(ray_session):
    """The histogram quantile sketch must land within one bin width
    ABOVE the exact quantile_disc value (deterministic bound)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from georay.sketch import approx_quantiles

    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.normal(100, 15, 20000), rng.exponential(50, 5000)])
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    out = approx_quantiles(ds, "v", qs=(0.5, 0.9, 0.99), n_bins=2048)
    row = out.to_pylist()[0]
    assert row["n_rows"] == len(vals)
    width = (vals.max() - vals.min()) / 2048
    s = np.sort(vals)
    for q, name in [(0.5, "p5"), (0.9, "p9"), (0.99, "p99")]:
        exact = s[max(0, int(np.ceil(q * len(s))) - 1)]
        got = row[name]
        assert exact <= got <= exact + 2 * width, (q, got, exact, width)


def test_grouped_approx_quantiles_bounds(ray_session):
    """Per-group sketch quantiles sit in (exact, exact + bin width]
    for every group — the deterministic error contract."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from georay.sketch import grouped_approx_quantiles

    rng = np.random.default_rng(23)
    n = 4000
    grp = rng.choice(["a", "b", "c"], size=n)
    val = np.where(grp == "a", rng.uniform(0, 100, n), rng.uniform(50, 500, n))
    t = pa.table({"g": pa.array(grp), "v": pa.array(val, pa.float64())})
    out = grouped_approx_quantiles(
        ray.data.from_arrow(t).repartition(5), "g", "v", qs=(0.5, 0.9), n_bins=256
    )
    rows = {
        out["g"][i].as_py(): (
            out["n_rows"][i].as_py(),
            out["p5"][i].as_py(),
            out["p9"][i].as_py(),
        )
        for i in range(out.num_rows)
    }
    for g in ("a", "b", "c"):
        sel = np.sort(val[grp == g])
        width = (sel[-1] - sel[0]) / 256
        n_g, p5, p9 = rows[g]
        assert n_g == len(sel)
        for q, got in ((0.5, p5), (0.9, p9)):
            exact = sel[max(0, int(np.ceil(q * len(sel))) - 1)]
            assert exact <= got <= exact + width + 1e-9


def test_hll_overlap_accuracy_and_invariance(ray_session):
    """Inclusion-exclusion overlap tracks the exact intersection within
    HLL error (<7% of union at p=12) and is partition-invariant."""
    import pyarrow as pa
    import ray.data

    from georay.sketch import hll_overlap

    # A: 0..4999, B: 3000..7999 (2000 shared), C: disjoint 100k..101k
    ka = np.arange(5000)
    kb = np.arange(3000, 8000)
    kc = np.arange(100000, 101000)
    t = pa.table(
        {
            "grp": pa.array(["a"] * len(ka) + ["b"] * len(kb) + ["c"] * len(kc)),
            "uid": pa.array(np.concatenate([ka, kb, kc]), pa.int64()),
        }
    )

    def run(blocks):
        out = hll_overlap(
            ray.data.from_arrow(t).repartition(blocks), "grp", "uid"
        ).to_pandas()
        return out

    out = run(4)
    row = out[(out["grp_a"] == "a") & (out["grp_b"] == "b")].iloc[0]
    assert abs(row["approx_overlap"] - 2000) < 0.07 * 8000
    rc = out[(out["grp_a"] == "a") & (out["grp_b"] == "c")].iloc[0]
    assert rc["approx_overlap"] < 0.07 * 6000  # disjoint stays near zero
    out2 = run(9)
    assert out.equals(out2)
