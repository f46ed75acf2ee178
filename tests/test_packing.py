"""Sequence packing: prefix-sum invariants, budget semantics,
partitioning independence (the two-pass scan must not depend on Ray's
batching)."""

import numpy as np
import pyarrow as pa
import pytest

from georay.packing import pack_sequences


def _mk_docs(n, seed=3):
    rng = np.random.default_rng(seed)
    texts = [" ".join(["w%d" % w for w in rng.integers(0, 50, rng.integers(1, 40))]) for _ in range(n)]
    # a couple of empty docs exercise the zero-token path
    texts[5] = ""
    texts[17] = "   "
    return pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts, pa.string())}
    )


@pytest.fixture(scope="module")
def docs_tbl():
    return _mk_docs(3000)


def _run(tbl, budget, blocks):
    import ray.data

    ds = ray.data.from_arrow(tbl).repartition(blocks)
    return (
        pack_sequences(ds, budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_prefix_sum_invariants(ray_session, docs_tbl):
    out = _run(docs_tbl, 512, 7)
    ntok = out["n_tokens"].to_numpy()
    start = out["start_offset"].to_numpy()
    assert start[0] == 0
    assert (start == np.concatenate(([0], np.cumsum(ntok)[:-1]))).all()
    assert (out["shard_id"].to_numpy() == start // 512).all()
    # empty docs contribute zero tokens and share their successor's offset
    assert ntok[5] == 0 and ntok[17] == 0
    assert start[6] == start[5]


def test_partitioning_independence(ray_session, docs_tbl):
    a = _run(docs_tbl, 512, 3)
    b = _run(docs_tbl, 512, 31)
    assert a.equals(b)


def test_budget_changes_only_shards(ray_session, docs_tbl):
    a = _run(docs_tbl, 256, 5)
    b = _run(docs_tbl, 4096, 5)
    assert (a["start_offset"] == b["start_offset"]).all()
    assert a["shard_id"].nunique() > b["shard_id"].nunique()
    # every shard except the last starts within budget of its id
    s = a.groupby("shard_id")["start_offset"].min()
    assert (s.to_numpy() // 256 == s.index.to_numpy()).all()


def test_pack_by_rank_matches_ordered_prefix_sum(ray_session):
    import ray.data

    from georay.packing import pack_by_rank

    rng = np.random.default_rng(11)
    n = 2500
    ntok = rng.integers(1, 60, n)
    # ranks are a permutation (dense 1-based), decoupled from doc_id
    rnk = rng.permutation(n) + 1
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "n_tokens": pa.array(ntok, pa.int64()),
            "rnk": pa.array(rnk, pa.int64()),
        }
    )
    out = (
        pack_by_rank(ray.data.from_arrow(t).repartition(7), budget=512)
        .to_pandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    exp_ntok = ntok[np.argsort(rnk)]
    start = np.concatenate(([0], np.cumsum(exp_ntok)[:-1]))
    assert (out["n_tokens"].to_numpy() == exp_ntok).all()
    assert (out["start_offset"].to_numpy() == start).all()
    assert (out["shard_id"].to_numpy() == start // 512).all()
    # all original columns survive
    assert set(out.columns) >= {"doc_id", "n_tokens", "rnk", "start_offset", "shard_id"}
