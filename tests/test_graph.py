"""Connected components: agreement with a driver-side union-find on
random graphs, partition independence, convergence on chains."""

import numpy as np
import pyarrow as pa
import pytest

from georay.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    out = {}
    for n in list(parent):
        root = find(n)
        out.setdefault(root, []).append(n)
    expect = {}
    for members in out.values():
        m = min(members)
        for n in members:
            expect[n] = m
    return expect


def _run_cc(edges, blocks=5):
    import ray.data

    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    ds = ray.data.from_arrow(pa.table({"a": a, "b": b})).repartition(blocks)
    got = connected_components(ds).to_pandas()
    return dict(zip(got["node"], got["label"]))


def test_cc_matches_union_find_random(ray_session):
    rng = np.random.default_rng(5)
    edges = [tuple(sorted(map(int, rng.integers(0, 400, 2)))) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run_cc(edges) == _union_find(edges)


def test_cc_chain_converges(ray_session):
    # a path graph is the worst case for min propagation (diameter steps)
    edges = [(i, i + 1) for i in range(40)]
    got = _run_cc(edges, blocks=3)
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_cc_partition_invariant(ray_session):
    rng = np.random.default_rng(9)
    edges = [tuple(sorted(map(int, rng.integers(0, 200, 2)))) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run_cc(edges, blocks=2) == _run_cc(edges, blocks=17)


def test_dedup_clusters_keep_one_per_cluster(ray_session):
    import ray.data

    from georay.graph import dedup_clusters

    texts = {
        0: "the quick brown fox jumps over the lazy dog again and again",
        1: "the quick brown fox jumps over the lazy dog again and again!",
        2: "the quick brown fox jumps over the lazy dog again and once more",
        3: "completely different content about ray data pipelines at scale",
        4: "completely different content about ray data pipelines at scale!",
        5: "an unrelated singleton document with no duplicate partner here",
    }
    # make near-dups actually share almost all bigrams
    texts[1] = texts[0] + " extra"
    texts[2] = texts[0] + " more"
    texts[4] = texts[3] + " extra"
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    out = dedup_clusters(ray.data.from_arrow(t), threshold=0.6).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}
    # the keep-rule leaves exactly one representative per cluster
    keep = out[out["doc_id"] == out["cluster_id"]]["doc_id"].tolist()
    assert sorted(keep) == [0, 3]
