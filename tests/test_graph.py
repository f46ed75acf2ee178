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


def _pagerank_reference(edges, n_iters=5, total=10**12):
    """Driver-side integer replay of graph.pagerank's exact formula."""
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    r0 = total // len(nodes)
    base = (15 * r0) // 100
    rank = {n: r0 for n in nodes}
    for _ in range(n_iters):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // deg[s]
        rank = {n: base + (85 * inflow[n]) // 100 for n in nodes}
    return nodes, [rank[n] for n in nodes]


def _run_pagerank(edges, blocks=4, n_iters=5):
    import ray.data

    from georay.graph import pagerank

    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    got = (
        pagerank(ray.data.from_arrow(t).repartition(blocks), n_iters=n_iters)
        .to_pandas()
        .sort_values("node")
    )
    return got["node"].tolist(), got["rank_nano"].tolist()


def test_pagerank_matches_integer_reference_random(ray_session):
    rng = np.random.default_rng(11)
    # random multigraph incl. parallel edges; make it undirected so no
    # node is dangling (the supplier_customer_edges contract)
    half = [
        (int(a), int(b))
        for a, b in rng.integers(0, 40, size=(300, 2))
        if a != b
    ]
    edges = half + [(b, a) for a, b in half]
    nodes, expect = _pagerank_reference(edges)
    got_nodes, got = _run_pagerank(edges)
    assert got_nodes == nodes
    assert got == expect


def test_pagerank_partition_invariant_and_hub_wins(ray_session):
    # star: hub 0 <-> leaves 1..20 — the hub must out-rank every leaf
    edges = [(0, i) for i in range(1, 21)] + [(i, 0) for i in range(1, 21)]
    n1, r1 = _run_pagerank(edges, blocks=1)
    n2, r2 = _run_pagerank(edges, blocks=7)
    assert (n1, r1) == (n2, r2)
    ranks = dict(zip(n1, r1))
    assert all(ranks[0] > ranks[i] for i in range(1, 21))


def test_pagerank_empty(ray_session):
    import ray.data

    from georay.graph import pagerank

    t = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    out = pagerank(ray.data.from_arrow(t).repartition(1), n_iters=5)
    # Ray drops column metadata on empty to_pandas; zero rows is the contract
    assert out.count() == 0


def test_supplier_customer_edges_budget_parity(ray_session, monkeypatch):
    import pandas as pd

    from georay.graph import pagerank, supplier_customer_edges

    sf = "/root/testdata/sf0.001"
    a = pagerank(supplier_customer_edges(sf), n_iters=3).to_pandas()
    monkeypatch.setenv("GEORAY_BROADCAST_BUDGET", "1")  # force bucket path
    b = pagerank(supplier_customer_edges(sf), n_iters=3).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("node").reset_index(drop=True),
        b.sort_values("node").reset_index(drop=True),
    )

def test_cluster_representatives_longest_wins(ray_session):
    import ray.data

    from georay.graph import cluster_representatives

    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content about ray data pipelines at scale"
    texts = {
        0: base,
        1: base + " extra",           # longest in cluster 0
        2: base + " more",
        3: other,
        4: other + " extra",          # longest in cluster 3
        5: "an unrelated singleton document with no duplicate partner here",
    }
    ids = sorted(texts)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[k] for k in ids], pa.string()),
        }
    )
    lens = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array([len(texts[k]) for k in ids], pa.int64()),
        }
    )
    res = cluster_representatives(
        ray.data.from_arrow(t), ray.data.from_arrow(lens), threshold=0.6
    ).to_pandas()
    rows = {r.cluster_id: (r.rep_doc_id, r.rep_n_chars, r.n_members)
            for r in res.itertuples()}
    assert rows == {
        0: (1, len(texts[1]), 3),
        3: (4, len(texts[4]), 2),
    }


def _brute_triangles(edges):
    """Per-node triangle membership counts via adjacency-set brute force."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            # each triangle found once per edge => 3x per triangle,
            # and each membership credited once per containing edge pair
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    # every node's count was accumulated once per incident triangle edge
    # pair apex... simpler: each triangle {x,y,z} enumerated 3 times
    # (once per edge), each time crediting all 3 nodes => divide by 3.
    return {n: c // 3 for n, c in counts.items()}


def _run_tri(edges, blocks=4):
    import ray.data

    from georay.graph import triangle_counts

    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    ds = ray.data.from_arrow(pa.table({"part_a": a, "part_b": b})).repartition(blocks)
    got = triangle_counts(ds).to_pandas()
    return dict(zip(got["part_key"], got["n_triangles"]))


def test_triangle_counts_random_matches_brute(ray_session):
    rng = np.random.default_rng(11)
    seen = set()
    for _ in range(600):
        x, y = sorted(map(int, rng.integers(0, 60, 2)))
        if x != y:
            seen.add((x, y))
    edges = sorted(seen)
    assert _run_tri(edges) == _brute_triangles(edges)


def test_triangle_counts_skew_hub(ray_session):
    # star + rim ring: hub h=0 connects to 1..30; rim edges (i, i+1)
    # close a triangle {0, i, i+1}. Degree ordering must keep the hub's
    # wedge fan bounded and still find every triangle.
    edges = [(0, i) for i in range(1, 31)] + [(i, i + 1) for i in range(1, 30)]
    got = _run_tri(edges, blocks=3)
    assert got == _brute_triangles(edges)
    assert got[0] == 29  # hub sits in every rim triangle


def test_triangle_counts_none(ray_session):
    # bipartite graph: no triangles -> empty output
    edges = [(i, 100 + j) for i in range(5) for j in range(5)]
    assert _run_tri(edges) == {}


def test_triangle_counts_partition_invariant(ray_session):
    rng = np.random.default_rng(13)
    seen = set()
    for _ in range(300):
        x, y = sorted(map(int, rng.integers(0, 40, 2)))
        if x != y:
            seen.add((x, y))
    edges = sorted(seen)
    assert _run_tri(edges, blocks=2) == _run_tri(edges, blocks=13)


def _brute_kcore(edges, k):
    es = set(edges)
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            return deg
        es = {(a, b) for a, b in es if a not in bad and b not in bad}


def _run_kcore(edges, k, blocks=4):
    import ray.data

    from georay.graph import kcore

    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    ds = ray.data.from_arrow(pa.table({"part_a": a, "part_b": b})).repartition(blocks)
    got = kcore(ds, k=k).to_pandas()
    return dict(zip(got["part_key"], got["degree"]))


def test_kcore_random_matches_brute(ray_session):
    rng = np.random.default_rng(5)
    seen = set()
    for _ in range(260):
        x, y = sorted(map(int, rng.integers(0, 50, 2)))
        if x != y:
            seen.add((x, y))
    edges = sorted(seen)
    for k in (2, 3, 4):
        assert _run_kcore(edges, k) == _brute_kcore(edges, k)


def test_kcore_chain_peels_to_empty(ray_session):
    # a path graph has no 2-core: peeling eats it from both ends,
    # one layer per round (exercises the multi-round loop)
    edges = [(i, i + 1) for i in range(20)]
    assert _run_kcore(edges, 2, blocks=3) == {}
    # closing the cycle makes every node degree-2: the whole ring IS
    # the 2-core and the first round is already the fixpoint
    ring = edges + [(0, 20)]
    assert _run_kcore(ring, 2, blocks=3) == {n: 2 for n in range(21)}


def test_kcore_partition_invariant(ray_session):
    rng = np.random.default_rng(17)
    seen = set()
    for _ in range(150):
        x, y = sorted(map(int, rng.integers(0, 30, 2)))
        if x != y:
            seen.add((x, y))
    edges = sorted(seen)
    assert _run_kcore(edges, 3, blocks=2) == _run_kcore(edges, 3, blocks=11)


def test_kcore_distributed_rounds_match_local(ray_session):
    # local_cutoff=0 forces the full BSP peel; it must agree with the
    # single-task local-tail path and with brute force
    import ray.data

    from georay.graph import kcore

    rng = np.random.default_rng(23)
    seen = set()
    for _ in range(200):
        x, y = sorted(map(int, rng.integers(0, 40, 2)))
        if x != y:
            seen.add((x, y))
    edges = sorted(seen)
    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    ds = ray.data.from_arrow(pa.table({"part_a": a, "part_b": b})).repartition(4)
    dist = kcore(ds, k=4, local_cutoff=0).to_pandas()
    got = dict(zip(dist["part_key"], dist["degree"]))
    assert got == _brute_kcore(edges, 4)
    assert got == _run_kcore(edges, 4)


def test_common_neighbors_topk_matches_brute(ray_session):
    import ray.data

    from georay.graph import common_neighbors_topk

    rng = np.random.default_rng(29)
    seen = set()
    for _ in range(300):
        x, y = sorted(map(int, rng.integers(0, 45, 2)))
        if x != y:
            seen.add((x, y))
    edges = sorted(seen)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    brute = []
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in seen:
                continue
            cn = len(adj[a] & adj[b])
            if cn:
                brute.append((-cn, a, b))
    brute.sort()
    want = [(a, b, -nc) for nc, a, b in brute[:15]]

    ea = pa.array([e[0] for e in edges], pa.int64())
    eb = pa.array([e[1] for e in edges], pa.int64())
    ds = ray.data.from_arrow(pa.table({"part_a": ea, "part_b": eb})).repartition(4)
    got_t = common_neighbors_topk(ds, k=15)
    got = list(
        zip(
            got_t["part_a"].to_pylist(),
            got_t["part_b"].to_pylist(),
            got_t["n_common"].to_pylist(),
        )
    )
    assert got == want


def test_triangle_counts_distributed_matches_local(ray_session):
    import ray.data

    from georay.graph import triangle_counts

    rng = np.random.default_rng(37)
    seen = set()
    for _ in range(500):
        x, y = sorted(map(int, rng.integers(0, 55, 2)))
        if x != y:
            seen.add((x, y))
    edges = sorted(seen)
    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    ds = ray.data.from_arrow(pa.table({"part_a": a, "part_b": b})).repartition(4)
    loc = triangle_counts(ds, local_cutoff=10**6).to_pandas()
    dist = triangle_counts(ds, local_cutoff=0).to_pandas()
    assert dict(zip(loc["part_key"], loc["n_triangles"])) == dict(
        zip(dist["part_key"], dist["n_triangles"])
    ) == _brute_triangles(edges)


def test_common_neighbors_distributed_matches_local(ray_session):
    import ray.data

    from georay.graph import common_neighbors_topk

    rng = np.random.default_rng(43)
    seen = set()
    for _ in range(250):
        x, y = sorted(map(int, rng.integers(0, 40, 2)))
        if x != y:
            seen.add((x, y))
    edges = sorted(seen)
    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    ds = ray.data.from_arrow(pa.table({"part_a": a, "part_b": b})).repartition(4)

    def rows(t):
        return list(
            zip(t["part_a"].to_pylist(), t["part_b"].to_pylist(), t["n_common"].to_pylist())
        )

    loc = common_neighbors_topk(ds, k=12, local_cutoff=10**6)
    dist = common_neighbors_topk(ds, k=12, local_cutoff=0)
    assert rows(loc) == rows(dist)


def test_personalized_pagerank_concentrates_on_sources(ray_session):
    """PPR with a single source on a path graph: mass decays with
    distance from the seed; integer reference replay matches exactly."""
    import ray.data

    from georay.graph import pagerank

    # directed 2-cycle chain so every node has out-degree >= 1
    edges = []
    for i in range(5):
        edges.append((i, i + 1))
        edges.append((i + 1, i))
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    got = pagerank(ds, n_iters=5, source_nodes=np.array([0])).to_pandas()
    r = dict(zip(got["node"], got["rank_nano"]))

    # integer reference replay
    nodes = list(range(6))
    deg = {n: sum(1 for a, _ in edges if a == n) for n in nodes}
    rank = {n: (10**12 if n == 0 else 0) for n in nodes}
    base = {n: ((15 * 10**12) // 100 if n == 0 else 0) for n in nodes}
    for _ in range(5):
        inflow = {n: 0 for n in nodes}
        for a, b in edges:
            inflow[b] += rank[a] // deg[a]
        rank = {n: base[n] + (85 * inflow[n]) // 100 for n in nodes}
    assert r == rank
    # mass concentrates near the seed (strict per-hop decay does not
    # hold — a seed's neighbor can out-rank it while the seed keeps
    # pushing 85% of its mass out — but near >> far always does)
    assert r[0] > r[4] and r[1] > r[5] and r[2] > r[5]


def test_hits_integer_replay(ray_session):
    """Distributed HITS must replay the sequential integer L-inf
    reference exactly; on a bipartite star, the hub that links to
    everything dominates."""
    import ray.data

    from georay.graph import hits

    # hubs 0,2 ; authorities 1,3,5 ; hub 0 links to all, hub 2 to one
    edges = [(0, 1), (0, 3), (0, 5), (2, 1)]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    got = hits(ray.data.from_arrow(t).repartition(2), n_iters=3).to_pandas()
    r = dict(zip(got["node"], got["score"]))

    nodes = sorted({n for e in edges for n in e})
    scale = 10**9
    h = {n: scale for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(3):
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[d] += h[s]
        mx = max(max(raw.values()), 1)
        a = {n: v * scale // mx for n, v in raw.items()}
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[s] += a[d]
        mx = max(max(raw.values()), 1)
        h = {n: v * scale // mx for n, v in raw.items()}
    want = {n: (h[n] if n in (0, 2) else a[n]) for n in nodes}
    assert r == want
    assert r[0] == scale and r[0] > r[2]  # dominant hub
    assert r[1] > r[3] == r[5]  # authority 1 has two in-links


def test_hits_both_scores(ray_session):
    """both_scores=True keeps hub AND authority per node (the lossless
    general-directed-graph schema, ADVICE r04); on the bipartite star
    the per-role columns must match the single-score collapse."""
    import ray.data

    from georay.graph import hits

    edges = [(0, 1), (0, 3), (0, 5), (2, 1)]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    single = hits(ds, n_iters=3).to_pandas()
    both = hits(ds, n_iters=3, both_scores=True).to_pandas()
    assert list(both.columns) == ["node", "hub", "authority"]
    s = dict(zip(single["node"], single["score"]))
    for _, row in both.iterrows():
        want = row["hub"] if row["node"] in (0, 2) else row["authority"]
        assert s[row["node"]] == want
    # pure authorities gathered no hub inflow
    assert all(both.set_index("node").loc[[1, 3, 5], "hub"] == 0)


def test_pagerank_disjoint_sources_raise(ray_session):
    """A seed set fully outside the graph must raise, not silently
    zero all mass (ADVICE r04 — the SQL replay divides by zero)."""
    import pytest
    import ray.data

    from georay.graph import pagerank

    t = pa.table(
        {"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 1], pa.int64())}
    )
    with pytest.raises(ValueError, match="source_nodes"):
        pagerank(ray.data.from_arrow(t), n_iters=2, source_nodes=[99, 100])


def test_pagerank_copartition_parity(ray_session):
    """The co-partitioned rank⨝edges fallback must be bit-identical to
    the broadcast path (same integer-nano arithmetic, different
    physical plan) — uniform AND personalized teleport."""
    import ray.data

    from georay.graph import pagerank

    rng = np.random.default_rng(23)
    half = [
        (int(a), int(b)) for a, b in rng.integers(0, 60, size=(400, 2)) if a != b
    ]
    edges = half + [(b, a) for a, b in half]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    for seeds in (None, [0, 3, 7]):
        bc = (
            pagerank(ds, n_iters=4, source_nodes=seeds, mode="broadcast")
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        cp = (
            pagerank(ds, n_iters=4, source_nodes=seeds, mode="copartition")
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert bc.equals(cp), f"copartition diverged (seeds={seeds})"


def test_pagerank_auto_gate_triggers(ray_session, monkeypatch):
    """mode='auto' must reroute to the co-partitioned path once the
    node-universe upper bound exceeds GEORAY_GRAPH_DENSE_BUDGET — and
    still produce the broadcast-identical answer."""
    import ray.data

    from georay.graph import pagerank

    edges = [(i, (i + 1) % 30) for i in range(30)] + [
        ((i + 1) % 30, i) for i in range(30)
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    want = pagerank(ds, n_iters=3, mode="broadcast").to_pandas().sort_values("node")
    monkeypatch.setenv("GEORAY_GRAPH_DENSE_BUDGET", "64")  # 8 nodes' worth
    got = pagerank(ds, n_iters=3, mode="auto").to_pandas().sort_values("node")
    # the gated run must have produced multiple bucket blocks
    assert want.reset_index(drop=True).equals(got.reset_index(drop=True))


def test_pagerank_copartition_disjoint_sources_raise(ray_session):
    import pytest
    import ray.data

    from georay.graph import pagerank

    t = pa.table(
        {"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 1], pa.int64())}
    )
    with pytest.raises(ValueError, match="source_nodes"):
        pagerank(
            ray.data.from_arrow(t), n_iters=2, source_nodes=[99], mode="copartition"
        )


def test_hits_copartition_parity(ray_session):
    """Co-partitioned HITS (src- and dst-keyed edge partitions, global
    max per half-step) must replay the broadcast path exactly, in both
    output schemas."""
    import ray.data

    from georay.graph import hits

    rng = np.random.default_rng(31)
    edges = [
        (int(a) * 2, int(b) * 2 + 1)  # bipartite: even hubs -> odd auths
        for a, b in rng.integers(0, 25, size=(300, 2))
    ]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    for both in (False, True):
        bc = (
            hits(ds, n_iters=3, both_scores=both, mode="broadcast")
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        cp = (
            hits(ds, n_iters=3, both_scores=both, mode="copartition")
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert bc.equals(cp), f"hits copartition diverged (both_scores={both})"


def test_label_propagation_reference(ray_session):
    """Distributed label propagation must replay a sequential
    plurality-vote reference exactly (seeds pinned, ties to the
    smallest label, no-vote nodes keep state), partition-invariant."""
    import ray.data

    from georay.graph import label_propagation

    rng = np.random.default_rng(17)
    half = [(int(a), int(b)) for a, b in rng.integers(0, 30, size=(120, 2)) if a != b]
    edges = [(a, b) for a, b in half] + [(b, a) for a, b in half]
    seeds = {0: 7, 3: 7, 5: 2, 11: 2, 20: 9}
    n_iters = 3

    nodes = sorted({n for e in edges for n in e})
    state = {n: seeds.get(n, -1) for n in nodes}
    for _ in range(n_iters):
        votes = {}
        for s, d in edges:
            if state[s] != -1:
                votes.setdefault(d, {}).setdefault(state[s], 0)
        for s, d in edges:
            if state[s] != -1:
                votes[d][state[s]] += 1
        nxt = dict(state)
        for n in nodes:
            if n in seeds:
                continue
            if n in votes and votes[n]:
                best = sorted(votes[n].items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                nxt[n] = best
        state = nxt

    et = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    st = pa.table(
        {
            "node": pa.array(list(seeds), pa.int64()),
            "label": pa.array(list(seeds.values()), pa.int64()),
        }
    )
    for blocks in (2, 9):
        got = label_propagation(
            ray.data.from_arrow(et).repartition(blocks),
            ray.data.from_arrow(st),
            n_iters=n_iters,
        ).to_pandas()
        assert dict(zip(got["node"], got["label"])) == state


def test_label_propagation_budget_raise(ray_session, monkeypatch):
    """V*L vote state past GEORAY_GRAPH_DENSE_BUDGET must raise loudly
    instead of broadcasting anyway (the dim_side contract)."""
    import pytest
    import ray.data

    from georay.graph import label_propagation

    et = pa.table(
        {"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 1], pa.int64())}
    )
    st = pa.table(
        {"node": pa.array([1], pa.int64()), "label": pa.array([4], pa.int64())}
    )
    monkeypatch.setenv("GEORAY_GRAPH_DENSE_BUDGET", "8")
    with pytest.raises(ValueError, match="DENSE_BUDGET"):
        label_propagation(
            ray.data.from_arrow(et), ray.data.from_arrow(st), n_iters=1
        )
