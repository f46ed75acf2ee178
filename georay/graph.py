"""Distributed connected components over an edge set — the step that
turns pairwise near-dup output ({a, b} pairs from MinHash/LSH or exact
n-gram Jaccard) into dedup CLUSTER ids, so a training pipeline can keep
one representative per duplicate cluster instead of reasoning about
pairs.

Algorithm: BSP min-label propagation (hash-to-min). Every node starts
labeled with itself; each superstep every node takes the min of its own
label and its neighbors' labels; fixed point = every node carries its
component's minimum id. Supersteps are pure Ray Data:

    msgs   = bucket_hash_join(edges, labels)   # one bucketed shuffle
    labels = (labels ∪ msgs).groupby(node).min(label)

Convergence is detected with a driver-side scalar: per-node labels are
monotonically non-increasing, so the global label SUM strictly
decreases until the fixed point — equal consecutive sums == converged
(no per-row old-vs-new join needed). Each superstep materializes the
labels table; that is the BSP barrier, and its size is O(|nodes of the
pair graph|) — the near-dup docs, a small fraction of the corpus —
never the corpus itself. The edge set is materialized ONCE up front so
the (expensive) pair-detection pipeline upstream does not re-execute
every superstep.

Each superstep also applies one pointer-doubling hop (label ←
label(label), a labels⨝labels self-join), so convergence is O(log
longest-path) supersteps rather than O(diameter) — a 1000-link chain
resolves in ~10 barriers, not 1000. `max_iters` is a backstop only.

The reference has no graph ops (SURVEY.md §2.6); this completes the
dedup tier: detect pairs (textops) → cluster (here) → keep
min-per-cluster (a groupby).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from .relational import bucket_hash_join

logger = logging.getLogger("georay.graph")


def connected_components(
    edges: ray.data.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 64,
) -> ray.data.Dataset:
    """(node, cluster_id) for every node appearing in ``edges``, where
    cluster_id = the minimum node id of the node's connected component.
    Node ids must be int64."""

    def bidir(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        # LOCAL CONTRACTION (standard distributed-CC optimization): run
        # a vectorized min-label fixpoint over this block's edges alone
        # and emit one star edge per node to its block-local root. The
        # quotient graph is connectivity-equivalent, |E'| <= |V_block|,
        # and every block-LOCAL component costs the global BSP loop
        # zero supersteps — only genuinely cross-block structure pays
        # the per-superstep barrier.
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        si, di = inv[: len(a)], inv[len(a) :]
        lab = np.arange(len(nodes))
        while True:
            new = lab.copy()
            np.minimum.at(new, si, lab[di])
            np.minimum.at(new, di, lab[si])
            new = np.minimum(new, new[new])  # pointer doubling
            if np.array_equal(new, lab):
                break
            lab = new
        roots = nodes[lab]
        return pa.table(
            {
                "src": pa.array(np.concatenate([nodes, roots]), pa.int64()),
                "dst": pa.array(np.concatenate([roots, nodes]), pa.int64()),
            }
        )

    # pin the edge set: supersteps re-read it, and its upstream is the
    # whole pair-detection pipeline
    raw = edges.materialize()
    n_edges = raw.count()
    if n_edges == 0:  # no pairs: no nodes, no clusters
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        )
    # SIZE edge blocks from the edge count before contracting (the
    # repo-wide "size blocks from data bytes" rule): pair generators
    # emit edges scattered over ~4xCPU tiny blocks, where per-block
    # contraction sees only fragments and every superstep pays fixed
    # latency per block. ~1M edges per block => a small edge set
    # contracts to its components in ONE block (the loop below then
    # just confirms the fixed point), while at 10^12-edge scale blocks
    # stay worker-heap-sized and the BSP loop does the cross-block work.
    nblk = max(1, min(raw.num_blocks(), -(-n_edges // 1_000_000)))
    ebi = (
        raw.repartition(nblk)
        .map_batches(bidir, batch_format="pyarrow")
        .materialize()
    )
    # every superstep's joins and groupbys pay fixed latency PER BLOCK,
    # and an unchecked groupby fans each labels table out to ~200 tiny
    # blocks — after a few iterations the loop is all block overhead.
    # Coalesce labels to an edge-set-proportional block count instead.
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n_parts = max(2, min(2 * cpus, ebi.num_blocks()))

    def init_labels(t: pa.Table) -> pa.Table:
        # fused first superstep: label(x) = min(x, neighbors(x)) comes
        # straight out of the edge rows ((dst, src) pairs plus the
        # self-label), so the loop below starts one propagation round
        # ahead — for the common near-dup case (pair/star clusters)
        # that is already the fixed point and the loop only confirms it
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([dst, src]), pa.int64()),
                "label": pa.array(np.concatenate([src, src]), pa.int64()),
            }
        )

    labels = (
        ebi.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .repartition(n_parts)
        .materialize()
    )
    prev_sum = labels.sum("label")

    def msg(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"], "label": t["label"]})

    def hop(t: pa.Table) -> pa.Table:
        # t rows: (node=x, label=p) joined with (node2=p, label2=label(p))
        return pa.table({"node": t["node"], "label": t["label2"]})

    def relabel(t: pa.Table) -> pa.Table:
        return pa.table({"node2": t["node"], "label2": t["label"]})

    for it in range(max_iters):
        # neighbor min: one bucketed shuffle of |E| + |V|
        joined = bucket_hash_join(ebi, labels, on="src", right_on="node")
        cand = labels.union(joined.map_batches(msg, batch_format="pyarrow"))
        # pointer doubling: label(label(x)) — a labels⨝labels self-join.
        # Neighbor-min alone converges in O(component diameter)
        # supersteps (a 1000-link chain = 1000 barriers); the hop
        # halves the distance-to-root every step, so the loop is
        # O(log n) supersteps at the cost of one extra |V|-sized join.
        # The neighbor-min fixed point alone is the true convergence
        # condition (labels constant across every edge), so the first
        # iteration — which after the fused init is usually just the
        # confirmation round — skips the hop entirely.
        if it > 0:
            hops = bucket_hash_join(
                labels,
                labels.map_batches(relabel, batch_format="pyarrow"),
                on="label",
                right_on="node2",
            ).map_batches(hop, batch_format="pyarrow")
            cand = cand.union(hops)
        labels = (
            cand.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(n_parts)
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum

    logger.warning(
        "connected_components hit max_iters=%d before the fixed point; "
        "labels may not have fully propagated (component diameter > "
        "max_iters)", max_iters,
    )
    return labels


@ray.remote
def _pr_prep(nodes: np.ndarray, block: pa.Table) -> pa.Table:
    """Edge block -> (src_idx, dst_idx) positions into the sorted node
    array, so the per-iteration kernel is pure integer gathers."""
    if block.num_rows == 0:  # empty blocks can carry an empty schema
        empty = np.array([], dtype=np.int64)
        return pa.table({"si": pa.array(empty), "di": pa.array(empty)})
    src = block["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = block["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "si": pa.array(np.searchsorted(nodes, src).astype(np.int64)),
            "di": pa.array(np.searchsorted(nodes, dst).astype(np.int64)),
        }
    )


@ray.remote
def _pr_nodes_partial(block: pa.Table) -> np.ndarray:
    if block.num_rows == 0:  # empty blocks can carry an empty schema
        return np.array([], dtype=np.int64)
    return np.unique(
        np.concatenate(
            [
                block["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                block["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
            ]
        )
    )


@ray.remote
def _pr_union(*parts):
    return np.unique(np.concatenate(parts))


@ray.remote
def _pr_deg_partial(n_nodes: int, prep: pa.Table) -> np.ndarray:
    out = np.zeros(n_nodes, dtype=np.int64)
    np.add.at(out, prep["si"].to_numpy(zero_copy_only=False), 1)
    return out


@ray.remote
def _pr_inflow_partial(rank, deg, prep: pa.Table) -> np.ndarray:
    """One edge block's inflow: each edge instance carries
    rank[src] // outdeg[src] nano-units to dst. Integer adds are exact
    and associative, so the fan-in tree is order-free."""
    si = prep["si"].to_numpy(zero_copy_only=False)
    di = prep["di"].to_numpy(zero_copy_only=False)
    out = np.zeros(len(rank), dtype=np.int64)
    np.add.at(out, di, rank[si] // deg[si])
    return out


@ray.remote
def _pr_sum_dense(*parts):
    out = parts[0].copy()
    for p in parts[1:]:
        out += p
    return out


# ----------------------------------------------------------------
# Co-partitioned iterative-graph fallback (VERDICT r04 #2).
#
# The broadcast path ships an O(|V|) int64 rank vector to every edge
# block each iteration — the right trade while the node universe is
# dimension-sized (hosts, not pages, in a web graph). Past the dense
# budget (GEORAY_GRAPH_DENSE_BUDGET, default 256 MB — the dim_side
# convention, relational.py:60) the fallback keeps BOTH sides
# partitioned by the same hash: edges are bucketed ONCE by
# hash(src) % B (so a src's full out-degree is bucket-local), rank
# lives as per-bucket (sorted nodes_b, rank_b) int64 arrays pinned in
# the object store, and each iteration is scatter (bucket-local
# rank⨝edges -> per-dst-bucket partial inflow tables) + apply (gather
# the B partials addressed to the bucket). Driver state is O(B) refs
# and a handful of ints — never O(|V|) — and per-iteration traffic is
# B^2 k-bounded partial tables instead of B copies of the full rank
# vector. Same integer-nano arithmetic as the broadcast path, so the
# two modes are bit-identical (pinned by tests/test_graph.py parity).

DEFAULT_GRAPH_DENSE_BUDGET_BYTES = 256 << 20


def _graph_dense_budget() -> int:
    import os

    return int(
        os.environ.get("GEORAY_GRAPH_DENSE_BUDGET", DEFAULT_GRAPH_DENSE_BUDGET_BYTES)
    )


def _gp_hash(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    # same multiplicative hash as relational._hash_bucket: rank buckets
    # and edge buckets MUST agree or co-partitioning silently breaks
    return np.abs((keys.astype(np.int64) * np.int64(2654435761)) % np.int64(n_buckets))


@ray.remote
def _gp_len(arr: np.ndarray) -> int:
    return int(len(arr))


@ray.remote
def _gp_split_nodes(n_buckets: int, uniq: np.ndarray):
    """One block's distinct nodes split by hash(node) % B."""
    hb = _gp_hash(uniq, n_buckets)
    return tuple(uniq[hb == b] for b in range(n_buckets))


@ray.remote
def _gp_union_sorted(*parts) -> np.ndarray:
    return np.unique(np.concatenate(parts)) if parts else np.array([], np.int64)


@ray.remote
def _gp_split_edges(n_buckets: int, key_col: str, block: pa.Table):
    """One edge block split by hash(key_col) % B (key_col = 'src' for
    the PageRank/authority gather, 'dst' for the HITS hub gather)."""
    if block.num_rows == 0:
        e = np.array([], np.int64)
        return tuple(pa.table({"src": pa.array(e), "dst": pa.array(e)}) for _ in range(n_buckets))
    src = block["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = block["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    hb = _gp_hash(src if key_col == "src" else dst, n_buckets)
    out = []
    for b in range(n_buckets):
        m = hb == b
        out.append(pa.table({"src": pa.array(src[m]), "dst": pa.array(dst[m])}))
    return tuple(out)


@ray.remote
def _gp_build_part(key_col: str, *subtables) -> pa.Table:
    """Concat one bucket's edge rows, sorted by the bucket key, with
    the per-edge key-side degree materialized (the full degree IS
    bucket-local because every edge with this key hashes here)."""
    t = pa.concat_tables([s for s in subtables if s.num_rows], promote_options="default") \
        if any(s.num_rows for s in subtables) else None
    if t is None:
        e = np.array([], np.int64)
        return pa.table({"src": pa.array(e), "dst": pa.array(e), "deg": pa.array(e)})
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    key = src if key_col == "src" else dst
    order = np.argsort(key, kind="stable")
    src, dst = src[order], dst[order]
    key = key[order]
    starts = np.r_[0, np.flatnonzero(key[1:] != key[:-1]) + 1]
    counts = np.diff(np.r_[starts, len(key)])
    deg = np.repeat(counts, counts).astype(np.int64)
    return pa.table({"src": pa.array(src), "dst": pa.array(dst), "deg": pa.array(deg)})


@ray.remote
def _gp_scatter(
    n_buckets: int,
    part: pa.Table,
    nodes_b: np.ndarray,
    rank_b: np.ndarray,
    divide_by_deg: bool,
    gather_col: str,
):
    """One src-bucket's iteration half: score each edge from the
    co-located rank slice, partial-sum per destination node, split by
    the destination's bucket. Integer sums via sort + add.reduceat
    (bincount(weights=...) would silently go float64)."""
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "inflow": pa.array([], pa.int64())}
    )
    if part.num_rows == 0:
        return tuple(empty for _ in range(n_buckets))
    src = part["src"].to_numpy(zero_copy_only=False)
    dst = part["dst"].to_numpy(zero_copy_only=False)
    key, other = (src, dst) if gather_col == "dst" else (dst, src)
    flow = rank_b[np.searchsorted(nodes_b, key)]
    if divide_by_deg:
        flow = flow // part["deg"].to_numpy(zero_copy_only=False)
    hb = _gp_hash(other, n_buckets)
    out = []
    for c in range(n_buckets):
        m = hb == c
        d, f = other[m], flow[m]
        if not len(d):
            out.append(empty)
            continue
        order = np.argsort(d, kind="stable")
        d, f = d[order], f[order]
        starts = np.r_[0, np.flatnonzero(d[1:] != d[:-1]) + 1]
        out.append(
            pa.table(
                {
                    "node": pa.array(d[starts], pa.int64()),
                    "inflow": pa.array(np.add.reduceat(f, starts), pa.int64()),
                }
            )
        )
    return tuple(out)


@ray.remote
def _gp_gather_raw(nodes_b: np.ndarray, *partials) -> np.ndarray:
    """Sum the B partial inflow tables addressed to this bucket into a
    nodes_b-aligned dense int64 vector."""
    inflow = np.zeros(len(nodes_b), dtype=np.int64)
    for p in partials:
        if p.num_rows == 0:
            continue
        idx = np.searchsorted(nodes_b, p["node"].to_numpy(zero_copy_only=False))
        np.add.at(inflow, idx, p["inflow"].to_numpy(zero_copy_only=False))
    return inflow


@ray.remote
def _gp_apply_pr(base_b: np.ndarray, damping_pct: int, inflow: np.ndarray) -> np.ndarray:
    return base_b + (damping_pct * inflow) // 100


@ray.remote
def _gp_vec_max(vec: np.ndarray) -> int:
    return int(vec.max()) if len(vec) else 0


@ray.remote
def _gp_linf(vec: np.ndarray, global_max: int, scale: int) -> np.ndarray:
    """Bucket slice of _linf_scale: same Python-int (HUGEINT) multiply
    against the GLOBAL max, so the distributed normalize is
    bit-identical to the driver-side one."""
    mx = max(global_max, 1)
    return np.array([int(v) * scale // mx for v in vec.tolist()], dtype=np.int64)


@ray.remote(num_returns=2)
def _gp_init_pr(nodes_b: np.ndarray, r0: int, damping_pct: int, src_ids):
    """(rank_b, base_b) for one bucket: uniform teleport when src_ids
    is None, else mass only on the bucket's seed positions."""
    if src_ids is None:
        rank = np.full(len(nodes_b), r0, dtype=np.int64)
        base = np.full(len(nodes_b), ((100 - damping_pct) * r0) // 100, np.int64)
        return rank, base
    pos = np.searchsorted(nodes_b, np.intersect1d(src_ids, nodes_b))
    rank = np.zeros(len(nodes_b), dtype=np.int64)
    base = np.zeros(len(nodes_b), dtype=np.int64)
    rank[pos] = r0
    base[pos] = ((100 - damping_pct) * r0) // 100
    return rank, base


@ray.remote
def _gp_count_in(nodes_b: np.ndarray, ids: np.ndarray) -> int:
    return int(len(np.intersect1d(nodes_b, ids)))


@ray.remote
def _gp_out(nodes_b: np.ndarray, rank_b: np.ndarray, col: str) -> pa.Table:
    return pa.table({"node": pa.array(nodes_b), col: pa.array(rank_b, pa.int64())})


@ray.remote
def _gp_out_hits(
    nodes_b: np.ndarray, h_b: np.ndarray, a_b: np.ndarray, outdeg_b: np.ndarray, both: bool
) -> pa.Table:
    if both:
        return pa.table(
            {
                "node": pa.array(nodes_b),
                "hub": pa.array(h_b, pa.int64()),
                "authority": pa.array(a_b, pa.int64()),
            }
        )
    return pa.table(
        {
            "node": pa.array(nodes_b),
            "score": pa.array(np.where(outdeg_b > 0, h_b, a_b), pa.int64()),
        }
    )


def _gp_partition(refs, n_buckets: int, key_col: str):
    """Shuffle edge blocks ONCE into B pinned bucket partitions keyed
    by hash(key_col), with per-edge key-side degree precomputed."""
    splits = [
        _gp_split_edges.options(num_returns=n_buckets).remote(n_buckets, key_col, r)
        for r in refs
    ]
    return [
        _gp_build_part.remote(key_col, *[s[b] for s in splits])
        for b in range(n_buckets)
    ]


def _gp_node_buckets(nparts, n_buckets: int):
    """Per-bucket sorted node-universe arrays from the per-block
    distinct-node refs; driver sees only refs and B lengths."""
    nsplits = [
        _gp_split_nodes.options(num_returns=n_buckets).remote(n_buckets, p)
        for p in nparts
    ]
    nodes_b = [
        _gp_union_sorted.remote(*[s[b] for s in nsplits]) for b in range(n_buckets)
    ]
    lens = ray.get([_gp_len.remote(nb) for nb in nodes_b])
    return nodes_b, lens


def _gp_n_buckets(ub_nodes: int, budget: int) -> int:
    """Bucket count so one bucket's dense state stays well under the
    budget; capped at 128 so the per-iteration B^2 partial-table count
    stays bounded (at 128 that is 16k small objects — raise the budget
    env, not the cap, for a larger node universe)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    per_bucket = max(1, budget // 8)
    return int(min(128, max(8, cpus, -(-ub_nodes * 8 // per_bucket))))


def _pagerank_copartition(
    refs,
    nparts,
    n_iters: int,
    damping_pct: int,
    total_nano: int,
    source_nodes,
    n_buckets: int,
):
    B = n_buckets
    nodes_b, lens = _gp_node_buckets(nparts, B)
    n_nodes = sum(lens)
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "rank_nano": pa.array([], pa.int64())}
            )
        )
    parts = _gp_partition(refs, B, "src")
    if source_nodes is None:
        r0 = total_nano // n_nodes
        src_ref = None
    else:
        src_arr = np.unique(np.asarray(source_nodes, dtype=np.int64))
        ns = sum(ray.get([_gp_count_in.remote(nb, src_arr) for nb in nodes_b]))
        if ns == 0:
            raise ValueError(
                "pagerank: no source_nodes intersect the graph's node set"
            )
        r0 = total_nano // ns
        src_ref = ray.put(src_arr)
    inits = [_gp_init_pr.remote(nodes_b[b], r0, damping_pct, src_ref) for b in range(B)]
    rank_b = [i[0] for i in inits]
    base_b = [i[1] for i in inits]
    for _ in range(n_iters):
        scatters = [
            _gp_scatter.options(num_returns=B).remote(
                B, parts[b], nodes_b[b], rank_b[b], True, "dst"
            )
            for b in range(B)
        ]
        rank_b = [
            _gp_apply_pr.remote(
                base_b[c],
                damping_pct,
                _gp_gather_raw.remote(nodes_b[c], *[scatters[b][c] for b in range(B)]),
            )
            for c in range(B)
        ]
    return ray.data.from_arrow_refs(
        [_gp_out.remote(nodes_b[b], rank_b[b], "rank_nano") for b in range(B)]
    )


def pagerank(
    edges: ray.data.Dataset,
    n_iters: int = 5,
    damping_pct: int = 85,
    total_nano: int = 10**12,
    source_nodes=None,
    mode: str = "auto",
) -> ray.data.Dataset:
    """Integer-exact PageRank over a directed multigraph edge list
    (``src``/``dst`` int64 columns; parallel edges count as
    multiplicity). Fixed ``n_iters`` supersteps, no convergence test —
    the iterative-numeric-BSP pattern.

    Why integers: rank mass lives in int64 "nano-units"
    (``total_nano`` split evenly at iteration 0) and every operation —
    floor-division by out-degree, damping as ``*85 // 100``, the
    teleport base — is exact and associative. A SQL engine replaying
    the same formula reaches bit-identical ranks regardless of its
    float summation order, which is what makes an iterative numeric
    algorithm oracle-checkable at all.

    Scale shape (``mode="auto"``, the default, GATED — VERDICT r04
    #2): while the node universe fits the dense budget
    (GEORAY_GRAPH_DENSE_BUDGET, default 256 MB; checked against a
    cheap sum-of-block-distincts upper bound on |V| BEFORE anything
    O(|V|) reaches the driver), the edge set is pinned once and each
    iteration broadcasts the O(|V|) rank vector (``ray.put``, read
    once per task), every edge block emits a dense int64 inflow
    vector, and a remote fan-in tree sums them — the right trade for
    a dimension-sized universe (hosts, not pages, in a web graph),
    the same bounded-small-side contract as the dim_side broadcasts
    (relational.py:76). A beyond-budget universe automatically
    switches to the co-partitioned rank⨝edges path
    (_pagerank_copartition above): per-bucket rank arrays co-located
    with hash(src)-bucketed edges, B^2 k-bounded partial-inflow
    tables per iteration, O(B) driver state. Both modes run the same
    integer arithmetic and are bit-identical (parity-pinned in
    tests); force one with ``mode="broadcast"``/``"copartition"``.

    The reference has no graph ops (SURVEY.md §2.6); this adds the
    canonical web-graph quality signal used in pretraining-data
    curation (page/host importance weighting).
    """
    from .textops import _tree_reduce

    if mode not in ("auto", "broadcast", "copartition"):
        raise ValueError(f"pagerank: unknown mode {mode!r}")
    refs = edges.materialize().to_arrow_refs()
    nparts = [_pr_nodes_partial.remote(r) for r in refs]
    if mode != "broadcast":
        # gate on a sum-of-block-distincts UPPER bound on |V|: if even
        # the overcount fits the budget, broadcasting is safe; the
        # bound costs B ints of driver traffic, never the node array
        ub = sum(ray.get([_gp_len.remote(p) for p in nparts]))
        budget = _graph_dense_budget()
        if mode == "copartition" or ub * 8 > budget:
            return _pagerank_copartition(
                refs,
                nparts,
                n_iters,
                damping_pct,
                total_nano,
                source_nodes,
                _gp_n_buckets(ub, budget),
            )
    nodes = ray.get(_tree_reduce(nparts, _pr_union))
    n_nodes = int(len(nodes))
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "rank_nano": pa.array([], pa.int64())}
            )
        )
    nodes_ref = ray.put(nodes)
    preps = [_pr_prep.remote(nodes_ref, r) for r in refs]
    deg = ray.get(
        _tree_reduce([_pr_deg_partial.remote(n_nodes, p) for p in preps], _pr_sum_dense)
    )
    deg_ref = ray.put(deg)

    if source_nodes is None:
        r0 = total_nano // n_nodes
        rank = np.full(n_nodes, r0, dtype=np.int64)
        base_vec = np.full(n_nodes, ((100 - damping_pct) * r0) // 100, np.int64)
    else:
        # PERSONALIZED PageRank: teleport mass concentrates on the
        # source cohort instead of the uniform vector — relevance
        # relative to a seed set (graph-based retrieval/expansion).
        # Same integer-nano exactness: only the base/init vectors
        # change, every update op is unchanged.
        src = np.intersect1d(
            np.asarray(source_nodes, dtype=np.int64), nodes
        )  # sources outside the graph carry no mass
        if len(src) == 0:
            # an all-outside seed set would silently zero every rank
            # here while the SQL replay divides by zero — fail loudly
            # instead of diverging (ADVICE r04)
            raise ValueError(
                "pagerank: no source_nodes intersect the graph's node set"
            )
        ns = len(src)
        pos = np.searchsorted(nodes, src)
        r0s = total_nano // ns
        rank = np.zeros(n_nodes, dtype=np.int64)
        rank[pos] = r0s
        base_vec = np.zeros(n_nodes, dtype=np.int64)
        base_vec[pos] = ((100 - damping_pct) * r0s) // 100
    for _ in range(n_iters):
        rank_ref = ray.put(rank)
        inflow = ray.get(
            _tree_reduce(
                [_pr_inflow_partial.remote(rank_ref, deg_ref, p) for p in preps],
                _pr_sum_dense,
            )
        )
        rank = base_vec + (damping_pct * inflow) // 100
    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "rank_nano": pa.array(rank)})
    )


def supplier_customer_edges(sf_dir: str) -> ray.data.Dataset:
    """The sandbox stand-in for a web host-link graph: the undirected
    customer↔supplier interaction multigraph (one edge instance per
    lineitem, via its order's customer), node ids namespaced as
    custkey*2 / suppkey*2+1. Undirected = both directed instances, so
    every node has out-degree >= 1 and PageRank has no dangling mass."""
    from .relational import (
        _read,
        bucket_hash_join,
        broadcast_map_batches,
        dim_side,
    )

    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    mode, orders = dim_side(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    if mode == "broadcast":
        # orders is the dimension side here (2 int columns): a sorted
        # (orderkey -> custkey) array pair broadcast once beats the
        # bucketed shuffle's ~5 s fixed all-to-all latency; dim_side
        # gates on the 256 MB budget so an over-budget orders table
        # still routes through the bucketed join below
        ok = orders["o_orderkey"].to_numpy().astype(np.int64)
        ck = orders["o_custkey"].to_numpy().astype(np.int64)
        order_sort = np.argsort(ok)
        lookup_ref = ray.put((ok[order_sort], ck[order_sort]))

        def via_lookup(t: pa.Table, lookup) -> pa.Table:
            keys, custs = lookup
            lo = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(keys, lo)
            c = custs[pos] * 2
            s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 2 + 1
            return pa.table(
                {
                    "src": pa.array(np.concatenate([c, s])),
                    "dst": pa.array(np.concatenate([s, c])),
                }
            )

        return broadcast_map_batches(lineitem, via_lookup, lookup_ref)

    joined = bucket_hash_join(orders, lineitem, on="o_orderkey", right_on="l_orderkey")

    def both_dirs(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 2
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 2 + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, s])),
                "dst": pa.array(np.concatenate([s, c])),
            }
        )

    return joined.map_batches(both_dirs, batch_format="pyarrow")


def dedup_clusters(docs: ray.data.Dataset, threshold: float = 0.8):
    """(doc_id, cluster_id) for every doc in a near-dup pair: MinHash+
    LSH pair detection (textops.minhash_near_dups) followed by
    connected components. cluster_id = min doc_id of the cluster, so
    "keep one per cluster" is ``filter(doc_id == cluster_id)``."""
    from .textops import minhash_near_dups

    pairs = minhash_near_dups(docs, threshold=threshold)
    cc = connected_components(pairs, a_col="a", b_col="b")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"], "cluster_id": t["label"]})

    return cc.map_batches(rename, batch_format="pyarrow")


def cluster_representatives(
    docs: ray.data.Dataset, lens: ray.data.Dataset, threshold: float = 0.8
):
    """Keep-one-per-cluster selection — the step AFTER dedup_clusters
    in a real curation pipeline: for every near-dup cluster pick the
    LONGEST member (max n_chars, ties -> min doc_id) as the survivor.

    ``lens`` is a (doc_id, n_chars) dataset (read with column pruning —
    the length join must not re-ship text). Cluster membership is a
    small fraction of the corpus but unbounded in absolute size, so the
    length attach is a bucketed hash join (no broadcast) and the
    per-cluster argmax is ONE hash-bucketed groupby: inside a bucket a
    single lexsort finds each cluster's first row by (-n_chars, doc_id)
    and run lengths give member counts. No driver materialization.

    Output: cluster_id, rep_doc_id, rep_n_chars, n_members."""
    from .relational import _n_partitions, bucket_hash_join

    clusters = dedup_clusters(docs, threshold=threshold)
    joined = bucket_hash_join(clusters, lens, on="doc_id")
    n_parts = _n_partitions()

    def rebucket(t: pa.Table) -> pa.Table:
        cid = t["cluster_id"].to_numpy(zero_copy_only=False)
        b = (cid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_parts)
        return pa.table(
            {
                "cluster_id": t["cluster_id"],
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "__b": pa.array(b.astype(np.int64), pa.int64()),
            }
        )

    def argmax_bucket(t: pa.Table) -> pa.Table:
        cid = t["cluster_id"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        ln = t["n_chars"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -ln, cid))
        cid, did, ln = cid[order], did[order], ln[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(cid))[0] + 1]).astype(np.int64)
        counts = np.diff(np.concatenate([starts, [len(cid)]]))
        return pa.table(
            {
                "cluster_id": pa.array(cid[starts], pa.int64()),
                "rep_doc_id": pa.array(did[starts], pa.int64()),
                "rep_n_chars": pa.array(ln[starts], pa.int64()),
                "n_members": pa.array(counts, pa.int64()),
            }
        )

    return (
        joined.map_batches(rebucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(argmax_bucket, batch_format="pyarrow")
    )


def triangle_counts(
    edges: ray.data.Dataset,
    a_col: str = "part_a",
    b_col: str = "part_b",
    local_cutoff: int = 200_000,
):
    """Per-node triangle counts over an undirected simple graph —
    the degree-ordered node-iterator algorithm (Schank/Wagner; the
    MapReduce form is Suri & Vassilvitskii's "Counting Triangles and
    the Curse of the Last Reducer"). ``edges`` holds one row per
    undirected edge with a_col < b_col (id order).

    Shape, all bucketed map_groups (no driver state, no broadcast):
    1. degree per node: endpoint fan-out -> hash-bucketed count;
    2. attach both endpoint degrees with two bucketed hash joins;
    3. orient every edge from its LOWER (deg, id) endpoint — the
       skew killer: a hub of degree d generates wedges only from
       neighbors that out-rank it, bounding total wedges by O(m^1.5)
       regardless of degree distribution;
    4. wedge generation per source (same repeat/cumsum index
       arithmetic as part_pair_counts), wedge key = packed id-order
       (lo << 32 | hi) so it collides exactly with the edge key;
    5. co-partition wedges + edges on the pair key: a wedge whose key
       exists as an edge closes a triangle -> credit all three nodes;
    6. final hash-bucketed per-node sum.

    Output: part_key, n_triangles (nodes in >= 1 triangle only)."""
    from .relational import _hash_bucket, _n_partitions, bucket_hash_join

    n_parts = _n_partitions()

    def endpoints(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "__bucket": pa.array(_hash_bucket(node, n_parts), pa.int64()),
            }
        )

    def count_deg(t: pa.Table) -> pa.Table:
        node, cnt = np.unique(t["node"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "deg": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    edges = edges.select_columns([a_col, b_col]).materialize()
    if edges.count() <= local_cutoff:
        # degree-ordered wedges bound work at O(m^1.5); below the
        # cutoff that fits ONE worker, and the distributed path would
        # pay ~6 fixed shuffle latencies for microseconds of compute
        # (the kcore local-tail rule)
        out = ray.get(_tri_local.remote(a_col, b_col, *edges.to_arrow_refs()))
        return out if out.num_rows == 0 else ray.data.from_arrow(out)
    degs = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(count_deg, batch_format="pyarrow")
    )

    def rn(old, new):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([new if c == old else c for c in t.column_names])

        return f

    with_da = bucket_hash_join(
        edges, degs.map_batches(rn("deg", "deg_a"), batch_format="pyarrow"),
        on=a_col, right_on="node",
    )
    with_db = bucket_hash_join(
        with_da.drop_columns(["node"]),
        degs.map_batches(rn("deg", "deg_b"), batch_format="pyarrow"),
        on=b_col, right_on="node",
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        da = t["deg_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = t["deg_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "__bucket": pa.array(_hash_bucket(src, n_parts), pa.int64()),
            }
        )

    oriented = with_db.map_batches(orient, batch_format="pyarrow")

    def wedges(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        n = len(src)
        if n == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "apex": pa.array([], pa.int64()),
                    "is_edge": pa.array([], pa.int8()),
                    "__b2": pa.array([], pa.int64()),
                }
            )
        starts = np.concatenate(([0], np.flatnonzero(src[1:] != src[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        ends_of = np.repeat(ends, ends - starts)
        pos = np.arange(n, dtype=np.int64)
        reps = ends_of - pos - 1
        total = int(reps.sum())
        i_idx = np.repeat(pos, reps)
        run0 = np.concatenate(([0], np.cumsum(reps)[:-1]))
        j_idx = np.arange(total, dtype=np.int64) - np.repeat(run0, reps) + i_idx + 1
        v, w = dst[i_idx], dst[j_idx]
        lo, hi = np.minimum(v, w), np.maximum(v, w)
        wkey = (lo << np.int64(32)) | hi
        apex = src[i_idx]
        return pa.table(
            {
                "key": pa.array(wkey, pa.int64()),
                "apex": pa.array(apex, pa.int64()),
                "is_edge": pa.array(np.zeros(total, np.int8), pa.int8()),
                "__b2": pa.array(_hash_bucket(wkey, n_parts), pa.int64()),
            }
        )

    def edge_keys(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and int(max(a.max(), b.max())) >= (1 << 31):
            raise ValueError("triangle_counts: node id >= 2^31, widen the pack")
        key = (a << np.int64(32)) | b
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "apex": pa.array(np.full(len(a), -1, np.int64), pa.int64()),
                "is_edge": pa.array(np.ones(len(a), np.int8), pa.int8()),
                "__b2": pa.array(_hash_bucket(key, n_parts), pa.int64()),
            }
        )

    wedge_rows = oriented.groupby("__bucket").map_groups(wedges, batch_format="pyarrow")
    edge_rows = edges.map_batches(edge_keys, batch_format="pyarrow")

    def close_bucket(t: pa.Table) -> pa.Table:
        is_edge = t["is_edge"].to_numpy(zero_copy_only=False).astype(bool)
        key = t["key"].to_numpy(zero_copy_only=False)
        apex = t["apex"].to_numpy(zero_copy_only=False)
        ekeys = np.sort(key[is_edge])
        wk, wa = key[~is_edge], apex[~is_edge]
        if len(wk) == 0 or len(ekeys) == 0:
            node = np.array([], np.int64)
            cnt = np.array([], np.int64)
        else:
            pos = np.searchsorted(ekeys, wk)
            pos[pos >= len(ekeys)] = len(ekeys) - 1
            closed = ekeys[pos] == wk
            wk, wa = wk[closed], wa[closed]
            nodes = np.concatenate(
                [wa, wk >> np.int64(32), wk & np.int64(0xFFFFFFFF)]
            )
            node, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "__b3": pa.array(_hash_bucket(node, n_parts), pa.int64()),
            }
        )

    def sum_nodes(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(node)
        node, cnt = node[order], cnt[order]
        starts = (
            np.concatenate(([0], np.flatnonzero(node[1:] != node[:-1]) + 1))
            if len(node)
            else np.array([], np.int64)
        )
        totals = np.add.reduceat(cnt, starts) if len(node) else np.array([], np.int64)
        return pa.table(
            {
                "part_key": pa.array(node[starts], pa.int64()),
                "n_triangles": pa.array(totals.astype(np.int64), pa.int64()),
            }
        )

    out = (
        wedge_rows.union(edge_rows)
        .groupby("__b2")
        .map_groups(close_bucket, batch_format="pyarrow")
        .groupby("__b3")
        .map_groups(sum_nodes, batch_format="pyarrow")
    ).materialize()
    # a triangle-free graph yields only the groupby's zero-COLUMN empty
    # partitions, Ray unifies the dataset schema to {} and consumers
    # lose the columns — return a typed empty table instead. (The
    # materialize is the result the caller consumes anyway; its size is
    # the node-level count table, not the edge/wedge stream.)
    if out.count() == 0:
        return pa.table(
            {
                "part_key": pa.array([], pa.int64()),
                "n_triangles": pa.array([], pa.int64()),
            }
        )
    return out


@ray.remote
def _peel_local(k: int, a_col: str, b_col: str, *blocks):
    """Finish the peel on one worker once the surviving edge set fits
    its heap: the entire remaining fixpoint runs as vectorized numpy
    rounds with zero shuffle barriers. Returns the final {part_key,
    degree} table."""
    empty = pa.table(
        {"part_key": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())}
    )
    live = [t for t in blocks if t.num_rows]
    if not live:
        return empty
    t = pa.concat_tables(live)
    a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
    while len(a):
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        deg = np.bincount(inv)
        ia, ib = inv[: len(a)], inv[len(a) :]
        keep = (deg[ia] >= k) & (deg[ib] >= k)
        if keep.all():
            return pa.table(
                {
                    "part_key": pa.array(nodes, pa.int64()),
                    "degree": pa.array(deg.astype(np.int64), pa.int64()),
                }
            )
        a, b = a[keep], b[keep]
    return empty


def kcore(
    edges: ray.data.Dataset,
    k: int = 3,
    a_col: str = "part_a",
    b_col: str = "part_b",
    max_rounds: int = 64,
    local_cutoff: int = 2_000_000,
):
    """k-core decomposition by distributed iterative peeling (the BSP
    form of Matula-Beck; cf. Montresor et al., "Distributed k-Core
    Decomposition"): repeatedly delete every node whose degree in the
    surviving subgraph is < k until a fixpoint. Output: {part_key,
    degree} — each surviving node with its induced-subgraph degree
    (>= k by definition).

    Per round, all bucketed (no driver state beyond two scalars):
    degree table via endpoint fan-out + hash-bucketed run count, then
    TWO bucket_hash_joins attach deg_a/deg_b to every edge and a
    vectorized filter keeps edges with both endpoints >= k. The edge
    set shrinks monotonically, so each round's shuffle is over a
    smaller graph; convergence is detected from the materialized edge
    count (no separate 'bad node' pass). Rounds are inherent to
    peeling (same superstep argument as connected_components); real
    graphs converge in tens of rounds — and once the surviving edge
    set drops under `local_cutoff`, the remaining rounds (the long
    low-volume tail where BSP barriers dominate) finish in ONE
    vectorized task over the materialized blocks.
    """
    from .relational import _hash_bucket, _n_partitions, bucket_hash_join

    n_parts = _n_partitions()

    def endpoints(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "__bucket": pa.array(_hash_bucket(node, n_parts), pa.int64()),
            }
        )

    def count_deg(t: pa.Table) -> pa.Table:
        node, cnt = np.unique(
            t["node"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "deg": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def degree_of(es: ray.data.Dataset) -> ray.data.Dataset:
        return (
            es.map_batches(endpoints, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(count_deg, batch_format="pyarrow")
        )

    def rn(old, new):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([new if c == old else c for c in t.column_names])

        return f

    def keep_core_edges(t: pa.Table) -> pa.Table:
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        db = t["deg_b"].to_numpy(zero_copy_only=False)
        sel = pa.array(np.flatnonzero((da >= k) & (db >= k)), pa.int64())
        return pa.table(
            {a_col: t[a_col].take(sel), b_col: t[b_col].take(sel)}
        )

    es = edges.select_columns([a_col, b_col]).materialize()
    n_prev = es.count()
    converged = False
    for _ in range(max_rounds):
        if n_prev == 0:
            converged = True
            break
        if n_prev <= local_cutoff:
            # the surviving graph fits one worker: the remaining rounds
            # are pure barrier overhead distributed (each costs ~3 fixed
            # shuffle latencies regardless of size) — finish the
            # fixpoint in ONE task over the materialized block refs.
            out = ray.get(_peel_local.remote(k, a_col, b_col, *es.to_arrow_refs()))
            if out.num_rows == 0:
                return out
            return ray.data.from_arrow(out)
        degs = degree_of(es).materialize()
        with_da = bucket_hash_join(
            es,
            degs.map_batches(rn("deg", "deg_a"), batch_format="pyarrow"),
            on=a_col,
            right_on="node",
        )
        with_db = bucket_hash_join(
            with_da.drop_columns(["node"]),
            degs.map_batches(rn("deg", "deg_b"), batch_format="pyarrow"),
            on=b_col,
            right_on="node",
        )
        # coalesce before the barrier: each round's joins/groupbys fan
        # the (shrinking) edge set out to ~join-bucket-count blocks, and
        # every subsequent round pays fixed latency PER BLOCK — without
        # this a 10-round peel compounds to thousands of near-empty
        # blocks (same rule as connected_components' label coalesce).
        # ~1M edges per block keeps blocks worker-heap-sized at scale.
        nblk = max(2, -(-n_prev // 1_000_000))
        es = (
            with_db.map_batches(keep_core_edges, batch_format="pyarrow")
            .repartition(nblk)
            .materialize()
        )
        n = es.count()
        if n == n_prev:  # no edge died -> every surviving degree >= k
            converged = True
            break
        n_prev = n
    if not converged and n_prev > 0:
        # max_rounds exhausted while edges were still dying: the partial
        # peel would violate the "every surviving degree >= k" contract,
        # so fail loudly instead of returning a wrong core (ADVICE r04)
        raise RuntimeError(
            f"kcore: fixpoint not reached in {max_rounds} rounds "
            f"({n_prev} edges alive); raise max_rounds"
        )

    def to_out(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["part_key" if c == "node" else "degree" for c in t.column_names]
        )

    out = (
        degree_of(es)
        .map_batches(to_out, batch_format="pyarrow")
        .select_columns(["part_key", "degree"])
        .materialize()
    )
    if out.count() == 0:
        # same all-empty schema-loss hazard as triangle_counts: the
        # groupby emits zero-column blocks for empty partitions
        return pa.table(
            {
                "part_key": pa.array([], pa.int64()),
                "degree": pa.array([], pa.int64()),
            }
        )
    return out


@ray.remote
def _merge_cn_topk(k: int, *tables):
    """Fan-in: global top-k candidate links by (n_common desc, part_a,
    part_b) — associative under the total order, so the driver sees
    O(k), not O(k x blocks)."""
    t = pa.concat_tables([x for x in tables if x.num_rows])
    if t.num_rows == 0:
        return tables[0]
    a = t["part_a"].to_numpy(zero_copy_only=False)
    b = t["part_b"].to_numpy(zero_copy_only=False)
    c = t["n_common"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a, -c))[:k]
    return t.take(pa.array(order, pa.int64()))


def common_neighbors_topk(
    edges: ray.data.Dataset,
    k: int = 20,
    a_col: str = "part_a",
    b_col: str = "part_b",
    local_cutoff: int = 200_000,
):
    """Link prediction by common-neighbor counting: the top-k node
    pairs that are NOT edges, ranked by how many shared neighbors they
    have ((n_common desc, a, b) total order, so the cut is
    deterministic). The classic unsupervised link-prediction baseline
    (Liben-Nowell & Kleinberg 2003); Adamic-Adar is the same dataflow
    with a per-apex weight.

    Shape: bidirectional adjacency bucketed by APEX -> vectorized
    repeat/cumsum wedge generation (each unordered neighbor pair of an
    apex emitted once, key = packed id-order pair) -> ONE co-partition
    of wedge keys with edge keys where counts fold and existing edges
    die -> per-partition top-k -> remote fan-in merge. Wedge volume is
    O(sum deg^2): inherent to exact CN counting (every shared
    neighbor must be witnessed); a hub of degree d contributes d^2
    wedges — the explicit contract of this op, same as the exact
    all-pairs Jaccard contract, and the reason the output is top-k
    rather than the full pair list."""
    from .relational import _hash_bucket, _n_partitions

    n_parts = _n_partitions()
    edges = edges.select_columns([a_col, b_col]).materialize()
    if edges.count() <= local_cutoff:
        # one-task tail: below the cutoff the four shuffles of the
        # distributed path are pure latency (compact-id order is
        # isomorphic to original ids, so the (count desc, a, b) cut
        # is identical)
        return ray.get(_cn_local.remote(k, a_col, b_col, *edges.to_arrow_refs()))

    def bidir(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        apex = np.concatenate([a, b])
        nb = np.concatenate([b, a])
        return pa.table(
            {
                "apex": pa.array(apex, pa.int64()),
                "nb": pa.array(nb, pa.int64()),
                "__bucket": pa.array(_hash_bucket(apex, n_parts), pa.int64()),
            }
        )

    def wedges(t: pa.Table) -> pa.Table:
        apex = t["apex"].to_numpy(zero_copy_only=False)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, apex))
        apex, nb = apex[order], nb[order]
        n = len(apex)
        empty = pa.table(
            {
                "key": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "is_edge": pa.array([], pa.int8()),
                "__b2": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        starts = np.r_[0, np.flatnonzero(apex[1:] != apex[:-1]) + 1]
        ends = np.r_[starts[1:], n]
        ends_of = np.repeat(ends, ends - starts)
        pos = np.arange(n, dtype=np.int64)
        reps = ends_of - pos - 1
        total = int(reps.sum())
        if total == 0:
            return empty
        i_idx = np.repeat(pos, reps)
        run0 = np.r_[0, np.cumsum(reps)[:-1]]
        j_idx = np.arange(total, dtype=np.int64) - np.repeat(run0, reps) + i_idx + 1
        v, w = nb[i_idx], nb[j_idx]
        lo, hi = np.minimum(v, w), np.maximum(v, w)
        key = (lo << np.int64(32)) | hi
        # pre-fold within the partition: hubs repeat pair keys a lot
        key, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "is_edge": pa.array(np.zeros(len(key), np.int8), pa.int8()),
                "__b2": pa.array(_hash_bucket(key, n_parts), pa.int64()),
            }
        )

    def edge_keys(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and int(max(a.max(), b.max())) >= (1 << 31):
            raise ValueError("common_neighbors_topk: node id >= 2^31")
        key = (a << np.int64(32)) | b
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "cnt": pa.array(np.zeros(len(a), np.int64), pa.int64()),
                "is_edge": pa.array(np.ones(len(a), np.int8), pa.int8()),
                "__b2": pa.array(_hash_bucket(key, n_parts), pa.int64()),
            }
        )

    def fold_bucket(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        is_e = g["is_edge"].to_numpy(zero_copy_only=False).astype(bool)
        empty = pa.table(
            {
                "part_a": pa.array([], pa.int64()),
                "part_b": pa.array([], pa.int64()),
                "n_common": pa.array([], pa.int64()),
            }
        )
        wk, wc = key[~is_e], cnt[~is_e]
        if len(wk) == 0:
            return empty
        order = np.argsort(wk)
        wk, wc = wk[order], wc[order]
        starts = np.r_[0, np.flatnonzero(wk[1:] != wk[:-1]) + 1]
        uk = wk[starts]
        uc = np.add.reduceat(wc, starts)
        ek = np.sort(key[is_e])
        if len(ek):
            pos = np.minimum(np.searchsorted(ek, uk), len(ek) - 1)
            keep = ek[pos] != uk  # drop pairs that are already edges
            uk, uc = uk[keep], uc[keep]
        if len(uk) == 0:
            return empty
        sel = np.lexsort((uk, -uc))[:k]  # partition-local top-k
        uk, uc = uk[sel], uc[sel]
        return pa.table(
            {
                "part_a": pa.array(uk >> np.int64(32), pa.int64()),
                "part_b": pa.array(uk & np.int64(0xFFFFFFFF), pa.int64()),
                "n_common": pa.array(uc, pa.int64()),
            }
        )

    folded = (
        edges.map_batches(bidir, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(wedges, batch_format="pyarrow")
        .union(edges.map_batches(edge_keys, batch_format="pyarrow"))
        .groupby("__b2")
        .map_groups(fold_bucket, batch_format="pyarrow")
        .materialize()
    )
    refs = folded.to_arrow_refs()
    if not refs:
        return pa.table(
            {
                "part_a": pa.array([], pa.int64()),
                "part_b": pa.array([], pa.int64()),
                "n_common": pa.array([], pa.int64()),
            }
        )
    from georay.textops import _tree_reduce

    return ray.get(_tree_reduce(refs, _merge_cn_topk, args=(k,)))


@ray.remote
def _tri_local(a_col: str, b_col: str, *blocks):
    """Single-task triangle counting for edge sets that fit one worker
    (same degree-ordered wedge algorithm as the distributed path, on
    compact ids): below the cutoff the distributed path is ~6 fixed
    shuffle latencies for microseconds of compute."""
    empty = pa.table(
        {"part_key": pa.array([], pa.int64()), "n_triangles": pa.array([], pa.int64())}
    )
    live = [t for t in blocks if t.num_rows]
    if not live:
        return empty
    t = pa.concat_tables(live)
    a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv)
    ia, ib = inv[: len(a)], inv[len(a) :]
    a_first = (deg[ia] < deg[ib]) | ((deg[ia] == deg[ib]) & (ia < ib))
    src = np.where(a_first, ia, ib)
    dst = np.where(a_first, ib, ia)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    n = len(src)
    starts = np.r_[0, np.flatnonzero(src[1:] != src[:-1]) + 1]
    ends = np.r_[starts[1:], n]
    ends_of = np.repeat(ends, ends - starts)
    pos = np.arange(n, dtype=np.int64)
    reps = ends_of - pos - 1
    total = int(reps.sum())
    if total == 0:
        return empty
    i_idx = np.repeat(pos, reps)
    run0 = np.r_[0, np.cumsum(reps)[:-1]]
    j_idx = np.arange(total, dtype=np.int64) - np.repeat(run0, reps) + i_idx + 1
    v, w = dst[i_idx], dst[j_idx]
    lo, hi = np.minimum(v, w), np.maximum(v, w)
    wkey = (lo << np.int64(32)) | hi
    apex = src[i_idx]
    ekeys = np.sort(
        (np.minimum(ia, ib).astype(np.int64) << np.int64(32))
        | np.maximum(ia, ib).astype(np.int64)
    )
    p = np.minimum(np.searchsorted(ekeys, wkey), len(ekeys) - 1)
    closed = ekeys[p] == wkey
    if not closed.any():
        return empty
    members = np.concatenate(
        [apex[closed], lo[closed], hi[closed]]
    )
    cnt = np.bincount(members, minlength=len(nodes))
    hit = np.flatnonzero(cnt)
    return pa.table(
        {
            "part_key": pa.array(nodes[hit], pa.int64()),
            "n_triangles": pa.array(cnt[hit].astype(np.int64), pa.int64()),
        }
    )


@ray.remote
def _cn_local(k: int, a_col: str, b_col: str, *blocks):
    """Single-task common-neighbors top-k for small edge sets (compact
    ids, full wedge counting, edge anti-join, (count desc, a, b) cut)."""
    empty = pa.table(
        {
            "part_a": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int64()),
            "n_common": pa.array([], pa.int64()),
        }
    )
    live = [t for t in blocks if t.num_rows]
    if not live:
        return empty
    t = pa.concat_tables(live)
    a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a) :]
    apex = np.concatenate([ia, ib])
    nb = np.concatenate([ib, ia])
    order = np.lexsort((nb, apex))
    apex, nb = apex[order], nb[order]
    n = len(apex)
    starts = np.r_[0, np.flatnonzero(apex[1:] != apex[:-1]) + 1]
    ends = np.r_[starts[1:], n]
    ends_of = np.repeat(ends, ends - starts)
    pos = np.arange(n, dtype=np.int64)
    reps = ends_of - pos - 1
    total = int(reps.sum())
    if total == 0:
        return empty
    i_idx = np.repeat(pos, reps)
    run0 = np.r_[0, np.cumsum(reps)[:-1]]
    j_idx = np.arange(total, dtype=np.int64) - np.repeat(run0, reps) + i_idx + 1
    v, w = nb[i_idx], nb[j_idx]
    key = (np.minimum(v, w) << np.int64(32)) | np.maximum(v, w)
    uk, uc = np.unique(key, return_counts=True)
    ekeys = np.sort(
        (np.minimum(ia, ib).astype(np.int64) << np.int64(32))
        | np.maximum(ia, ib).astype(np.int64)
    )
    p = np.minimum(np.searchsorted(ekeys, uk), len(ekeys) - 1)
    keep = ekeys[p] != uk
    uk, uc = uk[keep], uc[keep]
    if len(uk) == 0:
        return empty
    sel = np.lexsort((uk, -uc))[:k]
    uk, uc = uk[sel], uc[sel]
    pa_ids = nodes[(uk >> np.int64(32)).astype(np.int64)]
    pb_ids = nodes[(uk & np.int64(0xFFFFFFFF)).astype(np.int64)]
    return pa.table(
        {
            "part_a": pa.array(pa_ids, pa.int64()),
            "part_b": pa.array(pb_ids, pa.int64()),
            "n_common": pa.array(uc.astype(np.int64), pa.int64()),
        }
    )


@ray.remote
def _hits_gather(vec: np.ndarray, prep: pa.Table, to_dst: bool) -> np.ndarray:
    """One edge block's HITS half-step: sum vec over the opposite
    endpoint (dst accumulates src values or vice versa)."""
    si = prep["si"].to_numpy(zero_copy_only=False)
    di = prep["di"].to_numpy(zero_copy_only=False)
    out = np.zeros(len(vec), dtype=np.int64)
    if to_dst:
        np.add.at(out, di, vec[si])
    else:
        np.add.at(out, si, vec[di])
    return out


def _linf_scale(vec: np.ndarray, scale: int) -> np.ndarray:
    """Exact integer L-infinity normalization: v * scale // max(v).
    The multiply overflows int64 for post-gather magnitudes, so it
    runs in Python ints over the O(|V|) driver vector — the same
    HUGEINT arithmetic the SQL replay uses."""
    mx = max(int(vec.max()), 1)
    return np.array([int(v) * scale // mx for v in vec.tolist()], dtype=np.int64)


@ray.remote
def _gp_outdeg(nodes_b: np.ndarray, part_src: pa.Table) -> np.ndarray:
    """Dense nodes_b-aligned out-degree from the bucket's src-keyed
    edge partition (complete by construction: every edge with a src
    hashing here lives here)."""
    out = np.zeros(len(nodes_b), dtype=np.int64)
    if part_src.num_rows:
        src = part_src["src"].to_numpy(zero_copy_only=False)
        np.add.at(out, np.searchsorted(nodes_b, src), 1)
    return out


@ray.remote
def _gp_const(n: int, value: int) -> np.ndarray:
    return np.full(n, value, dtype=np.int64)


def _hits_copartition(refs, nparts, n_iters, scale, both_scores, n_buckets):
    """Co-partitioned HITS: same two-half-step loop as the broadcast
    path, but hub/authority vectors live as per-bucket arrays and each
    gather runs against edges bucketed by ITS key side (src-keyed
    partitions feed the authority gather, dst-keyed the hub gather).
    L-inf normalization needs one global scalar per half-step: each
    bucket reports its raw max (B ints to the driver), the normalize
    itself runs per bucket with the same HUGEINT arithmetic as
    _linf_scale. Driver state O(B)."""
    B = n_buckets
    nodes_b, lens = _gp_node_buckets(nparts, B)
    if sum(lens) == 0:
        empty = pa.array([], pa.int64())
        if both_scores:
            return ray.data.from_arrow(
                pa.table({"node": empty, "hub": empty, "authority": empty})
            )
        return ray.data.from_arrow(pa.table({"node": empty, "score": empty}))
    parts_src = _gp_partition(refs, B, "src")
    parts_dst = _gp_partition(refs, B, "dst")
    outdeg = [_gp_outdeg.remote(nodes_b[b], parts_src[b]) for b in range(B)]
    h_b = [_gp_const.remote(lens[b], scale) for b in range(B)]

    def half_step(vec_b, parts, gather_col):
        scat = [
            _gp_scatter.options(num_returns=B).remote(
                B, parts[b], nodes_b[b], vec_b[b], False, gather_col
            )
            for b in range(B)
        ]
        raw = [
            _gp_gather_raw.remote(nodes_b[c], *[scat[b][c] for b in range(B)])
            for c in range(B)
        ]
        mx = max(ray.get([_gp_vec_max.remote(r) for r in raw]))
        return [_gp_linf.remote(r, mx, scale) for r in raw]

    a_b = [_gp_const.remote(lens[b], 0) for b in range(B)]
    for _ in range(n_iters):
        a_b = half_step(h_b, parts_src, "dst")
        h_b = half_step(a_b, parts_dst, "src")
    return ray.data.from_arrow_refs(
        [
            _gp_out_hits.remote(nodes_b[b], h_b[b], a_b[b], outdeg[b], both_scores)
            for b in range(B)
        ]
    )


def hits(
    edges: ray.data.Dataset,
    n_iters: int = 4,
    scale: int = 10**9,
    both_scores: bool = False,
    mode: str = "auto",
) -> ray.data.Dataset:
    """HITS hubs & authorities (Kleinberg 1999) over a directed edge
    list — the second classic link-analysis signal next to PageRank,
    natural on bipartite interaction graphs (hubs = one side,
    authorities = the other).

    Determinism contract: the textbook L2 normalization is replaced by
    exact integer L-INFINITY normalization (v * scale // max) — same
    fixed point direction, but every iterate is integer-exact, so the
    SQL replay is bit-identical (the pagerank nano-unit idea; the
    normalizing multiply runs in Python/HUGEINT ints because
    post-gather magnitudes overflow an int64 product).

    Scale shape identical to pagerank, INCLUDING the dense-budget gate
    (VERDICT r04 #2): under GEORAY_GRAPH_DENSE_BUDGET the per-half-step
    O(|V|) vector broadcast + dense-partial fan-in tree runs; past it
    the call reroutes to _hits_copartition (per-bucket score arrays
    co-located with src- and dst-keyed edge partitions, one global max
    scalar per half-step). Bit-identical across modes; force with
    ``mode=``.

    Output (default, ``both_scores=False``): {node, score} — hub score
    for source-side nodes, authority score for destination-side nodes
    (per-side L-inf max = scale). That single-score collapse is only
    meaningful on bipartite / one-role graphs (as here: customers are
    pure hubs, suppliers pure authorities); on a general directed
    graph a node with both roles would have its authority score
    silently discarded (ADVICE r04) — pass ``both_scores=True`` to get
    the lossless {node, hub, authority} schema instead."""
    from .textops import _tree_reduce

    if mode not in ("auto", "broadcast", "copartition"):
        raise ValueError(f"hits: unknown mode {mode!r}")
    refs = edges.materialize().to_arrow_refs()
    nparts = [_pr_nodes_partial.remote(r) for r in refs]
    if mode != "broadcast":
        # same dense-vector budget gate as pagerank (VERDICT r04 #2)
        ub = sum(ray.get([_gp_len.remote(p) for p in nparts]))
        budget = _graph_dense_budget()
        if mode == "copartition" or ub * 8 > budget:
            return _hits_copartition(
                refs, nparts, n_iters, scale, both_scores, _gp_n_buckets(ub, budget)
            )
    nodes = ray.get(_tree_reduce(nparts, _pr_union))
    n_nodes = int(len(nodes))
    if n_nodes == 0:
        empty = pa.array([], pa.int64())
        if both_scores:
            return ray.data.from_arrow(
                pa.table({"node": empty, "hub": empty, "authority": empty})
            )
        return ray.data.from_arrow(pa.table({"node": empty, "score": empty}))
    nodes_ref = ray.put(nodes)
    preps = [_pr_prep.remote(nodes_ref, r) for r in refs]
    is_src = ray.get(
        _tree_reduce([_pr_deg_partial.remote(n_nodes, p) for p in preps], _pr_sum_dense)
    ) > 0

    h = np.full(n_nodes, scale, dtype=np.int64)
    a = np.zeros(n_nodes, dtype=np.int64)
    for _ in range(n_iters):
        h_ref = ray.put(h)
        a_raw = ray.get(
            _tree_reduce(
                [_hits_gather.remote(h_ref, p, True) for p in preps], _pr_sum_dense
            )
        )
        a = _linf_scale(a_raw, scale)
        a_ref = ray.put(a)
        h_raw = ray.get(
            _tree_reduce(
                [_hits_gather.remote(a_ref, p, False) for p in preps], _pr_sum_dense
            )
        )
        h = _linf_scale(h_raw, scale)
    if both_scores:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes),
                    "hub": pa.array(h, pa.int64()),
                    "authority": pa.array(a, pa.int64()),
                }
            )
        )
    score = np.where(is_src, h, a)
    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "score": pa.array(score, pa.int64())})
    )


@ray.remote
def _lp_vote_partial(lidx: np.ndarray, n_labels: int, prep: pa.Table) -> np.ndarray:
    """One edge block's vote counts as a dense [V * L] int64 vector:
    each edge whose src currently holds a label votes that label onto
    its dst. Integer adds -> order-free fan-in merge."""
    si = prep["si"].to_numpy(zero_copy_only=False)
    di = prep["di"].to_numpy(zero_copy_only=False)
    src_l = lidx[si]
    live = src_l >= 0
    out = np.zeros(len(lidx) * n_labels, dtype=np.int64)
    np.add.at(out, di[live] * n_labels + src_l[live], 1)
    return out


def label_propagation(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    n_iters: int = 3,
) -> ray.data.Dataset:
    """Semi-supervised LABEL PROPAGATION (Zhu & Ghahramani 2002 /
    Raghavan 2007 community flavor, made deterministic): seed nodes
    hold fixed integer labels; every round each non-seed node takes
    the PLURALITY label among its in-neighbors' current labels (ties
    -> the smallest label value; nodes with no labeled neighbor keep
    their previous state). Synchronous rounds, fixed n_iters, integer
    vote counts — every round is exactly replayable by an unrolled SQL
    CTE chain, the kcore/pagerank oracle pattern.

    Scale shape: pagerank's broadcast BSP — edge blocks prepped once
    to (si, di) index pairs, a compact label-INDEX vector (int8-sized
    domain, stored int64) broadcast per round, per-block dense
    [V x L] vote partials merged by the remote fan-in tree, argmax on
    the driver vectorized. Label count L is the seed-label alphabet
    (propagation never invents labels). Dense-budget contract
    (VERDICT r04 #2 family): driver/broadcast state is O(V * L); the
    call RAISES past GEORAY_GRAPH_DENSE_BUDGET rather than silently
    not scaling — a beyond-budget universe wants the co-partitioned
    vote join (pagerank's _gp machinery keyed by (node, label) packs).

    seeds: Dataset{node, label} (int64). Output: {node, label} for
    every node, label = -1 where propagation never reached."""
    from .textops import _tree_reduce

    refs = edges.materialize().to_arrow_refs()
    nparts = [_pr_nodes_partial.remote(r) for r in refs]
    seed_rows = seeds.select_columns(["node", "label"]).take_all()
    seed_nodes = np.array([r["node"] for r in seed_rows], dtype=np.int64)
    seed_labels = np.array([r["label"] for r in seed_rows], dtype=np.int64)
    labels_alpha = np.unique(seed_labels)  # sorted: index order == value order
    n_labels = int(len(labels_alpha))
    ub = sum(ray.get([_gp_len.remote(p) for p in nparts]))
    if ub * max(n_labels, 1) * 8 > _graph_dense_budget():
        raise ValueError(
            "label_propagation: V*L vote state exceeds "
            "GEORAY_GRAPH_DENSE_BUDGET; co-partition the vote join first"
        )
    nodes = ray.get(_tree_reduce(nparts, _pr_union))
    if len(nodes) == 0 or n_labels == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        )
    nodes_ref = ray.put(nodes)
    preps = [_pr_prep.remote(nodes_ref, r) for r in refs]
    # current state as label INDICES into labels_alpha; -1 = unlabeled
    lidx = np.full(len(nodes), -1, dtype=np.int64)
    in_graph = np.isin(seed_nodes, nodes)
    spos = np.searchsorted(nodes, seed_nodes[in_graph])
    seed_lidx = np.searchsorted(labels_alpha, seed_labels[in_graph])
    lidx[spos] = seed_lidx
    is_seed = np.zeros(len(nodes), dtype=bool)
    is_seed[spos] = True
    for _ in range(n_iters):
        l_ref = ray.put(lidx)
        votes = ray.get(
            _tree_reduce(
                [_lp_vote_partial.remote(l_ref, n_labels, p) for p in preps],
                _pr_sum_dense,
            )
        ).reshape(len(nodes), n_labels)
        got_votes = votes.sum(axis=1) > 0
        # plurality with ties to the SMALLEST label value: argmax on a
        # value-sorted alphabet returns the first (= smallest) maximum
        best = np.argmax(votes, axis=1)
        upd = ~is_seed & got_votes
        lidx = np.where(upd, best, lidx)
    out_label = np.where(lidx >= 0, labels_alpha[np.maximum(lidx, 0)], -1)
    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(nodes), "label": pa.array(out_label, pa.int64())}
        )
    )
