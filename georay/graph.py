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
