"""IVF (inverted-file) approximate nearest-neighbor search — the scale
path next to textops.ann_topk's brute-force baseline.

Shape (100 TB-ready):
1. TRAIN on a small deterministic sample (driver-side numpy Lloyd
   k-means; at real scale the sample is ~1e6 vectors — still tiny).
2. Broadcast the centroid matrix once with ray.put.
3. One actor-pool map_batches pass does assign + probe + partial
   top-k fused: each batch assigns its vectors to centroids and scores
   a query only against the vectors that fall in that query's nprobe
   closest clusters. No shuffle; the only cross-batch traffic is
   k x Q partial-top-k rows per batch.

With nprobe == n_clusters this degenerates to exact brute force; with
nprobe << n_clusters each batch does ~nprobe/n_clusters of the matmul
work. Recall is pinned by tests/test_ann.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from georay.textops import _merge_ann_partials, _ann_rank_output, _tree_reduce, unpack_embeddings


def _seed_for(tag: str) -> int:
    return int.from_bytes(hashlib.sha256(tag.encode()).digest()[:4], "big")


def _normalize(E: np.ndarray) -> np.ndarray:
    return E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)


def kmeans(sample: np.ndarray, n_clusters: int, n_iter: int = 10, seed_tag: str = "ivf"):
    """Deterministic Lloyd k-means on unit-normalized vectors (so
    euclidean argmin == cosine argmax). Returns [C, D] centroids."""
    X = _normalize(sample.astype(np.float64))
    rng = np.random.default_rng(_seed_for(seed_tag))
    init = rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)
    C = X[np.sort(init)].copy()
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(C.shape[0]):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def train_centroids(
    embeddings: ray.data.Dataset,
    n_clusters: int = 16,
    sample_n: int = 2048,
    n_iter: int = 10,
):
    """Sample the head of the dataset (deterministic) and k-means it.
    Returns (centroids ndarray, ObjectRef to centroids)."""
    rows = embeddings.limit(sample_n).take_all()
    sample = np.array([r["embedding"] for r in rows], dtype=np.float64)
    C = kmeans(sample, n_clusters, n_iter)
    return C, ray.put(C)


def assign_clusters(embeddings: ray.data.Dataset, centroids_ref):
    """Add a `cluster` column: argmax-cosine centroid per vector.
    (The partition-pruning key for IVF-organized storage: write
    parquet partitioned by this and a probe only reads nprobe/C of
    the files.)"""

    class Assign:
        def __init__(self):
            self.C = ray.get(centroids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            E = _normalize(unpack_embeddings(batch))
            cl = np.argmax(E @ self.C.T, axis=1).astype(np.int32)
            return batch.append_column("cluster", pa.array(cl, pa.int32()))

    return embeddings.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 8))


def knn_label_vote(embeddings: ray.data.Dataset, query_ids: list, k: int = 5):
    """k-NN classification: each query vector takes the MAJORITY label
    of its k cosine-nearest neighbors (ties -> the smallest label) —
    the label-propagation / weak-supervision primitive on top of the
    brute-force top-k.

    Shape: ann_topk's broadcast-queries partial-top-k does the heavy
    matmul; the neighbor set is k x Q rows, so the label fetch is ONE
    column-pruned scan filtered against the broadcast neighbor ids
    (searchsorted, no shuffle) and the vote is one vectorized
    O(k x Q) run-length pass on the driver (bounded: k x Q rows, never
    corpus-sized).

    Output: query_id, label (int32), votes (int64)."""
    from georay.textops import ann_topk

    top = ann_topk(embeddings, query_ids, k=k).select_columns(
        ["query_id", "neighbor_id"]
    ).take_all()
    top_q = np.array([r["query_id"] for r in top], dtype=np.int64)
    top_n = np.array([r["neighbor_id"] for r in top], dtype=np.int64)
    nid_ref = ray.put(np.unique(top_n))

    def fetch_labels(t: pa.Table) -> pa.Table:
        wanted = ray.get(nid_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wanted, ids)
        hit = (pos < len(wanted)) & (wanted[np.minimum(pos, len(wanted) - 1)] == ids)
        t = t.filter(pa.array(hit))
        return t.select(["vec_id", "label"])

    lab_rows = embeddings.map_batches(
        fetch_labels, batch_format="pyarrow"
    ).take_all()
    lab_ids = np.array([r["vec_id"] for r in lab_rows], dtype=np.int64)
    lab_vals = np.array([r["label"] for r in lab_rows], dtype=np.int64)
    srt = np.argsort(lab_ids)
    lab_ids, lab_vals = lab_ids[srt], lab_vals[srt]
    nlab = lab_vals[np.searchsorted(lab_ids, top_n)]
    # count per (query, label) via run lengths, then pick per query by
    # (count desc, label asc) — no per-query Python loop
    order = np.lexsort((nlab, top_q))
    q, l = top_q[order], nlab[order]
    new = np.r_[True, (q[1:] != q[:-1]) | (l[1:] != l[:-1])]
    starts = np.flatnonzero(new)
    counts = np.diff(np.r_[starts, len(q)]).astype(np.int64)
    gq, gl = q[starts], l[starts]
    sel = np.lexsort((gl, -counts, gq))
    gq, gl, counts = gq[sel], gl[sel], counts[sel]
    first = np.r_[True, gq[1:] != gq[:-1]]
    return pa.table(
        {
            "query_id": pa.array(gq[first], pa.int64()),
            "label": pa.array(gl[first].astype(np.int32), pa.int32()),
            "votes": pa.array(counts[first], pa.int64()),
        }
    )


def label_centroids(embeddings: ray.data.Dataset, label_col: str = "label"):
    """Mean-pooled embedding per label — the distributed vector
    aggregation primitive (class prototypes / IVF retraining input).

    Two-phase like every groupby here: each batch collapses to one
    [labels x dim] partial-sum row set (a few KB), the final groupby
    sums those tiny partials — the shuffle never carries vectors
    per-row. Output is EXPLODED to scalar rows (label, dim, mean_micro)
    with the mean micro-quantized, so the driver hash compares it and
    any float-summation-order skew vs the SQL replay stays ~1e-9 of a
    unit (sums of float32-exact doubles are ~1e-13 apart at worst).

    Output: label (int32), dim (int32), n_vecs, mean_micro."""
    from ray.data.aggregate import Count as AggCount

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
        labels = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dim = flat.size // max(len(labels), 1)
        E = flat.reshape(-1, dim)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.float64)
        np.add.at(sums, inv, E)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        lab = np.repeat(uniq, dim).astype(np.int64)
        dims = np.tile(np.arange(dim, dtype=np.int64), len(uniq))
        return pa.table(
            {
                "label": pa.array(lab, pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "s": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(counts, dim), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as AggSum

    summed = (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(AggSum("s", alias_name="s"), AggSum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        micro = np.floor((s / n) * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(
                    t["label"].to_numpy(zero_copy_only=False).astype(np.int32),
                    pa.int32(),
                ),
                "dim": pa.array(
                    t["dim"].to_numpy(zero_copy_only=False).astype(np.int32),
                    pa.int32(),
                ),
                "n_vecs": pa.array(
                    t["n"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
                "mean_micro": pa.array(micro, pa.int64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def cluster_assign_fixed(embeddings: ray.data.Dataset, k: int = 8):
    """Oracle-able single-pass cluster assignment: the centroids are
    the k vectors with ``vec_id < k`` (deterministic — no training
    RNG), cosine is quantized to integer micro-units BEFORE the argmax
    and ties break to the lowest centroid id, so a SQL engine replaying
    the same quantization with its own float summation order reaches
    the identical assignment. The trained-k-means path is
    ``assign_clusters``; this is the verification-friendly variant with
    the same broadcast-centroids / no-shuffle shape.

    Output: vec_id, cluster (int32), cos_micro (int64)."""
    cent_rows = embeddings.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], k)),  # vectorized; k rows out
        batch_format="pyarrow",
    ).take_all()
    cent_rows.sort(key=lambda r: r["vec_id"])
    C = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    Cn = np.linalg.norm(C, axis=1)
    c_ref = ray.put((C, Cn))

    class Assign:
        def __init__(self):
            self.C, self.Cn = ray.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            E = unpack_embeddings(batch)
            # cos = dot / (|e| |c|) on raw doubles (same form as the
            # SQL side); micro-quantize, then argmax with low-cid ties
            norms = np.maximum(np.linalg.norm(E, axis=1), 1e-300)
            cos = (E @ self.C.T) / np.outer(norms, np.maximum(self.Cn, 1e-300))
            micro = np.floor(cos * 1e6 + 0.5).astype(np.int64)
            score = micro * 1024 - np.arange(self.C.shape[0], dtype=np.int64)
            best = np.argmax(score, axis=1)
            rows = np.arange(len(best))
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "cluster": pa.array(best.astype(np.int32), pa.int32()),
                    "cos_micro": pa.array(micro[rows, best], pa.int64()),
                }
            )

    return embeddings.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 8))


@ray.remote
def _pca_sums(block: pa.Table):
    if block.num_rows == 0:
        return None
    E = unpack_embeddings(block)
    return E.sum(axis=0), np.int64(E.shape[0])


@ray.remote
def _pca_step(mu: np.ndarray, v: np.ndarray, block: pa.Table):
    """One block's covariance action: sum_i (x_i - mu) ((x_i - mu) . v)."""
    if block.num_rows == 0:
        return None
    C = unpack_embeddings(block) - mu
    return C.T @ (C @ v)


@ray.remote
def _pca_merge(*parts):
    live = [p for p in parts if p is not None]
    if not live:
        return None
    if isinstance(live[0], tuple):
        s = live[0][0].copy()
        n = live[0][1]
        for p in live[1:]:
            s += p[0]
            n += p[1]
        return s, n
    out = live[0].copy()
    for p in live[1:]:
        out += p
    return out


def power_pca(embeddings: ray.data.Dataset, n_iters: int = 5):
    """Top principal direction by fixed-superstep POWER ITERATION over
    the centered embedding matrix, then every vector's projection onto
    it — the embedding-compression / whitening primitive (and the third
    iterative-numeric BSP operator next to pagerank and kmeans_iter).

    Determinism contract: the mean and each round's normalized
    direction are quantized to 1e-6 (six orders above worst-case
    float64 summation-order skew), v0 is the fixed all-ones direction,
    and the covariance is PSD so the iteration never flips sign — the
    whole float trajectory is engine-independent and a SQL engine
    replays it with plain SUM/AVG.

    Scale shape: the table is pinned once; each round is one task-mode
    pass emitting a [d]-vector per block, merged by a remote fan-in
    tree — driver traffic O(d) per round, n_iters+2 data passes.

    Output: vec_id, proj_micro (int64 — (x - mu) . v in micro-units)."""
    from georay.textops import _tree_reduce

    emb = embeddings.materialize()
    refs = emb.to_arrow_refs()
    got = ray.get(_tree_reduce([_pca_sums.remote(b) for b in refs], _pca_merge))
    if got is None:
        return ray.data.from_arrow(
            pa.table(
                {"vec_id": pa.array([], pa.int64()), "proj_micro": pa.array([], pa.int64())}
            )
        )
    sums, n = got
    mu = np.floor(sums / n * 1e6 + 0.5) / 1e6
    d = mu.shape[0]
    v = np.full(d, 1.0 / np.sqrt(d))
    v = np.floor(v * 1e6 + 0.5) / 1e6
    mu_ref = ray.put(mu)
    for _ in range(n_iters):
        v_ref = ray.put(v)
        p = ray.get(
            _tree_reduce(
                [_pca_step.remote(mu_ref, v_ref, b) for b in refs], _pca_merge
            )
        )
        nrm = np.linalg.norm(p)
        if nrm <= 0:
            break  # degenerate (all points identical): keep v
        v = np.floor(p / nrm * 1e6 + 0.5) / 1e6

    vq_ref = ray.put((mu, v))

    def project(batch: pa.Table) -> pa.Table:
        m, vv = ray.get(vq_ref)
        E = unpack_embeddings(batch)
        proj = (E - m) @ vv
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "proj_micro": pa.array(
                    np.floor(proj * 1e6 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return emb.map_batches(project, batch_format="pyarrow")


@ray.remote
def _km_partial(C: np.ndarray, block: pa.Table):
    """One block's Lloyd statistics under centroids C: micro-quantized
    cosine argmax assignment (the cluster_assign_fixed rule), then
    per-cluster [k x d] float64 sums + counts."""
    k, d = C.shape
    if block.num_rows == 0:
        return np.zeros((k, d), dtype=np.float64), np.zeros(k, dtype=np.int64)
    E = unpack_embeddings(block)
    norms = np.maximum(np.linalg.norm(E, axis=1), 1e-300)
    Cn = np.maximum(np.linalg.norm(C, axis=1), 1e-300)
    micro = np.floor((E @ C.T) / np.outer(norms, Cn) * 1e6 + 0.5).astype(np.int64)
    best = np.argmax(micro * 1024 - np.arange(k, dtype=np.int64), axis=1)
    sums = np.zeros((k, d), dtype=np.float64)
    np.add.at(sums, best, E)
    counts = np.bincount(best, minlength=k).astype(np.int64)
    return sums, counts


@ray.remote
def _km_merge(*parts):
    sums = parts[0][0].copy()
    counts = parts[0][1].copy()
    for s, c in parts[1:]:
        sums += s
        counts += c
    return sums, counts


def kmeans_iter(embeddings: ray.data.Dataset, k: int = 8, n_iters: int = 3):
    """Distributed Lloyd k-means TRAINING with a fixed superstep count —
    the iterative-ML-fit operator (vs cluster_assign_fixed's one-shot
    assignment and kmeans()'s driver-side sample fit).

    Determinism contract (what makes an iterative float algorithm
    oracle-replayable): seeds are the k vectors with ``vec_id < k``;
    each round assigns by MICRO-quantized cosine (ties to the lowest
    cid), and the new centroid is the member mean quantized to 1e-4 —
    a step ~9 orders of magnitude above the worst float64
    summation-order skew, so DuckDB's sequential AVG and the numpy
    tree-reduced sums land on the same quantized value. A cluster that
    loses all members keeps its previous centroid.

    Scale shape: the embedding table is pinned once; each round is one
    task-mode pass over its blocks emitting a [k x d] partial-sum +
    count pair, merged by a remote fan-in tree — driver traffic is
    O(k x d) per round, never O(rows). n_iters+1 total data passes
    (standard Lloyd; at 100 TB you fit on a bounded sample — see
    kmeans() above — and run ONE labeling pass).

    Output: the final-round assignment (vec_id, cluster int32,
    cos_micro int64 vs the trained centroids)."""
    from georay.textops import _tree_reduce

    emb = embeddings.materialize()
    refs = emb.to_arrow_refs()
    cent_rows = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], k)),
        batch_format="pyarrow",
    ).take_all()
    cent_rows.sort(key=lambda r: r["vec_id"])
    C = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)

    for _ in range(n_iters):
        c_ref = ray.put(C)
        sums, counts = ray.get(
            _tree_reduce([_km_partial.remote(c_ref, b) for b in refs], _km_merge)
        )
        newC = C.copy()
        live = counts > 0
        newC[live] = np.floor(sums[live] / counts[live, None] * 1e4 + 0.5) / 1e4
        C = newC

    c_final = ray.put((C, np.maximum(np.linalg.norm(C, axis=1), 1e-300)))

    class FinalAssign:
        def __init__(self):
            self.C, self.Cn = ray.get(c_final)

        def __call__(self, batch: pa.Table) -> pa.Table:
            E = unpack_embeddings(batch)
            norms = np.maximum(np.linalg.norm(E, axis=1), 1e-300)
            micro = np.floor(
                (E @ self.C.T) / np.outer(norms, self.Cn) * 1e6 + 0.5
            ).astype(np.int64)
            best = np.argmax(
                micro * 1024 - np.arange(self.C.shape[0], dtype=np.int64), axis=1
            )
            rows = np.arange(len(best))
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "cluster": pa.array(best.astype(np.int32), pa.int32()),
                    "cos_micro": pa.array(micro[rows, best], pa.int64()),
                }
            )

    return emb.map_batches(FinalAssign, batch_format="pyarrow", concurrency=(1, 8))


def semantic_dedup(
    embeddings: ray.data.Dataset, k: int = 8, thresh_micro: int = 920_000
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then inside each
    cluster prune every vector that is near-identical (cosine >=
    threshold) to a lower-id vector — "keep one representative per
    semantic duplicate set, but only compare within a cluster".

    Deterministic / oracle-friendly choices:
    - centroids are the k vectors with ``vec_id < k`` (the
      cluster_assign_fixed contract — no training RNG);
    - assignment quantizes cosine to integer micro-units BEFORE the
      argmax with low-cid tie-break, so SQL replays it exactly;
    - the prune rule compares the micro-quantized pair cosine against
      an integer threshold and emits only the BOOLEAN verdict, so a
      last-ulp float difference between engines can only matter on an
      exact threshold boundary (probability ~1e-11 per pair).

    Scale shape: assignment is one broadcast-centroids map_batches (no
    shuffle); the pairwise pass is one groupby(cluster).map_groups with
    an O(|cluster|^2) blocked matmul inside. The partitioning
    assumption is the SemDeDup contract itself: k grows with the
    corpus (the paper uses 50k clusters) so a cluster's members fit
    one worker; a hot cluster would be salted into fixed-size
    sub-blocks with a cross-block pair sweep.

    Output: vec_id, cluster (int32), keep (bool) — keep=False means a
    smaller-id vector in the same cluster sits at or above the
    threshold."""
    cent_rows = embeddings.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], k)),
        batch_format="pyarrow",
    ).take_all()
    cent_rows.sort(key=lambda r: r["vec_id"])
    C = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    Cn = np.linalg.norm(C, axis=1)
    c_ref = ray.put((C, Cn))

    class AssignCarry:
        def __init__(self):
            self.C, self.Cn = ray.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            E = unpack_embeddings(batch)
            norms = np.maximum(np.linalg.norm(E, axis=1), 1e-300)
            cos = (E @ self.C.T) / np.outer(norms, np.maximum(self.Cn, 1e-300))
            micro = np.floor(cos * 1e6 + 0.5).astype(np.int64)
            score = micro * 1024 - np.arange(self.C.shape[0], dtype=np.int64)
            best = np.argmax(score, axis=1).astype(np.int32)
            return batch.append_column("cluster", pa.array(best, pa.int32()))

    assigned = embeddings.map_batches(
        AssignCarry, batch_format="pyarrow", concurrency=(1, 8)
    )

    def per_cluster(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        E = unpack_embeddings(group)[order]
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-300)
        micro = np.floor((En @ En.T) * 1e6 + 0.5).astype(np.int64)
        # ids ascending => strictly-lower triangle row i = pairs with a
        # smaller-id vector; prune i if any such pair clears the bar
        hit = np.tril(micro >= thresh_micro, k=-1)
        keep = ~hit.any(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(
                    np.full(len(ids), group["cluster"][0].as_py(), dtype=np.int32)
                ),
                "keep": pa.array(keep),
            }
        )

    return assigned.groupby("cluster").map_groups(per_cluster, batch_format="pyarrow")


def pq_encode(embeddings: ray.data.Dataset, n_codes: int = 8, n_sub: int = 2):
    """Product-quantization encode — the vector-compression half of the
    IVF-PQ scale path (at 10^12 vectors the raw float corpus cannot be
    probed; PQ codes shrink it ~64x and distances reconstruct from
    per-subspace lookup tables). Each embedding splits into n_sub
    contiguous subspaces; per subspace the code is the argmin squared
    euclidean distance to a DETERMINISTIC codebook (the sub-vectors of
    vec_id < n_codes — no training RNG, mirroring cluster_assign_fixed)
    with the distance quantized to integer 1e4 units BEFORE the argmin
    and ties broken to the lowest code, so the SQL oracle replays the
    assignment exactly (floor(d2*1e4+0.5): cross-engine float error
    ~1e-11 abs vs 1e-4 boundary spacing).

    Shape: the codebook is a few KB, shipped once in the task spec;
    one stateless map_batches pass, no shuffle.

    Output: vec_id, code_0..code_{n_sub-1} (int32), dist_dm (int64 sum
    of the chosen per-subspace quantized distances)."""
    cent_rows = embeddings.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n_codes)), batch_format="pyarrow"
    ).take_all()
    cent_rows.sort(key=lambda r: r["vec_id"])
    C = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)

    def encode(batch: pa.Table, C=C, n_sub=n_sub) -> pa.Table:
        E = unpack_embeddings(batch)
        k, D = C.shape
        w = D // n_sub
        out: dict = {"vec_id": batch["vec_id"]}
        total = np.zeros(len(E), np.int64)
        for m in range(n_sub):
            Es = E[:, m * w : (m + 1) * w]
            Cs = C[:, m * w : (m + 1) * w]
            d2 = ((Es[:, None, :] - Cs[None, :, :]) ** 2).sum(axis=2)
            dm = np.floor(d2 * 1e4 + 0.5).astype(np.int64)
            score = dm * 1024 + np.arange(k, dtype=np.int64)
            best = np.argmin(score, axis=1)
            out[f"code_{m}"] = pa.array(best.astype(np.int32), pa.int32())
            total += dm[np.arange(len(E)), best]
        out["dist_dm"] = pa.array(total, pa.int64())
        return pa.table(out)

    return embeddings.map_batches(encode, batch_format="pyarrow")


def ann_topk_pq(
    embeddings: ray.data.Dataset,
    query_ids: list,
    k: int = 5,
    n_codes: int = 8,
    n_sub: int = 2,
):
    """PQ-scored approximate top-k — the retrieval half of IVF-PQ: each
    vector collapses to its per-subspace codes (pq_encode's exact
    assignment) and a query's distance to it is the sum of PRECOMPUTED
    query->codebook-entry lookup-table entries, so the scan never
    touches raw floats. All quantities are the same integer 1e4-unit
    distances pq_encode pins, so the approximation itself is
    deterministic and the SQL oracle replays it bit-for-bit (ranking by
    dist asc, vec_id asc).

    Shape: codebook + per-query LUT ([Q, M, K] ints, a few KB) ship in
    the task spec; one stateless map_batches emits k x Q partial
    top-ks; a remote fan-in tree merges (O(k x Q) driver traffic).

    Output: {query_id, rank, neighbor_id} (self excluded), same schema
    as ann_topk."""
    from georay.textops import _merge_ann_partials, _ann_rank_output, _tree_reduce

    cent_rows = embeddings.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n_codes)), batch_format="pyarrow"
    ).take_all()
    cent_rows.sort(key=lambda r: r["vec_id"])
    C = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)

    q_arr = pa.array(sorted(set(int(q) for q in query_ids)), pa.int64())
    qrows = embeddings.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=q_arr)),
        batch_format="pyarrow",
    ).take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)

    D = C.shape[1]
    w = D // n_sub
    # LUT[qi, m, code] = quantized squared distance (pq_encode units)
    lut = np.empty((len(qids), n_sub, C.shape[0]), dtype=np.int64)
    for m in range(n_sub):
        d2 = ((Q[:, None, m * w : (m + 1) * w] - C[None, :, m * w : (m + 1) * w]) ** 2).sum(
            axis=2
        )
        lut[:, m, :] = np.floor(d2 * 1e4 + 0.5).astype(np.int64)

    def score(batch: pa.Table, C=C, lut=lut, qids=qids) -> pa.Table:
        E = unpack_embeddings(batch)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        kcodes = C.shape[0]
        approx = np.zeros((len(E), len(qids)), dtype=np.int64)
        for m in range(n_sub):
            Es = E[:, m * w : (m + 1) * w]
            Cs = C[:, m * w : (m + 1) * w]
            d2 = ((Es[:, None, :] - Cs[None, :, :]) ** 2).sum(axis=2)
            dm = np.floor(d2 * 1e4 + 0.5).astype(np.int64)
            codes = np.argmin(dm * 1024 + np.arange(kcodes, dtype=np.int64), axis=1)
            approx += lut[:, m, :][:, codes].T  # [B, Q]
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            mask = ids != qids[qi]
            cand = np.nonzero(mask)[0]
            col = approx[cand, qi]
            top = cand[np.lexsort((ids[cand], col))[:k]]
            out_q.extend([int(qids[qi])] * len(top))
            out_n.extend(ids[top].tolist())
            out_s.extend((-approx[top, qi]).astype(np.float64).tolist())  # sim = -dist
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = embeddings.map_batches(score, batch_format="pyarrow")
    refs = partials.materialize().to_arrow_refs()
    merged = ray.get(_tree_reduce(refs, _merge_ann_partials, args=(k,)))
    return _ann_rank_output(merged)


def _lsh_band_codes(E: np.ndarray, H: np.ndarray, n_bands: int) -> np.ndarray:
    """Band codes of an [n, D] matrix under hyperplanes H [P, D]: bit j
    = (quantized dot with plane j) >= 1, packed w = P/n_bands bits per
    band. Dots quantize to 1e4 units before the sign test (floor(x*1e4
    + 0.5) — cross-engine float error ~1e-11 vs the 1e-4 boundary
    spacing, the pq_encode determinism recipe), so the bucketing is
    bit-identical across numpy and the SQL oracle."""
    dq = np.floor(E @ H.T * 1e4 + 0.5).astype(np.int64)
    bits = (dq >= 1).astype(np.int64)  # [n, P]
    n_planes = H.shape[0]
    w = n_planes // n_bands
    codes = np.zeros((len(E), n_bands), dtype=np.int64)
    for b in range(n_bands):
        for j in range(w):
            codes[:, b] = codes[:, b] * 2 + bits[:, b * w + j]
    return codes


def ann_topk_lsh(
    embeddings: ray.data.Dataset,
    query_ids: list,
    k: int = 5,
    n_planes: int = 16,
    n_bands: int = 4,
):
    """LSH-bucketed approximate cosine top-k — the random-hyperplane
    (SimHash) member of the ANN family (brute / IVF / PQ / LSH): a
    vector is a CANDIDATE for a query iff they share at least one of
    `n_bands` signature bands (w = n_planes/n_bands sign bits each);
    only candidates get exact cosine scoring. Hyperplanes are the
    first `n_planes` corpus vectors — deterministic and training-free
    (mirroring pq_encode's codebook convention); at scale they'd be
    seeded Gaussian planes shipped the same way.

    Shape: planes + query band codes (a few KB) broadcast once via
    ray.put; ONE stateless map_batches pass computes each batch's band
    codes with a [B, P] matmul, masks candidates per query, scores
    only those rows, and emits k x Q partial top-ks; a remote fan-in
    tree merges them (O(k x Q) driver traffic). No shuffle anywhere —
    the bucket test runs WHERE the data is instead of moving rows into
    band buckets, which is the right trade when Q is small; the
    band-explode groupby variant (minhash_near_dups' shape) is the
    all-pairs sibling.

    Output: {query_id, rank, neighbor_id} (self excluded), ranked by
    exact cosine desc, neighbor_id asc."""
    q_arr = pa.array(sorted(set(int(q) for q in query_ids)), pa.int64())

    def take_rows(flt):
        rows = embeddings.map_batches(flt, batch_format="pyarrow").take_all()
        rows.sort(key=lambda r: r["vec_id"])
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        M = np.array([r["embedding"] for r in rows], dtype=np.float64)
        return ids, M

    _, H = take_rows(
        lambda t: t.filter(pc.less(t["vec_id"], n_planes))
    )
    qids, Q = take_rows(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=q_arr))
    )
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qcodes = _lsh_band_codes(Q, H, n_bands)  # [Q, n_bands]
    spec = ray.put((H, qids, Qn, qcodes))

    class LSHTopK:
        def __init__(self):
            self.H, self.qids, self.Qn, self.qcodes = ray.get(spec)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            E = unpack_embeddings(batch)
            codes = _lsh_band_codes(E, self.H, n_bands)  # [B, n_bands]
            En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.qids)):
                cand = np.nonzero(
                    (codes == self.qcodes[qi]).any(axis=1)
                    & (ids != self.qids[qi])
                )[0]
                if not len(cand):
                    continue
                sims = En[cand] @ self.Qn[qi]
                top = cand[np.lexsort((ids[cand], -sims))[:k]]
                out_q.extend([int(self.qids[qi])] * len(top))
                out_n.extend(ids[top].tolist())
                out_s.extend((En[top] @ self.Qn[qi]).tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = embeddings.map_batches(
        LSHTopK, batch_format="pyarrow", concurrency=(1, 8)
    )
    refs = partials.materialize().to_arrow_refs()
    merged = ray.get(_tree_reduce(refs, _merge_ann_partials, args=(k,)))
    return _ann_rank_output(merged)


def hard_negatives(
    embeddings: ray.data.Dataset,
    query_ids: list,
    k: int = 5,
):
    """Contrastive hard-negative mining: for each query vector, the
    top-k most-cosine-similar vectors whose LABEL DIFFERS from the
    query's — the negatives that sit closest to the decision boundary,
    the standard mining pass when training embedding models
    (contrastive / triplet losses want negatives the current model
    already confuses).

    Shape is ann_topk's: queries + labels broadcast once via ray.put,
    ONE stateless map_batches emits per-batch partial top-ks over the
    label-mismatch mask, a remote fan-in tree merges (O(k x Q) driver
    traffic). No shuffle.

    Output: {query_id, rank, neighbor_id}, ranked by cosine desc,
    neighbor_id asc."""
    from georay.textops import unpack_embeddings as _unpack

    q_arr = pa.array(sorted(set(int(q) for q in query_ids)), pa.int64())
    qrows = embeddings.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=q_arr)),
        batch_format="pyarrow",
    ).take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qlabels = np.array([r["label"] for r in qrows], dtype=np.int64)
    spec = ray.put((qids, qlabels, Qn))

    class NegTopK:
        def __init__(self):
            self.qids, self.qlabels, self.Qn = ray.get(spec)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            labels = (
                batch["label"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            E = _unpack(batch)
            En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
            sims = En @ self.Qn.T  # [B, Q]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.qids)):
                cand = np.nonzero(labels != self.qlabels[qi])[0]
                if not len(cand):
                    continue
                col = sims[cand, qi]
                top = cand[np.lexsort((ids[cand], -col))[:k]]
                out_q.extend([int(self.qids[qi])] * len(top))
                out_n.extend(ids[top].tolist())
                out_s.extend(sims[top, qi].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = embeddings.map_batches(
        NegTopK, batch_format="pyarrow", concurrency=(1, 8)
    )
    refs = partials.materialize().to_arrow_refs()
    merged = ray.get(_tree_reduce(refs, _merge_ann_partials, args=(k,)))
    return _ann_rank_output(merged)


def ann_topk_ivf(
    embeddings: ray.data.Dataset,
    query_ids: list,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_n: int = 2048,
):
    """IVF-probed cosine top-k. Same output schema as
    textops.ann_topk: {query_id, rank, neighbor_id}."""
    q_arr = pa.array(sorted(set(int(q) for q in query_ids)), pa.int64())
    _, c_ref = train_centroids(embeddings, n_clusters, sample_n)

    def get_queries(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["vec_id"], value_set=q_arr))

    qrows = embeddings.map_batches(get_queries, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: query_ids.index(r["vec_id"]))
    Qn = _normalize(np.array([r["embedding"] for r in qrows], dtype=np.float64))
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_ref = ray.put((qids, Qn))

    class ProbeTopK:
        """Fused assign + probe + partial top-k (see module doc)."""

        def __init__(self):
            self.C = ray.get(c_ref)
            self.qids, self.Qn = ray.get(q_ref)
            # per-query probe set: nprobe closest centroids
            qsim = self.Qn @ self.C.T  # [Q, C]
            order = np.argsort(-qsim, axis=1, kind="stable")
            self.probe = order[:, : min(nprobe, self.C.shape[0])]  # [Q, P]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            En = _normalize(unpack_embeddings(batch))
            cl = np.argmax(En @ self.C.T, axis=1)  # [B]
            out_q, out_n, out_s = [], [], []
            for qi in range(self.Qn.shape[0]):
                mask = np.isin(cl, self.probe[qi]) & (ids != self.qids[qi])
                cand = np.nonzero(mask)[0]
                if not len(cand):
                    continue
                sims = En[cand] @ self.Qn[qi]
                top = cand[np.argsort(-sims, kind="stable")[:k]]
                col = En[top] @ self.Qn[qi]
                out_q.extend([int(self.qids[qi])] * len(top))
                out_n.extend(ids[top].tolist())
                out_s.extend(col.tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = embeddings.map_batches(ProbeTopK, batch_format="pyarrow", concurrency=(1, 8))
    refs = partials.materialize().to_arrow_refs()
    merged = ray.get(_tree_reduce(refs, _merge_ann_partials, args=(k,)))
    return _ann_rank_output(merged)


@ray.remote
def _kc_partial(C: np.ndarray, block: pa.Table):
    """One block's farthest-point candidate under selected centers C:
    min squared euclidean distance per vector, quantized to 1e-4 (the
    pq_encode-proven scale where DuckDB's list_distance^2 and numpy's
    direct sum-of-squares agree), winner = (max q, then lowest
    vec_id). Returns (q, vec_id, vector) or None for an empty block."""
    if block.num_rows == 0:
        return None
    E = unpack_embeddings(block)
    ids = block["vec_id"].to_numpy(zero_copy_only=False)
    d2 = ((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    q = np.floor(d2 * 1e4 + 0.5).astype(np.int64).min(axis=1)
    order = np.lexsort((ids, -q))
    w = order[0]
    return int(q[w]), int(ids[w]), E[w]


@ray.remote
def _kc_merge(*parts):
    live = [p for p in parts if p is not None]
    if not live:
        return None
    live.sort(key=lambda p: (-p[0], p[1]))
    return live[0]


def kcenter_sample(embeddings: ray.data.Dataset, k: int = 8):
    """Greedy farthest-point (k-center / Gonzalez 1985) DIVERSITY
    sampling over the embedding table — the coreset-selection
    primitive for training-data curation: pick k points such that
    every point is near some pick (2-approximation of the k-center
    optimum), where random/stratified sampling would oversample dense
    regions.

    Determinism contract (oracle-replayable like kmeans_iter): seed =
    the lowest vec_id; each round scores every vector by its 1e-4
    quantized min squared distance to the selected set and picks
    (max q, then lowest vec_id). Already-selected points score 0
    against themselves, so picks don't repeat while any vector has a
    nonzero min-distance — but when every remaining min-distance is 0
    (exact-duplicate vectors saturate the selected set) the argmax
    re-picks the lowest already-selected vec_id, so the output CAN
    contain duplicate vec_ids on degenerate inputs. The SQL oracle
    replays the identical rule, by design (ADVICE r04).

    Scale shape: the table is pinned once; each of the k-1 rounds is
    one task-mode pass over its blocks (per-block top-1 partial, remote
    fan-in merge) against the ray.put [r x d] selected matrix — driver
    traffic is ONE (q, id, vector) triple per round, never O(rows).

    Output: {sel_rank, vec_id, dist_q} — selection order and the
    quantized distance at selection time (seed: 0)."""
    emb = embeddings.select_columns(["vec_id", "embedding"]).materialize()
    refs = emb.to_arrow_refs()
    seed_id = emb.min("vec_id")
    seed_row = emb.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], seed_id)), batch_format="pyarrow"
    ).take(1)[0]
    C = np.asarray(seed_row["embedding"], dtype=np.float64)[None, :]
    ranks, ids, qs = [0], [int(seed_id)], [0]
    for r in range(1, k):
        c_ref = ray.put(C)
        win = ray.get(
            _tree_reduce([_kc_partial.remote(c_ref, b) for b in refs], _kc_merge)
        )
        if win is None:
            break
        q, vid, vec = win
        ranks.append(r)
        ids.append(vid)
        qs.append(q)
        C = np.vstack([C, vec[None, :]])
    return pa.table(
        {
            "sel_rank": pa.array(ranks, pa.int64()),
            "vec_id": pa.array(ids, pa.int64()),
            "dist_q": pa.array(qs, pa.int64()),
        }
    )


@ray.remote
def _mknn_block_pair(refs_i, refs_j, same: bool, k: int):
    """Directed top-k candidates between two chunks of the embedding
    table: one [Ni, Nj] cosine matmul serves BOTH directions (i-rows
    rank j-columns; for i != j the transpose ranks j-rows against
    i-columns), each side k-bounded before anything leaves the task.
    Sims are MICRO-quantized before ranking (the embedding_clusters
    contract) so numpy's normalize-then-dot and DuckDB's
    list_cosine_similarity rank identically; the chunk is pre-sorted
    by vec_id so a stable descending argsort IS the
    (micro desc, neighbor asc) order."""

    def load(refs):
        t = pa.concat_tables(ray.get(list(refs)))
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        E = unpack_embeddings(t)[order]
        return ids, _normalize(E)

    ids_i, Ei = load(refs_i)
    ids_j, Ej = (ids_i, Ei) if same else load(refs_j)
    M = np.floor((Ei @ Ej.T) * 1e6 + 0.5).astype(np.int64)
    SELF = np.int64(-(10**15))  # below any micro-cosine; int64-min would
    if same:                    # overflow under negation and sort FIRST
        np.fill_diagonal(M, SELF)

    def side_topk(mat, qids, nids):
        kk = min(k, mat.shape[1])
        order = np.argsort(-mat, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(mat.shape[0]), kk)
        cols = order.ravel()
        keep = mat[rows, cols] != SELF
        return (
            np.repeat(qids, kk)[keep],
            nids[cols][keep],
            mat[rows, cols][keep],
        )

    oq, on, om = side_topk(M, ids_i, ids_j)
    if not same:
        oq2, on2, om2 = side_topk(np.ascontiguousarray(M.T), ids_j, ids_i)
        oq = np.concatenate([oq, oq2])
        on = np.concatenate([on, on2])
        om = np.concatenate([om, om2])
    return pa.table(
        {
            "query_id": pa.array(oq, pa.int64()),
            "neighbor_id": pa.array(on, pa.int64()),
            "sim_micro": pa.array(om, pa.int64()),
        }
    )


def _mutual_fold(cand: ray.data.Dataset, k: int, n_parts: int) -> ray.data.Dataset:
    """Shared tail of the mutual-kNN family: directed {query_id,
    neighbor_id, sim_micro} candidates -> per-query EXACT top-k
    (hash-bucketed on query) -> pack-keyed mutuality (count == 2).
    Exact over whatever candidate set feeds it — the all-pairs path
    gets the exact graph, the IVF path gets exact-within-candidates
    (VERDICT r04 #1: candidate generation is the approximation, this
    fold is the exact verify)."""
    from georay.relational import _hash_bucket

    def qbucket(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket", pa.array(_hash_bucket(q, n_parts), pa.int64())
        )

    def per_query_topk(g: pa.Table) -> pa.Table:
        q = g["query_id"].to_numpy(zero_copy_only=False)
        n = g["neighbor_id"].to_numpy(zero_copy_only=False)
        s = g["sim_micro"].to_numpy(zero_copy_only=False)
        order = np.lexsort((n, -s, q))
        q, n = q[order], n[order]
        starts = np.r_[0, np.flatnonzero(q[1:] != q[:-1]) + 1]
        runlen = np.diff(np.r_[starts, len(q)])
        rank = np.arange(len(q)) - np.repeat(starts, runlen)
        keep = rank < k
        q, n = q[keep], n[keep]
        if len(q) and int(max(q.max(), n.max())) >= (1 << 31):
            raise ValueError("mutual_knn: vec_id >= 2^31, widen the pack")
        key = (np.minimum(q, n) << np.int64(32)) | np.maximum(q, n)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "__b2": pa.array(_hash_bucket(key, n_parts), pa.int64()),
            }
        )

    def mutual(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        uk, uc = np.unique(key, return_counts=True)
        uk = uk[uc == 2]  # both directions made the cut
        return pa.table(
            {
                "a": pa.array(uk >> np.int64(32), pa.int64()),
                "b": pa.array(uk & np.int64(0xFFFFFFFF), pa.int64()),
            }
        )

    return (
        cand.map_batches(qbucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_query_topk, batch_format="pyarrow")
        .groupby("__b2")
        .map_groups(mutual, batch_format="pyarrow")
    )


def mutual_knn(embeddings: ray.data.Dataset, k: int = 5):
    """EXACT mutual k-NN graph over the embedding table: unordered
    pairs {a, b} where EACH vector ranks the other inside its own
    cosine top-k — the reciprocal-neighbor criterion used for
    high-precision near-dup mining and kNN-graph clustering
    (one-directional kNN keeps hub false friends; mutuality kills
    them).

    EXACT-BY-CONTRACT (VERDICT r04 #1): the chunk-pair matmul
    enumerates every block pair, so compute is O(N^2 * d) FLOPs even
    though memory stays k-bounded (never the [N, N] matrix). That is
    the price of the exact graph and the right call only while
    N^2 * d fits the fleet's FLOP budget — past that, use
    mutual_knn_ivf below, which generates candidates through the IVF
    cell machinery (sub-quadratic) and keeps this function's exact
    per-query top-k + mutuality folds as the verify stage.

    Scale shape: chunk-pair matmul tasks emit k-bounded DIRECTED
    candidates, then the two hash-bucketed folds (_mutual_fold) — so
    no stage materializes more than N*k rows and the driver sees
    nothing. Ranking is micro-quantized cosine with ties by neighbor
    id (the embedding_clusters determinism contract)."""
    from georay.relational import _n_partitions

    n_parts = _n_partitions()
    emb = embeddings.select_columns(["vec_id", "embedding"]).materialize()
    prefs = emb.to_arrow_refs()
    n_docs = emb.count()
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if n_docs < 2:
        return empty
    try:
        ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        ncpu = 8
    n_chunks = min(len(prefs), max(1, -(-n_docs // 2048)), int(np.ceil(np.sqrt(4 * ncpu))))
    per = -(-len(prefs) // n_chunks)
    chunks = [prefs[i : i + per] for i in range(0, len(prefs), per)]
    futures = []
    for i in range(len(chunks)):
        for j in range(i, len(chunks)):
            futures.append(_mknn_block_pair.remote(chunks[i], chunks[j], i == j, k))

    cand = ray.data.from_arrow_refs(futures)
    return _mutual_fold(cand, k, n_parts)


def mutual_knn_ivf(
    embeddings: ray.data.Dataset,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
):
    """Sub-quadratic mutual k-NN (VERDICT r04 #1): IVF-gated candidate
    generation feeding the same exact per-query top-k + mutuality
    folds as mutual_knn. A vector is a CANDIDATE for a query iff the
    vector's top-1 cell is among the query's ``nprobe`` closest cells
    — the standard inverted-file kNN-graph recipe — so compute drops
    from all block pairs to ~N * (N * nprobe / n_cells) pair scores
    (with n_cells ~ sqrt(N) at scale, O(N^1.5 * d) instead of
    O(N^2 * d)).

    Determinism / oracle contract: cells are the first ``n_cells``
    corpus vectors (the pq_encode / embedding_clusters training-free
    convention; seeded Gaussian centroids would ship the same way at
    scale), assignment and probing rank cells by MICRO-quantized
    cosine with ties to the lower cell id, so DuckDB replays the
    candidate set exactly and the output is hash-comparable.

    Shape: the (tiny) centroid matrix broadcasts once via ray.put; ONE
    stateless map_batches pass assigns each vector its member cell +
    nprobe probe cells and EXPLODES rows keyed by cell (the shuffle
    moves each embedding 1 + nprobe times — the classic IVF build
    cost); a hash-bucketed groupby on cell runs member x query matmuls
    per cell with k-bounded output; _mutual_fold finishes. Driver
    state: the centroid matrix."""
    from georay.relational import _hash_bucket, _n_partitions
    from georay.textops import unpack_embeddings as _unpack

    n_parts = _n_partitions()
    emb = embeddings.select_columns(["vec_id", "embedding"])
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    crows = emb.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n_cells)), batch_format="pyarrow"
    ).take_all()
    if len(crows) < 1:
        return empty
    crows.sort(key=lambda r: r["vec_id"])
    cids = np.array([r["vec_id"] for r in crows], dtype=np.int64)
    Cn = _normalize(np.array([r["embedding"] for r in crows], dtype=np.float64))
    c_ref = ray.put((cids, Cn))
    P = int(min(nprobe, len(cids)))
    SELF = np.int64(-(10**15))  # mutual_knn's below-any-micro sentinel

    class Explode:
        def __init__(self):
            self.cids, self.Cn = ray.get(c_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                e = pa.array([], pa.int64())
                return pa.table(
                    {
                        "cell": e,
                        "role": e,
                        "vec_id": e,
                        "embedding": pa.array([], t.schema.field("embedding").type)
                        if "embedding" in t.column_names
                        else pa.array([], pa.list_(pa.float32())),
                        "__cb": e,
                    }
                )
            En = _normalize(_unpack(t))
            m = np.floor((En @ self.Cn.T) * 1e6 + 0.5).astype(np.int64)  # [B, C]
            # cells ranked (micro desc, cid asc); cids sorted asc so a
            # stable argsort over -m lands ties on the lower cell id
            order = np.argsort(-m, axis=1, kind="stable")
            B = t.num_rows
            a1 = order[:, 0]
            probes = order[:, :P]
            idx = np.concatenate([np.arange(B), np.repeat(np.arange(B), P)])
            cell = np.concatenate([self.cids[a1], self.cids[probes].ravel()])
            role = np.concatenate(
                [np.zeros(B, np.int64), np.ones(B * P, np.int64)]
            )
            sel = pa.array(idx, pa.int64())
            return pa.table(
                {
                    "cell": pa.array(cell, pa.int64()),
                    "role": pa.array(role, pa.int64()),
                    "vec_id": t["vec_id"].take(sel),
                    "embedding": t["embedding"].take(sel),
                    "__cb": pa.array(_hash_bucket(cell, n_parts), pa.int64()),
                }
            )

    def cell_topk(g: pa.Table) -> pa.Table:
        out = {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "sim_micro": pa.array([], pa.int64()),
        }
        if g.num_rows == 0:
            return pa.table(out)
        cell = g["cell"].to_numpy(zero_copy_only=False)
        role = g["role"].to_numpy(zero_copy_only=False)
        vid = g["vec_id"].to_numpy(zero_copy_only=False)
        En = _normalize(_unpack(g))
        # segment the bucket: members (role 0, vid asc) before queries
        # within each cell, so per-cell slices are contiguous and the
        # member side is already in neighbor-asc tie order
        srt = np.lexsort((vid, role, cell))
        cell, role, vid, En = cell[srt], role[srt], vid[srt], En[srt]
        starts = np.r_[0, np.flatnonzero(cell[1:] != cell[:-1]) + 1]
        ends = np.r_[starts[1:], len(cell)]
        oq, on, om = [], [], []
        for s, e in zip(starts, ends):
            r = role[s:e]
            nm = int(np.searchsorted(r, 1))  # members first after sort
            if nm == 0 or nm == e - s:
                continue  # a cell with no members or no queries
            mid, mE = vid[s : s + nm], En[s : s + nm]
            qid, qE = vid[s + nm : e], En[s + nm : e]
            M = np.floor((qE @ mE.T) * 1e6 + 0.5).astype(np.int64)
            M[qid[:, None] == mid[None, :]] = SELF
            kk = min(k, M.shape[1])
            top = np.argsort(-M, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(np.arange(M.shape[0]), kk)
            cols = top.ravel()
            keep = M[rows, cols] != SELF
            oq.append(np.repeat(qid, kk)[keep])
            on.append(mid[cols][keep])
            om.append(M[rows, cols][keep])
        if not oq:
            return pa.table(out)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(oq), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(on), pa.int64()),
                "sim_micro": pa.array(np.concatenate(om), pa.int64()),
            }
        )

    cand = (
        emb.map_batches(Explode, batch_format="pyarrow", concurrency=(1, 8))
        .groupby("__cb")
        .map_groups(cell_topk, batch_format="pyarrow")
    )
    return _mutual_fold(cand, k, n_parts)
