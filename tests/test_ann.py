"""IVF ANN: determinism, exactness at nprobe == n_clusters, recall at
nprobe < n_clusters vs the brute-force baseline."""

import numpy as np
import pytest

from georay import ann
from georay.textops import ann_topk

QUERY_IDS = [0, 1, 2, 3]
K = 5


@pytest.fixture(scope="module")
def emb(ray_session, sf_dir):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _pairs(ds):
    return {(r["query_id"], r["rank"]): r["neighbor_id"] for r in ds.take_all()}


def test_kmeans_deterministic():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 8))
    C1 = ann.kmeans(X, 4)
    C2 = ann.kmeans(X, 4)
    np.testing.assert_array_equal(C1, C2)
    assert C1.shape == (4, 8)
    np.testing.assert_allclose(np.linalg.norm(C1, axis=1), 1.0)


def test_ivf_exact_when_probing_everything(emb):
    exact = _pairs(ann_topk(emb, QUERY_IDS, k=K))
    ivf = _pairs(ann.ann_topk_ivf(emb, QUERY_IDS, k=K, n_clusters=8, nprobe=8))
    assert ivf == exact


def test_ivf_recall_with_pruning(emb):
    exact = ann_topk(emb, QUERY_IDS, k=K).take_all()
    ivf = ann.ann_topk_ivf(emb, QUERY_IDS, k=K, n_clusters=8, nprobe=4).take_all()
    gt = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(gt & got) / len(gt)
    assert recall >= 0.8, f"IVF recall {recall} too low"


def test_assign_clusters_column(emb):
    import ray

    C, c_ref = ann.train_centroids(emb, n_clusters=8, sample_n=256)
    ds = ann.assign_clusters(emb.limit(100), c_ref)
    rows = ds.take_all()
    assert len(rows) == 100
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(8))
    # assignment matches the broadcast centroids
    r = rows[0]
    e = np.asarray(r["embedding"], dtype=np.float64)
    e /= np.linalg.norm(e)
    assert r["cluster"] == int(np.argmax(C @ e))
