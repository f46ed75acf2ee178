"""Exact n-gram Jaccard: bit-packed blocked-matmul fast path must agree
with the inverted-index fallback and with a pure-python reference."""

import numpy as np
import pytest

from georay.textops import ngram_jaccard_pairs, word_shingles


def _ref_pairs(texts: dict, threshold: float):
    sets = {i: set(int(x) for x in word_shingles(t)) for i, t in texts.items()}
    out = set()
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                out.add((a, b))
    return out


@pytest.fixture(scope="module")
def docs(ray_session):
    import pyarrow as pa

    import ray.data

    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox jumps over the lazy cat",
        2: "completely different words appear in this one",
        3: "the quick brown fox jumps over the lazy dog",  # dup of 0
        4: "",  # empty: must pair with nothing
        5: "completely different words appear in this one too",
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    return texts, ray.data.from_arrow(t)


def _run(ds, threshold, **kw):
    return {(r["a"], r["b"]) for r in ngram_jaccard_pairs(ds, threshold, **kw).take_all()}


def test_fast_path_matches_reference(docs):
    texts, ds = docs
    for tau in (0.5, 0.8, 1.0):
        assert _run(ds, tau) == _ref_pairs(texts, tau)


def test_fallback_matches_fast_path(docs):
    texts, ds = docs
    for tau in (0.5, 0.8):
        fast = _run(ds, tau)
        slow = _run(ds, tau, max_vocab=0)  # forces the postings path
        assert fast == slow == _ref_pairs(texts, tau)


def test_empty_doc_never_pairs(docs):
    texts, ds = docs
    pairs = _run(ds, 0.0)
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_matches_exact(docs):
    """The distributed MinHash+LSH path (candidate generation, pair
    dedup, co-partitioned semi-join verify) must equal the exact
    all-pairs result at tau=0.8 on a corpus with clear separation
    (near-dups >> tau, non-dups << tau, so LSH at 32x4 bands cannot
    miss)."""
    from georay.textops import minhash_near_dups

    texts, ds = docs
    exact = _ref_pairs(texts, 0.8)
    lsh = {(r["a"], r["b"]) for r in minhash_near_dups(ds, threshold=0.8).take_all()}
    assert lsh == exact


def test_minhash_hot_bucket_star_cap(ray_session):
    """Past MAX_LSH_BUCKET a bucket emits the star pattern; below it,
    all-pairs. Verified at a tiny cap via monkeypatched constant."""
    import pyarrow as pa
    from georay import textops

    ids = np.arange(5, dtype=np.int64)
    a, b = textops._pair_block(ids)
    assert len(a) == 10  # 5 choose 2
    old = textops.MAX_LSH_BUCKET
    try:
        textops.MAX_LSH_BUCKET = 3
        a, b = textops._pair_block(ids)
        assert len(a) == 4
        assert set(a.tolist()) == {0}
    finally:
        textops.MAX_LSH_BUCKET = old

    # partition-level kernel: two band buckets in one partition, one
    # multi-member run -> only its pairs emitted
    g = pa.table(
        {
            "band": pa.array([0, 0, 0, 1], pa.int32()),
            "band_hash": pa.array([7, 7, 9, 7], pa.int64()),
            "doc_id": pa.array([3, 1, 2, 3], pa.int64()),
        }
    )
    pairs = textops._bucket_pairs(g)
    assert pairs.to_pydict() == {"a": [1], "b": [3]}


def _ref_pairs_counts(texts: dict, threshold: float):
    sets = {i: set(int(x) for x in word_shingles(t)) for i, t in texts.items()}
    out = {}
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                out[(a, b)] = (inter, union)
    return out


def _run_prefix(ds, threshold):
    from georay.textops import jaccard_prefix_join

    return {
        (r["a"], r["b"]): (r["n_inter"], r["n_union"])
        for r in jaccard_prefix_join(ds, threshold).take_all()
    }


def test_prefix_join_matches_reference(docs):
    """AllPairs prefix filtering is EXACT: every thresholded pair of the
    brute-force reference must survive, with exact inter/union counts."""
    texts, ds = docs
    for tau in (0.5, 0.6, 0.8):
        assert _run_prefix(ds, tau) == _ref_pairs_counts(texts, tau)


def test_prefix_join_random_corpus_no_recall_loss(ray_session):
    """Randomized small-vocab corpus: prefix candidate generation must
    not lose a single pair vs brute force at any tested threshold."""
    import pyarrow as pa

    import ray.data

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = {
        i: " ".join(rng.choice(vocab, size=int(rng.integers(4, 12))))
        for i in range(40)
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    for tau in (0.4, 0.6):
        assert _run_prefix(ds, tau) == _ref_pairs_counts(texts, tau)


def _ref_containment(texts: dict, threshold: float, shingle_n: int = 2):
    sets = {
        i: set(int(x) >> 1 for x in word_shingles(t, shingle_n))
        for i, t in texts.items()
    }
    out = set()
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            mn = min(len(sets[a]), len(sets[b]))
            if mn and inter / mn >= threshold:
                out.add((a, b, inter, mn))
    return out


def test_containment_join_catches_subset_pairs(ray_session):
    """The defining case: a short doc fully quoted inside a much longer
    one has tiny Jaccard but overlap coefficient 1.0 — containment_join
    must find it and jaccard-at-the-same-tau must not."""
    import pyarrow as pa

    import ray.data

    from georay.textops import containment_join, jaccard_prefix_join

    filler = " ".join(f"w{i}" for i in range(60))
    texts = {
        0: "rare quoted sentence here",
        1: f"{filler} rare quoted sentence here",  # contains doc 0
        2: "completely unrelated words in this document",
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    got = {
        tuple(r)
        for r in containment_join(ds, threshold=0.8)
        .to_pandas()[["a", "b", "n_inter", "n_min"]]
        .to_numpy()
        .tolist()
    }
    assert got == _ref_containment(texts, 0.8) and (0, 1, 3, 3) in got
    jac = jaccard_prefix_join(ds, threshold=0.8).to_pandas()
    assert len(jac) == 0 or not ((jac["a"] == 0) & (jac["b"] == 1)).any()


def test_containment_join_random_corpus_exact(ray_session):
    """Randomized mixed-size corpus incl. long docs: the containment
    prefix generation must lose no pair vs brute force at any tau."""
    import pyarrow as pa

    import ray.data

    from georay.textops import containment_join

    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(12)]
    texts = {}
    for i in range(36):
        size = int(rng.integers(3, 10)) if i % 3 else int(rng.integers(20, 40))
        texts[i] = " ".join(rng.choice(vocab, size=size))
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    for tau in (0.5, 0.8):
        got = {
            tuple(r)
            for r in containment_join(ds, threshold=tau)
            .to_pandas()[["a", "b", "n_inter", "n_min"]]
            .to_numpy()
            .tolist()
        }
        assert got == _ref_containment(texts, tau)


def test_containment_join_postings_path_matches_fast_path(ray_session):
    """max_vocab=1 forces the prefix/postings fallback; both engines
    must produce the identical exact pair set (the fast matmul path is
    what the small-vocab corpora above exercise by default)."""
    import pyarrow as pa

    import ray.data

    from georay.textops import containment_join

    rng = np.random.default_rng(17)
    vocab = [f"v{i}" for i in range(12)]
    texts = {}
    for i in range(30):
        size = int(rng.integers(3, 10)) if i % 3 else int(rng.integers(20, 40))
        texts[i] = " ".join(rng.choice(vocab, size=size))
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    for tau in (0.5, 0.8):
        ref = _ref_containment(texts, tau)
        slow = {
            tuple(r)
            for r in containment_join(ds, threshold=tau, max_vocab=1)
            .to_pandas()[["a", "b", "n_inter", "n_min"]]
            .to_numpy()
            .tolist()
        }
        assert slow == ref
