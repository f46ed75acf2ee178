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
