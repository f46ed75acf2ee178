"""chunk_texts: sliding-window token chunking parity vs a plain-python
reference, plus edge paths (empty/whitespace docs, overlap bounds)."""

import pyarrow as pa
import pytest


def _ref(texts, window, overlap):
    stride = window - overlap
    rows = []
    for d, tx in enumerate(texts):
        toks = tx.split()
        k = 0
        while k * stride < len(toks):
            ch = toks[k * stride : k * stride + window]
            rows.append((d, k, len(ch), " ".join(ch)))
            k += 1
    return sorted(rows)


def _run(texts, window, overlap):
    import ray.data

    from georay.chunk import chunk_texts

    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = chunk_texts(
        ray.data.from_arrow(t).repartition(3), window=window, overlap=overlap
    ).to_pandas()
    return sorted(out.itertuples(index=False, name=None))


def test_chunk_parity(ray_session):
    texts = [
        " ".join(f"t{i}" for i in range(n)) for n in (0, 1, 3, 31, 32, 33, 64, 100)
    ] + ["", "   ", "\tone\ntwo  three\t"]
    for window, overlap in ((32, 8), (4, 0), (5, 4)):
        assert _run(texts, window, overlap) == _ref(texts, window, overlap)


def test_chunk_every_token_covered(ray_session):
    texts = [" ".join(f"w{i}" for i in range(57))]
    rows = _run(texts, 16, 4)
    seen = set()
    for _, _, _, chunk in rows:
        seen.update(chunk.split())
    assert seen == {f"w{i}" for i in range(57)}


def test_chunk_bad_overlap_raises(ray_session):
    import ray.data

    from georay.chunk import chunk_texts

    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a"])})
    with pytest.raises(ValueError):
        chunk_texts(ray.data.from_arrow(t), window=4, overlap=4)
