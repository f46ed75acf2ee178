"""Property-based invariants (hypothesis) for the core kernels the
whole engine leans on: WKB codec round-trip, coordinate
flatten/rebuild, geometry normalization idempotence, name laundering,
HLL monotonicity. The reference has no property tests; these cover the
input space its hand-written goldens cannot."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from georay import sketch
from georay.geometry import (
    fix_semantics,
    flatten_coords,
    rebuild_coords,
    vertex_count,
    wkb_decode,
    wkb_encode,
)
from georay.soql import launder_name, rename_columns

coord = st.tuples(
    st.floats(-1e6, 1e6, allow_nan=False), st.floats(-1e6, 1e6, allow_nan=False)
).map(list)
line = st.lists(coord, min_size=2, max_size=8)
ring = st.lists(coord, min_size=4, max_size=8)
polygon = st.lists(ring, min_size=1, max_size=3)

GEOMS = st.one_of(
    st.tuples(st.just("point"), coord),
    st.tuples(st.just("linestring"), line),
    st.tuples(st.just("polygon"), polygon),
    st.tuples(st.just("multipoint"), st.lists(coord, min_size=1, max_size=5)),
    st.tuples(st.just("multilinestring"), st.lists(line, min_size=1, max_size=3)),
    st.tuples(st.just("multipolygon"), st.lists(polygon, min_size=1, max_size=2)),
)


@settings(max_examples=200, deadline=None)
@given(GEOMS)
def test_wkb_roundtrip(g):
    ctype, coords = g
    ct2, back = wkb_decode(wkb_encode(ctype, coords))
    assert ct2 == ctype
    assert back == coords


@settings(max_examples=200, deadline=None)
@given(GEOMS)
def test_flatten_rebuild_roundtrip(g):
    ctype, coords = g
    arr, spec = flatten_coords(ctype, coords)
    assert arr.shape[0] == vertex_count(ctype, coords)
    back = rebuild_coords(ctype, arr, spec)
    assert back == coords


@settings(max_examples=200, deadline=None)
@given(GEOMS)
def test_fix_semantics_idempotent(g):
    ctype, coords = g
    once = fix_semantics(ctype, coords)
    twice = fix_semantics(ctype, once)
    assert twice == once
    if ctype in ("polygon", "multipolygon"):
        polys = once if ctype == "multipolygon" else [once]
        for poly in polys:
            for r in poly:
                assert len(r) >= 4 and r[0] == r[-1]  # closed, padded
    if ctype in ("linestring", "multilinestring"):
        lines = once if ctype == "multilinestring" else [once]
        for l in lines:
            assert len(l) >= 2  # linified


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(
            "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 _-."
        ),
        min_size=0,
        max_size=30,
    )
)
def test_launder_output_shape(name):
    # True invariants of the reference's launder (soql.js:5-18): no
    # uppercase survives the uppercase/space trigger, no spaces ever
    # survive, and an already-laundered snake_case name is untouched.
    # (Full idempotence is NOT an invariant: the digit-prefix check runs
    # BEFORE snake_case, so '-0 a' launders to the digit-leading '0_a'
    # in the reference too.)
    out = launder_name(name)
    assert " " not in out
    if any(c.isupper() for c in name) or " " in name:
        assert not any(c.isupper() for c in out)


@settings(max_examples=200, deadline=None)
@given(
    st.from_regex(r"[a-z_][a-z0-9_]{0,20}", fullmatch=True)
)
def test_launder_identity_on_laundered_names(name):
    assert launder_name(name) == name


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=10), min_size=1, max_size=12))
def test_rename_columns_unique(names):
    out = rename_columns([launder_name(n) or "_" for n in names])
    assert len(out) == len(names)
    assert len(set(out)) == len(out)  # always collision-free


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 2**60), min_size=0, max_size=500))
def test_hll_bounds_and_merge_monotone(vals):
    arr = np.array(sorted(set(vals)), dtype=np.int64)
    regs = sketch.empty_registers()
    sketch.update_registers(regs, sketch.hash64(arr))
    est = sketch.estimate(regs)
    n = len(arr)
    if n == 0:
        assert est == 0
    else:
        assert est <= n * 1.5 + 10 and est >= n * 0.5 - 10
    # merging with itself changes nothing
    assert np.array_equal(sketch.merge_registers(regs, regs), regs)


@given(
    st.lists(st.integers(0, 9999), min_size=4, max_size=40),
    st.floats(0.01, 10.0),
)
@settings(max_examples=60, deadline=None)
def test_dp_simplify_deviation_bound(ys, tol):
    """Every DROPPED point lies within `tol` of the segment between its
    surviving neighbors — the Douglas-Peucker contract."""
    import numpy as np

    from georay.spatial.simplify import _seg_dist, dp_simplify

    pts = np.column_stack([np.arange(len(ys), dtype=float), np.array(ys, float)])
    keep = dp_simplify(pts, tol)
    assert keep[0] and keep[-1]
    kept_idx = np.flatnonzero(keep)
    for a, b in zip(kept_idx[:-1], kept_idx[1:]):
        if b - a > 1:
            inner = pts[a + 1 : b]
            d = _seg_dist(inner, pts[a], pts[b])
            assert (d <= tol + 1e-9).all()


@given(
    st.lists(
        st.lists(st.text(alphabet="abc", min_size=1, max_size=3), max_size=50),
        min_size=1,
        max_size=8,
    ),
    st.integers(2, 10),
    st.integers(0, 5),
)
@settings(max_examples=40, deadline=None)
def test_chunk_texts_contract(ray_session, token_lists, window, overlap):
    """Chunk boundaries follow the stride rule exactly and concatenating
    the stride-heads reconstructs the document."""
    import pyarrow as pa
    import ray.data

    from georay.chunk import chunk_texts

    if overlap >= window:
        overlap = window - 1
    stride = window - overlap
    texts = [" ".join(toks) for toks in token_lists]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = chunk_texts(
        ray.data.from_arrow(t), window=window, overlap=overlap
    ).to_pandas()
    if out.empty:  # to_pandas drops columns on empty datasets
        assert all(len(toks) == 0 for toks in token_lists)
        return
    for d, toks in enumerate(token_lists):
        rows = out[out["doc_id"] == d].sort_values("chunk_idx")
        n = len(toks)
        assert len(rows) == -(-n // stride)
        rebuilt = []
        for _, r in rows.iterrows():
            chunk = r.chunk_text.split()
            assert chunk == toks[r.chunk_idx * stride : r.chunk_idx * stride + window]
            rebuilt.extend(chunk[:stride])
        assert rebuilt == toks
