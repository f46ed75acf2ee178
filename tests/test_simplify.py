"""Douglas-Peucker simplification: behavior on non-trivial shapes
(noise removal, extreme retention, degeneration) plus the end-to-end
feature rewrite."""

import numpy as np
import pytest

from georay.spatial.simplify import dp_simplify, simplify_ring


def test_dp_removes_collinear_noise():
    # straight line with tiny perpendicular jitter: only endpoints stay
    x = np.linspace(0, 10, 21)
    y = np.zeros(21)
    y[1:-1] = 1e-6 * np.sign(np.sin(x[1:-1]))
    keep = dp_simplify(np.column_stack([x, y]), tolerance=1e-3)
    assert keep[0] and keep[-1] and keep.sum() == 2


def test_dp_keeps_significant_extremes():
    # one significant spike; the other interior points hug the chords
    pts = np.array([[0, 0], [2.5, 1.49], [5, 3.0], [7.5, 1.51], [10, 0]], float)
    keep = dp_simplify(pts, tolerance=0.5)
    assert keep.tolist() == [True, False, True, False, True]


def test_dp_zigzag_all_kept():
    pts = np.array([[i, (-1.0) ** i] for i in range(9)], float)
    keep = dp_simplify(pts, tolerance=0.5)
    assert keep.all()


def test_simplify_ring_rectangle_fixed_point():
    ring = [[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]]
    assert simplify_ring(ring, tolerance=0.1) == [
        [0.0, 0.0],
        [4.0, 0.0],
        [4.0, 3.0],
        [0.0, 3.0],
        [0.0, 0.0],
    ]


def test_simplify_ring_drops_jitter_keeps_corners():
    # rectangle with a midpoint nudge on every edge, below tolerance
    ring = [
        [0, 0], [2, 0.05], [4, 0], [4.05, 1.5], [4, 3],
        [2, 3.05], [0, 3], [-0.05, 1.5], [0, 0],
    ]
    out = simplify_ring(ring, tolerance=0.2)
    assert out == [[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]]


def test_simplify_ring_degenerates_to_none():
    # near-degenerate sliver collapses below a closable ring
    ring = [[0, 0], [1, 1e-9], [2, 0], [1, -1e-9], [0, 0]]
    assert simplify_ring(ring, tolerance=0.1) is None


def test_simplify_features_counts(ray_session, tmp_path):
    import ray.data

    from georay.fixtures import has_hole
    from georay.pages import synthesize_pages_parquet
    from georay.pipeline import decode_features
    from georay.spatial.simplify import simplify_features

    out = str(tmp_path / "pages")
    synthesize_pages_parquet(out, n=200, seed=42)
    pages = ray.data.read_parquet(out, columns=["url", "html"])
    feats = simplify_features(decode_features(pages), tolerance=1e-4)
    df = feats.to_pandas()
    poly = df[df["n_pts_before"].notna()]
    assert len(poly) > 0
    # grid rectangles are DP fixed points: counts unchanged, 5 per ring
    assert (poly["n_pts_before"] == poly["n_pts_after"]).all()
    assert set(poly["n_pts_after"].astype(int)) <= {5, 10}
