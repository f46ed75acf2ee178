"""Spatial operators: cell index, STRtree, ray-casting PIP, joins, kNN,
tiles — verified against the closed-form grid goldens from
georay.fixtures."""

import numpy as np
import pytest

from georay.fixtures import (
    BBOX,
    GRID,
    containing_polygon_id,
    grid_polygon_rings,
    has_hole,
    hole_bounds,
    grid_cell_bounds,
    point_in_grid_polygon,
)
from georay.spatial.cells import (
    cell_bounds,
    cell_encode,
    cell_parent,
    cell_to_zxy,
    cells_covering_bbox,
    k_ring,
)
from georay.spatial.pip import pack_rings, points_in_polygon
from georay.spatial.strtree import STRtree


def test_cell_roundtrip():
    lons = np.array([-122.4, 0.0, 179.9, -179.9])
    lats = np.array([47.6, 0.0, 84.0, -84.0])
    cells = cell_encode(lons, lats, 12)
    z, x, y = cell_to_zxy(cells)
    assert (z == 12).all()
    minlon, minlat, maxlon, maxlat = cell_bounds(cells)
    assert ((lons >= minlon) & (lons <= maxlon)).all()
    assert ((lats >= minlat - 1e-9) & (lats <= maxlat + 1e-9)).all()


def test_cell_parent():
    c = cell_encode(np.array([-122.4]), np.array([47.6]), 15)
    p = cell_parent(c, 10)
    z, x, y = cell_to_zxy(p)
    z0, x0, y0 = cell_to_zxy(c)
    assert z[0] == 10 and x[0] == x0[0] >> 5 and y[0] == y0[0] >> 5


def test_k_ring_sizes():
    c = int(cell_encode(np.array([-122.4]), np.array([47.6]), 10)[0])
    assert len(k_ring(c, 0)) == 1
    assert len(k_ring(c, 1)) == 9
    assert len(k_ring(c, 2)) == 25


def test_cells_covering_bbox():
    cells = cells_covering_bbox(-122.5, 47.4, -122.2, 47.8, 10)
    assert len(cells) >= 1
    # every cell intersects the box
    minlon, minlat, maxlon, maxlat = cell_bounds(cells)
    assert (maxlon >= -122.5).all() and (minlon <= -122.2).all()


def test_pip_square_and_hole():
    pid = 3  # has a hole (3 % 7 == 3)
    assert has_hole(pid)
    coords, offs = pack_rings(grid_polygon_rings(pid))
    x0, y0, x1, y1 = grid_cell_bounds(pid)
    hx0, hy0, hx1, hy1 = hole_bounds(pid)
    pts = np.array(
        [
            [(x0 + x1) / 2, y0 + 0.01 * (y1 - y0)],  # inside, below hole
            [(hx0 + hx1) / 2, (hy0 + hy1) / 2],  # inside the hole -> out
            [x0 - 1.0, y0],  # far outside
        ]
    )
    got = points_in_polygon(pts, coords, offs)
    assert got.tolist() == [True, False, False]


def test_pip_matches_closed_form_golden():
    rng = np.random.default_rng(7)
    lon = BBOX[0] + rng.random(500) * (BBOX[2] - BBOX[0])
    lat = BBOX[1] + rng.random(500) * (BBOX[3] - BBOX[1])
    for pid in [0, 3, 17, 100, 255]:
        coords, offs = pack_rings(grid_polygon_rings(pid))
        got = points_in_polygon(np.column_stack([lon, lat]), coords, offs)
        want = np.array([point_in_grid_polygon(pid, x, y) for x, y in zip(lon, lat)])
        assert (got == want).all()


def test_strtree_query():
    rng = np.random.default_rng(3)
    centers = rng.random((300, 2)) * 100
    bboxes = np.column_stack(
        [centers[:, 0] - 1, centers[:, 1] - 1, centers[:, 0] + 1, centers[:, 1] + 1]
    )
    tree = STRtree(bboxes)
    for q in [(0, 0, 10, 10), (50, 50, 52, 52), (-10, -10, -5, -5), (0, 0, 100, 100)]:
        got = set(tree.query(*q).tolist())
        brute = set(
            np.nonzero(
                (bboxes[:, 0] <= q[2])
                & (bboxes[:, 2] >= q[0])
                & (bboxes[:, 1] <= q[3])
                & (bboxes[:, 3] >= q[1])
            )[0].tolist()
        )
        assert got == brute


def test_strtree_empty():
    tree = STRtree(np.empty((0, 4)))
    assert len(tree.query(0, 0, 1, 1)) == 0


@pytest.fixture(scope="module")
def index(ray_session):
    import ray.data

    from georay.pages import pages_batch
    from georay.pipeline import decode_features
    from georay.spatial.index import build_polygon_index

    pages = ray.data.from_arrow(pages_batch(0, 2000))
    feats = decode_features(pages)
    return build_polygon_index(feats)


def test_polygon_index_build(index):
    # 2000 pages -> 20 payloads x 4 polygons, dedup by content
    ids = sorted({int(p["polygon_id"]) for p in index.polygons})
    assert len(index.polygons) == len(ids)  # content-deduped
    assert len(ids) == 80
    assert ids[:4] == [0, 1, 2, 3]


def test_pip_join_golden(index, ray_session):
    import ray
    import ray.data

    from georay.pages import pages_batch
    from georay.pipeline import extract_batch
    from georay.spatial.join import PIPJoiner

    pages = ray.data.from_arrow(pages_batch(0, 2000))
    pts = pages.map_batches(extract_batch, batch_format="pyarrow").drop_columns(["html"])
    ref = ray.put(index)
    joined = pts.map_batches(PIPJoiner, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=2)
    rows = joined.take_all()

    # golden: closed-form containment for the indexed polygon subset
    from georay.pages import page_coords, page_url

    known = {int(p["polygon_id"]) for p in index.polygons}
    expect = {}
    for i in range(2000):
        u = page_url(i)
        lon, lat = page_coords(u)
        pid = containing_polygon_id(lon, lat)
        if pid is not None and pid in known:
            expect[u] = pid
    got = {r["url"]: int(r["polygon_id"]) for r in rows}
    assert got == expect
    assert len(rows) > 0


def test_knn_golden(index, ray_session):
    import ray
    import ray.data

    from georay.pages import pages_batch
    from georay.pipeline import extract_batch
    from georay.spatial.join import KNNJoiner, haversine_m

    pages = ray.data.from_arrow(pages_batch(0, 200))
    pts = pages.map_batches(extract_batch, batch_format="pyarrow").drop_columns(["html"])
    ref = ray.put(index)
    k = 3
    knn = pts.map_batches(
        KNNJoiner, fn_constructor_args=(ref, k), batch_format="pyarrow", concurrency=2
    )
    rows = knn.take_all()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)

    from georay.pages import page_coords, page_url

    cents = index.centroids
    for i in range(0, 200, 17):  # sample
        u = page_url(i)
        lon, lat = page_coords(u)
        d = haversine_m(lon, lat, cents[:, 0], cents[:, 1])
        want = np.sort(d)[:k]
        got = sorted(r["distance_m"] for r in by_url[u])
        assert np.allclose(got, want, rtol=1e-9), (u, got, want)


def test_tile_assignment_and_counts(index, ray_session):
    import ray
    import ray.data

    from georay.pages import pages_batch
    from georay.pipeline import extract_batch
    from georay.spatial.tiles import assign_tiles_batch, tile_counts, polygon_tile_table

    pages = ray.data.from_arrow(pages_batch(0, 1000))
    pts = pages.map_batches(extract_batch, batch_format="pyarrow").drop_columns(["html"])
    tiled = pts.map_batches(assign_tiles_batch, batch_format="pyarrow")
    counts = tile_counts(tiled).take_all()
    assert sum(r["n_pages"] for r in counts) == 1000
    assert all(r["n_pages"] >= 1 for r in counts)

    cover = polygon_tile_table(index)
    assert cover.num_rows > len(index.polygons)  # every polygon spans >1 tile at z15


def test_knn_exact_on_skewed_distribution():
    """Exact-kNN stopping rule (ADVICE r01): a dense far cluster fills k
    candidates early while a nearer sparse centroid hides 2+ rings out;
    high-latitude points exercise latitude-varying mercator cell height.
    Brute force over all centroids is the oracle."""
    from georay.spatial.index import PolygonIndex
    from georay.spatial.join import KNNJoiner, haversine_m
    import pyarrow as pa

    rng = np.random.default_rng(7)

    def square(pid, cx, cy, e=1e-4):
        ring = [
            [cx - e, cy - e], [cx + e, cy - e], [cx + e, cy + e],
            [cx - e, cy + e], [cx - e, cy - e],
        ]
        return {"polygon_id": pid, "layer": "t", "name": f"p{pid}", "rings": [ring]}

    polys = []
    # dense cluster near (10.30, 45.30)
    for i in range(150):
        polys.append(square(len(polys), 10.30 + rng.normal(0, 0.005), 45.30 + rng.normal(0, 0.005)))
    # sparse spread over a 2x2 degree box
    for i in range(40):
        polys.append(square(len(polys), float(rng.uniform(9, 11)), float(rng.uniform(44, 46))))
    # high-latitude cluster + sparse
    for i in range(30):
        polys.append(square(len(polys), 10.0 + rng.normal(0, 0.01), 80.0 + rng.normal(0, 0.01)))
    for i in range(10):
        polys.append(square(len(polys), float(rng.uniform(9, 11)), float(rng.uniform(79, 81))))

    index = PolygonIndex(polys)
    cents = index.centroids
    k = 3
    knn = KNNJoiner(index, k=k)

    q_lon = np.concatenate([rng.uniform(9, 11, 40), rng.uniform(9, 11, 20)])
    q_lat = np.concatenate([rng.uniform(44, 46, 40), rng.uniform(79, 81, 20)])
    urls = [f"q{i}" for i in range(len(q_lon))]
    out = knn(pa.table({"url": urls, "lon": q_lon, "lat": q_lat}))
    by_url = {}
    for r in out.to_pylist():
        by_url.setdefault(r["url"], []).append(r["distance_m"])

    for i, u in enumerate(urls):
        d = haversine_m(q_lon[i], q_lat[i], cents[:, 0], cents[:, 1])
        want = np.sort(d)[:k]
        got = np.sort(by_url[u])
        assert np.allclose(got, want, rtol=1e-9), (u, got.tolist(), want.tolist())


def test_sharded_index_matches_single(index, ray_session):
    """ShardedPolygonIndex + sharded_pip_join_batch must reproduce the
    single-object broadcast join exactly (same (url, polygon_id) set),
    including polygons replicated across shard-cell boundaries."""
    import ray
    import ray.data

    from georay.pages import pages_dir_for, pages_batch
    from georay.pipeline import decode_features, extract_batch
    from georay.spatial.index import build_sharded_polygon_index
    from georay.spatial.join import pip_join_batch, sharded_pip_join_batch

    pages = ray.data.from_arrow(pages_batch(0, 2000))
    feats = decode_features(
        pages.select_columns(["url", "html"])
    ).materialize()
    # shard_zoom 13 ≈ the grid cell size -> polygons genuinely span
    # multiple shard cells (replication path exercised)
    sharded = build_sharded_polygon_index(feats, shard_zoom=13)
    assert len(sharded.shard_refs) > 4

    pts = pages.map_batches(extract_batch, batch_format="pyarrow").drop_columns(["html"])
    ref = ray.put(index)
    single = pts.map_batches(
        pip_join_batch, fn_kwargs={"index_ref": ref}, batch_format="pyarrow"
    ).take_all()
    shard_join = pts.map_batches(
        sharded_pip_join_batch, fn_kwargs={"sharded": sharded}, batch_format="pyarrow"
    ).take_all()

    # compare against closed form, restricted to the polygon subset the
    # 2000-page corpus actually decodes (payload k=0..19 -> pids 0..79)
    got_single = {(r["url"], int(r["polygon_id"])) for r in single}
    got_sharded = {(r["url"], int(r["polygon_id"])) for r in shard_join}
    from georay.fixtures import payload_polygon_ids
    from georay.pages import page_coords, page_url

    decoded_pids = set()
    for k in range(20):
        decoded_pids.update(payload_polygon_ids(k))
    expect = set()
    for i in range(2000):
        u = page_url(i)
        lon, lat = page_coords(u)
        pid = containing_polygon_id(lon, lat)
        if pid is not None and pid in decoded_pids:
            expect.add((u, pid))
    assert got_sharded == expect
    # no duplicate (url, polygon) rows from shard replication
    assert len(shard_join) == len(got_sharded)
    # every single-object-index hit on a decoded polygon appears in the
    # sharded result too (the fixture index may hold a subset)
    assert {p for p in got_single if p[1] in decoded_pids} <= got_sharded


def test_hex_encode_geometry():
    """Every point lies within one circumradius of its assigned hex
    center, adjacent centers are sqrt(3)*size apart, and the packing
    round-trips."""
    import numpy as np

    from georay.spatial.cells import hex_center, hex_encode, hex_to_qr

    rng = np.random.default_rng(1)
    size = 0.02
    lon = rng.uniform(-122.5, -122.2, 5000)
    lat = rng.uniform(47.4, 47.8, 5000)
    cells = hex_encode(lon, lat, size)
    q, r = hex_to_qr(cells)
    assert (hex_encode(*hex_center(cells, size), size) == cells).all()
    cx, cy = hex_center(cells, size)
    d = np.sqrt((lon - cx) ** 2 + (lat - cy) ** 2)
    assert (d <= size + 1e-12).all()
    # nearest-center property: closer to own center than to any axial neighbor
    for dq, dr in ((1, 0), (0, 1), (-1, 1)):
        nx, ny = hex_center((q + dq + (1 << 20)) * (1 << 21) + (r + dr + (1 << 20)), size)
        dn = np.sqrt((lon - nx) ** 2 + (lat - ny) ** 2)
        assert (d <= dn + 1e-12).all()


def test_tile_pyramid_rollup_conserves(ray_session):
    """Each zoom level's counts sum to the page total, and every z13
    tile's count equals the sum of its z15 children."""
    import __ray_entry__ as entry_mod

    df = entry_mod.queries()["geo_tile_pyramid"]("/root/testdata/sf0.001").to_pandas()
    from georay.spatial.cells import cell_parent

    totals = df.groupby("zoom")["n_pages"].sum()
    assert totals[15] == totals[13] == totals[11] == 1000
    z15 = df[df["zoom"] == 15].copy()
    z15["parent"] = cell_parent(z15["tile"].to_numpy(), 13)
    child_sums = z15.groupby("parent")["n_pages"].sum()
    z13 = df[df["zoom"] == 13].set_index("tile")["n_pages"]
    assert child_sums.sort_index().equals(z13.sort_index())
