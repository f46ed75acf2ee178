"""Planar polygon measurement: shoelace area + ring perimeter per
decoded polygon feature, deduplicated to one row per polygon id.

Semantics: even-odd over the flattened ring set — a ring at odd
containment depth subtracts |shoelace(ring)| (winding-independent, so
GeoJSON CCW interior rings and shapefile CW sibling-part holes land on
the same number); perimeter = total boundary length including hole
rings. Units are squared / plain CRS
degrees (the engine reprojects everything to EPSG:4326 first;
reference parity: geo-import exposes no measurement op — this extends
the engine's raster<->vector toolset per the task brief).

Oracle strategy: outputs are quantized to integer 1e-10 units
(floor(x*1e10 + 0.5)). The decoder+reprojection pipeline perturbs
coordinates by at most a few ulps of ~122-degree magnitudes (~3e-14,
see geo_features' 1e-9 bbox rounding), which propagates to < 1e-2
quantized units — far inside the 0.5-unit decision margin — so every
decode path (GeoJSON/KML/KMZ/SHP) of the same grid cell quantizes
identically and the closed-form SQL oracle reproduces the integers
exactly. The dedup groups by the FULL (id, area_q, perim_q) triple:
a decode path that disagreed would surface as an extra row, never be
masked by a min/first.

Scale shape: stateless map_batches over the features checkpoint
(column-pruned to wkb+props_json), one row out per polygon feature,
then one small groupby keyed by polygon id — the group count is the
polygon universe (index-side cardinality), not the page corpus.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count

from georay.geometry import wkb_decode

QUANT = 1e10


def _ring_area_perim(ring) -> tuple:
    v = np.asarray(ring, dtype=np.float64)
    if len(v) < 3:
        return 0.0, 0.0
    # shoelace on RAW lon/lat magnitudes (~122 deg) cancels ~5.7e3
    # cross terms down to ~1e-4 — a 4e8-ulp cancellation that costs
    # ~0.05 quantized units; translating to the ring origin first makes
    # the terms the same magnitude as the answer (error ~ulp of it)
    x = v[:, 0] - v[0, 0]
    y = v[:, 1] - v[0, 1]
    area = 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    d = np.diff(v, axis=0)
    perim = float(np.sum(np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)))
    return float(area), perim


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Even-odd crossing test (same model as the PIP join)."""
    x, y = ring[:, 0], ring[:, 1]
    x0, y0 = x[:-1], y[:-1]
    x1, y1 = x[1:], y[1:]
    crosses = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x0 + (py - y0) / (y1 - y0) * (x1 - x0)
    return bool(np.count_nonzero(crosses & (px < xs)) % 2)


def _even_odd_area_perim(rings) -> tuple:
    """Feature area under even-odd semantics: a ring at odd containment
    depth subtracts. The decoders emit holes either as interior rings or
    (shapefile multi-part) as sibling parts, so nesting depth — not ring
    position — decides the sign, mirroring the PIP join's flattened
    even-odd ring model (georay/spatial/index.py)."""
    vs = [np.asarray(r, dtype=np.float64) for r in rings if len(r) >= 3]
    area = perim = 0.0
    for i, v in enumerate(vs):
        a, p = _ring_area_perim(v)
        px, py = float(v[0, 0]), float(v[0, 1])
        depth = sum(
            _point_in_ring(px, py, u) for j, u in enumerate(vs) if j != i
        )
        area += a if depth % 2 == 0 else -a
        perim += p
    return area, perim


def clip_ring_rect(ring, x0: float, y0: float, x1: float, y1: float):
    """Sutherland-Hodgman clip of a closed ring to an axis-aligned
    rectangle (the classic public algorithm; clip region is convex, so
    one pass per half-plane). Returns an open vertex list (possibly
    empty). Vertex counts here are tiny (grid rings are 5 points), so
    the scalar loop is not a hot path — the per-batch fan-out is."""
    pts = [tuple(p) for p in ring[:-1]] if ring and tuple(ring[0]) == tuple(ring[-1]) else [tuple(p) for p in ring]
    for axis, bound, keep_le in (
        (0, x0, False),
        (0, x1, True),
        (1, y0, False),
        (1, y1, True),
    ):
        if not pts:
            return []
        out = []
        n = len(pts)
        for i in range(n):
            a, b = pts[i], pts[(i + 1) % n]
            a_in = a[axis] <= bound if keep_le else a[axis] >= bound
            b_in = b[axis] <= bound if keep_le else b[axis] >= bound
            if a_in:
                out.append(a)
            if a_in != b_in:
                t = (bound - a[axis]) / (b[axis] - a[axis])
                if axis == 0:
                    out.append((bound, a[1] + t * (b[1] - a[1])))
                else:
                    out.append((a[0] + t * (b[0] - a[0]), bound))
        pts = out
    return pts


def _open_ring_area(pts) -> float:
    if len(pts) < 3:
        return 0.0
    v = np.asarray(pts, dtype=np.float64)
    # origin-translated shoelace (see _ring_area_perim's margin note)
    x = v[:, 0] - v[0, 0]
    y = v[:, 1] - v[0, 1]
    return 0.5 * abs(
        float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    )


def polygon_tile_coverage(
    features: ray.data.Dataset,
    zoom: int = 15,
    id_prop: str = "polygon_id",
) -> ray.data.Dataset:
    """Raster<-vector coverage fractions: for every decoded polygon and
    every slippy tile it touches at ``zoom``, the clipped polygon area
    inside that tile, quantized like polygon_measures. Even-odd ring
    signs (holes subtract their own clipped area). Rows with zero
    quantized coverage are dropped (bbox-cover tiles that only graze).

    Output: polygon_id, tile (packed cell id), cov_q — deduplicated to
    one row per triple, so a decode path that disagreed would surface
    as a duplicate (polygon_id, tile)."""
    from georay.spatial.cells import cell_bounds, cells_covering_bbox

    def coverage(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "polygon_id": pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64()),
                "cov_q": pa.array([], pa.int64()),
            }
        )
        if "wkb" not in t.column_names:
            return empty
        mask = pc.and_(
            pc.is_valid(t["wkb"]),
            pc.is_in(
                t["geom_type"], value_set=pa.array(["polygon", "multipolygon"])
            ),
        )
        t = t.filter(mask)
        out_id, out_tile, out_cov = [], [], []
        for wkb, pj, cj in zip(
            t["wkb"].to_pylist(),
            t["props_json"].to_pylist(),
            t["cols_json"].to_pylist(),
        ):
            names, _types = json.loads(cj)
            props = dict(zip(names[1:], json.loads(pj)))
            pid = props.get(id_prop)
            if pid is None:
                continue
            ctype, coords = wkb_decode(wkb)
            polys = [coords] if ctype == "polygon" else coords
            rings = [
                np.asarray(r, dtype=np.float64)
                for rs in polys
                for r in rs
                if len(r) >= 4
            ]
            if not rings:
                continue
            signs = []
            for i, v in enumerate(rings):
                px, py = float(v[0, 0]), float(v[0, 1])
                depth = sum(
                    _point_in_ring(px, py, u)
                    for j, u in enumerate(rings)
                    if j != i
                )
                signs.append(1.0 if depth % 2 == 0 else -1.0)
            allv = np.vstack(rings)
            bb = (
                float(allv[:, 0].min()),
                float(allv[:, 1].min()),
                float(allv[:, 0].max()),
                float(allv[:, 1].max()),
            )
            tiles = cells_covering_bbox(*bb, zoom)
            tx0, ty0, tx1, ty1 = cell_bounds(tiles)
            for ti in range(len(tiles)):
                cov = 0.0
                for s, v in zip(signs, rings):
                    clipped = clip_ring_rect(
                        v.tolist(),
                        float(tx0[ti]),
                        float(ty0[ti]),
                        float(tx1[ti]),
                        float(ty1[ti]),
                    )
                    cov += s * _open_ring_area(clipped)
                q = int(np.floor(cov * QUANT + 0.5))
                if q > 0:
                    out_id.append(int(pid))
                    out_tile.append(int(tiles[ti]))
                    out_cov.append(q)
        return pa.table(
            {
                "polygon_id": pa.array(out_id, pa.int64()),
                "tile": pa.array(out_tile, pa.int64()),
                "cov_q": pa.array(out_cov, pa.int64()),
            }
        )

    covered = features.map_batches(coverage, batch_format="pyarrow")
    return (
        covered.groupby(["polygon_id", "tile", "cov_q"])
        .aggregate(Count(alias_name="n_feat"))
        .drop_columns(["n_feat"])
    )


def polygon_adjacency(
    features: ray.data.Dataset, id_prop: str = "polygon_id"
) -> ray.data.Dataset:
    """Shared-edge polygon adjacency derived from GEOMETRY (not ids):
    two polygons are adjacent when their quantized exterior bboxes
    touch along a full-overlap interval in x or y — the topology
    primitive for region merging / neighborhood smoothing.

    Shape: one map_batches pass emits a deduped (polygon_id, bbox)
    table quantized to 1e-9-degree ints (decode paths differ by ulps;
    integer equality makes edge-matching exact); the polygon universe
    is index-side small, so the pair sweep is a driver-free
    map_groups over ONE group of the collected bbox table — a
    sort-sweep (O(P log P + adjacencies)) inside a single task, the
    same bounded-side contract as the polygon index build.

    Output: a < b polygon_id pairs, one row each."""
    Q = 1e9

    def bbox_rows(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "polygon_id": pa.array([], pa.int64()),
                "x0": pa.array([], pa.int64()),
                "y0": pa.array([], pa.int64()),
                "x1": pa.array([], pa.int64()),
                "y1": pa.array([], pa.int64()),
            }
        )
        if "wkb" not in t.column_names:
            return empty
        mask = pc.and_(
            pc.is_valid(t["wkb"]),
            pc.is_in(
                t["geom_type"], value_set=pa.array(["polygon", "multipolygon"])
            ),
        )
        t = t.filter(mask)
        ids, x0s, y0s, x1s, y1s = [], [], [], [], []
        for wkb, pj, cj in zip(
            t["wkb"].to_pylist(),
            t["props_json"].to_pylist(),
            t["cols_json"].to_pylist(),
        ):
            names, _types = json.loads(cj)
            props = dict(zip(names[1:], json.loads(pj)))
            pid = props.get(id_prop)
            if pid is None:
                continue
            ctype, coords = wkb_decode(wkb)
            polys = [coords] if ctype == "polygon" else coords
            v = np.vstack(
                [np.asarray(r, np.float64) for rs in polys for r in rs if len(r)]
            )
            ids.append(int(pid))
            x0s.append(int(np.floor(v[:, 0].min() * Q + 0.5)))
            y0s.append(int(np.floor(v[:, 1].min() * Q + 0.5)))
            x1s.append(int(np.floor(v[:, 0].max() * Q + 0.5)))
            y1s.append(int(np.floor(v[:, 1].max() * Q + 0.5)))
        return pa.table(
            {
                "polygon_id": pa.array(ids, pa.int64()),
                "x0": pa.array(x0s, pa.int64()),
                "y0": pa.array(y0s, pa.int64()),
                "x1": pa.array(x1s, pa.int64()),
                "y1": pa.array(y1s, pa.int64()),
            }
        )

    boxes = features.map_batches(bbox_rows, batch_format="pyarrow")
    deduped = (
        boxes.groupby(["polygon_id", "x0", "y0", "x1", "y1"])
        .aggregate(Count(alias_name="n"))
        .drop_columns(["n"])
    )

    def sweep(t: pa.Table) -> pa.Table:
        pid = t["polygon_id"].to_numpy(zero_copy_only=False)
        x0 = t["x0"].to_numpy(zero_copy_only=False)
        y0 = t["y0"].to_numpy(zero_copy_only=False)
        x1 = t["x1"].to_numpy(zero_copy_only=False)
        y1 = t["y1"].to_numpy(zero_copy_only=False)
        out_a, out_b = [], []
        n = len(pid)
        # vertical shared edges: a.x1 == b.x0 with y-interval overlap
        for xa, xb, lo, hi in ((x1, x0, y0, y1), (y1, y0, x0, x1)):
            order = np.argsort(xb, kind="stable")
            sb = xb[order]
            for i in range(n):
                j0 = np.searchsorted(sb, xa[i], side="left")
                j1 = np.searchsorted(sb, xa[i], side="right")
                for j in order[j0:j1]:
                    if j == i:
                        continue
                    if min(hi[i], hi[j]) > max(lo[i], lo[j]):  # interval overlap
                        a, b = int(pid[i]), int(pid[j])
                        if a != b:
                            out_a.append(min(a, b))
                            out_b.append(max(a, b))
        pairs = sorted(set(zip(out_a, out_b)))
        return pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )

    # ONE group: the polygon table is index-side bounded by contract
    return (
        deduped.map_batches(
            lambda t: t.append_column("__k", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow",
        )
        .groupby("__k")
        .map_groups(
            lambda g: sweep(g.drop_columns(["__k"])), batch_format="pyarrow"
        )
    )


def polygon_measures(
    features: ray.data.Dataset, id_prop: str = "polygon_id"
) -> ray.data.Dataset:
    """(polygon_id, area_q, perim_q): quantized planar area/perimeter,
    one row per distinct polygon id (and per distinct measurement, so
    cross-format decode disagreements surface as duplicate ids)."""

    def measure(t: pa.Table) -> pa.Table:
        if "wkb" not in t.column_names:  # empty block, degenerate schema
            return pa.table(
                {
                    "polygon_id": pa.array([], pa.int64()),
                    "area_q": pa.array([], pa.int64()),
                    "perim_q": pa.array([], pa.int64()),
                }
            )
        mask = pc.and_(
            pc.is_valid(t["wkb"]),
            pc.is_in(
                t["geom_type"], value_set=pa.array(["polygon", "multipolygon"])
            ),
        )
        t = t.filter(mask)
        ids, areas, perims = [], [], []
        for wkb, pj, cj in zip(
            t["wkb"].to_pylist(),
            t["props_json"].to_pylist(),
            t["cols_json"].to_pylist(),
        ):
            # props are positional; names ride in cols_json (first name
            # is the geometry column) — the _tables_to_polygons layout
            names, _types = json.loads(cj)
            props = dict(zip(names[1:], json.loads(pj)))
            pid = props.get(id_prop)
            if pid is None:
                continue
            ctype, coords = wkb_decode(wkb)
            polys = [coords] if ctype == "polygon" else coords
            area, perim = _even_odd_area_perim(
                [ring for rings in polys for ring in rings]
            )
            ids.append(int(pid))
            areas.append(int(np.floor(area * QUANT + 0.5)))
            perims.append(int(np.floor(perim * QUANT + 0.5)))
        return pa.table(
            {
                "polygon_id": pa.array(ids, pa.int64()),
                "area_q": pa.array(areas, pa.int64()),
                "perim_q": pa.array(perims, pa.int64()),
            }
        )

    measured = features.map_batches(measure, batch_format="pyarrow")
    return (
        measured.groupby(["polygon_id", "area_q", "perim_q"])
        .aggregate(Count(alias_name="n_feat"))
        .drop_columns(["n_feat"])
    )
