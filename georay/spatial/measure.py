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


def polygon_attrs(
    features: ray.data.Dataset, id_prop: str = "polygon_id", props: list = ()
) -> ray.data.Dataset:
    """Deduped per-polygon attribute table (polygon_id, *props) from
    decoded polygon features — the dimension side for dissolve /
    region-level joins. One stateless pass + one small groupby (group
    count = polygon universe); integer-valued properties only."""

    cols = ["polygon_id", *props]

    def rows(t: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], pa.int64()) for c in cols})
        if "wkb" not in t.column_names:
            return empty
        mask = pc.and_(
            pc.is_valid(t["wkb"]),
            pc.is_in(
                t["geom_type"], value_set=pa.array(["polygon", "multipolygon"])
            ),
        )
        t = t.filter(mask)
        out: dict = {c: [] for c in cols}
        for pj, cj in zip(t["props_json"].to_pylist(), t["cols_json"].to_pylist()):
            names, _types = json.loads(cj)
            p = dict(zip(names[1:], json.loads(pj)))
            pid = p.get(id_prop)
            if pid is None:
                continue
            out["polygon_id"].append(int(pid))
            for c in props:
                v = p.get(c)
                out[c].append(int(v) if v is not None else None)
        return pa.table({c: pa.array(out[c], pa.int64()) for c in cols})

    return (
        features.map_batches(rows, batch_format="pyarrow")
        .groupby(cols)
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
    )


def polygon_adjacency(
    features: ray.data.Dataset,
    id_prop: str = "polygon_id",
    same_prop: str | None = None,
    dedupe: bool = True,
) -> ray.data.Dataset:
    """Shared-edge polygon adjacency derived from GEOMETRY (not ids):
    two polygons are adjacent iff they share at least one quantized
    boundary SEGMENT — a consecutive-vertex edge with both endpoints
    quantized to 1e-9-degree ints and the endpoint pair sorted, so the
    same border emitted by either polygon (in either winding) produces
    the same key and decode-path ulp noise cannot split a match. True
    topology for arbitrary polygons: bbox contact without a common
    boundary segment is NOT adjacency. Documented assumption (standard
    for segment-keyed topology): a shared border uses the same vertex
    chain on both sides, as any tessellated/tiled source produces; a
    border subdivided by extra vertices on one side only won't match.

    Shape (fully distributed — no single-task pair sweep):
      1. map_batches emits (segment key, polygon_id) rows, per-batch
         deduped with np.unique;
      2. segments hash-bucket to 4xCPU partitions; groupby(bucket)
         .map_groups runs a VECTORIZED run scan (lexsorted unique rows
         -> run boundaries -> the all-of-a-tessellation 2-polygon run
         case is branch-free; >2-sharers loop only over those runs);
      3. a small groupby(a, b) dedups polygons sharing several
         segments.
    Shuffle traffic is fixed-width int64 segment rows, never geometry.

    With ``same_prop`` set (an integer-valued property name), only
    pairs whose two polygons share that property value are emitted —
    the attribute rides the segment rows, so the constraint costs zero
    extra joins (the dissolve path).

    Output: a < b polygon_id pairs, one row each. ``dedupe=False``
    skips the final global pair-dedup groupby (one whole shuffle):
    pairs sharing several boundary segments across buckets may then
    repeat — fine for duplicate-edge-tolerant consumers like
    connected_components (the dissolve path)."""
    Q = 1e9

    _EMPTY_SEGS = {
        "ax": pa.array([], pa.int64()),
        "ay": pa.array([], pa.int64()),
        "bx": pa.array([], pa.int64()),
        "by": pa.array([], pa.int64()),
        "pid": pa.array([], pa.int64()),
    }
    if same_prop is not None:
        _EMPTY_SEGS["attr"] = pa.array([], pa.int64())

    def segment_rows(t: pa.Table) -> pa.Table:
        if "wkb" not in t.column_names:
            return pa.table(_EMPTY_SEGS)
        mask = pc.and_(
            pc.is_valid(t["wkb"]),
            pc.is_in(
                t["geom_type"], value_set=pa.array(["polygon", "multipolygon"])
            ),
        )
        t = t.filter(mask)
        segs = []
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
            if same_prop is not None:
                attr = props.get(same_prop)
                if attr is None:
                    continue
            ctype, coords = wkb_decode(wkb)
            polys = [coords] if ctype == "polygon" else coords
            for ring in (r for rs in polys for r in rs if len(r) >= 2):
                q = np.floor(np.asarray(ring, np.float64) * Q + 0.5).astype(np.int64)
                ax, ay = q[:-1, 0], q[:-1, 1]
                bx, by = q[1:, 0], q[1:, 1]
                keep = (ax != bx) | (ay != by)  # drop quantization-degenerate
                ax, ay, bx, by = ax[keep], ay[keep], bx[keep], by[keep]
                swap = (ax > bx) | ((ax == bx) & (ay > by))
                cols = [
                    np.where(swap, bx, ax),
                    np.where(swap, by, ay),
                    np.where(swap, ax, bx),
                    np.where(swap, ay, by),
                    np.full(len(ax), int(pid), np.int64),
                ]
                if same_prop is not None:
                    cols.append(np.full(len(ax), int(attr), np.int64))
                segs.append(np.stack(cols, axis=1))
        if not segs:
            return pa.table(_EMPTY_SEGS)
        M = np.unique(np.concatenate(segs), axis=0)  # per-batch dedup
        return pa.table(
            {name: pa.array(M[:, i], pa.int64()) for i, name in enumerate(_EMPTY_SEGS)}
        )

    from georay.textops import _n_partitions

    nparts = np.uint64(max(_n_partitions(), 1))

    def add_bucket(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, np.uint64)
        for name, mult in (
            ("ax", 0x9E3779B97F4A7C15),
            ("ay", 0xC2B2AE3D27D4EB4F),
            ("bx", 0x165667B19E3779F9),
            ("by", 0x27D4EB2F165667C5),
        ):
            v = t[name].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = (h ^ (v * np.uint64(mult))) * np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return t.append_column(
            "__b", pa.array((h % nparts).astype(np.int64), pa.int64())
        )

    seg_cols = tuple(_EMPTY_SEGS)  # (..., "pid"[, "attr"])

    def bucket_pairs(g: pa.Table) -> pa.Table:
        cols = [g[c].to_numpy(zero_copy_only=False) for c in seg_cols]
        M = np.unique(np.stack(cols, axis=1), axis=0)  # cross-batch dedup + lexsort
        if len(M) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        same = np.all(M[1:, :4] == M[:-1, :4], axis=1)
        starts = np.r_[0, np.nonzero(~same)[0] + 1]
        counts = np.diff(np.r_[starts, len(M)])
        out_a, out_b = [], []
        s2 = starts[counts == 2]  # the dominant tessellation case, branch-free
        a2, b2 = M[s2, 4], M[s2 + 1, 4]
        if same_prop is not None:
            ok = M[s2, 5] == M[s2 + 1, 5]
            a2, b2 = a2[ok], b2[ok]
        out_a.append(a2)
        out_b.append(b2)
        for s, c in zip(starts[counts > 2], counts[counts > 2]):
            ids = M[s : s + c, 4]
            iu, ju = np.triu_indices(int(c), k=1)
            if same_prop is not None:
                at = M[s : s + c, 5]
                keep = at[iu] == at[ju]
                iu, ju = iu[keep], ju[keep]
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    pairs = (
        features.map_batches(segment_rows, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    if not dedupe:
        return pairs
    return (
        pairs.groupby(["a", "b"])
        .aggregate(Count(alias_name="n"))
        .drop_columns(["n"])
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


def _monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Convex hull of an [N, 2] point array (Andrew's monotone chain),
    returned CCW starting from the lexicographically smallest point,
    collinear points dropped (cross <= 0 pops), no closing repeat."""
    pts = np.unique(pts, axis=0)  # lexsorted (x, then y)
    n = len(pts)
    if n <= 2:
        return pts

    def half(idx_iter):
        out: list = []
        for i in idx_iter:
            p = pts[i]
            while len(out) >= 2:
                o, a = pts[out[-2]], pts[out[-1]]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (
                    p[0] - o[0]
                ) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    return pts[np.array(lower[:-1] + upper[:-1])]


def polygon_hulls(
    features: ray.data.Dataset, id_prop: str = "polygon_id"
) -> ray.data.Dataset:
    """(polygon_id, hull_nv, hull_area_q): convex hull of every
    polygon's full vertex set (all rings — an interior hole can never
    contribute a hull vertex, so hole-bearing grid cells hull to their
    outer rectangle), vertex count with collinear points dropped, and
    the hull's shoelace area quantized like polygon_measures. The
    dedup-by-full-triple contract matches polygon_measures: a decode
    path producing a different hull surfaces as an extra row.

    Scale shape: identical to polygon_measures — stateless map_batches
    over the column-pruned features checkpoint, one small groupby on
    the polygon universe. The hull kernel is O(V log V) per feature on
    vertex counts already bounded by the M8 vertex gate (1e6)."""

    def hulls(t: pa.Table) -> pa.Table:
        if "wkb" not in t.column_names:
            return pa.table(
                {
                    "polygon_id": pa.array([], pa.int64()),
                    "hull_nv": pa.array([], pa.int64()),
                    "hull_area_q": pa.array([], pa.int64()),
                }
            )
        mask = pc.and_(
            pc.is_valid(t["wkb"]),
            pc.is_in(
                t["geom_type"], value_set=pa.array(["polygon", "multipolygon"])
            ),
        )
        t = t.filter(mask)
        ids, nvs, areas = [], [], []
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
            pts = np.concatenate(
                [np.asarray(ring, np.float64) for rings in polys for ring in rings]
            )
            hull = _monotone_chain(pts[:, :2])
            x, y = hull[:, 0], hull[:, 1]
            area = 0.5 * abs(
                float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            )
            ids.append(int(pid))
            nvs.append(len(hull))
            areas.append(int(np.floor(area * QUANT + 0.5)))
        return pa.table(
            {
                "polygon_id": pa.array(ids, pa.int64()),
                "hull_nv": pa.array(nvs, pa.int64()),
                "hull_area_q": pa.array(areas, pa.int64()),
            }
        )

    measured = features.map_batches(hulls, batch_format="pyarrow")
    return (
        measured.groupby(["polygon_id", "hull_nv", "hull_area_q"])
        .aggregate(Count(alias_name="n_feat"))
        .drop_columns(["n_feat"])
    )
