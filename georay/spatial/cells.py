"""Hierarchical spatial cell index (web-mercator quadtree / slippy-tile
scheme), playing the H3/S2 role from the north rule: a uint64 cell id
per (zoom, x, y) used as the partition key for spatial joins, kNN ring
expansion and raster<->vector tile assignment.

Implemented from scratch on the public slippy-map tile math (the same
scheme every web map uses); no external index library exists in this
environment. Cells at zoom z form a 2^z x 2^z grid; a cell's parent at
zoom z-1 is (x>>1, y>>1) — pure bit arithmetic, fully vectorized.

Packing: id = zoom << 58 | x << 29 | y  (29 bits per axis, zoom <= 29).
"""

from __future__ import annotations

import math

import numpy as np

MAX_ZOOM = 29
_LAT_LIMIT = 85.05112877980659  # web-mercator clamp


def cell_encode(lon, lat, zoom: int):
    """Vectorized (lon, lat) -> uint64 cell id at `zoom`."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -_LAT_LIMIT, _LAT_LIMIT)
    n = 1 << zoom
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat)
    y = np.floor((1.0 - np.arcsinh(np.tan(lat_rad)) / math.pi) / 2.0 * n).astype(np.int64)
    x = np.clip(x, 0, n - 1)
    y = np.clip(y, 0, n - 1)
    return (np.int64(zoom) << 58) | (x << 29) | y


def cell_to_zxy(cell):
    cell = np.asarray(cell, dtype=np.int64)
    return cell >> 58, (cell >> 29) & ((1 << 29) - 1), cell & ((1 << 29) - 1)


def cell_xy(zoom: int, x, y):
    return (np.int64(zoom) << 58) | (np.asarray(x, dtype=np.int64) << 29) | np.asarray(y, dtype=np.int64)


def cell_parent(cell, parent_zoom: int):
    z, x, y = cell_to_zxy(cell)
    shift = z - parent_zoom
    return cell_xy(parent_zoom, x >> shift, y >> shift)


def cell_bounds(cell):
    """Cell -> (minlon, minlat, maxlon, maxlat)."""
    z, x, y = cell_to_zxy(np.asarray(cell))
    n = np.left_shift(np.int64(1), z).astype(np.float64)
    minlon = x / n * 360.0 - 180.0
    maxlon = (x + 1) / n * 360.0 - 180.0

    def lat_of(yy):
        t = math.pi * (1 - 2 * yy / n)
        return np.degrees(np.arctan(np.sinh(t)))

    maxlat = lat_of(y.astype(np.float64))
    minlat = lat_of((y + 1).astype(np.float64))
    return minlon, minlat, maxlon, maxlat


def k_ring(cell: int, k: int):
    """All cells within Chebyshev distance k (the (2k+1)^2 block) —
    the cell-ring expansion primitive for kNN. x wraps around the
    antimeridian; y clamps at the poles."""
    z, x, y = (int(v) for v in cell_to_zxy(np.int64(cell)))
    n = 1 << z
    out = []
    for dy in range(-k, k + 1):
        yy = y + dy
        if yy < 0 or yy >= n:
            continue
        for dx in range(-k, k + 1):
            out.append(cell_xy(z, (x + dx) % n, yy))
    return np.array(out, dtype=np.int64)


def ring_only(cell: int, k: int):
    """Just the ring at distance exactly k (k=0 -> the cell itself)."""
    if k == 0:
        return np.array([cell], dtype=np.int64)
    z, x, y = (int(v) for v in cell_to_zxy(np.int64(cell)))
    n = 1 << z
    out = []
    for dy in range(-k, k + 1):
        yy = y + dy
        if yy < 0 or yy >= n:
            continue
        for dx in range(-k, k + 1):
            if max(abs(dx), abs(dy)) != k:
                continue
            out.append(cell_xy(z, (x + dx) % n, yy))
    return np.array(out, dtype=np.int64)


def cells_covering_bbox(minx, miny, maxx, maxy, zoom: int):
    """All cells at `zoom` intersecting the lon/lat bbox (the polygon
    cover primitive; a bbox cover is a superset — PIP verifies exactly)."""
    c0 = cell_encode(np.array([minx]), np.array([maxy]), zoom)[0]  # top-left
    c1 = cell_encode(np.array([maxx]), np.array([miny]), zoom)[0]  # bottom-right
    _, x0, y0 = cell_to_zxy(c0)
    _, x1, y1 = cell_to_zxy(c1)
    xs = np.arange(int(x0), int(x1) + 1, dtype=np.int64)
    ys = np.arange(int(y0), int(y1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return cell_xy(zoom, gx.ravel(), gy.ravel())


# ------------------------------------------------------ hexagonal cells
# A pointy-top axial hex grid over lon/lat (the public Red Blob Games
# axial/cube-round construction) — the hexagonal H3-role binning next
# to the square mercator cells above. Every operation is an identical
# sequence of IEEE double ops on any engine (multiply, divide, floor,
# compare — no transcendentals beyond one sqrt(3)), so a SQL replay
# produces bit-identical cell ids with NO quantization margin.

HEX_BIAS = 1 << 20  # axial coords are biased non-negative for packing


def hex_encode(lon, lat, size: float):
    """Vectorized (lon, lat) -> int64 hex cell id; ``size`` is the hex
    circumradius in degrees. id = (q + BIAS) * 2^21 + (r + BIAS)."""
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    qf = ((np.sqrt(3.0) / 3.0) * x - (1.0 / 3.0) * y) / size
    rf = ((2.0 / 3.0) * y) / size
    xf, zf = qf, rf
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    # cube-round: re-derive exactly one component from the ORIGINAL
    # other two (the scalar if/elif chain, vectorized)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    fix_z = ~fix_x & ~fix_y
    q = np.where(fix_x, -ry - rz, rx).astype(np.int64)
    r = np.where(fix_z, -rx - ry, rz).astype(np.int64)
    # fix_y only corrects the (unused-for-packing) y component
    del fix_y
    return (q + HEX_BIAS) * (1 << 21) + (r + HEX_BIAS)


def hex_to_qr(cell):
    """Inverse of hex_encode's packing -> (q, r) axial coords."""
    cell = np.asarray(cell, dtype=np.int64)
    return cell // (1 << 21) - HEX_BIAS, cell % (1 << 21) - HEX_BIAS


def hex_center(cell, size: float):
    """Hex cell id -> (lon, lat) of the hex center."""
    q, r = hex_to_qr(cell)
    y = r.astype(np.float64) * size * 1.5
    x = (q.astype(np.float64) + r.astype(np.float64) / 2.0) * size * np.sqrt(3.0)
    return x, y
