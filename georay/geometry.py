"""Geometry kernel: normalization (closeRings / linify), arity checks,
vertex counts, a WKB codec, coordinate flattening for vectorized
reprojection, and bbox accumulation.

Reference semantics:
  - closeRings: /root/reference/es6-lib/soql/polygon.js:14-36 (note the
    JS `for (i=0; i <= 4 - ring.length; i++)` pad loop re-evaluates
    ring.length every iteration — goldens in
    es6-test/unit/geometry-transforms.js:36-157)
  - linify: /root/reference/es6-lib/soql/line.js:16-26
  - arity: /root/reference/es6-lib/soql/geom.js:18-21
  - vertex counts: soql/{point,line,polygon,multiline,multipolygon}.js
  - nullIfNoCoords: /root/reference/es6-lib/soql/mapper.js:32-46
  - bbox expand: /root/reference/es6-lib/util/bbox.js:40-75

Geometries are represented as (ctype: str, coords: nested lists) while
inside a single blob decode (blobs are KB..MB scale), and as WKB binary
columns once they enter the Dataset; batch-level coordinate math runs on
flattened numpy arrays via flatten/rebuild.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------- normalize


def close_rings(poly):
    """Close every unclosed ring (append first coord) then pad rings with
    fewer than 4 coords by repeating the first coord, re-checking the
    length each iteration exactly like the reference's JS loop."""
    for ring in poly:
        if not ring:
            continue
        x0, y0 = ring[0][0], ring[0][1]
        xn, yn = ring[-1][0], ring[-1][1]
        if x0 != xn or y0 != yn:
            ring.append([x0, y0])
        if len(ring) < 4:
            i = 0
            while i <= 4 - len(ring):
                ring.append([x0, y0])
                i += 1
    return poly


def linify(line):
    """A 1-point LineString gets its point duplicated (downstream rejects
    1-point lines)."""
    if len(line) < 2 and line:
        line.append(line[0])
    return line


def fix_semantics(ctype: str, coords):
    """Apply the per-type normalization the reference runs during
    reprojection (wgs84-reprojector.js:52-54)."""
    if ctype == "linestring":
        return linify(coords)
    if ctype == "polygon":
        return close_rings(coords)
    if ctype == "multilinestring":
        return [linify(l) for l in coords]
    if ctype == "multipolygon":
        return [close_rings(p) for p in coords]
    return coords


# ------------------------------------------------------------------- depth
# coordinate nesting depth per ctype: point=[x,y] -> 0 wrapping levels
_DEPTH = {
    "point": 0,
    "linestring": 1,
    "multipoint": 1,
    "polygon": 2,
    "multilinestring": 2,
    "multipolygon": 3,
}


def iter_positions(ctype: str, coords):
    """Yield every [x, y] position of a geometry."""
    d = _DEPTH[ctype]
    if d == 0:
        yield coords
    elif d == 1:
        yield from coords
    elif d == 2:
        for part in coords:
            yield from part
    else:
        for part in coords:
            for ring in part:
                yield from ring


def is_correct_arity(ctype: str, coords) -> bool:
    """Every position must have exactly 2 ordinates
    (reference geom.js:18-21, enforced at wgs84-reprojector.js:47-50)."""
    return all(len(p) == 2 for p in iter_positions(ctype, coords))


def vertex_count(ctype: str, coords) -> int:
    if ctype == "point":
        return 1
    return sum(1 for _ in iter_positions(ctype, coords))


def null_if_no_coords(ctype: str, coords):
    """GeoJSON can't represent empty Line/Polygon coordinate lists: they
    become null-typed cells (reference mapper.js:32-46)."""
    if ctype in ("linestring", "polygon") and (coords is None or len(coords) == 0):
        return "null", None
    return ctype, coords


# ------------------------------------------------- flatten / rebuild (numpy)


def flatten_coords(ctype: str, coords):
    """Return (positions: float64 ndarray [N,2], shape-spec) for vectorized
    coordinate transforms; rebuild with rebuild_coords."""
    pts = list(iter_positions(ctype, coords))
    if not pts:
        # empty multis are valid GeoJSON (reference mapper.js nullIfNoCoords
        # only wraps Line/Polygon) — reshape(0, -1) would raise
        arr = np.empty((0, 2), dtype=np.float64)
    else:
        arr = np.asarray(pts, dtype=np.float64).reshape(len(pts), -1)[:, :2]
    if _DEPTH[ctype] == 0:
        return arr, None
    if _DEPTH[ctype] == 1:
        return arr, len(pts)
    if _DEPTH[ctype] == 2:
        return arr, [len(part) for part in coords]
    return arr, [[len(ring) for ring in part] for part in coords]


def rebuild_coords(ctype: str, arr: np.ndarray, spec):
    lists = arr.tolist()
    d = _DEPTH[ctype]
    if d == 0:
        return lists[0]
    if d == 1:
        return lists
    if d == 2:
        out, i = [], 0
        for n in spec:
            out.append(lists[i : i + n])
            i += n
        return out
    out, i = [], 0
    for part in spec:
        rings = []
        for n in part:
            rings.append(lists[i : i + n])
            i += n
        out.append(rings)
    return out


# --------------------------------------------------------------------- WKB

_WKB_CODE = {
    "point": 1,
    "linestring": 2,
    "polygon": 3,
    "multipoint": 4,
    "multilinestring": 5,
    "multipolygon": 6,
}
_CODE_WKB = {v: k for k, v in _WKB_CODE.items()}


def _pack_positions(buf: bytearray, positions):
    for p in positions:
        if len(p) < 2:
            # reference M7 (soql/geom.js:18-21): a coordinate without 2
            # members is an arity error, not a crash — raised here so
            # it surfaces wherever the geometry is first materialized
            from .errors import InvalidArityError

            raise InvalidArityError(
                f"coordinate {p!r} does not have 2 coordinates"
            )
        buf += struct.pack("<dd", p[0], p[1])


def _pack_ring_seq(buf: bytearray, rings):
    buf += struct.pack("<I", len(rings))
    for ring in rings:
        buf += struct.pack("<I", len(ring))
        _pack_positions(buf, ring)


def wkb_encode(ctype: str, coords) -> bytes:
    """2D little-endian ISO WKB."""
    buf = bytearray(b"\x01")
    buf += struct.pack("<I", _WKB_CODE[ctype])
    if ctype == "point":
        _pack_positions(buf, [coords])
    elif ctype in ("linestring", "multipoint"):
        buf += struct.pack("<I", len(coords))
        _pack_positions(buf, coords)
    elif ctype in ("polygon", "multilinestring"):
        if ctype == "polygon":
            _pack_ring_seq(buf, coords)
        else:
            buf += struct.pack("<I", len(coords))
            for line in coords:
                buf += b"\x01" + struct.pack("<II", _WKB_CODE["linestring"], len(line))
                _pack_positions(buf, line)
    else:  # multipolygon
        buf += struct.pack("<I", len(coords))
        for poly in coords:
            buf += b"\x01" + struct.pack("<I", _WKB_CODE["polygon"])
            _pack_ring_seq(buf, poly)
    return bytes(buf)


def wkb_decode(wkb: bytes):
    """Inverse of wkb_encode -> (ctype, coords nested lists)."""
    ctype, coords, _ = _wkb_decode_at(wkb, 0)
    return ctype, coords


def _read_positions(wkb, off, n, dtype="<f8"):
    arr = np.frombuffer(wkb, dtype=dtype, count=2 * n, offset=off)
    return arr.reshape(n, 2).tolist(), off + 16 * n


def _wkb_decode_at(wkb: bytes, off: int):
    little = wkb[off] == 1
    fmt = "<I" if little else ">I"
    pos_dtype = "<f8" if little else ">f8"  # honor byte order for coords too
    code = struct.unpack_from(fmt, wkb, off + 1)[0] % 1000
    ctype = _CODE_WKB[code]
    off += 5
    if ctype == "point":
        pts, off = _read_positions(wkb, off, 1, pos_dtype)
        return ctype, pts[0], off
    n = struct.unpack_from(fmt, wkb, off)[0]
    off += 4
    if ctype in ("linestring", "multipoint"):
        pts, off = _read_positions(wkb, off, n, pos_dtype)
        return ctype, pts, off
    if ctype == "polygon":
        rings = []
        for _ in range(n):
            m = struct.unpack_from(fmt, wkb, off)[0]
            pts, off = _read_positions(wkb, off + 4, m, pos_dtype)
            rings.append(pts)
        return ctype, rings, off
    parts = []
    for _ in range(n):
        _, part, off = _wkb_decode_at(wkb, off)
        parts.append(part)
    return ctype, parts, off


def wkb_vertex_count(wkb: bytes) -> int:
    """Vertex count straight off the WKB byte layout (no full decode)."""
    ctype, coords = wkb_decode(wkb)
    return vertex_count(ctype, coords)


# -------------------------------------------------------------------- bbox


class BBox:
    """min/max accumulator matching reference util/bbox.js exactly: a
    coordinate is valid iff x >= -180 and -90 <= y <= 90 (the reference's
    _isValid never checks x <= 180 — bbox.js:42-50 tests validMinY twice);
    NaN fails every comparison and is skipped."""

    __slots__ = ("minx", "miny", "maxx", "maxy")

    def __init__(self, minx=None, miny=None, maxx=None, maxy=None):
        self.minx, self.miny, self.maxx, self.maxy = minx, miny, maxx, maxy

    def expand(self, coord) -> "BBox":
        if len(coord) != 2:
            return self
        x, y = coord
        if x is None or y is None or math.isnan(x) or math.isnan(y):
            return self
        if not (x >= -180 and -90 <= y <= 90):  # x<=180 deliberately unchecked
            return self
        if self.minx is None or x < self.minx:
            self.minx = x
        if self.maxx is None or x > self.maxx:
            self.maxx = x
        if self.miny is None or y < self.miny:
            self.miny = y
        if self.maxy is None or y > self.maxy:
            self.maxy = y
        return self

    def merge(self, other: "BBox") -> "BBox":
        for x, y in ((other.minx, other.miny), (other.maxx, other.maxy)):
            if x is not None and y is not None:
                self.expand([x, y])
        return self

    def to_json(self):
        return {
            "minx": self.minx,
            "miny": self.miny,
            "maxx": self.maxx,
            "maxy": self.maxy,
        }

    def __repr__(self):
        return f"BBox({self.minx}, {self.miny}, {self.maxx}, {self.maxy})"
