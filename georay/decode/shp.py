"""Zipped-ESRI-shapefile decoder, from scratch (struct/numpy over the
public .shp / .dbf binary formats).

Reference: /root/reference/es6-lib/decoders/shapefile.js. Reproduced
semantics:

  - only zip entries at depth < 2 are considered (shapefile.js:247 —
    `path.dirname(name).split(sep).length !== 1` keeps both top-level
    and single-directory entries); hidden dot-files are skipped when
    grouping (shapefile.js:30-47)
  - components sorted by name and grouped POSITIONALLY into
    (shp, prj, dbf) triples (shapefile.js:210-218 `_.zip` after sort)
  - each group must have .shp and .dbf else IncompleteShapefileError
    naming the missing file (shapefile.js:194-208)
  - missing .prj -> default WGS84 proj4 string (shapefile.js:28,178-191)
  - records without geometry (null shapes) dropped; null coordinates
    -> []; Polygon promoted to MultiPolygon and LineString to
    MultiLineString by wrapping coords one level (shapefile.js:109-148)
  - DBF: 'C' text (trailing spaces stripped, single-space NUL -> ''),
    'N'/'F' numbers, 'L' logicals, 'D' dates emitted as ISO-8601
    strings with ctype date (es6-test/unit/shapefile.js:67-78)
  - a DBF column named the_geom (any case) renamed invalid_the_geom
    (transform.js:56-58 applies — shapefile rows go through geoJsToSoQL)
"""

from __future__ import annotations

import io
import struct
import zipfile
from itertools import zip_longest

from ..errors import ArchiveError, CorruptShapefileError, IncompleteShapefileError
from ..geometry import null_if_no_coords
from .common import GEOM_NAME, DecodeResult, FeatureRow

DEFAULT_PROJECTION = "+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs"


def _basename(name: str) -> str:
    return name.rsplit("/", 1)[-1]


def _ext(name: str) -> str:
    b = _basename(name)
    return b[b.rfind(".") :].lower() if "." in b else ""


def _is_hidden(name: str) -> bool:
    b = _basename(name)
    stem = b[: b.rfind(".")] if "." in b else b
    return stem.startswith(".")


def _depth_ok(name: str) -> bool:
    # dirname('a/b.shp') -> 'a' (1 part, kept); 'a/b/c.shp' -> 'a/b' (2, skipped)
    parts = name.rstrip("/").split("/")
    return len(parts) <= 2


# ------------------------------------------------------------------- .shp


def _read_shp(data: bytes):
    """Yield GeoJSON-ish geometries (or None for null shapes) per record."""
    if len(data) < 100:
        raise CorruptShapefileError("shp file too short for header")
    (file_code,) = struct.unpack_from(">i", data, 0)
    if file_code != 9994:
        raise CorruptShapefileError(f"bad .shp magic {file_code}")
    (file_len_words,) = struct.unpack_from(">i", data, 24)
    (header_type,) = struct.unpack_from("<i", data, 32)
    if header_type not in _SHAPE_TYPES:
        raise CorruptShapefileError(f"unsupported shape type: {header_type}")
    file_len = file_len_words * 2
    pos = 100
    geoms = []
    while pos + 8 <= min(file_len, len(data)):
        _recno, content_words = struct.unpack_from(">ii", data, pos)
        pos += 8
        rec_end = pos + content_words * 2
        if rec_end > len(data):
            raise CorruptShapefileError("truncated .shp record")
        geoms.append(_read_shape(data, pos, rec_end))
        pos = rec_end
    return geoms


def _pts(data, off, n):
    # bulk parse: one C-level frombuffer + tolist instead of a Python
    # pair loop (identical float64 values, ~4x faster on big records)
    import numpy as np

    return np.frombuffer(data, dtype="<f8", count=2 * n, offset=off).reshape(n, 2).tolist()


_SHAPE_TYPES = {0, 1, 3, 5, 8, 11, 13, 15, 18, 21, 23, 25, 28}


def _read_shape(data: bytes, pos: int, end: int):
    (stype,) = struct.unpack_from("<i", data, pos)
    if stype not in _SHAPE_TYPES:
        raise CorruptShapefileError(f"unsupported shape type: {stype}")
    base = stype % 10  # Z (x+10) and M (x+20) variants carry the same xy front
    if stype == 0:
        return None
    if base == 1:  # point
        x, y = struct.unpack_from("<2d", data, pos + 4)
        return {"type": "Point", "coordinates": [x, y]}
    if base == 8:  # multipoint
        (n,) = struct.unpack_from("<i", data, pos + 36)
        return {"type": "MultiPoint", "coordinates": _pts(data, pos + 40, n)}
    if base in (3, 5):  # polyline / polygon
        nparts, npoints = struct.unpack_from("<2i", data, pos + 36)
        part_idx = list(struct.unpack_from(f"<{nparts}i", data, pos + 44))
        pts = _pts(data, pos + 44 + 4 * nparts, npoints)
        parts = [
            pts[part_idx[i] : (part_idx[i + 1] if i + 1 < nparts else npoints)]
            for i in range(nparts)
        ]
        if base == 3:
            if len(parts) == 1:
                return {"type": "LineString", "coordinates": parts[0]}
            return {"type": "MultiLineString", "coordinates": parts}
        return _assemble_polygon(parts)
    raise CorruptShapefileError(f"unsupported shape type {stype}")


def _ring_area(ring) -> float:
    import numpy as np

    a = np.asarray(ring, dtype=np.float64)
    x, y = a[:, 0], a[:, 1]
    return float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])) / 2.0


def _point_in_ring(pt, ring) -> bool:
    x, y = pt
    inside = False
    j = len(ring) - 1
    for i in range(len(ring)):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def _assemble_polygon(rings):
    """Shapefile polygon ring semantics: clockwise rings (negative signed
    area) are outers, counter-clockwise are holes of the containing outer."""
    if len(rings) == 1:
        return {"type": "Polygon", "coordinates": [rings[0]]}
    polys = []  # [outer, holes...]
    holes = []
    for ring in rings:
        if _ring_area(ring) <= 0:  # clockwise -> outer
            polys.append([ring])
        else:
            holes.append(ring)
    if not polys:
        polys = [[r] for r in rings]
        holes = []
    for hole in holes:
        probe = hole[0]
        target = next((p for p in polys if _point_in_ring(probe, p[0])), polys[0])
        target.append(hole)
    if len(polys) == 1:
        return {"type": "Polygon", "coordinates": polys[0]}
    return {"type": "MultiPolygon", "coordinates": polys}


# ------------------------------------------------------------------- .dbf


def _read_dbf(data: bytes):
    """Return (fields, records): fields = [(name, type, length, decimals)],
    records = list of dicts (deleted records skipped)."""
    if len(data) < 32:
        raise CorruptShapefileError("dbf too short")
    n_records, header_size, record_size = struct.unpack_from("<IHH", data, 4)
    fields = []
    pos = 32
    while pos < header_size - 1 and data[pos] != 0x0D:
        raw = data[pos : pos + 32]
        if len(raw) < 32:
            break
        name = raw[:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(raw[11])
        length = raw[16]
        decimals = raw[17]
        fields.append((name, ftype, length, decimals))
        pos += 32
    records = []
    pos = header_size
    for _ in range(n_records):
        if pos + record_size > len(data):
            break
        deleted = data[pos : pos + 1] == b"*"
        off = pos + 1
        row = {}
        for name, ftype, length, decimals in fields:
            raw = data[off : off + length]
            off += length
            row[name] = _dbf_value(ftype, raw, decimals)
        if not deleted:
            records.append(row)
        pos += record_size
    return fields, records


def _dbf_value(ftype: str, raw: bytes, decimals: int):
    if ftype in ("C", "M"):
        text = raw.decode("utf-8", "replace").rstrip(" \x00")
        return "" if text == " " else text
    text = raw.decode("ascii", "replace").strip(" \x00*")
    if ftype in ("N", "F", "O", "+", "I"):
        if text in ("", ".", "-", "+"):
            return None
        try:
            val = float(text)
        except ValueError:
            return None
        if decimals == 0 and val == int(val):
            return int(val)
        return val
    if ftype == "L":
        if text.upper() in ("T", "Y"):
            return True
        if text.upper() in ("F", "N"):
            return False
        return None
    if ftype == "D":
        if len(text) == 8 and text.isdigit():
            return ("__date__", f"{text[:4]}-{text[4:6]}-{text[6:8]}T00:00:00.000Z")
        return None
    return text or None


# ---------------------------------------------------------------- decoder


def decode_shapefile_zip(blob: bytes) -> DecodeResult:
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        names = [n for n in zf.namelist() if not n.endswith("/") and _depth_ok(n)]
    except zipfile.BadZipFile as e:
        raise ArchiveError(str(e)) from None

    def visible_with_ext(ext):
        return sorted(n for n in names if _ext(n) == ext and not _is_hidden(n))

    shps = visible_with_ext(".shp")
    prjs = visible_with_ext(".prj")
    dbfs = visible_with_ext(".dbf")

    missing = []
    groups = list(zip_longest(shps, prjs, dbfs))
    for shp, _prj, dbf in groups:
        if not shp and dbf:
            missing.append(_basename(dbf)[: -len(".dbf")] + ".shp")
        if not dbf and shp:
            missing.append(_basename(shp)[: -len(".shp")] + ".dbf")
    if missing:
        raise IncompleteShapefileError(missing)

    rows, errors = [], []
    for shp, prj, dbf in groups:
        if not shp:
            continue
        crs = DEFAULT_PROJECTION
        if prj:
            try:
                crs = zf.read(prj).decode("utf-8", "replace")
            except Exception as e:  # unreadable prj entry -> corrupt archive
                raise ArchiveError(str(e)) from None
        try:
            geoms = _read_shp(zf.read(shp))
            _fields, records = _read_dbf(zf.read(dbf))
        except struct.error as e:
            raise CorruptShapefileError(str(e)) from None
        for geom, props in zip_longest(geoms, records):
            if geom is None:
                errors.append("null_shape")
                continue
            if geom.get("coordinates") is None:
                geom["coordinates"] = []
            # reference hack shapefile.js:121-132: always Multi*
            if geom["type"] == "Polygon":
                geom = {
                    "type": "MultiPolygon",
                    "coordinates": [geom["coordinates"]] if geom["coordinates"] else [],
                }
            elif geom["type"] == "LineString":
                geom = {
                    "type": "MultiLineString",
                    "coordinates": [geom["coordinates"]] if geom["coordinates"] else [],
                }
            ctype = geom["type"].lower()
            ctype, coords = null_if_no_coords(ctype, geom["coordinates"])
            names_, types_, values = [], [], []
            for key, value in (props or {}).items():
                if key.lower() == GEOM_NAME:
                    key = f"invalid_{GEOM_NAME}"
                if isinstance(value, tuple) and value and value[0] == "__date__":
                    names_.append(key)
                    types_.append("date")
                    values.append(value[1])
                    continue
                names_.append(key)
                if value is None:
                    types_.append("null")
                elif isinstance(value, bool):
                    types_.append("boolean")
                elif isinstance(value, (int, float)):
                    types_.append("number")
                else:
                    types_.append("string")
                values.append(value)
            rows.append(FeatureRow(ctype, coords, crs, names_, types_, values))
    return DecodeResult(rows, None, errors)
