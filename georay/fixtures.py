"""Deterministic geo-payload builders (GeoJSON / KML / KMZ / zipped
shapefile bytes) used by the synthetic pages corpus and the standalone
decoder tests. Modeled on the reference's fixture corpus shapes
(/root/reference/es6-test/fixtures — content synthesized fresh, schemas
described in FIXTURES.md §2), so every decoder path is exercised
in-pipeline without any external data.
"""

from __future__ import annotations

import io
import json
import struct
import zipfile

WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)

# ------------------------------------------------------------ grid model
# The spatial-join side: a fixed G x G polygon grid over the test bbox.
# Every geo payload embeds a handful of grid-cell polygons; PIP/tiling
# goldens are closed-form (a page point's containing cell is arithmetic).

BBOX = (-122.5, 47.4, -122.2, 47.8)  # minx miny maxx maxy
GRID = 16
HOLE_EVERY = 7  # polygon_id % 7 == 3 -> donut with a centered hole


def grid_cell_bounds(polygon_id: int):
    r, c = divmod(polygon_id, GRID)
    minx, miny, maxx, maxy = BBOX
    w = (maxx - minx) / GRID
    h = (maxy - miny) / GRID
    x0 = minx + c * w
    y0 = miny + r * h
    return x0, y0, x0 + w, y0 + h


def has_hole(polygon_id: int) -> bool:
    return polygon_id % HOLE_EVERY == 3


def hole_bounds(polygon_id: int):
    x0, y0, x1, y1 = grid_cell_bounds(polygon_id)
    w, h = x1 - x0, y1 - y0
    return x0 + 0.25 * w, y0 + 0.25 * h, x1 - 0.25 * w, y1 - 0.25 * h


def grid_polygon_rings(polygon_id: int):
    """Outer ring CCW (GeoJSON winding) + optional hole ring."""
    x0, y0, x1, y1 = grid_cell_bounds(polygon_id)
    outer = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
    rings = [outer]
    if has_hole(polygon_id):
        hx0, hy0, hx1, hy1 = hole_bounds(polygon_id)
        rings.append([[hx0, hy0], [hx0, hy1], [hx1, hy1], [hx1, hy0], [hx0, hy0]])
    return rings


def point_in_grid_polygon(polygon_id: int, lon: float, lat: float) -> bool:
    """Closed-form containment golden."""
    x0, y0, x1, y1 = grid_cell_bounds(polygon_id)
    if not (x0 <= lon < x1 and y0 <= lat < y1):
        return False
    if has_hole(polygon_id):
        hx0, hy0, hx1, hy1 = hole_bounds(polygon_id)
        if hx0 < lon < hx1 and hy0 < lat < hy1:
            return False
    return True


def containing_polygon_id(lon: float, lat: float) -> int | None:
    minx, miny, maxx, maxy = BBOX
    if not (minx <= lon < maxx and miny <= lat < maxy):
        return None
    c = int((lon - minx) / (maxx - minx) * GRID)
    r = int((lat - miny) / (maxy - miny) * GRID)
    pid = r * GRID + c
    return pid if point_in_grid_polygon(pid, lon, lat) else None


# ----------------------------------------------------------- payloads


def payload_polygon_ids(k: int, per_payload: int = 4):
    """Deterministic polygon subset for payload #k."""
    n = GRID * GRID
    return [(k * per_payload + j) % n for j in range(per_payload)]


def geojson_payload(k: int) -> bytes:
    feats = []
    for pid in payload_polygon_ids(k):
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": grid_polygon_rings(pid)},
                "properties": {"polygon_id": pid, "name": f"cell_{pid}", "layer": pid % 2},
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats}).encode()


def kml_payload(k: int) -> bytes:
    pms = []
    for pid in payload_polygon_ids(k):
        rings = grid_polygon_rings(pid)
        outer = " ".join(f"{x},{y},0" for x, y in rings[0])
        inner = ""
        if len(rings) > 1:
            ring1 = " ".join(f"{x},{y},0" for x, y in rings[1])
            inner = (
                "<innerBoundaryIs><LinearRing><coordinates>"
                f"{ring1}</coordinates></LinearRing></innerBoundaryIs>"
            )
        pms.append(
            "<Placemark>"
            f"<name>cell_{pid}</name>"
            "<ExtendedData><SchemaData schemaUrl=\"#grid\">"
            f'<SimpleData name="polygon_id">{pid}</SimpleData>'
            f'<SimpleData name="layer">{pid % 2}</SimpleData>'
            "</SchemaData></ExtendedData>"
            "<Polygon><outerBoundaryIs><LinearRing><coordinates>"
            f"{outer}</coordinates></LinearRing></outerBoundaryIs>{inner}</Polygon>"
            "</Placemark>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
        '<Schema name="grid" id="grid">'
        '<SimpleField type="int" name="polygon_id"></SimpleField>'
        '<SimpleField type="int" name="layer"></SimpleField>'
        "</Schema>" + "".join(pms) + "</Document></kml>"
    ).encode()


def kmz_payload(k: int) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("doc.kml", kml_payload(k))
    return buf.getvalue()


def shapefile_zip_payload(k: int) -> bytes:
    """Minimal polygon shapefile: .shp with polygon records (clockwise
    outer rings per the spec), .dbf with polygon_id/name/layer, .prj."""
    pids = payload_polygon_ids(k)
    records = []
    for pid in pids:
        rings = grid_polygon_rings(pid)
        # shapefile winding: outer clockwise, holes counter-clockwise
        outer = list(reversed(rings[0]))
        shp_rings = [outer] + [list(r) for r in rings[1:]]
        records.append((pid, shp_rings))

    shp_records = b""
    for i, (pid, rings) in enumerate(records):
        pts = [p for ring in rings for p in ring]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        content = struct.pack("<i", 5)  # polygon
        content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<2i", len(rings), len(pts))
        idx = 0
        for ring in rings:
            content += struct.pack("<i", idx)
            idx += len(ring)
        for x, y in pts:
            content += struct.pack("<2d", x, y)
        shp_records += struct.pack(">2i", i + 1, len(content) // 2) + content

    minx, miny, maxx, maxy = BBOX
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    header += struct.pack(">i", (100 + len(shp_records)) // 2)
    header += struct.pack("<2i", 1000, 5)
    header += struct.pack("<8d", minx, miny, maxx, maxy, 0, 0, 0, 0)
    shp = header + shp_records

    fields = [("polygon_id", "N", 10, 0), ("name", "C", 20, 0), ("layer", "N", 10, 0)]
    rec_size = 1 + sum(f[2] for f in fields)
    dbf_hdr = struct.pack(
        "<B3BIHH20x", 3, 24, 1, 1, len(records), 32 + 32 * len(fields) + 1, rec_size
    )
    for name, ftype, length, dec in fields:
        dbf_hdr += struct.pack("<11sc4xBB14x", name.encode(), ftype.encode(), length, dec)
    dbf_hdr += b"\x0d"
    dbf_body = b""
    for pid, _rings in records:
        dbf_body += b" "
        dbf_body += f"{pid:>10d}".encode()
        dbf_body += f"cell_{pid}".ljust(20).encode()
        dbf_body += f"{pid % 2:>10d}".encode()
    dbf = dbf_hdr + dbf_body + b"\x1a"

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("grid.shp", shp)
        zf.writestr("grid.dbf", dbf)
        zf.writestr("grid.prj", WGS84_PRJ)
    return buf.getvalue()


PAYLOAD_BUILDERS = [
    ("grid.geojson", geojson_payload),
    ("grid.kml", kml_payload),
    ("grid.kmz", kmz_payload),
    ("grid.zip", shapefile_zip_payload),
]


def build_payload(k: int):
    """Payload #k: (filename, bytes); format rotates across the four
    decoder paths."""
    name, fn = PAYLOAD_BUILDERS[k % len(PAYLOAD_BUILDERS)]
    return name, fn(k)
