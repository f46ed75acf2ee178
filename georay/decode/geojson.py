"""GeoJSON FeatureCollection decoder.

Reference: /root/reference/es6-lib/decoders/geojson.js:15-71 and
transform.js:11-61. Drops (with a recorded reason, not a crash):
non-Feature elements, features without a geometry, linked-CRS features;
renames a *property* named the_geom (any case) to invalid_the_geom
(transform.js:56-58, the cartoDB EN-4531 hack); null geometry becomes a
null-typed cell; empty Line/Polygon coordinates become null cells
(mapper.js:32-46).
"""

from __future__ import annotations

import json

from ..errors import JSONParseError
from ..geometry import null_if_no_coords
from ..soql import GEOJSON_TO_CTYPE, soql_type_for
from .common import GEOM_NAME, DecodeResult, FeatureRow


def feature_to_row(feature, crs=None):
    """transform.js geoJsToSoQL: returns FeatureRow or a drop-reason str."""
    ftype = feature.get("type")
    if not isinstance(ftype, str) or ftype.lower() != "feature":
        return "not_a_feature"
    geometry = feature.get("geometry")
    if not geometry:
        return "missing_geometry"
    fcrs = feature.get("crs")
    if fcrs and crs is None:
        if isinstance(fcrs, dict) and "href" in fcrs:
            return "linked_crs"
        crs = (fcrs.get("properties") or {}).get("name") if isinstance(fcrs, dict) else None

    gtype = geometry.get("type")
    ctype = GEOJSON_TO_CTYPE.get(gtype.lower()) if isinstance(gtype, str) else None
    if ctype is None:
        return "unknown_geometry_type"
    if "coordinates" not in geometry:
        return "geometry_without_coordinates"
    ctype, coords = null_if_no_coords(ctype, geometry.get("coordinates"))

    names, types_, values = [], [], []
    for name, value in (feature.get("properties") or {}).items():
        if name.lower() == GEOM_NAME:
            name = f"invalid_{GEOM_NAME}"
        vtype = soql_type_for(value)
        if vtype == "null" and isinstance(value, dict):
            value = None  # reference has no object type; js would crash — we null
        names.append(name)
        types_.append(vtype)
        values.append(value)
    return FeatureRow(ctype, coords, crs, names, types_, values)


def decode_geojson(blob: bytes) -> DecodeResult:
    try:
        obj = json.loads(blob)
    except (ValueError, UnicodeDecodeError) as e:
        raise JSONParseError(str(e)) from None

    default_crs = None
    crs_obj = obj.get("crs") if isinstance(obj, dict) else None
    if isinstance(crs_obj, dict):
        default_crs = (crs_obj.get("properties") or {}).get("name")

    rows, errors = [], []
    for feature in (obj.get("features") or []) if isinstance(obj, dict) else []:
        if not isinstance(feature, dict):
            errors.append("not_a_feature")
            continue
        row = feature_to_row(feature)
        if isinstance(row, str):
            errors.append(row)
        else:
            rows.append(row)
    return DecodeResult(rows, default_crs, errors)
