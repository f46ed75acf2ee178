"""LDJSON decoder (S5) + abbreviated/full summary surface (§2.5)."""

import json

from georay.decode import decode_blob
from georay.decode.ldjson import decode_ldjson
from georay.fixtures import build_payload
from georay.summary import summarize_blob, summarize_quick


def _feature(i, geom_type="Point", coords=None, props=None):
    return {
        "type": "Feature",
        "geometry": {"type": geom_type, "coordinates": coords or [float(i), float(i)]},
        "properties": props or {"name": f"f{i}", "n": i},
    }


def _ndjson(features):
    return ("\n".join(json.dumps(f) for f in features)).encode()


def test_ldjson_basic():
    blob = _ndjson([_feature(i) for i in range(5)])
    res = decode_ldjson(blob)
    assert len(res.rows) == 5
    assert res.rows[0].geom_ctype == "point"
    assert res.rows[0].prop_names == ["name", "n"]


def test_ldjson_silent_drop_of_garbage_lines():
    lines = [json.dumps(_feature(0)), "{not json", "", "42", json.dumps(_feature(1))]
    res = decode_ldjson("\n".join(lines).encode())
    # bad JSON and non-dict lines silently dropped (ldjson.js:24-31)
    assert len(res.rows) == 2


def test_ldjson_feature_semantics_apply_per_line():
    feats = [
        _feature(0),
        {"type": "NotAFeature"},
        {"type": "Feature"},  # missing geometry -> drop with reason
        _feature(1, props={"THE_GEOM": "x"}),  # cartoDB rename hack
    ]
    res = decode_ldjson(_ndjson(feats))
    assert len(res.rows) == 2
    assert res.rows[1].prop_names == ["invalid_the_geom"]
    assert {r for _, r in res.errors} == {"not_a_feature", "missing_geometry"}


def test_ldjson_dispatch_by_extension():
    blob = _ndjson([_feature(0)])
    res = decode_blob(blob, "data.ndjson")
    assert len(res.rows) == 1


def test_full_summary_matches_decode():
    name, blob = build_payload(0)  # grid.geojson
    s = summarize_blob(blob, name)
    assert len(s["layers"]) >= 1
    layer = s["layers"][0]
    assert layer["count"] == len(decode_blob(blob, name).rows)
    assert layer["columns"]


def test_abbreviated_summary_shapefile_prj_only():
    name, blob = build_payload(3)  # grid.zip (shp+dbf+prj)
    s = summarize_blob(blob, name, blob_length=20 * 1024**3)
    assert len(s["layers"]) == 1
    layer = s["layers"][0]
    assert layer == {
        "count": 0,
        "projection": layer["projection"],  # parsed from the .prj text
        "name": "grid",
        "geometry": None,
        "bbox": {"minx": None, "miny": None, "maxx": None, "maxy": None},
        "columns": [],
    }
    assert isinstance(layer["projection"], str) and layer["projection"]


def test_abbreviated_summary_other_formats_empty():
    for k in (0, 1, 2):  # geojson, kml, kmz
        name, blob = build_payload(k)
        s = summarize_blob(blob, name, blob_length=20 * 1024**3)
        assert s["layers"] == [], name


def test_quick_summary_direct():
    name, blob = build_payload(3)
    assert summarize_quick(blob, name)[0]["name"] == "grid"
    gname, gblob = build_payload(0)
    assert summarize_quick(gblob, gname) == []
