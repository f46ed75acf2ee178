"""Decoder conformance against the reference's own fixture corpus
(/root/reference/es6-test/fixtures, read-only). Goldens ported from
es6-test/unit/{geojson,kml,kmz,shapefile}.js. Skipped wholesale when the
reference tree is absent — georay's own synthetic fixtures
(georay/fixtures.py, exercised by tests/test_pipeline.py and
tests/test_spatial.py) cover the same semantics standalone, and
tests/test_properties.py pins the codec invariants property-based.
"""

import os

import pytest

from georay.decode import decode_blob
from georay.errors import (
    CorruptShapefileError,
    IncompleteShapefileError,
    JSONParseError,
    XMLParseError,
)

FIX = "/root/reference/es6-test/fixtures"

pytestmark = pytest.mark.skipif(not os.path.isdir(FIX), reason="reference fixtures not present")


def load(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def dec(name):
    return decode_blob(load(name), name)


def row_types(row):
    return [row.geom_ctype] + list(row.prop_types)


def test_simple_points_geojson():
    # unit/geojson.js:23-42 + merger.js:57-107
    r = dec("simple_points.json")
    assert len(r.rows) == 2
    assert row_types(r.rows[0]) == ["point", "string", "number", "number", "boolean"]
    assert r.rows[0].geom_coords == [102.0, 0.5]
    assert r.rows[1].geom_coords == [103.0, 1.5]
    assert r.rows[0].prop_values == ["first value", 2, 2.2, False]
    assert r.rows[0].prop_names == ["a_string", "a_num", "a_float", "a_bool"]


def test_multi_crs_geojson():
    r = dec("multi_crs.json")
    assert [row.crs for row in r.rows] == ["urn:ogc:def:crs:EPSG::26915", None]
    assert r.default_crs == "urn:ogc:def:crs:OGC:1.3:CRS84"


def test_multi_non_wgs84_collection_crs():
    r = dec("multi_non_wgs84.json")
    assert r.default_crs == "urn:ogc:def:crs:EPSG::23700"
    assert [row.crs for row in r.rows] == ["urn:ogc:def:crs:EPSG::26915", None]


def test_empty_coords_null_cell():
    # unit/spatial.js:87-112 + mapper.js:32-46
    r = dec("empty_coords.json")
    assert [row.geom_ctype for row in r.rows] == ["linestring", "null"]
    assert r.rows[1].geom_coords is None


def test_dup_columns_raw_names_preserved():
    r = dec("simple_points_dup_columns.json")
    assert r.rows[0].prop_names == ["a_string", "A_STRING", "A_string", "a_String"]


def test_malformed_geojson():
    with pytest.raises(JSONParseError):
        dec("malformed_geojson.json")


def test_typed_kml_schema():
    # unit/kml.js:109-457: <Schema><SimpleField> declared types
    r = dec("simple_points.kml")
    assert len(r.rows) == 2
    assert row_types(r.rows[0]) == ["point", "string", "number", "number", "boolean"]
    assert r.rows[0].prop_values == ["first value", 2, 2.2, False]
    assert r.rows[0].crs == "+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs"


def test_untyped_kml_guessing():
    # unit/kml.js:56-107: booleans are NOT guessed
    r = dec("untyped_simple_points.kml")
    assert row_types(r.rows[0]) == ["point", "string", "number", "number", "string"]
    assert r.rows[0].prop_values == ["first value", 2.0, 2.2, "false"]


def test_kml_type_guessing_dashes_stay_text():
    # unit/kml.js:40-54: "1 - 2" stays text
    r = dec("type_guessing.kml")
    vals = dict(zip(r.rows[0].prop_names, r.rows[0].prop_values))
    assert vals["a_string"] == "1 - 2"
    assert vals["a_num"] == 42.0


def test_kml_with_nulls():
    # unit/kml.js:23-38: empty <value> -> null column
    r = dec("with_nulls.kml")
    assert set(r.rows[0].prop_types) == {"null"}


def test_kml_multigeometry_fanout():
    # unit/kml.js:459-550: MultiGeometry Point+LineString -> 2 rows
    r = dec("points_and_lines_multigeom.kml")
    assert len(r.rows) == 2
    p, l = r.rows
    assert p.geom_ctype == "multipoint"
    assert p.geom_coords == [[102.0, 0.5]]
    assert l.geom_ctype == "multilinestring"
    assert l.geom_coords == [[[101.0, 0.0], [101.0, 1.0]]]
    assert p.prop_values == ["first value"]
    assert l.prop_values == ["first value"]


def test_kml_multigeometry_sans_schema():
    r = dec("points_and_lines_multigeom_sans_schema.kml")
    assert len(r.rows) == 2
    assert r.rows[0].geom_coords == [[102.0, 0.5]]


def test_kml_extra_dimension_dropped():
    from georay.geometry import iter_positions

    r = dec("line_extra_dimension.kml")
    for row in r.rows:
        for pos in iter_positions(row.geom_ctype, row.geom_coords):
            assert len(pos) == 2


def test_malformed_kml():
    with pytest.raises(XMLParseError):
        dec("malformed_kml.kml")


def test_kmz():
    r = dec("simple_points.kmz")
    assert len(r.rows) == 2
    assert row_types(r.rows[0]) == ["point", "string", "number", "number", "boolean"]


def test_multi_layer_kmz_row_count():
    # smoke/decoders.js multi_layer.kmz -> 28 rows
    r = dec("multi_layer.kmz")
    assert len(r.rows) == 28


def test_malformed_kmz():
    with pytest.raises(XMLParseError):
        dec("malformed_kmz.kmz")


def test_simple_points_shapefile():
    # unit/shapefile.js:130-172: dbf N(0 dec) bool column stays number
    r = dec("simple_points.zip")
    assert len(r.rows) == 2
    assert row_types(r.rows[0]) == ["point", "string", "number", "number", "number"]
    assert r.rows[0].prop_values == ["first value", 2, 2.2, 0]
    assert r.rows[1].prop_values == ["second value", 2, 2.2, 1]
    assert r.rows[0].crs.startswith("GEOGCS")


def test_shapefile_line_promotion():
    # shapefile.js:121-132: LineString -> MultiLineString
    r = dec("simple_lines.zip")
    assert r.rows[0].geom_ctype == "multilinestring"
    assert r.rows[0].geom_coords == [[[100.0, 0.0], [101.0, 1.0]]]


def test_shapefile_polygon_promotion():
    r = dec("simple_polygons.zip")
    assert r.rows[0].geom_ctype == "multipolygon"


def test_shapefile_sans_prj_default():
    r = dec("simple_points_sans_prj.zip")
    assert r.rows[0].crs == "+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs"


def test_shapefile_missing_parts():
    with pytest.raises(IncompleteShapefileError) as e:
        dec("missing_dbf.zip")
    assert e.value.missing == ["SIGNIFICANT_ECOLOGICAL_AREA_(SEA).dbf"]
    with pytest.raises(IncompleteShapefileError) as e:
        dec("missing_shp.zip")
    assert e.value.missing == ["SIGNIFICANT_ECOLOGICAL_AREA_(SEA).shp"]


def test_shapefile_hidden_garbage():
    # unit/shapefile.js:112-121
    r = dec("simple_points_hidden_garbage.zip")
    assert len(r.rows) == 2


def test_shapefile_dates_iso():
    # unit/shapefile.js:67-78
    r = dec("dates.zip")
    assert len(r.rows) == 75
    vals = dict(zip(r.rows[0].prop_names, r.rows[0].prop_values))
    types = dict(zip(r.rows[0].prop_names, r.rows[0].prop_types))
    assert types["Date_"] == "date"
    assert vals["Date_"].startswith("2011-08-29T")


def test_corrupt_shapefile():
    with pytest.raises(CorruptShapefileError) as e:
        dec("corrupt_shapefile.zip")
    assert "unsupported shape type" in str(e.value)


def test_epsg_2834_prj_resolves():
    import numpy as np

    from georay.proj import Transformer

    r = dec("simple_points_epsg_2834.zip")
    t = Transformer.get(r.rows[0].crs)
    # reference golden proj4 (unit/shapefile.js:45-54) origin sanity
    out = t.transform(np.array([[600000.0, 0.0]]))
    assert out[0, 0] == pytest.approx(-82.5, abs=1e-7)
    assert out[0, 1] == pytest.approx(39.66666666666666, abs=1e-7)
