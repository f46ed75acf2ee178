"""Conformance against the reference's REAL-WORLD smoke corpus
(/root/reference/es6-test/fixtures/smoke, read-only), asserting the
reference's own published expectations:

- es6-test/smoke/decoders.js: exact row counts (xdpw...zip=5,
  xLibrTaxDist.zip=116, xNeighbourhood.zip=236), municipio name set,
  per-row column names for noaa.kml / police_beats_patternc.kmz /
  terrassa.kml, no-NaN coordinates for boundaries.kml
- es6-test/smoke/flow-control.js: wards.{geojson,kml,kmz,zip} = 53 rows
- es6-test/smoke/merger.js: CATCH_BASIN_LEAD_POLY.zip exact column
  schema + WGS84 bbox to 1e-4 (exercises the from-scratch CRS engine on
  a real projected .prj), co-parcels.zip the_geom/invalid_the_geom
  types, private_public.geojson invalid-arity row
"""

import math
import os

import pytest

from georay.decode import decode_blob
from georay.errors import InvalidArityError
from georay.geometry import wkb_encode
from georay.merge import merge_rows, _external_type_name
from georay.reproject import reproject_features

SMOKE = "/root/reference/es6-test/fixtures/smoke"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SMOKE), reason="reference corpus not present"
)


def fx(name: str):
    with open(os.path.join(SMOKE, name), "rb") as f:
        return decode_blob(f.read(), name)


@pytest.mark.parametrize(
    "name,count",
    [
        ("xdpw_supervisorial_districts_2011.zip", 5),  # decoders.js:105-111
        ("xLibrTaxDist.zip", 116),  # decoders.js:120-126
        ("xNeighbourhood.zip", 236),  # decoders.js:135-141
        ("wards.geojson", 53),  # flow-control.js:71
        ("wards.kml", 53),  # flow-control.js:89
        ("wards.kmz", 53),  # flow-control.js:107
        ("wards.zip", 53),  # flow-control.js:150
        ("terrassa.kml", 72),
        ("municipios.zip", 78),
    ],
)
def test_reference_row_counts(name, count):
    assert len(fx(name).rows) == count


MUNICIPIOS = [  # decoders.js:150-229 expectedNames
    "Adjuntas", "Aguada", "Aguadilla", "Aguas Buenas", "Aibonito", "Arecibo",
    "Arroyo", "Añasco", "Barceloneta", "Barranquitas", "Bayamón", "Cabo Rojo",
    "Caguas", "Camuy", "Canóvanas", "Carolina", "Cataño", "Cayey", "Ceiba",
    "Ciales", "Cidra", "Coamo", "Comerío", "Corozal", "Culebra", "Dorado",
    "Fajardo", "Florida", "Guayama", "Guayanilla", "Guaynabo", "Gurabo",
    "Guánica", "Hatillo", "Hormigueros", "Humacao", "Isabela", "Jayuya",
    "Juana Díaz", "Juncos", "Lajas", "Lares", "Las Marías", "Las Piedras",
    "Loíza", "Luquillo", "Manatí", "Maricao", "Maunabo", "Mayagüez", "Moca",
    "Morovis", "Naguabo", "Naranjito", "Orocovis", "Patillas", "Peñuelas",
    "Ponce", "Quebradillas", "Rincón", "Río Grande", "Sabana Grande",
    "Salinas", "San Germán", "San Juan", "San Lorenzo", "San Sebastián",
    "Santa Isabel", "Toa Alta", "Toa Baja", "Trujillo Alto", "Utuado",
    "Vega Alta", "Vega Baja", "Vieques", "Villalba", "Yabucoa", "Yauco",
]


def test_municipios_names():
    res = fx("municipios.zip")
    values = []
    for row in res.rows:
        idx = [n.lower() for n in row.prop_names].index("municipio")
        values.append(row.prop_values[idx])
    assert sorted(values) == sorted(MUNICIPIOS)


@pytest.mark.parametrize(
    "name,cols",
    [
        ("noaa.kml", ["the_geom", "name", "descriptio"]),  # decoders.js:295-302
        (
            "police_beats_patternc.kmz",  # decoders.js:313-331
            ["the_geom", "objectid", "area", "perimeter", "patternc",
             "patternc_i", "districtc", "square_mil", "shape_leng", "shape_area"],
        ),
        ("terrassa.kml", ["the_geom", "name", "description"]),  # decoders.js:339-349
    ],
)
def test_reference_column_names(name, cols):
    from georay.soql import launder_name

    res = fx(name)
    assert res.rows
    for row in res.rows:
        laundered = ["the_geom"] + [launder_name(n) for n in row.prop_names]
        assert sorted(laundered) == sorted(cols)


def test_boundaries_kml_no_nan_coords():
    res = fx("boundaries.kml")  # decoders.js:277-282

    def walk(c):
        if isinstance(c, (int, float)):
            assert not math.isnan(c)
        else:
            for x in c:
                walk(x)

    assert res.rows
    for row in res.rows:
        if row.geom_coords is not None:
            walk(row.geom_coords)


def test_catch_basin_schema_and_bbox():
    """merger.js:65-117: exact columns (laundered fieldName, raw name,
    external type) + WGS84 bbox to 1e-4 — a real projected .prj through
    the from-scratch CRS engine."""
    res = fx("CATCH_BASIN_LEAD_POLY.zip")
    layers = merge_rows(res.rows, res.default_crs)
    assert len(layers) == 1
    layer = layers[0]
    cols = [
        {"fieldName": fn, "name": raw, "dataTypeName": _external_type_name(ct)}
        for fn, raw, ct in zip(layer.laundered_names(), layer.raw_names, layer.ctypes)
    ]
    assert cols == [
        {"fieldName": "the_geom", "name": "the_geom", "dataTypeName": "multiline"},
        {"fieldName": "facility", "name": "FACILITY", "dataTypeName": "text"},
        {"fieldName": "type", "name": "TYPE", "dataTypeName": "text"},
        {"fieldName": "year_const", "name": "YEAR_CONST", "dataTypeName": "number"},
        {"fieldName": "nghbrhd", "name": "NGHBRHD", "dataTypeName": "text"},
        {"fieldName": "nghbrhd_id", "name": "NGHBRHD_ID", "dataTypeName": "text"},
        {"fieldName": "ward", "name": "WARD", "dataTypeName": "text"},
        {"fieldName": "str_ave", "name": "STR_AVE", "dataTypeName": "text"},
    ]

    crs = layer.crs_string(res.default_crs)
    wkbs, ctypes, crss = [], [], []
    for i in layer.row_indices:
        row = res.rows[i]
        if row.geom_ctype == "null" or row.geom_coords is None:
            continue
        wkbs.append(wkb_encode(row.geom_ctype, row.geom_coords))
        ctypes.append(row.geom_ctype)
        crss.append(crs)
    _, (minx, miny, maxx, maxy), _ = reproject_features(wkbs, ctypes, crss)
    import numpy as np

    assert np.nanmin(minx) == pytest.approx(-113.71250, abs=1e-4)
    assert np.nanmin(miny) == pytest.approx(53.39732, abs=1e-4)
    assert np.nanmax(maxx) == pytest.approx(-113.29525, abs=1e-4)
    assert np.nanmax(maxy) == pytest.approx(53.65448, abs=1e-4)


def test_co_parcels_geom_rename():
    """merger.js:126-141: a DBF attribute literally named the_geom is
    renamed invalid_the_geom (text); the geometry stays multipolygon."""
    res = fx("co-parcels.zip")
    layers = merge_rows(res.rows, res.default_crs)
    layer = max(layers, key=lambda l: l.count)
    names = layer.laundered_names()
    types = dict(zip(names, layer.ctypes))
    assert _external_type_name(types["the_geom"]) == "multipolygon"
    assert _external_type_name(types["invalid_the_geom"]) == "text"


def test_private_public_invalid_arity():
    """merger.js:34-55: a Point with empty coordinates is an
    invalid-arity error (the reference fails the job); raised at WKB
    materialization, never a crash."""
    res = fx("private_public.geojson")
    bad = [r for r in res.rows if r.geom_coords == []]
    assert bad, "fixture should contain the empty-coordinates point"
    with pytest.raises(InvalidArityError):
        for r in res.rows:
            if r.geom_ctype != "null":
                wkb_encode(r.geom_ctype, r.geom_coords)


@pytest.mark.parametrize(
    "name,count,geom",
    [
        ("cgis-en-6393.kml", 233, "point"),
        ("wards-chicago.zip", 53, "multipolygon"),  # shp-http.js:78 (53 wards again)
    ],
)
def test_remaining_real_fixtures(name, count, geom):
    res = fx(name)
    assert len(res.rows) == count
    assert not res.errors
    assert {r.geom_ctype for r in res.rows} == {geom}
