"""Reprojection goldens ported from /root/reference/es6-test/unit/merger.js
(FLOAT_DELTA = 1e-9) plus WKT/.prj and EPSG resolution checks."""

import numpy as np
import pytest

from georay.proj import (
    WGS84_PROJ4,
    Transformer,
    UnknownCrsError,
    crs_to_proj4,
    parse_proj4,
    wkt_to_proj4,
)

DELTA = 1e-9  # reference FLOAT_DELTA (merger.js:53)


def test_utm_nad83_golden():
    # merger.js:171-175: EPSG:26915 point (102, 0.5)
    t = Transformer.get("urn:ogc:def:crs:EPSG::26915")
    out = t.transform(np.array([[102.0, 0.5]]))
    assert out[0, 0] == pytest.approx(-97.48783007891072, abs=DELTA)
    assert out[0, 1] == pytest.approx(0.00000450969282, abs=DELTA)


def test_eov_somerc_golden():
    # merger.js:139-142: EPSG:23700 point (103, 1.5)
    t = Transformer.get("urn:ogc:def:crs:EPSG::23700")
    out = t.transform(np.array([[103.0, 1.5]]))
    assert out[0, 0] == pytest.approx(10.7889673904, abs=DELTA)
    assert out[0, 1] == pytest.approx(45.0359670320, abs=DELTA)


def test_crs84_is_identity_valued():
    # merger.js:176-180: CRS84 point passes through numerically
    t = Transformer.get("urn:ogc:def:crs:OGC:1.3:CRS84")
    out = t.transform(np.array([[103.0, 1.5]]))
    assert out[0, 0] == pytest.approx(103.0, abs=DELTA)
    assert out[0, 1] == pytest.approx(1.5, abs=DELTA)


def test_wgs84_string_identity_skip():
    # soql/geom.js:10-16: same input string -> no reprojection at all
    t = Transformer.get(WGS84_PROJ4)
    assert t.identity
    xy = np.array([[1.0, 2.0]])
    assert t.transform(xy) is xy


def test_epsg_shorthand_and_utm_ranges():
    assert "longlat" in crs_to_proj4("EPSG:4326")
    assert "+zone=10" in crs_to_proj4("EPSG:26910")
    assert "+zone=33" in crs_to_proj4("EPSG:32633")
    with pytest.raises(UnknownCrsError):
        crs_to_proj4("EPSG:999999")


def test_utm_roundtrip():
    t = Transformer("+proj=utm +zone=15 +datum=NAD83 +units=m +no_defs")
    lonlat = t.transform(np.array([[500000.0, 4649776.22]]))
    assert lonlat[0, 0] == pytest.approx(-93.0, abs=1e-7)
    assert lonlat[0, 1] == pytest.approx(42.0, abs=1e-5)
    fx, fy = t.proj.forward(lonlat[:, 0] * np.pi / 180, lonlat[:, 1] * np.pi / 180)
    assert fx[0] == pytest.approx(500000.0, abs=1e-4)
    assert fy[0] == pytest.approx(4649776.22, abs=1e-3)


def test_prj_wkt_geogcs():
    # shapefile .prj default-WGS84 path (unit/shapefile.js:45-65)
    wkt = (
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
    )
    p = parse_proj4(wkt_to_proj4(wkt))
    assert p["proj"] == "longlat"
    assert p["a"] == 6378137.0
    t = Transformer(wkt)
    out = t.transform(np.array([[-122.4, 47.6]]))
    assert out[0, 0] == pytest.approx(-122.4, abs=DELTA)
    assert out[0, 1] == pytest.approx(47.6, abs=DELTA)


def test_prj_wkt_state_plane_feet():
    # typical ESRI state-plane .prj (lcc + US survey feet)
    wkt = (
        'PROJCS["NAD_1983_StatePlane_Washington_North_FIPS_4601_Feet",'
        'GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",'
        'SPHEROID["GRS_1980",6378137.0,298.257222101]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic"],'
        'PARAMETER["False_Easting",1640416.666666667],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",-120.8333333333333],'
        'PARAMETER["Standard_Parallel_1",47.5],'
        'PARAMETER["Standard_Parallel_2",48.73333333333333],'
        'PARAMETER["Latitude_Of_Origin",47.0],'
        'UNIT["Foot_US",0.3048006096012192]]'
    )
    t = Transformer(wkt)
    # the projection origin in feet maps back to (lon0, lat0)
    out = t.transform(np.array([[1640416.666666667, 0.0]]))
    assert out[0, 0] == pytest.approx(-120.8333333333333, abs=1e-7)
    assert out[0, 1] == pytest.approx(47.0, abs=1e-7)


def test_wkt_tmerc():
    wkt = (
        'PROJCS["utmish",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["False_Easting",500000.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",-93.0],'
        'PARAMETER["Scale_Factor",0.9996],'
        'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]'
    )
    t = Transformer(wkt)
    out = t.transform(np.array([[500000.0, 0.0]]))
    assert out[0, 0] == pytest.approx(-93.0, abs=1e-9)
    assert out[0, 1] == pytest.approx(0.0, abs=1e-9)


def test_transformer_cache():
    a = Transformer.get("EPSG:4326")
    b = Transformer.get("EPSG:4326")
    assert a is b
