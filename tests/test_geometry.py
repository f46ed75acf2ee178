"""Geometry normalization goldens ported from
/root/reference/es6-test/unit/geometry-transforms.js and WKB round-trips."""

import numpy as np
import pytest

from georay.geometry import (
    BBox,
    close_rings,
    fix_semantics,
    flatten_coords,
    is_correct_arity,
    linify,
    null_if_no_coords,
    rebuild_coords,
    vertex_count,
    wkb_decode,
    wkb_encode,
)


def test_linify_point_line():
    # geometry-transforms.js:10-21
    assert linify([[100.0, 0.0]]) == [[100.0, 0.0], [100.0, 0.0]]
    assert fix_semantics("multilinestring", [[[100.0, 0.0]]]) == [[[100.0, 0.0], [100.0, 0.0]]]
    # already valid lines untouched
    assert linify([[1, 2], [3, 4]]) == [[1, 2], [3, 4]]


def test_close_rings_unclosed():
    # geometry-transforms.js:36-81: unclosed ring gets first coord appended
    poly = [
        [[100.0, 0.0], [101.0, 0.0], [101.0, 1.0], [100.0, 1.0]],
        [[100.2, 0.2], [100.8, 0.2], [100.8, 0.8], [100.2, 0.8]],
    ]
    got = close_rings(poly)
    assert got[0] == [[100.0, 0.0], [101.0, 0.0], [101.0, 1.0], [100.0, 1.0], [100.0, 0.0]]
    assert got[1] == [[100.2, 0.2], [100.8, 0.2], [100.8, 0.8], [100.2, 0.8], [100.2, 0.2]]


def test_close_rings_short_ring_padding():
    # geometry-transforms.js:64-78: a 2-coord unclosed ring -> close (3) ->
    # pad to 4 with the first coord
    got = close_rings([[[100.2, 0.2], [100.8, 0.2]]])
    assert got[0] == [[100.2, 0.2], [100.8, 0.2], [100.2, 0.2], [100.2, 0.2]]


def test_close_rings_degenerate_pair():
    # unclosed_multipolygons golden: 2 identical coords -> padded to 4
    got = close_rings([[[100.2, 0.2], [100.2, 0.2]]])
    assert got[0] == [[100.2, 0.2], [100.2, 0.2], [100.2, 0.2], [100.2, 0.2]]


def test_close_rings_five_point_ring_with_gap():
    # unclosed_multipolygons.json second polygon's outer ring: 6 coords
    # unclosed -> first appended
    ring = [[100.0, 0.0], [101.0, 0.0], [101.0, 1.0], [100.0, 1.0], [100.0, 0.0], [0.0, 0.0]]
    got = close_rings([list(map(list, ring))])
    assert got[0] == ring + [[100.0, 0.0]]


def test_multipolygon_fix():
    mp = [
        [[[103.0, 2.0], [102.0, 2.0], [103.0, 3.0], [102.0, 3.0]]],
        [[[100.2, 0.2], [100.2, 0.2]]],
    ]
    got = fix_semantics("multipolygon", mp)
    assert got[0][0][-1] == [103.0, 2.0]
    assert len(got[1][0]) == 4


def test_arity():
    assert is_correct_arity("point", [1.0, 2.0])
    assert not is_correct_arity("point", [1.0])
    assert not is_correct_arity("linestring", [[1.0, 2.0], [1.0]])
    assert is_correct_arity("multipolygon", [[[[1, 2], [3, 4], [5, 6], [1, 2]]]])


def test_vertex_count():
    assert vertex_count("point", [1, 2]) == 1
    assert vertex_count("linestring", [[1, 2], [3, 4]]) == 2
    assert vertex_count("polygon", [[[1, 2], [3, 4], [5, 6], [1, 2]]]) == 4
    assert vertex_count("multipolygon", [[[[1, 2], [3, 4], [5, 6], [1, 2]]]] * 2) == 8


def test_null_if_no_coords():
    # mapper.js:32-46: empty line/polygon coordinate lists -> null cell
    assert null_if_no_coords("linestring", []) == ("null", None)
    assert null_if_no_coords("polygon", []) == ("null", None)
    assert null_if_no_coords("point", [1, 2]) == ("point", [1, 2])
    assert null_if_no_coords("multipoint", []) == ("multipoint", [])


@pytest.mark.parametrize(
    "ctype,coords",
    [
        ("point", [102.5, 0.5]),
        ("linestring", [[1.0, 2.0], [3.0, 4.0]]),
        ("multipoint", [[1.0, 2.0], [3.0, 4.0]]),
        ("polygon", [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]], [[0.2, 0.2], [0.4, 0.2], [0.3, 0.3], [0.2, 0.2]]]),
        ("multilinestring", [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]]),
        ("multipolygon", [[[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]], [[[2.0, 2.0], [3.0, 2.0], [3.0, 3.0], [2.0, 2.0]]]]),
    ],
)
def test_wkb_roundtrip(ctype, coords):
    wkb = wkb_encode(ctype, coords)
    ct2, c2 = wkb_decode(wkb)
    assert ct2 == ctype
    assert c2 == coords


@pytest.mark.parametrize(
    "ctype,coords",
    [
        ("point", [102.5, 0.5]),
        ("linestring", [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]),
        ("polygon", [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]], [[0.2, 0.2], [0.4, 0.2], [0.3, 0.3], [0.2, 0.2]]]),
        ("multipolygon", [[[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]], [[[2.0, 2.0], [3.0, 2.0], [3.0, 3.0], [2.0, 2.0]]]]),
    ],
)
def test_flatten_rebuild(ctype, coords):
    arr, spec = flatten_coords(ctype, coords)
    assert arr.dtype == np.float64
    assert rebuild_coords(ctype, arr, spec) == coords


def test_bbox_reference_quirks():
    b = BBox()
    b.expand([10, 20]).expand([-5, -8])
    assert b.to_json() == {"minx": -5, "miny": -8, "maxx": 10, "maxy": 20}
    # x > 180 is ACCEPTED (reference bbox.js never checks validMaxX)
    b2 = BBox().expand([200.0, 0.0])
    assert b2.maxx == 200.0
    # y out of range rejected; x < -180 rejected
    b3 = BBox().expand([0.0, 91.0]).expand([-181.0, 0.0])
    assert b3.minx is None
    # merge
    m = BBox().expand([1, 1]).merge(BBox().expand([5, 5]))
    assert (m.minx, m.maxy) == (1, 5)


# ---------------------------------------------- empty multis (ADVICE r01)


@pytest.mark.parametrize("ctype", ["multipolygon", "multilinestring", "multipoint"])
def test_empty_multi_flatten_and_wkb(ctype):
    # {type: MultiPolygon, coordinates: []} is valid GeoJSON; the
    # reference flows empty multis through reprojection harmlessly
    arr, spec = flatten_coords(ctype, [])
    assert arr.shape == (0, 2)
    assert rebuild_coords(ctype, arr, spec) == []
    wkb = wkb_encode(ctype, [])
    assert wkb_decode(wkb) == (ctype, [])


def test_empty_multi_reproject_batch_and_bbox_isolation():
    """A batch mixing empty multis with real geometries must not crash,
    and the empty rows must not steal a neighbor's bbox (the reduceat
    empty-segment trap)."""
    from georay.reproject import reproject_features

    wkbs = [
        wkb_encode("multipolygon", []),
        wkb_encode("point", [10.0, 20.0]),
        wkb_encode("multilinestring", []),
        wkb_encode("point", [30.0, 40.0]),
        wkb_encode("multipolygon", []),  # trailing empty segment
    ]
    ctypes = ["multipolygon", "point", "multilinestring", "point", "multipolygon"]
    crss = ["EPSG:4326"] * 5
    out, (minx, miny, maxx, maxy), ok = reproject_features(wkbs, ctypes, crss)
    assert ok.all()
    assert wkb_decode(out[0]) == ("multipolygon", [])
    assert wkb_decode(out[2]) == ("multilinestring", [])
    assert wkb_decode(out[4]) == ("multipolygon", [])
    # empty rows: NaN bbox, NOT the neighbor's coordinates
    assert np.isnan(minx[0]) and np.isnan(maxy[0])
    assert np.isnan(minx[2]) and np.isnan(maxy[2])
    assert np.isnan(minx[4]) and np.isnan(maxy[4])
    assert [minx[1], miny[1], maxx[1], maxy[1]] == pytest.approx([10.0, 20.0, 10.0, 20.0])
    assert [minx[3], miny[3], maxx[3], maxy[3]] == pytest.approx([30.0, 40.0, 30.0, 40.0])


def test_wkb_big_endian_reject_or_decode():
    """wkb_decode honors the byte-order flag for coordinates, not just
    counts (ADVICE r01: big-endian WKB decoded counts right but
    coordinates as garbage)."""
    import struct

    be = bytearray(b"\x00")
    be += struct.pack(">I", 1)  # point
    be += struct.pack(">dd", 12.5, -3.25)
    ctype, coords = wkb_decode(bytes(be))
    assert ctype == "point"
    assert coords == [12.5, -3.25]
