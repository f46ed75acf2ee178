"""Streaming GeoJSON parser: identical rows/errors to the whole-blob
decoder on every input shape, under a bounded memory footprint
(reference es6-lib/util/parser.js streams features; config.js:7 gates
blobs at 10 GB — the whole-blob DOM path would OOM a worker there)."""

import json

import numpy as np
import pytest

from georay.decode.geojson import decode_geojson
from georay.decode.geojson_stream import (
    GeoJSONStreamParser,
    decode_geojson_auto,
    decode_geojson_file,
    decode_geojson_stream,
)


def _collection(n=500, crs_after=True, seed=3):
    rng = np.random.default_rng(seed)
    feats = []
    for i in range(n):
        props = {
            "name": f'tricky "quoted" \\ {{braces}} [brackets], unicode é{i}',
            "n": int(rng.integers(0, 1000)),
            "tags": ["a,b", "}{", None],
            "the_geom": "hack-me",
        }
        geom = {
            "type": "Point",
            "coordinates": [float(rng.uniform(-180, 180)), float(rng.uniform(-85, 85))],
        }
        feats.append({"type": "Feature", "geometry": geom, "properties": props})
    # drop-path elements interleaved, exactly like the DOM decoder sees
    feats.insert(3, {"type": "Feature"})           # missing_geometry
    feats.insert(7, {"type": "nope"})              # not_a_feature (type)
    doc = {"type": "FeatureCollection"}
    if not crs_after:
        doc["crs"] = {"type": "name", "properties": {"name": "EPSG:3857"}}
    doc["features"] = feats
    if crs_after:
        doc["crs"] = {"type": "name", "properties": {"name": "EPSG:3857"}}
    blob = json.dumps(doc).encode()
    # raw non-dict elements can't come from json.dumps of dicts cleanly:
    # splice them into the array text
    blob = blob.replace(b'"features": [', b'"features": [17, "str", null, ', 1)
    return blob


def _chunks(blob, size):
    for off in range(0, len(blob), size):
        yield blob[off : off + size]


@pytest.mark.parametrize("chunk_size", [7, 64, 4096, 10**9])
@pytest.mark.parametrize("crs_after", [True, False])
def test_stream_equals_whole_blob(chunk_size, crs_after):
    blob = _collection(200, crs_after=crs_after)
    want = decode_geojson(blob)
    got = decode_geojson_stream(_chunks(blob, chunk_size))
    assert got.default_crs == want.default_crs == "EPSG:3857"
    assert got.errors == want.errors
    assert len(got.rows) == len(want.rows)
    for a, b in zip(got.rows, want.rows):
        assert a == b


def test_auto_gate(monkeypatch):
    import georay.decode.geojson_stream as gs

    blob = _collection(100)
    want = decode_geojson(blob)
    monkeypatch.setattr(gs, "GEOJSON_STREAM_GATE", 10)  # force streaming
    got = decode_geojson_auto(blob, chunk_size=97)
    assert got.rows == want.rows and got.errors == want.errors

    from georay.decode.dispatch import decode_blob

    got2 = decode_blob(blob, "payload.geojson")
    assert got2.rows == want.rows


def test_stream_from_file(tmp_path):
    blob = _collection(150)
    p = tmp_path / "fc.geojson"
    p.write_bytes(blob)
    want = decode_geojson(blob)
    got = decode_geojson_file(str(p), chunk_size=1024)
    assert got.rows == want.rows and got.default_crs == want.default_crs


def test_stream_memory_bounded():
    """Peak tracemalloc of the streaming parse stays a small fraction
    of the blob size (the DOM path allocates a multiple of it)."""
    import tracemalloc

    blob = _collection(6000)  # ~1.5 MB of JSON
    n_bytes = len(blob)

    tracemalloc.start()
    rows = 0
    p = GeoJSONStreamParser(_chunks(blob, 64 * 1024))
    for el in p.elements():
        rows += 1
    _, peak_stream = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert rows == 6005  # 6000 features + 2 dict drops + 3 raw elements
    # shell + one feature + chunk — far below the blob size
    assert peak_stream < 0.35 * n_bytes

    tracemalloc.start()
    obj = json.loads(blob)
    _, peak_dom = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(obj["features"]) == 6005
    assert peak_dom > 2 * peak_stream  # DOM inflates; stream does not


# ------------------------------------------------- streaming KML path


def _big_kml(n=4000):
    from georay.fixtures import kml_payload

    # expand the 4-placemark fixture into a large document by repeating
    # placemark bodies with distinct names
    base = kml_payload(1).decode()
    head, rest = base.split("<Placemark>", 1)
    body = "<Placemark>" + rest.rsplit("</Placemark>", 1)[0] + "</Placemark>"
    tail = base.rsplit("</Placemark>", 1)[1]
    return (head + body * (n // 4) + tail).encode()


def test_kml_stream_equals_whole_blob():
    import io

    from georay.decode.kml import decode_kml, decode_kml_stream

    blob = _big_kml(400)
    want = decode_kml(blob)
    got = decode_kml_stream(io.BytesIO(blob))
    assert len(got.rows) == len(want.rows)
    for a, b in zip(got.rows, want.rows):
        assert a == b


def test_kml_auto_gate_and_kmz_stream(monkeypatch):
    import io
    import zipfile

    import georay.decode.kml as km
    from georay.decode.dispatch import decode_blob

    blob = _big_kml(200)
    want = km.decode_kml(blob)
    monkeypatch.setattr(km, "KML_STREAM_GATE", 100)
    got = km.decode_kml_auto(blob)
    assert got.rows == want.rows

    # kmz member over the (patched) gate streams off the zip entry
    import georay.decode.kmz as kz

    monkeypatch.setattr(kz, "KML_STREAM_GATE", 100)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("doc.kml", blob)
    got2 = decode_blob(buf.getvalue(), "x.kmz")
    assert got2.rows == want.rows


def test_kml_stream_memory_bounded():
    import io
    import tracemalloc

    from georay.decode.kml import decode_kml_stream

    from georay.decode.kml import decode_kml

    blob = _big_kml(4000)  # ~1.6 MB xml
    tracemalloc.start()
    res = decode_kml_stream(io.BytesIO(blob))
    _, peak_stream = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(res.rows) == 4000

    tracemalloc.start()
    res2 = decode_kml(blob)
    _, peak_dom = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(res2.rows) == 4000
    # the output rows dominate both; the streaming path must not ALSO
    # hold the ElementTree DOM (which adds a multiple of the xml size)
    assert peak_stream < peak_dom - 0.8 * len(blob)


def test_kml_unbound_prefix_falls_back(monkeypatch):
    import georay.decode.kml as km

    # defective doc: undeclared prefix, over the gate -> auto falls back
    # to the whole-blob declare-and-retry repair
    blob = (
        b'<kml xmlns="http://www.opengis.net/kml/2.2">'
        b"<Document><Placemark xsi:nil=\"false\"><name>p</name>"
        b"<Point><coordinates>1,2,0</coordinates></Point>"
        b"</Placemark></Document></kml>"
    )
    want = km.decode_kml(blob)
    monkeypatch.setattr(km, "KML_STREAM_GATE", 10)
    got = km.decode_kml_auto(blob)
    assert got.rows == want.rows and len(got.rows) == 1


def test_kml_stream_husks_pruned(monkeypatch):
    """The iterparse prune must detach processed placemarks from their
    IMMEDIATE parent: with row output suppressed, peak memory must be
    ~flat in document length (the old root.clear() husk leak grew it
    O(#placemarks) — ADVICE r02)."""
    import io
    import tracemalloc

    import georay.decode.kml as km

    monkeypatch.setattr(km, "_placemark_rows", lambda elem, schema: [])

    def peak(n):
        blob = _big_kml(n)
        tracemalloc.start()
        km.decode_kml_stream(io.BytesIO(blob))
        _, p = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        return p

    p_small, p_big = peak(1000), peak(8000)
    assert p_big < 2 * p_small, (p_small, p_big)
