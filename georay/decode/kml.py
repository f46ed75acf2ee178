"""KML decoder.

Reference: /root/reference/es6-lib/decoders/kml.js (442 LoC expat state
machine). Semantics reproduced:

  - Placemark -> row(s); Folder structure flattened (kml.js:149-151)
  - <Schema><SimpleField type name> declares column types, applied by
    raw-name match; untyped values are guessed ('' -> null, Number()
    parseable -> number, else trimmed string; booleans are NOT guessed)
    (kml.js:111-118, 392-422)
  - name/description elements become properties
  - MultiGeometry explosion (kml.js:42-109): heterogeneous geometries in
    one Placemark fan out into multiple rows (one per geometry kind,
    properties cloned); geometries inside MultiGeometry become their
    Multi* kind and same-kind geometries merge into one feature; two
    single (non-MultiGeometry) geometries of the same kind in one
    Placemark REPLACE each other (mergeSingleGeom) — last one wins
  - coordinate text: "x,y[,z]" tuples, z dropped; linestring/ring text
    split into segments by newline then whitespace (kml.js:122-140)
  - CRS is always '+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs'
    (kml.js:20) carried per row
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from ..errors import XMLParseError
from ..geometry import null_if_no_coords
from ..soql import _js_number
from .common import GEOM_NAME, DecodeResult, FeatureRow

KML_CRS = "+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs"

_FLOAT_PREFIX = re.compile(r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")
_INT_PREFIX = re.compile(r"^\s*[+-]?\d+")


def _parse_float(s: str) -> float:
    m = _FLOAT_PREFIX.match(s or "")
    return float(m.group(0)) if m else float("nan")


def _parse_int(s: str):
    m = _INT_PREFIX.match(s or "")
    return int(m.group(0)) if m else None


def _decode0(s: str):
    parts = (s or "").split(",")
    x = _parse_float(parts[0]) if parts else float("nan")
    y = _parse_float(parts[1]) if len(parts) > 1 else float("nan")
    return [x, y]


def _decode1(text: str):
    coords = []
    for segment in (text or "").strip().split("\n"):
        for tup in segment.strip().split():
            coords.append(_decode0(tup))
    return coords


def _local(tag) -> str:
    if not isinstance(tag, str):
        return ""  # comments / PIs
    return tag.rsplit("}", 1)[-1].lower()


def _text(elem) -> str:
    return "".join(elem.itertext())


def coerce_prop(schema: list, name: str, value: str):
    """kml.js _propToSoQL: declared SimpleField type wins, else guess.
    Returns (ctype, coerced_value)."""
    decl = next((c for c in schema if c.get("name") == name), None)
    v = (value or "").strip()
    if decl:
        t = (decl.get("type") or "").lower()
        if t == "int":
            n = _parse_int(v)
            return "number", n
        if t in ("float", "number", "double"):
            n = _js_number(v)
            return "number", n
        if t == "bool" or t == "boolean":
            return "boolean", v.lower() == "true"
        return "string", v
    # guess (kml.js:392-396)
    if v == "":
        return "null", None
    n = _js_number(v)
    if n is not None:
        return "number", n
    return "string", v


class _PlacemarkState:
    def __init__(self):
        self.features = [{}]  # each: {GEOM_NAME: {"type","coords"}} + later props

    def set_or_clone(self, kind: str, coords, multi: bool):
        for f in self.features:
            g = f.get(GEOM_NAME)
            if g is None or g["type"] == kind:
                if multi:
                    prev = g["coords"] if g is not None else []
                    prev.append(coords)
                    f[GEOM_NAME] = {"type": kind, "coords": prev}
                else:
                    f[GEOM_NAME] = {"type": kind, "coords": coords}
                return
        clone = {GEOM_NAME: {"type": kind, "coords": [coords] if multi else coords}}
        self.features.append(clone)


def _placemark_rows(pm, schema):
    state = _PlacemarkState()
    props: dict = {}

    def geom_walk(elem, in_multi):
        for child in elem:
            name = _local(child.tag)
            if name == "point":
                state.set_or_clone(
                    "multipoint" if in_multi else "point",
                    _coords_of_point(child),
                    in_multi,
                )
            elif name == "linestring":
                state.set_or_clone(
                    "multilinestring" if in_multi else "linestring",
                    _coords_of_line(child),
                    in_multi,
                )
            elif name == "polygon":
                state.set_or_clone(
                    "multipolygon" if in_multi else "polygon",
                    _rings_of_polygon(child),
                    in_multi,
                )
            elif name == "multigeometry":
                geom_walk(child, True)
            elif name not in ("extendeddata",):
                geom_walk(child, in_multi)

    # properties: direct children name/description; ExtendedData paths
    for child in pm:
        name = _local(child.tag)
        if name in ("name", "description"):
            props[name] = _text(child)
        elif name == "extendeddata":
            for ed_child in child:
                edl = _local(ed_child.tag)
                if edl == "schemadata":
                    for sd in ed_child:
                        if _local(sd.tag) == "simpledata" and "name" in _attrs(sd):
                            props[_attrs(sd)["name"]] = _text(sd)
                elif edl == "data":
                    key = _attrs(ed_child).get("name")
                    if key is not None:
                        val = ""
                        for v in ed_child:
                            if _local(v.tag) == "value":
                                val = _text(v)
                        props[key] = val

    geom_walk(pm, False)

    rows = []
    for f in state.features:
        g = f.get(GEOM_NAME)
        if g is None:
            continue
        ctype, coords = null_if_no_coords(g["type"], g["coords"])
        names, types_, values = [], [], []
        for k, v in props.items():
            ct, cv = coerce_prop(schema, k, v)
            names.append(k)
            types_.append(ct)
            values.append(cv)
        rows.append(FeatureRow(ctype, coords, KML_CRS, names, types_, values))
    return rows


def _attrs(elem) -> dict:
    return {k.rsplit("}", 1)[-1].lower(): v for k, v in elem.attrib.items()}


def _coords_of_point(point):
    for c in point.iter():
        if _local(c.tag) == "coordinates":
            return _decode0(_text(c).strip())
    return []


def _coords_of_line(line):
    for c in line.iter():
        if _local(c.tag) == "coordinates":
            return _decode1(_text(c))
    return []


def _rings_of_polygon(poly):
    rings = []
    for boundary in poly:
        bl = _local(boundary.tag)
        if bl in ("outerboundaryis", "innerboundaryis"):
            for ring_el in boundary:
                for c in ring_el:
                    if _local(c.tag) == "coordinates":
                        rings.append(_decode1(_text(c)))
    return rings


def _parse_xml(blob: bytes):
    """fromstring with undeclared-prefix tolerance: the reference's
    expat runs namespace-unaware, so real-world KML with an undeclared
    prefix (e.g. a bare xsi:schemaLocation, smoke/terrassa.kml) parses
    fine there. ElementTree is namespace-aware; on 'unbound prefix' we
    declare every used-but-undeclared prefix on the root and retry."""
    import re as _re

    try:
        return ET.fromstring(blob)
    except ET.ParseError as e:
        if "unbound prefix" not in str(e):
            raise
        text = blob if isinstance(blob, bytes) else blob.encode()
        declared = set(_re.findall(rb"xmlns:([\w.-]+)\s*=", text))
        used = set(_re.findall(rb"<([\w.-]+):", text)) | set(
            _re.findall(rb"\s([\w.-]+):[\w.-]+\s*=", text)
        )
        missing = sorted(used - declared - {b"xmlns", b"xml"})
        if not missing:
            raise
        decls = b" " + b" ".join(
            b'xmlns:%s="urn:x-undeclared:%s"' % (p, p) for p in missing
        )
        m = _re.search(rb"<([\w.-]+)[\s>]", text)
        if not m:
            raise
        pos = m.start() + 1 + len(m.group(1))
        return ET.fromstring(text[:pos] + decls + text[pos:])


def decode_kml(blob: bytes) -> DecodeResult:
    try:
        root = _parse_xml(blob)
    except ET.ParseError as e:
        raise XMLParseError(str(e)) from None

    rows: list = []
    schema: list = []

    # document-order walk: Schema declarations take effect for subsequent
    # Placemarks (the reference's SAX state machine behaves the same way)
    def walk(elem):
        name = _local(elem.tag)
        if name == "schema":
            for sf in elem.iter():
                if _local(sf.tag) == "simplefield":
                    a = _attrs(sf)
                    schema.append({"name": a.get("name"), "type": a.get("type")})
            return
        if name == "placemark":
            rows.extend(_placemark_rows(elem, schema))
            return
        for child in elem:
            walk(child)

    walk(root)
    return DecodeResult(rows, None, [])


# ------------------------------------------------------ streaming path

KML_STREAM_GATE = int(__import__("os").environ.get("GEORAY_KML_STREAM_GATE", 64 * 1024 * 1024))


def decode_kml_stream(fileobj) -> DecodeResult:
    """Incremental KML decode (reference es6-lib/decoders/kml.js:280-442
    SAX-streams with 2-row backpressure; this is the pull counterpart):
    ElementTree.iterparse fires an end event per completed element;
    Placemark and Schema subtrees are processed there and immediately
    cleared (plus the classic root-husk prune), so memory is bounded by
    one Placemark + parser state regardless of document size. Document
    order is preserved, so Schema declarations take effect for
    subsequent Placemarks exactly like the DOM walk.

    Limitation: the undeclared-namespace-prefix retry (see _parse_xml)
    needs the whole text, so defective over-gate documents fall back to
    the whole-blob decoder at the dispatch layer."""
    rows: list = []
    schema: list = []
    try:
        context = ET.iterparse(fileobj, events=("start", "end"))
        # ancestor stack from the start events: processed subtrees are
        # detached from their IMMEDIATE parent (the standard iterparse
        # prune). The old root.clear() only worked once — the first
        # clear detached Document from root, after which cleared
        # placemark husks accumulated on the detached Document and
        # memory grew O(#placemarks) (ADVICE r02).
        stack: list = []
        for event, elem in context:
            if event == "start":
                stack.append(elem)
                continue
            stack.pop()  # == elem
            name = _local(elem.tag)
            if name == "schema":
                for sf in elem.iter():
                    if _local(sf.tag) == "simplefield":
                        a = _attrs(sf)
                        schema.append({"name": a.get("name"), "type": a.get("type")})
                elem.clear()
                if stack:
                    stack[-1].remove(elem)
            elif name == "placemark":
                rows.extend(_placemark_rows(elem, schema))
                elem.clear()
                if stack:
                    stack[-1].remove(elem)
    except ET.ParseError as e:
        raise XMLParseError(str(e)) from None
    return DecodeResult(rows, None, [])


def decode_kml_auto(blob: bytes) -> DecodeResult:
    """Whole-blob decode below the gate; streaming above it (with the
    whole-blob path as fallback for defective-namespace documents that
    need the declare-and-retry repair)."""
    import io

    if len(blob) <= KML_STREAM_GATE:
        return decode_kml(blob)
    try:
        return decode_kml_stream(io.BytesIO(blob))
    except XMLParseError as e:
        if "unbound prefix" in str(e):
            return decode_kml(blob)
        raise


def decode_kml_file(path: str) -> DecodeResult:
    """Stream a KML document straight from disk."""
    with open(path, "rb") as f:
        return decode_kml_stream(f)
