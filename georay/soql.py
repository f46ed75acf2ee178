"""SoQL-compatible type system: name laundering, collision dedup, type
lattice and KML-style type guessing.

Semantics ported (behaviorally, not textually) from the reference:
  - launder_name:  /root/reference/es6-lib/soql/soql.js:5-18
  - rename_columns (collision dedup): /root/reference/es6-lib/decoders/layer.js:58-74
  - ctype names: /root/reference/es6-lib/soql/mapper.js:16-48
  - null unification: /root/reference/es6-lib/decoders/layer.js:135-154
  - KML coercers: /root/reference/es6-lib/decoders/kml.js:111-118
  - KML type guessing: /root/reference/es6-lib/decoders/kml.js:392-396

The engine's canonical per-cell type tags ("ctype") are the reference's:
  point linestring polygon multipoint multilinestring multipolygon
  string number boolean date array null
"""

from __future__ import annotations

import re

GEOM_CTYPES = (
    "point",
    "linestring",
    "polygon",
    "multipoint",
    "multilinestring",
    "multipolygon",
)

# ctype -> GeoJSON "type" string (reference soql/<geom>.js `_type` getters)
CTYPE_TO_GEOJSON = {
    "point": "Point",
    "linestring": "LineString",
    "polygon": "Polygon",
    "multipoint": "MultiPoint",
    "multilinestring": "MultiLineString",
    "multipolygon": "MultiPolygon",
}
GEOJSON_TO_CTYPE = {v.lower(): k for k, v in CTYPE_TO_GEOJSON.items()}

_CAMEL_1 = re.compile(r"([a-z0-9])([A-Z])")
_CAMEL_2 = re.compile(r"([A-Z]+)([A-Z][a-z])")
_NON_ALNUM = re.compile(r"[^a-zA-Z0-9]+")


def _snake_case(name: str) -> str:
    """change-case@2 snakeCase: split camel humps and acronym boundaries,
    collapse non-alphanumerics to '_', lowercase, trim separators."""
    s = _CAMEL_1.sub(r"\1 \2", name)
    s = _CAMEL_2.sub(r"\1 \2", s)
    s = _NON_ALNUM.sub(" ", s)
    return "_".join(s.lower().split())


def launder_name(name: str) -> str:
    """reference soql.js:5-18: trim; snake_case if the name is not already
    all-lowercase or contains a space; prefix '_' if it starts with a digit
    (JS parseInt semantics: optional sign + digit)."""
    name = name.strip()
    # JS `parseInt(name[0])` is NaN for anything but an ASCII digit
    starts_num = bool(re.match(r"^[0-9]", name))
    if name != name.lower() or " " in name:
        name = _snake_case(name)
    if starts_num:
        name = "_" + name
    return name


_DEDUP_SUFFIX = re.compile(r"_\d+$")


def rename_columns(names: list[str]) -> list[str]:
    """Post-launder collision dedup (reference layer.js:58-74):
    foo_bar, FOO_BAR, FOO_bar -> foo_bar, foo_bar_1, foo_bar_2.

    Mirrors the reference's loop exactly: on collision, strip a trailing
    `_\\d+` suffix, bump a per-column counter, retry with `{base}_{i}`.
    """
    prohibited: set[str] = set()
    out: list[str] = []
    for name in names:
        index = 0
        while name in prohibited:
            orig = _DEDUP_SUFFIX.split(name)[0]
            if orig:
                name = orig
                index += 1
            name = f"{name}_{index}"
        prohibited.add(name)
        out.append(name)
    return out


def unify_ctype(a: str, b: str) -> str | None:
    """Type lattice for layer membership: 'null' unifies with anything
    (reference layer.js:148); otherwise types must match exactly.
    Returns the unified ctype, or None when incompatible."""
    if a == b:
        return a
    if a == "null":
        return b
    if b == "null":
        return a
    return None


def soql_type_for(value) -> str:
    """Infer ctype from a decoded JSON property value
    (reference transform.js:32-37 via JS typeof)."""
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, (int, float)):
        return "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, (list, tuple)):
        return "array"
    if isinstance(value, dict):
        return "null"  # JS `types['object']` is undefined -> dropped; we null it
    return "string"


def guess_kml_value(value: str):
    """Untyped-KML value guessing (reference kml.js:392-396):
    ``Number(value)`` parseable -> number; '' -> null; else string.
    JS Number() accepts leading/trailing whitespace, '', hex, exponents;
    '' -> 0 but the reference checks for '' FIRST via falsiness of ''.

    Returns (ctype, coerced_value).
    """
    if value == "":
        return "null", None
    n = _js_number(value)
    if n is not None:
        return "number", n
    return "string", value


def _js_number(s: str):
    """Approximation of JS Number(string): trims whitespace; '' -> 0;
    accepts decimal/exponent/hex/Infinity. Returns None when NaN."""
    t = s.strip()
    if t == "":
        return 0.0
    try:
        if re.fullmatch(r"[+-]?0[xX][0-9a-fA-F]+", t):
            return float(int(t, 16))
        if re.fullmatch(r"[+-]?(Infinity)", t):
            return float("inf") if not t.startswith("-") else float("-inf")
        if re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", t):
            return float(t)
    except ValueError:
        return None
    return None


# KML <SimpleField type=...> declared-type coercers (reference kml.js:111-118)
def coerce_kml_typed(decl_type: str, value: str):
    """Coerce a KML SchemaData value per its declared SimpleField type.
    Returns (ctype, value)."""
    t = decl_type.lower()
    if t in ("int", "uint", "short", "ushort", "float", "double"):
        n = _js_number(value)
        return "number", n if n is not None else None
    if t == "bool":
        return "boolean", value.strip().lower() == "true"
    return "string", value


def clean_dbf_text(value: str) -> str:
    """DBF NUL-sentinel cleanup (reference soql/text.js:8-16): the
    shapefile parser yields '\\u0000' for null text values; convert to
    the empty string."""
    return "" if value == "\u0000" else value
