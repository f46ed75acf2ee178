"""Layer merging: dynamic schema-split of a decoded feature stream.

Reference semantics (/root/reference/es6-lib/decoders/merger.js:25-99,
layer.js:135-236):

  - a row belongs in a layer iff same column count, same rawName and
    ctype per position ('null' unifies with anything), and same per-row
    CRS string (layer.js:135-154)
  - layers are created on first sight, indexed by arrival order
  - a layer's null columns are refined in place when a later row has a
    concrete type (layer.js:214-236), re-deduping names afterwards
  - rows with no CRS fall to the collection default
    (urn:ogc:def:crs:OGC:1.3:CRS84 unless the blob supplies one)
    applied at the END of the stream (merger.js:22,82-91) — grouping
    keys on the row's own CRS, so explicit-CRS rows and default-CRS
    rows form different layers even when the CRS value matches
  - geometry vertex count above max_vertices aborts (layer.js:254-258)

In the engine this runs SEQUENTIALLY PER BLOB inside the decode
``map_batches`` stage (one import job == one shapeblob, so the exact
arrival-order semantics are preserved with zero shuffle); the resulting
(names, unified types, crs) signature is the GLOBAL schema-class key
used for partitioned writes and grouped aggregates downstream —
distinct signatures are few even at 10^12 pages, so cross-blob layer
statistics become small groupby aggregates instead of per-layer passes.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from .errors import VertexTooComplexError
from .geometry import vertex_count
from .soql import launder_name, rename_columns, unify_ctype

DEFAULT_CRS = "urn:ogc:def:crs:OGC:1.3:CRS84"
WGS84_REPROJECTOR_CRS = "+proj=longlat +ellps=WGS84 +no_defs"
MAX_VERTICES_PER_ROW = 1_000_000  # reference config.js:26


@dataclass
class LayerInfo:
    position: int
    raw_names: list  # rawName per column (geometry first: the_geom)
    ctypes: list  # ctype per column, refined in place
    crs: str | None  # the grouping CRS string (None == blob default)
    spec: dict = field(default_factory=dict)
    count: int = 0
    row_indices: list = field(default_factory=list)  # indices into the input rows

    @property
    def name(self) -> str:
        return self.spec.get("name") or f"layer_{self.position}"

    def laundered_names(self) -> list:
        return rename_columns([launder_name(n) for n in self.raw_names])

    def crs_string(self, default_crs: str | None) -> str:
        # layer.js:171-175 setDefaultCrs: layer CRS, else collection
        # default, else the reprojector's WGS84 string
        return self.crs or default_crs or WGS84_REPROJECTOR_CRS

    def geom_ctype(self) -> str | None:
        for n, t in zip(self.raw_names, self.ctypes):
            if n == "the_geom":
                return t
        return None

    def signature(self, default_crs: str | None) -> str:
        """Global schema-class key: laundered columns + unified types +
        resolved CRS. Stable across blobs."""
        payload = json.dumps(
            [self.laundered_names(), self.ctypes, self.crs_string(default_crs)],
            separators=(",", ":"),
        )
        return hashlib.sha1(payload.encode()).hexdigest()[:16]


def _belongs_in(layer: LayerInfo, row) -> bool:
    cols = ["the_geom"] + list(row.prop_names)
    types_ = [row.geom_ctype] + list(row.prop_types)
    if len(cols) != len(layer.raw_names):
        return False
    for lr, lt, rr, rt in zip(layer.raw_names, layer.ctypes, cols, types_):
        if lr != rr:
            return False
        if lt != rt and lt != "null" and rt != "null":
            return False
    return row.crs == layer.crs


def _refine(layer: LayerInfo, row) -> None:
    # layer.js:214-236 _updateColumnTypes
    types_ = [row.geom_ctype] + list(row.prop_types)
    for i, (lt, rt) in enumerate(zip(layer.ctypes, types_)):
        if lt == "null" and rt != "null":
            layer.ctypes[i] = rt


def merge_rows(
    rows,
    default_crs: str | None = None,
    specs: list | None = None,
    max_vertices: int = MAX_VERTICES_PER_ROW,
) -> list:
    """Sequentially split FeatureRows into LayerInfos (exact reference
    arrival-order semantics). ``default_crs`` is the blob's collection
    CRS (GeoJSON `crs`), applied to layers whose rows had none."""
    specs = specs or []
    layers: list[LayerInfo] = []
    for idx, row in enumerate(rows):
        layer = next((l for l in layers if _belongs_in(l, row)), None)
        if layer is None:
            layer = LayerInfo(
                position=len(layers),
                raw_names=["the_geom"] + list(row.prop_names),
                ctypes=[row.geom_ctype] + list(row.prop_types),
                crs=row.crs,
                spec=specs[len(layers)] if len(layers) < len(specs) else {},
            )
            layers.append(layer)
        _refine(layer, row)
        if row.geom_ctype != "null" and row.geom_coords is not None:
            vc = vertex_count(row.geom_ctype, row.geom_coords)
            if vc > max_vertices:
                raise VertexTooComplexError(vc, layer.count)
        layer.count += 1
        layer.row_indices.append(idx)
    return layers


def summarize_rows(rows, default_crs: str | None = None) -> list:
    """Throwaway-mode summary (reference services/summary.js:10-93 /
    layer.js:103-112): schema + counts, no writes, no bbox (the bbox is
    only known post-reprojection, which summary mode skips)."""
    from .proj import crs_name

    layers = merge_rows(rows, default_crs)
    out = []
    for layer in layers:
        names = layer.laundered_names()
        out.append(
            {
                "count": layer.count,
                "projection": crs_name(layer.crs_string(default_crs)),
                "name": layer.name,
                "geometry": _external_geom_name(layer.geom_ctype()),
                "bbox": {"minx": None, "miny": None, "maxx": None, "maxy": None},
                "columns": [
                    {
                        "fieldName": fn,
                        "name": raw,
                        "dataTypeName": _external_type_name(ct),
                    }
                    for fn, raw, ct in zip(names, layer.raw_names, layer.ctypes)
                ],
            }
        )
    return out


def _external_type_name(ctype: str) -> str:
    # soql/boolean.js:6-12 (checkbox), soql/null.js (null -> text),
    # soql/text.js (string -> text)
    return {
        "boolean": "checkbox",
        "null": "text",
        "string": "text",
        "linestring": "line",
        "multilinestring": "multiline",
    }.get(ctype, ctype)


def _external_geom_name(ctype: str | None) -> str | None:
    if ctype is None:
        return None
    return _external_type_name(ctype)
