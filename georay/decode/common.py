"""Shared decode row model.

A decoder is a pure ``bytes -> DecodeResult`` callable (the reference's
Transform-stream contract collapsed to a function over one blob —
blobs are KB..MB scale web payloads, so a per-blob in-memory decode
inside ``map_batches`` is the Ray-native unit of work; file-scale inputs
go through `ray.data.read_binary_files` and the same functions).
"""

from __future__ import annotations

from dataclasses import dataclass, field

GEOM_NAME = "the_geom"


@dataclass
class FeatureRow:
    """One decoded feature: geometry cell + ordered property cells.

    Mirrors the reference SoQL row {columns: [geom, props...], crs}
    (es6-lib/decoders/transform.js:74-87): geometry always first and
    named ``the_geom``; ``crs`` is the per-row CRS (None when the format
    leaves it to the collection default).
    """

    geom_ctype: str  # point|linestring|...|multipolygon|null
    geom_coords: object  # nested lists, or None when geom_ctype == 'null'
    crs: str | None
    prop_names: list = field(default_factory=list)  # raw names, in order
    prop_types: list = field(default_factory=list)  # ctypes, same order
    prop_values: list = field(default_factory=list)


@dataclass
class DecodeResult:
    rows: list  # list[FeatureRow]
    default_crs: str | None = None  # collection-level CRS (GeoJSON `crs`)
    errors: list = field(default_factory=list)  # non-fatal row-level drops
