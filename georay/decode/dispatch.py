"""Decoder dispatch by filename extension, with magic-byte fallback.

Reference: /root/reference/es6-lib/decoders/index.js:9-24 (extension
registry: .json/.geojson -> GeoJSON, .kml -> KML, .kmz -> KMZ,
.zip -> Shapefile). The registry is the reference's only user-extension
point; register new decoders with `register_decoder`.
"""

from __future__ import annotations

import io
import zipfile

from ..errors import UnknownFileTypeError
from .common import DecodeResult
from .geojson_stream import decode_geojson_auto
from .kml import decode_kml_auto
from .kmz import decode_kmz
from .ldjson import decode_ldjson
from .shp import decode_shapefile_zip

_BY_EXTENSION = {
    ".json": decode_geojson_auto,
    ".geojson": decode_geojson_auto,
    ".kml": decode_kml_auto,
    ".kmz": decode_kmz,
    ".zip": decode_shapefile_zip,
    ".ldjson": decode_ldjson,
    ".ndjson": decode_ldjson,
    ".geojsonl": decode_ldjson,
}


def register_decoder(extension: str, fn):
    _BY_EXTENSION[extension.lower()] = fn


def decoder_for(filename: str | None, blob: bytes | None = None):
    if filename and "." in filename:
        ext = filename[filename.rfind(".") :].lower()
        fn = _BY_EXTENSION.get(ext)
        if fn:
            return fn
    if blob is not None:
        return _sniff(blob)
    raise UnknownFileTypeError(filename or "<no name>")


def _sniff(blob: bytes):
    head = blob[:256].lstrip()
    if head.startswith(b"PK"):
        try:
            zf = zipfile.ZipFile(io.BytesIO(blob))
            if any(n.lower().endswith(".kml") for n in zf.namelist()):
                return decode_kmz
        except zipfile.BadZipFile:
            pass
        return decode_shapefile_zip
    if head.startswith(b"{"):
        return decode_geojson_auto
    if head.startswith(b"<"):
        return decode_kml_auto
    raise UnknownFileTypeError("unrecognized payload")


def decode_blob(blob: bytes, filename: str | None = None) -> DecodeResult:
    """Decode one geo payload blob into FeatureRows."""
    return decoder_for(filename, blob)(blob)
