"""Blob summary surface (reference POST /summary, services/summary.js).

- Full summary: decode + throwaway merge (schema + counts, no writes) —
  merge.summarize_rows.
- Abbreviated summary (blob_length >= abbreviate_over, reference
  config.js:7 `abbreviateSummarySize` 10 GB prod / 50 kB test): only
  the shapefile decoder can say anything without a full parse — it
  scans just the .prj entries of the zip (shapefile.js:293-320) and
  reports zero-count layers; GeoJSON/KML/KMZ return an empty layer
  list (geojson.js:62-68, kml.js:433-439, kmz.js:125-131).
"""

from __future__ import annotations

import io
import zipfile

from .decode import decode_blob
from .decode.shp import _basename, _ext, _is_hidden
from .merge import summarize_rows
from .proj import crs_name

ABBREVIATE_SUMMARY_SIZE = 10 * 1024**3  # reference config.js:7

_EMPTY_BBOX = {"minx": None, "miny": None, "maxx": None, "maxy": None}


def _is_shapefile_zip(filename: str | None, blob: bytes) -> bool:
    if filename and filename.lower().endswith(".zip"):
        return True
    if blob[:2] == b"PK":
        try:
            zf = zipfile.ZipFile(io.BytesIO(blob))
        except zipfile.BadZipFile:
            return False
        return not any(n.lower().endswith(".kml") for n in zf.namelist())
    return False


def summarize_quick(blob: bytes, filename: str | None = None) -> list:
    """Abbreviated summary. Shapefile zip -> one zero-count layer per
    visible .prj entry; every other format -> []."""
    if not _is_shapefile_zip(filename, blob):
        return []
    zf = zipfile.ZipFile(io.BytesIO(blob))
    out = []
    for name in sorted(zf.namelist()):
        if _ext(name) != ".prj" or _is_hidden(name):
            continue
        prj = zf.read(name).decode("utf-8", "replace")
        out.append(
            {
                "count": 0,
                "projection": crs_name(prj),
                "name": _basename(name)[: -len(".prj")],
                "geometry": None,
                "bbox": dict(_EMPTY_BBOX),
                "columns": [],
            }
        )
    return out


def summarize_blob(
    blob: bytes,
    filename: str | None = None,
    blob_length: int | None = None,
    abbreviate_over: int = ABBREVIATE_SUMMARY_SIZE,
) -> dict:
    """The summary entry point: {"layers": [...]}. blob_length is the
    declared length (reference X-Blob-Length header); at/above the gate
    the full parse is skipped."""
    if blob_length is not None and blob_length >= abbreviate_over:
        return {"layers": summarize_quick(blob, filename)}
    result = decode_blob(blob, filename)
    return {"layers": summarize_rows(result.rows, result.default_crs)}
