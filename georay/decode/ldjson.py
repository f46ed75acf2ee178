"""Line-delimited JSON decoder (reference S5).

Reference: /root/reference/es6-lib/decoders/ldjson.js:5-54 — split the
byte stream on newlines, JSON.parse each line, SILENTLY drop lines that
fail to parse. The reference uses it for its internal scratch format;
here it decodes the public newline-delimited-GeoJSON convention
(.ldjson/.ndjson/.geojsonl: one Feature per line) through the same
feature_to_row path as the FeatureCollection decoder, so all
transform.js drop/rename semantics apply per line.
"""

from __future__ import annotations

import json

from .common import DecodeResult, FeatureRow
from .geojson import feature_to_row


def decode_ldjson(blob: bytes) -> DecodeResult:
    rows, errors = [], []
    for lineno, line in enumerate(blob.split(b"\n")):
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue  # silent drop, ldjson.js:24-31
        if not isinstance(obj, dict):
            continue
        row = feature_to_row(obj)
        if isinstance(row, FeatureRow):
            rows.append(row)
        else:
            errors.append((lineno, row))
    return DecodeResult(rows=rows, default_crs=None, errors=errors)
