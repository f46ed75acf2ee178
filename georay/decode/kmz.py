"""KMZ decoder: unzip, run every `.kml` entry (any depth, zip order)
through the KML decoder, concatenate rows.

Reference: /root/reference/es6-lib/decoders/kmz.js:18-134.
"""

from __future__ import annotations

import io
import zipfile

from ..errors import ArchiveError, XMLParseError
from .common import DecodeResult
from .kml import KML_STREAM_GATE, decode_kml, decode_kml_stream


def decode_kmz(blob: bytes) -> DecodeResult:
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
    except zipfile.BadZipFile as e:
        raise ArchiveError(str(e)) from None
    rows, errors = [], []
    for name in zf.namelist():
        if not name.lower().endswith(".kml") or name.endswith("/"):
            continue
        # over-gate members stream straight off the zip entry (never
        # decompressed into one bytes object, never a DOM); the
        # whole-blob path remains for small members and as the fallback
        # for defective-namespace documents (see kml.decode_kml_auto)
        if zf.getinfo(name).file_size > KML_STREAM_GATE:
            try:
                sub = decode_kml_stream(zf.open(name))
            except XMLParseError as e:
                if "unbound prefix" in str(e):
                    sub = decode_kml(zf.read(name))
                else:
                    raise
        else:
            sub = decode_kml(zf.read(name))
        rows.extend(sub.rows)
        errors.extend(sub.errors)
    return DecodeResult(rows, None, errors)
