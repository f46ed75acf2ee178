"""KMZ decoder: unzip, run every `.kml` entry (any depth, zip order)
through the KML decoder, concatenate rows.

Reference: /root/reference/es6-lib/decoders/kmz.js:18-134.
"""

from __future__ import annotations

import io
import zipfile

from ..errors import ArchiveError
from .common import DecodeResult
from .kml import decode_kml


def decode_kmz(blob: bytes) -> DecodeResult:
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
    except zipfile.BadZipFile as e:
        raise ArchiveError(str(e)) from None
    rows, errors = [], []
    for name in zf.namelist():
        if not name.lower().endswith(".kml") or name.endswith("/"):
            continue
        sub = decode_kml(zf.read(name))
        rows.extend(sub.rows)
        errors.extend(sub.errors)
    return DecodeResult(rows, None, errors)
