"""Incremental GeoJSON FeatureCollection parser.

The reference streams a FeatureCollection through a SAX JSON path
parser with backpressure (es6-lib/util/parser.js:7-193) so a multi-GB
blob never lives in memory as a DOM; jobs are gated at 10 GB
(es6-lib/config/config.js:7). This is the pull-parser counterpart for
the Ray engine: `GeoJSONStreamParser` walks byte chunks with a
string/escape-aware depth machine, yields each element of the top-level
"features" array as its own (small) parsed object, and keeps only the
"shell" — the document with `features` replaced by `[]` — for the
top-level `crs`. Peak memory is one chunk + one feature + the shell,
regardless of blob size.

`decode_blob` switches to this path automatically for GeoJSON blobs
over GEOJSON_STREAM_GATE; `decode_geojson_file` streams straight from
disk without ever holding the whole file.
"""

from __future__ import annotations

import json
import os
import re

from ..errors import JSONParseError
from .common import DecodeResult
from .geojson import feature_to_row

# blobs above this use the streaming parser (whole-blob json.loads
# inflates a blob ~5-10x as a Python DOM)
GEOJSON_STREAM_GATE = int(
    os.environ.get("GEORAY_GEOJSON_STREAM_GATE", 64 * 1024 * 1024)
)

# structural bytes the scanner jumps between; everything else is copied
# in bulk
_STRUCT = re.compile(rb'[":{}\[\],]')


class GeoJSONStreamParser:
    """Pull-parse the top-level "features" array out of byte chunks.

    Usage:
        p = GeoJSONStreamParser(chunks)
        for element in p.elements(): ...   # parsed JSON values
        p.shell                            # dict: doc with features=[]
    """

    def __init__(self, chunks):
        self._chunks = iter(chunks)
        self.shell: dict | None = None

    def elements(self):
        shell_buf = bytearray()
        fbuf = bytearray()
        depth = 0
        in_string = False
        mode = 0  # 0 = shell, 1 = inside the features array
        pending_key = None  # contents of the last depth-1 string
        key_buf = bytearray()  # accumulates the current depth-1 string
        await_array = False
        elem_open = False  # a feature element has begun

        _EMPTY = object()  # distinct from a JSON null element

        def finalize_element():
            nonlocal elem_open
            text = bytes(fbuf).strip()
            fbuf.clear()
            elem_open = False
            if not text:
                return _EMPTY
            try:
                return json.loads(text)
            except ValueError as e:
                raise JSONParseError(str(e)) from None

        for chunk in self._chunks:
            buf = bytes(chunk)
            pos = 0
            n = len(buf)
            while pos < n:
                m = _STRUCT.search(buf, pos)
                seg_end = m.start() if m else n
                # bulk-copy the non-structural span
                if seg_end > pos:
                    span = buf[pos:seg_end]
                    if mode == 1:
                        if elem_open:
                            fbuf += span
                        elif span.strip():
                            fbuf += span  # scalar element begins
                            elem_open = True
                    else:
                        shell_buf += span
                        if in_string and depth == 1:
                            key_buf += span
                if m is None:
                    pos = n
                    break
                c = buf[m.start() : m.start() + 1]
                pos = m.start() + 1

                if in_string:
                    # only an unescaped quote is structural inside a string
                    if c == b'"':
                        # count preceding backslashes (may cross the span
                        # we just copied — check the tail of the right buf)
                        tail = fbuf if mode == 1 else shell_buf
                        bs = 0
                        ti = len(tail) - 1
                        while ti >= 0 and tail[ti : ti + 1] == b"\\":
                            bs += 1
                            ti -= 1
                        if mode == 1:
                            fbuf += c
                        else:
                            shell_buf += c
                        if bs % 2 == 0:
                            in_string = False
                            if mode == 0 and depth == 1:
                                pending_key = bytes(key_buf)
                                key_buf.clear()
                    else:
                        (fbuf if mode == 1 else shell_buf).__iadd__(c)
                        if mode == 0 and in_string and depth == 1:
                            key_buf += c
                    continue

                if c == b'"':
                    in_string = True
                    if mode == 1:
                        fbuf += c
                        elem_open = True
                    else:
                        shell_buf += c
                        await_array = False  # "features" value wasn't an array
                        if depth == 1:
                            key_buf.clear()
                    continue
                if c == b":":
                    if mode == 1:
                        fbuf += c
                    else:
                        shell_buf += c
                        if depth == 1 and pending_key == b"features":
                            await_array = True
                            pending_key = None
                    continue
                if c == b",":
                    if mode == 1:
                        if depth == 2:
                            el = finalize_element()
                            if el is not _EMPTY:
                                yield el
                        else:
                            fbuf += c
                    else:
                        shell_buf += c
                        await_array = False
                    continue
                if c in (b"{", b"["):
                    depth += 1
                    if mode == 0:
                        if c == b"[" and await_array and depth == 2:
                            mode = 1
                            shell_buf += b"["
                            await_array = False
                        else:
                            shell_buf += c
                            await_array = False
                    else:
                        fbuf += c
                        elem_open = True
                    continue
                # '}' or ']'
                depth -= 1
                if mode == 1:
                    if c == b"]" and depth == 1:
                        el = finalize_element()
                        if el is not _EMPTY:
                            yield el
                        mode = 0
                        shell_buf += b"]"
                    else:
                        fbuf += c
                else:
                    shell_buf += c

        try:
            shell = json.loads(bytes(shell_buf)) if shell_buf.strip() else {}
        except ValueError as e:
            raise JSONParseError(str(e)) from None
        self.shell = shell if isinstance(shell, dict) else {}


def decode_geojson_stream(chunks) -> DecodeResult:
    """Streaming equivalent of decode_geojson: identical rows/errors,
    bounded memory. The top-level crs is applied from the shell AFTER
    the feature pass (legal JSON may place it after the array; the
    merger consumes default_crs at the end either way)."""
    parser = GeoJSONStreamParser(chunks)
    rows, errors = [], []
    for el in parser.elements():
        if not isinstance(el, dict):
            errors.append("not_a_feature")
            continue
        row = feature_to_row(el)
        if isinstance(row, str):
            errors.append(row)
        else:
            rows.append(row)
    default_crs = None
    crs_obj = parser.shell.get("crs") if parser.shell else None
    if isinstance(crs_obj, dict):
        default_crs = (crs_obj.get("properties") or {}).get("name")
    return DecodeResult(rows, default_crs, errors)


def _blob_chunks(blob: bytes, chunk_size: int):
    view = memoryview(blob)
    for off in range(0, len(blob), chunk_size):
        yield view[off : off + chunk_size]


def decode_geojson_auto(blob: bytes, chunk_size: int = 8 * 1024 * 1024) -> DecodeResult:
    """Whole-blob decode below the gate, streaming above it."""
    from .geojson import decode_geojson

    if len(blob) <= GEOJSON_STREAM_GATE:
        return decode_geojson(blob)
    return decode_geojson_stream(_blob_chunks(blob, chunk_size))


def decode_geojson_file(path: str, chunk_size: int = 8 * 1024 * 1024) -> DecodeResult:
    """Stream a FeatureCollection straight from disk (never holds the
    whole file — the reference's production 10 GB-file case)."""

    def chunks():
        with open(path, "rb") as f:
            while True:
                b = f.read(chunk_size)
                if not b:
                    return
                yield b

    return decode_geojson_stream(chunks())
