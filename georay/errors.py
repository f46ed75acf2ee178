"""Typed decode/pipeline errors mirroring the reference's error surface
(/root/reference/es6-lib/errors.js)."""

from __future__ import annotations


class GeorayError(Exception):
    kind = "georay"

    def to_json(self):
        return {"error": self.kind, "reason": str(self)}


class JSONParseError(GeorayError):
    kind = "json_parse"


class XMLParseError(GeorayError):
    kind = "xml_parse"


class ArchiveError(GeorayError):
    kind = "archive"


class CorruptShapefileError(GeorayError):
    kind = "corrupt_shapefile"


class IncompleteShapefileError(GeorayError):
    kind = "incomplete_shapefile"

    def __init__(self, missing):
        self.missing = list(missing)
        super().__init__(f"Incomplete shapefile: missing {', '.join(self.missing)}")


class InvalidArityError(GeorayError):
    kind = "invalid_arity"


class VertexTooComplexError(GeorayError):
    kind = "vertex_too_complex"

    def __init__(self, count, row_index):
        self.count = count
        self.row_index = row_index
        super().__init__(f"Geometry with {count} vertices at row {row_index} exceeds limit")


class UnknownFileTypeError(GeorayError):
    kind = "unknown_file_type"
