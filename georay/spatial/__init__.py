from .cells import cell_encode, cell_parent, cell_to_zxy, cell_xy, k_ring, cells_covering_bbox
from .index import PolygonIndex, build_polygon_index
from .pip import points_in_polygon

__all__ = [
    "cell_encode",
    "cell_parent",
    "cell_to_zxy",
    "cell_xy",
    "k_ring",
    "cells_covering_bbox",
    "PolygonIndex",
    "build_polygon_index",
    "points_in_polygon",
]
