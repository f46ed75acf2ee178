"""Compiled polygon index: the broadcast small side of the spatial join.

Built ONCE from the decoded polygon layers (the reference decoders'
output), then `ray.put` on the driver; every PIP/kNN/tile actor reads it
from the object store in ``__init__`` — never re-shipped per batch.

Contents: packed ring arrays per polygon (for vectorized ray-casting),
polygon bboxes + an STRtree over them, a cell -> polygon-ids cover table
at INDEX_ZOOM (the H3/S2-role join key), and centroids (kNN targets).

Partitioning assumption (documented per the north rule): the polygon
side (admin boundaries / decoded layer sets) fits in one object-store
object (<= a few GB). For polygon sets beyond that, shard this index by
cell_parent at a coarse zoom and use an actor per shard with rows routed
by cell — same cover table, one extra groupby.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

from ..geometry import wkb_decode
from .cells import cells_covering_bbox
from .pip import pack_rings, points_in_polygon
from .strtree import STRtree

INDEX_ZOOM = 13  # ~4.8 km cells at the equator; 16x16 grid over the test bbox


class PolygonIndex:
    def __init__(self, polygons, zoom: int = INDEX_ZOOM):
        """polygons: list of dicts {polygon_id, layer, name, rings}
        where rings is a list of [[x,y],...] rings (WGS84)."""
        self.zoom = zoom
        self.polygons = polygons
        self.packed = []
        bboxes = np.empty((len(polygons), 4))
        cents = np.empty((len(polygons), 2))
        self.cell_cover: dict[int, list[int]] = {}
        for i, poly in enumerate(polygons):
            coords, offsets = pack_rings(poly["rings"])
            self.packed.append((coords, offsets))
            if len(coords):
                bboxes[i] = (
                    coords[:, 0].min(),
                    coords[:, 1].min(),
                    coords[:, 0].max(),
                    coords[:, 1].max(),
                )
                outer_end = int(offsets[1])
                outer = coords[:outer_end]
                cents[i] = outer[:-1].mean(axis=0) if outer_end > 1 else outer.mean(axis=0)
            else:
                bboxes[i] = (0, 0, 0, 0)
                cents[i] = (0, 0)
            for cell in cells_covering_bbox(*bboxes[i], zoom):
                self.cell_cover.setdefault(int(cell), []).append(i)
        self.bboxes = bboxes
        self.centroids = cents
        self.tree = STRtree(bboxes)

    def candidates_for_cell(self, cell: int) -> list[int]:
        return self.cell_cover.get(int(cell), [])

    def contains(self, idx: int, pts: np.ndarray) -> np.ndarray:
        coords, offsets = self.packed[idx]
        return points_in_polygon(pts, coords, offsets)

    def query_bbox(self, minx, miny, maxx, maxy) -> np.ndarray:
        return self.tree.query(minx, miny, maxx, maxy)


def _wkb_to_rings(wkb: bytes):
    ctype, coords = wkb_decode(wkb)
    if ctype == "polygon":
        return [coords]
    if ctype == "multipolygon":
        return coords
    return None


def build_polygon_index(features, zoom: int = INDEX_ZOOM, id_prop: str = "polygon_id"):
    """Compile the polygon side from a (reprojected) features Dataset.

    Streams ONLY polygon feature rows to the driver, deduping by content
    hash along the way (payload polygons repeat across blobs); everything
    else stays distributed. Returns a PolygonIndex.
    """
    import pyarrow.compute as pc

    def polygon_rows(t):
        mask = pc.and_(
            pc.is_valid(t["wkb"]),
            pc.is_in(t["geom_type"], value_set=__import__("pyarrow").array(["polygon", "multipolygon"])),
        )
        return t.filter(mask).select(["wkb", "props_json", "cols_json"])

    seen = set()
    polygons = []
    ds = features.map_batches(polygon_rows, batch_format="pyarrow")
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for wkb, props_json, cols_json in zip(
            batch["wkb"].to_pylist(),
            batch["props_json"].to_pylist(),
            batch["cols_json"].to_pylist(),
        ):
            key = hashlib.sha1(wkb + (props_json or "").encode()).digest()
            if key in seen:
                continue
            seen.add(key)
            polys = _wkb_to_rings(wkb)  # list of polygons, each a ring list
            if polys is None:
                continue
            names, _t = json.loads(cols_json)
            props = dict(zip(names[1:], json.loads(props_json)))
            polygons.append(
                {
                    "polygon_id": props.get(id_prop, len(polygons)),
                    "layer": props.get("layer"),
                    "name": props.get("name"),
                    # even-odd PIP treats the flattened ring set of a
                    # (multi)polygon uniformly
                    "rings": [ring for poly in polys for ring in poly],
                }
            )
    return PolygonIndex(polygons, zoom)
