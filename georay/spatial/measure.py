"""Planar polygon measurement: shoelace area + ring perimeter per
decoded polygon feature, deduplicated to one row per polygon id.

Semantics: even-odd over the flattened ring set — a ring at odd
containment depth subtracts |shoelace(ring)| (winding-independent, so
GeoJSON CCW interior rings and shapefile CW sibling-part holes land on
the same number); perimeter = total boundary length including hole
rings. Units are squared / plain CRS
degrees (the engine reprojects everything to EPSG:4326 first;
reference parity: geo-import exposes no measurement op — this extends
the engine's raster<->vector toolset per the task brief).

Oracle strategy: outputs are quantized to integer 1e-10 units
(floor(x*1e10 + 0.5)). The decoder+reprojection pipeline perturbs
coordinates by at most a few ulps of ~122-degree magnitudes (~3e-14,
see geo_features' 1e-9 bbox rounding), which propagates to < 1e-2
quantized units — far inside the 0.5-unit decision margin — so every
decode path (GeoJSON/KML/KMZ/SHP) of the same grid cell quantizes
identically and the closed-form SQL oracle reproduces the integers
exactly. The dedup groups by the FULL (id, area_q, perim_q) triple:
a decode path that disagreed would surface as an extra row, never be
masked by a min/first.

Scale shape: stateless map_batches over the features checkpoint
(column-pruned to wkb+props_json), one row out per polygon feature,
then one small groupby keyed by polygon id — the group count is the
polygon universe (index-side cardinality), not the page corpus.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count

from georay.geometry import wkb_decode

QUANT = 1e10


def _ring_area_perim(ring) -> tuple:
    v = np.asarray(ring, dtype=np.float64)
    if len(v) < 3:
        return 0.0, 0.0
    x, y = v[:, 0], v[:, 1]
    area = 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    d = np.diff(v, axis=0)
    perim = float(np.sum(np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)))
    return float(area), perim


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Even-odd crossing test (same model as the PIP join)."""
    x, y = ring[:, 0], ring[:, 1]
    x0, y0 = x[:-1], y[:-1]
    x1, y1 = x[1:], y[1:]
    crosses = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x0 + (py - y0) / (y1 - y0) * (x1 - x0)
    return bool(np.count_nonzero(crosses & (px < xs)) % 2)


def _even_odd_area_perim(rings) -> tuple:
    """Feature area under even-odd semantics: a ring at odd containment
    depth subtracts. The decoders emit holes either as interior rings or
    (shapefile multi-part) as sibling parts, so nesting depth — not ring
    position — decides the sign, mirroring the PIP join's flattened
    even-odd ring model (georay/spatial/index.py)."""
    vs = [np.asarray(r, dtype=np.float64) for r in rings if len(r) >= 3]
    area = perim = 0.0
    for i, v in enumerate(vs):
        a, p = _ring_area_perim(v)
        px, py = float(v[0, 0]), float(v[0, 1])
        depth = sum(
            _point_in_ring(px, py, u) for j, u in enumerate(vs) if j != i
        )
        area += a if depth % 2 == 0 else -a
        perim += p
    return area, perim


def polygon_measures(
    features: ray.data.Dataset, id_prop: str = "polygon_id"
) -> ray.data.Dataset:
    """(polygon_id, area_q, perim_q): quantized planar area/perimeter,
    one row per distinct polygon id (and per distinct measurement, so
    cross-format decode disagreements surface as duplicate ids)."""

    def measure(t: pa.Table) -> pa.Table:
        if "wkb" not in t.column_names:  # empty block, degenerate schema
            return pa.table(
                {
                    "polygon_id": pa.array([], pa.int64()),
                    "area_q": pa.array([], pa.int64()),
                    "perim_q": pa.array([], pa.int64()),
                }
            )
        mask = pc.and_(
            pc.is_valid(t["wkb"]),
            pc.is_in(
                t["geom_type"], value_set=pa.array(["polygon", "multipolygon"])
            ),
        )
        t = t.filter(mask)
        ids, areas, perims = [], [], []
        for wkb, pj, cj in zip(
            t["wkb"].to_pylist(),
            t["props_json"].to_pylist(),
            t["cols_json"].to_pylist(),
        ):
            # props are positional; names ride in cols_json (first name
            # is the geometry column) — the _tables_to_polygons layout
            names, _types = json.loads(cj)
            props = dict(zip(names[1:], json.loads(pj)))
            pid = props.get(id_prop)
            if pid is None:
                continue
            ctype, coords = wkb_decode(wkb)
            polys = [coords] if ctype == "polygon" else coords
            area, perim = _even_odd_area_perim(
                [ring for rings in polys for ring in rings]
            )
            ids.append(int(pid))
            areas.append(int(np.floor(area * QUANT + 0.5)))
            perims.append(int(np.floor(perim * QUANT + 0.5)))
        return pa.table(
            {
                "polygon_id": pa.array(ids, pa.int64()),
                "area_q": pa.array(areas, pa.int64()),
                "perim_q": pa.array(perims, pa.int64()),
            }
        )

    measured = features.map_batches(measure, batch_format="pyarrow")
    return (
        measured.groupby(["polygon_id", "area_q", "perim_q"])
        .aggregate(Count(alias_name="n_feat"))
        .drop_columns(["n_feat"])
    )
