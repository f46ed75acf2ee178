"""Vectorized ray-casting point-in-polygon (even-odd rule).

Polygons are packed as flat coordinate arrays + ring offsets so a batch
of N points tests against a polygon's E edges in one N x E numpy
broadcast (no Python loop over points — the hot path the north star
names: "ray-casting point-in-polygon against the decoded multilayer
polygon sets").

Even-odd over ALL rings (outer + holes) makes holes fall out naturally:
a point inside a hole crosses both the outer and the hole boundary an
odd number of times each -> even total -> outside.
"""

from __future__ import annotations

import numpy as np


def pack_rings(rings):
    """rings: list of [[x, y], ...] -> (coords [M,2] float64, ring_offsets).
    Rings are closed on pack if not already closed."""
    arrs = []
    offsets = [0]
    for ring in rings:
        a = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        if len(a) and not np.array_equal(a[0], a[-1]):
            a = np.vstack([a, a[:1]])
        arrs.append(a)
        offsets.append(offsets[-1] + len(a))
    coords = np.concatenate(arrs) if arrs else np.empty((0, 2))
    return coords, np.asarray(offsets, dtype=np.int64)


def points_in_polygon(pts: np.ndarray, coords: np.ndarray, ring_offsets: np.ndarray):
    """pts: [N,2]; returns bool[N] even-odd containment over all rings."""
    n = len(pts)
    if n == 0 or len(coords) == 0:
        return np.zeros(n, dtype=bool)
    px = pts[:, 0:1]  # [N,1]
    py = pts[:, 1:2]
    inside = np.zeros(n, dtype=bool)
    for r in range(len(ring_offsets) - 1):
        a, b = int(ring_offsets[r]), int(ring_offsets[r + 1])
        if b - a < 2:
            continue
        x1 = coords[a : b - 1, 0][None, :]  # [1,E]
        y1 = coords[a : b - 1, 1][None, :]
        x2 = coords[a + 1 : b, 0][None, :]
        y2 = coords[a + 1 : b, 1][None, :]
        straddle = (y1 > py) != (y2 > py)  # [N,E]
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        crossings = (straddle & (px < xint)).sum(axis=1)
        inside ^= (crossings % 2).astype(bool)
    return inside
