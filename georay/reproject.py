"""Vectorized geometry normalize + reproject-to-WGS84 + per-row bbox.

Reference: /root/reference/es6-lib/decoders/wgs84-reprojector.js:11-74.
Order of operations per geometry (matching _transform exactly):
arity check -> fixSemantics (closeRings/linify) -> reproject -> expand
bbox with every reprojected coordinate (invalid coords skipped by the
bbox rules).

The per-worker state (compiled Transformer per CRS) lives in the
module-level `Transformer.get` cache — built once per (worker process,
CRS), which is the actor-pool/`map_batches` equivalent of the
reference's per-layer srs.parse.

Coordinates for ALL rows of a batch that share a CRS are flattened into
one numpy array and transformed in a single call.
"""

from __future__ import annotations

import numpy as np

from .errors import InvalidArityError
from .geometry import (
    BBox,
    fix_semantics,
    flatten_coords,
    is_correct_arity,
    rebuild_coords,
    wkb_decode,
    wkb_encode,
)
from .proj import Transformer


def reproject_features(wkbs, ctypes, crs_list, fail_on_arity: bool = True):
    """Reproject a batch of WKB geometries to EPSG:4326.

    wkbs: sequence of WKB bytes or None; ctypes: geometry ctype per row
    ('null' rows pass through); crs_list: resolved CRS string per row.

    Returns (new_wkbs, bbox_arrays, ok_mask):
      bbox_arrays: (minx, miny, maxx, maxy) float64 arrays, NaN for
      rows with no geometry / no valid coords;
      ok_mask: False where arity failed (only when fail_on_arity=False,
      otherwise InvalidArityError raises — the reference fails the job).
    """
    n = len(wkbs)
    out_wkbs = [None] * n
    minx = np.full(n, np.nan)
    miny = np.full(n, np.nan)
    maxx = np.full(n, np.nan)
    maxy = np.full(n, np.nan)
    ok = np.ones(n, dtype=bool)

    # group rows by CRS so each group is one vectorized transform
    by_crs: dict = {}
    for i, crs in enumerate(crs_list):
        if wkbs[i] is None or ctypes[i] == "null":
            continue
        by_crs.setdefault(crs, []).append(i)

    for crs, idxs in by_crs.items():
        transformer = Transformer.get(crs)
        decoded = []
        arrays = []
        offsets = [0]
        for i in idxs:
            ctype, coords = wkb_decode(wkbs[i])
            if not is_correct_arity(ctype, coords):
                if fail_on_arity:
                    raise InvalidArityError(f"geometry with wrong arity at row {i}")
                ok[i] = False
                decoded.append(None)
                offsets.append(offsets[-1])
                continue
            coords = fix_semantics(ctype, coords)
            arr, spec = flatten_coords(ctype, coords)
            decoded.append((ctype, spec))
            arrays.append(arr)
            offsets.append(offsets[-1] + len(arr))

        if not arrays:
            continue
        stacked = np.concatenate(arrays) if len(arrays) > 1 else arrays[0]
        transformed = transformer.transform(stacked) if len(stacked) else stacked

        # per-row bboxes VECTORIZED over the stacked array (reduceat per
        # row segment) — per-row numpy slicing costs more than the
        # transform itself on many-small-geometry batches.
        # bbox validity per reference bbox.js: x >= -180, |y| <= 90
        x, y = transformed[:, 0], transformed[:, 1]
        valid = (x >= -180) & (y >= -90) & (y <= 90)
        xmin_src = np.where(valid, x, np.inf)
        xmax_src = np.where(valid, x, -np.inf)
        ymin_src = np.where(valid, y, np.inf)
        ymax_src = np.where(valid, y, -np.inf)
        live = [j for j in range(len(idxs)) if decoded[j] is not None]
        # reduceat over EMPTY segments is wrong twice over: it returns the
        # NEXT segment's element (a neighboring row's coordinate as this
        # row's bbox) and a trailing empty segment indexes out of bounds —
        # so only nonempty segments participate; empty ones keep NaN bbox
        nonempty = [j for j in live if offsets[j + 1] > offsets[j]]
        bbox_slot = {j: kk for kk, j in enumerate(nonempty)}
        if nonempty:
            starts = np.array([offsets[j] for j in nonempty], dtype=np.int64)
            seg_minx = np.minimum.reduceat(xmin_src, starts)
            seg_maxx = np.maximum.reduceat(xmax_src, starts)
            seg_miny = np.minimum.reduceat(ymin_src, starts)
            seg_maxy = np.maximum.reduceat(ymax_src, starts)

        for j in live:
            i = idxs[j]
            ctype, spec = decoded[j]
            seg = transformed[offsets[j] : offsets[j + 1]]
            out_wkbs[i] = wkb_encode(ctype, rebuild_coords(ctype, seg, spec))
            kk = bbox_slot.get(j)
            if kk is not None and np.isfinite(seg_minx[kk]):
                minx[i] = seg_minx[kk]
                maxx[i] = seg_maxx[kk]
                miny[i] = seg_miny[kk]
                maxy[i] = seg_maxy[kk]

    return out_wkbs, (minx, miny, maxx, maxy), ok


def merge_bboxes(minx, miny, maxx, maxy) -> BBox:
    """Reduce per-row bbox arrays to one BBox (NaNs skipped)."""
    b = BBox()
    if len(minx) == 0:
        return b
    m = ~np.isnan(minx)
    if m.any():
        b.expand([float(np.nanmin(minx)), float(np.nanmin(miny))])
        b.expand([float(np.nanmax(maxx)), float(np.nanmax(maxy))])
    return b
