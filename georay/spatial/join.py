"""Spatial join stages: cell-encode + point-in-polygon (actor pool) and
kNN via cell-ring expansion.

These are the north rule's core operators: pages (points) join against
the compiled polygon index (broadcast via ``ray.put``; see index.py).
Both stages are callable CLASSES for ``map_batches(cls, concurrency=N)``
— the index is fetched from the object store once per actor in
``__init__`` and reused across batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .cells import cell_encode, cell_to_zxy, cell_xy


class PIPJoiner:
    """Inner join pages -> containing polygons.

    Per batch: vectorized cell encode; points grouped by cell; each
    (cell, candidate polygon) pair is one vectorized ray-cast of all the
    cell's points against the polygon. Output: one row per (page,
    containing polygon).
    """

    def __init__(self, index_ref):
        self.index = ray.get(index_ref) if not hasattr(index_ref, "zoom") else index_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        urls = batch["url"]
        cells = cell_encode(lon, lat, self.index.zoom)
        pts = np.column_stack([lon, lat])

        take_idx = []
        pids, players, pnames = [], [], []
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        boundaries = np.nonzero(np.diff(sorted_cells))[0] + 1
        groups = np.split(order, boundaries)
        for grp in groups:
            if len(grp) == 0:
                continue
            cands = self.index.candidates_for_cell(int(cells[grp[0]]))
            if not cands:
                continue
            gpts = pts[grp]
            for ci in cands:
                mask = self.index.contains(ci, gpts)
                if mask.any():
                    hit = grp[mask]
                    take_idx.extend(hit.tolist())
                    meta = self.index.polygons[ci]
                    pids.extend([meta["polygon_id"]] * len(hit))
                    players.extend([meta["layer"]] * len(hit))
                    pnames.extend([meta["name"]] * len(hit))

        idx = pa.array(take_idx, pa.int64())
        return pa.table(
            {
                "url": urls.take(idx) if len(take_idx) else pa.array([], urls.type),
                "lon": pa.array(lon[take_idx], pa.float64()),
                "lat": pa.array(lat[take_idx], pa.float64()),
                "cell": pa.array(cells[take_idx], pa.int64()),
                "polygon_id": pa.array(pids, pa.float64()),
                "polygon_layer": pa.array(players, pa.float64()),
                "polygon_name": pa.array(pnames, pa.string()),
            }
        )


_EARTH_R = 6371008.8


def haversine_m(lon1, lat1, lon2, lat2):
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * _EARTH_R * np.arcsin(np.sqrt(h))


class KNNJoiner:
    """k nearest polygon centroids per page via cell-ring expansion:
    expand rings around the page's cell until >= k candidates are seen,
    expand ONE more ring (a nearer point can hide in the next ring),
    then exact haversine top-k."""

    def __init__(self, index_ref, k: int = 3, knn_zoom: int | None = None, max_ring: int = 64):
        index = ray.get(index_ref) if not hasattr(index_ref, "zoom") else index_ref
        self.index = index
        self.k = k
        self.zoom = knn_zoom if knn_zoom is not None else index.zoom
        self.max_ring = max_ring
        # centroid buckets at self.zoom, built once per actor
        cents = index.centroids
        ccells = cell_encode(cents[:, 0], cents[:, 1], self.zoom)
        self.buckets: dict[int, np.ndarray] = {}
        order = np.argsort(ccells, kind="stable")
        sc = ccells[order]
        bounds = np.nonzero(np.diff(sc))[0] + 1
        for grp in np.split(order, bounds):
            if len(grp):
                self.buckets[int(ccells[grp[0]])] = grp

    def _candidates(self, cell: int):
        """Yield (ring_k, ids) growing outward."""
        z, x, y = (int(v) for v in cell_to_zxy(np.int64(cell)))
        n = 1 << z
        for k in range(self.max_ring + 1):
            ids = []
            if k == 0:
                ring = [(x, y)]
            else:
                ring = []
                for dy in range(-k, k + 1):
                    yy = y + dy
                    if yy < 0 or yy >= n:
                        continue
                    for dx in range(-k, k + 1):
                        if max(abs(dx), abs(dy)) == k:
                            ring.append(((x + dx) % n, yy))
            for cx, cy in ring:
                b = self.buckets.get(int(cell_xy(z, cx, cy)))
                if b is not None:
                    ids.append(b)
            yield k, (np.concatenate(ids) if ids else np.empty(0, dtype=np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        urls = batch["url"].to_pylist()
        cents = self.index.centroids
        out_url, out_rank, out_pid, out_dist = [], [], [], []
        cache: dict[int, np.ndarray] = {}
        cells = cell_encode(lon, lat, self.zoom)
        for i, cell in enumerate(cells):
            cand = cache.get(int(cell))
            if cand is None:
                found: list[np.ndarray] = []
                total = 0
                need_extra = None
                for ring_k, ids in self._candidates(int(cell)):
                    if need_extra is not None and ring_k > need_extra:
                        break
                    found.append(ids)
                    total += len(ids)
                    if total >= self.k and need_extra is None:
                        need_extra = ring_k + 1  # one safety ring
                cand = np.concatenate(found) if found else np.empty(0, dtype=np.int64)
                cache[int(cell)] = cand
            if len(cand) == 0:
                continue
            d = haversine_m(lon[i], lat[i], cents[cand, 0], cents[cand, 1])
            top = np.argsort(d, kind="stable")[: self.k]
            for rank, j in enumerate(top):
                out_url.append(urls[i])
                out_rank.append(rank)
                out_pid.append(self.index.polygons[int(cand[j])]["polygon_id"])
                out_dist.append(float(d[j]))
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "rank": pa.array(out_rank, pa.int32()),
                "polygon_id": pa.array(out_pid, pa.float64()),
                "distance_m": pa.array(out_dist, pa.float64()),
            }
        )


# --------------------------------------------------- task-mode joiners

# Broadcast state is IMMUTABLE here (the compiled polygon index), so an
# actor pool buys nothing over plain tasks + a per-worker cache: Ray
# task workers are prestarted and reused, the joiner deserializes once
# per worker process (keyed by ObjectRef), and every CPU participates
# with full work stealing — no pool spawn latency, no pool/task CPU
# split to tune. Actor classes above remain for genuinely mutable or
# heavyweight per-worker state.

_WORKER_JOINERS: dict = {}


def pip_join_batch(batch: pa.Table, index_ref) -> pa.Table:
    key = ("pip", index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref))
    j = _WORKER_JOINERS.get(key)
    if j is None:
        j = PIPJoiner(index_ref)
        _WORKER_JOINERS[key] = j
    return j(batch)


def knn_join_batch(batch: pa.Table, index_ref, k: int) -> pa.Table:
    key = ("knn", index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref), k)
    j = _WORKER_JOINERS.get(key)
    if j is None:
        j = KNNJoiner(index_ref, k)
        _WORKER_JOINERS[key] = j
    return j(batch)
