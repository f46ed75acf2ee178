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
        # every non-coordinate input column passes through (the query
        # path sends `url`; the persisted flagship path sends the int64
        # `page_key` — the joiner is key-agnostic)
        key_cols = [n for n in batch.column_names if n not in ("lon", "lat")]
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
                    # a decoded polygon whose props lack id/layer emits
                    # null, matching the pre-int64 float path (ADVICE
                    # r02: int(None) killed the join task)
                    pid, lay = meta["polygon_id"], meta["layer"]
                    pids.extend([int(pid) if pid is not None else None] * len(hit))
                    players.extend([int(lay) if lay is not None else None] * len(hit))
                    pnames.extend([meta["name"]] * len(hit))

        idx = pa.array(take_idx, pa.int64())
        cols: dict = {}
        for name in key_cols:
            c = batch[name]
            cols[name] = c.take(idx) if len(take_idx) else c.slice(0, 0)
        cols.update(
            {
                "lon": pa.array(lon[take_idx], pa.float64()),
                "lat": pa.array(lat[take_idx], pa.float64()),
                "cell": pa.array(cells[take_idx], pa.int64()),
                # int64 keys at the decode edge (VERDICT r01 #7): join
                # outputs must be integer-keyed, not JSON-float artifacts
                "polygon_id": pa.array(pids, pa.int64()),
                "polygon_layer": pa.array(players, pa.int64()),
                "polygon_name": pa.array(pnames, pa.string()),
            }
        )
        return pa.table(cols)


_EARTH_R = 6371008.8


def haversine_m(lon1, lat1, lon2, lat2):
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * _EARTH_R * np.arcsin(np.sqrt(h))


def _tile_lat(y: float, n: int) -> float:
    """Latitude (deg) of the TOP edge of tile row y at grid size n."""
    import math

    t = math.pi * (1.0 - 2.0 * y / n)
    return math.degrees(math.atan(math.sinh(t)))


class KNNJoiner:
    """Exact k nearest polygon centroids per page via cell-ring expansion.

    Stopping rule (ADVICE r01): a fixed "+1 safety ring" is NOT
    sufficient for exact kNN — a candidate found in ring r can be up to
    ~(r+1)*sqrt(2) cell-diagonals away while an unexplored cell at ring
    r+2 holds a nearer centroid, and mercator cell height varies with
    latitude. Instead, rings keep expanding until a *lower bound* on
    the distance from anywhere in the home cell to anything outside the
    explored (2r+1)^2 box exceeds the kth-best *upper bound* among the
    candidates already found (distance from the cell center plus the
    cell's corner radius). Bounds, all conservative on the sphere:

      - north/south: great-circle distance >= R * |dlat| (any path must
        traverse the latitude gap between the home cell edge and the
        box edge — exact mercator row latitudes, so varying cell height
        is handled);
      - east/west: distance from p to the meridian lon=L is exactly
        R * asin(cos(lat_p) * |sin(lon_p - L)|), minimized over the
        home cell with the largest |lat| in the cell;
      - an edge at the grid boundary (row 0 / n-1, or a box spanning
        all longitudes) has nothing unexplored behind it: term dropped
        (clamped >85.05 deg centroids live in row 0/n-1 buckets, which
        the box then covers).
    """

    def __init__(self, index_ref, k: int = 3, knn_zoom: int | None = None, max_ring: int = 64):
        index = ray.get(index_ref) if not hasattr(index_ref, "zoom") else index_ref
        self.index = index
        self.k = k
        self.zoom = knn_zoom if knn_zoom is not None else index.zoom
        # CentroidIndex carries ids directly; PolygonIndex via polygons
        pids = getattr(index, "polygon_ids", None)
        self.pids = pids if pids is not None else [p["polygon_id"] for p in index.polygons]
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

    def _unexplored_lower_bound_m(self, z: int, x: int, y: int, r: int) -> float:
        """Lower bound (meters) on haversine distance from ANY point in
        cell (x,y) to ANY point in a cell at Chebyshev ring > r."""
        import math

        n = 1 << z
        lat_top = _tile_lat(y, n)
        lat_bot = _tile_lat(y + 1, n)
        terms = []
        if 2 * r + 1 < n:  # box does not span every longitude column
            dlon = math.radians(r * 360.0 / n)
            coslat = math.cos(math.radians(max(abs(lat_top), abs(lat_bot))))
            s = min(1.0, coslat * abs(math.sin(dlon)))
            terms.append(_EARTH_R * math.asin(s))
        if y - r > 0:  # rows above the box exist
            dlat = math.radians(_tile_lat(y - r, n) - lat_top)
            terms.append(_EARTH_R * max(0.0, dlat))
        if y + r < n - 1:  # rows below the box exist
            dlat = math.radians(lat_bot - _tile_lat(y + r + 1, n))
            terms.append(_EARTH_R * max(0.0, dlat))
        return min(terms) if terms else float("inf")

    def _expand_cell(self, cell: int) -> np.ndarray:
        """Candidate centroid ids guaranteed to contain the exact top-k
        for every query point inside `cell`."""
        import math

        z, x, y = (int(v) for v in cell_to_zxy(np.int64(cell)))
        n = 1 << z
        clon = (x + 0.5) / n * 360.0 - 180.0
        clat = (_tile_lat(y, n) + _tile_lat(y + 1, n)) / 2.0
        corners_lon = np.array([(x) / n * 360.0 - 180.0, (x + 1) / n * 360.0 - 180.0] * 2)
        corners_lat = np.array([_tile_lat(y, n)] * 2 + [_tile_lat(y + 1, n)] * 2)
        # radius: center -> farthest corner, +5% slack for the flat-box
        # approximation of "farthest point in cell"
        radius = 1.05 * float(np.max(haversine_m(clon, clat, corners_lon, corners_lat)))

        cents = self.index.centroids
        found: list[np.ndarray] = []
        total = 0
        for ring_k, ids in self._candidates(int(cell)):
            found.append(ids)
            total += len(ids)
            if total >= self.k:
                cand = np.concatenate(found)
                # upper bound of each candidate's distance from ANY point
                # in the home cell
                du = haversine_m(clon, clat, cents[cand, 0], cents[cand, 1]) + radius
                kth_ub = float(np.partition(du, self.k - 1)[self.k - 1])
                if self._unexplored_lower_bound_m(z, x, y, ring_k) > kth_ub:
                    return cand
        # max_ring exhausted without the bound closing (sparse region /
        # polar cells): fall back to brute force — exactness beats the
        # ring heuristic, and the centroid array is already in memory
        return np.arange(len(cents), dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        # key-agnostic like PIPJoiner: non-coordinate columns pass
        # through (url on the query path, int64 page_key when persisted)
        key_cols = [n for n in batch.column_names if n not in ("lon", "lat")]
        cents = self.index.centroids
        out_idx, out_rank, out_pid, out_dist = [], [], [], []
        cache: dict[int, np.ndarray] = {}
        cells = cell_encode(lon, lat, self.zoom)
        for i, cell in enumerate(cells):
            cand = cache.get(int(cell))
            if cand is None:
                cand = self._expand_cell(int(cell))
                cache[int(cell)] = cand
            if len(cand) == 0:
                continue
            d = haversine_m(lon[i], lat[i], cents[cand, 0], cents[cand, 1])
            top = np.argsort(d, kind="stable")[: self.k]
            for rank, j in enumerate(top):
                out_idx.append(i)
                out_rank.append(rank)
                pid = self.pids[int(cand[j])]
                out_pid.append(int(pid) if pid is not None else None)
                out_dist.append(float(d[j]))
        idx = pa.array(out_idx, pa.int64())
        cols: dict = {}
        for name in key_cols:
            c = batch[name]
            cols[name] = c.take(idx) if len(out_idx) else c.slice(0, 0)
        cols.update(
            {
                "rank": pa.array(out_rank, pa.int32()),
                "polygon_id": pa.array(out_pid, pa.int64()),
                "distance_m": pa.array(out_dist, pa.float64()),
            }
        )
        return pa.table(cols)


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


def _pip_schema(batch: pa.Table) -> pa.Schema:
    """PIP join output schema for a given input batch: the batch's
    non-coordinate (key) columns pass through, then the fixed join
    tail — mirrors PIPJoiner.__call__'s column layout."""
    fields = [f for f in batch.schema if f.name not in ("lon", "lat")]
    fields += [
        pa.field("lon", pa.float64()),
        pa.field("lat", pa.float64()),
        pa.field("cell", pa.int64()),
        pa.field("polygon_id", pa.int64()),
        pa.field("polygon_layer", pa.int64()),
        pa.field("polygon_name", pa.string()),
    ]
    return pa.schema(fields)


def sharded_pip_join_batch(batch: pa.Table, sharded) -> pa.Table:
    """Task-mode PIP join against a ShardedPolygonIndex: the batch's
    points are routed by their coarse shard cell, and only the touched
    shards are fetched (then cached per worker process, keyed by
    ObjectRef). A polygon is replicated into every shard cell its bbox
    covers, so one shard lookup per point is complete and duplicate-free
    — per-worker memory is bounded by the shards its batches touch, not
    the whole polygon universe."""
    from .cells import cell_encode as _enc

    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    if len(lon) == 0:
        return _pip_schema(batch).empty_table()
    shard_cells = _enc(lon, lat, sharded.shard_zoom)
    order = np.argsort(shard_cells, kind="stable")
    sc = shard_cells[order]
    bounds = np.nonzero(np.diff(sc))[0] + 1
    outs = []
    for grp in np.split(order, bounds):
        if len(grp) == 0:
            continue
        ref = sharded.shard_refs.get(int(shard_cells[grp[0]]))
        if ref is None:
            continue
        key = ("pip", ref.hex() if hasattr(ref, "hex") else id(ref))
        joiner = _WORKER_JOINERS.get(key)
        if joiner is None:
            joiner = PIPJoiner(ref)
            _WORKER_JOINERS[key] = joiner
        outs.append(joiner(batch.take(pa.array(grp))))
    if not outs:
        return _pip_schema(batch).empty_table()
    return pa.concat_tables(outs)
