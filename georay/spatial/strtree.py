"""STR-packed R-tree over bounding boxes, from scratch in numpy
(Leutenegger et al., "STR: A Simple and Efficient Algorithm for R-Tree
Packing", 1997 — public).

Used as the per-partition polygon index an actor pool holds: bulk-load
once in ``__init__``, answer bbox queries per batch. Query returns
candidate ids; exact geometry predicates (ray-casting PIP) verify.
"""

from __future__ import annotations

import math

import numpy as np


class STRtree:
    def __init__(self, bboxes: np.ndarray, node_capacity: int = 16):
        """bboxes: [N,4] (minx, miny, maxx, maxy)."""
        self.bboxes = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
        self.node_capacity = node_capacity
        n = len(self.bboxes)
        self.levels = []  # each: (child_start_index_array, node_bboxes)
        if n == 0:
            return
        # leaf ordering: sort-tile-recursive on bbox centers
        cx = (self.bboxes[:, 0] + self.bboxes[:, 2]) / 2
        cy = (self.bboxes[:, 1] + self.bboxes[:, 3]) / 2
        n_slices = max(1, math.ceil(math.sqrt(math.ceil(n / node_capacity))))
        slice_size = math.ceil(n / n_slices)
        order_x = np.argsort(cx, kind="stable")
        self.leaf_order = np.concatenate(
            [
                s[np.argsort(cy[s], kind="stable")]
                for s in np.array_split(order_x, math.ceil(n / slice_size))
            ]
        )
        # build levels bottom-up: groups of node_capacity
        cur_bboxes = self.bboxes[self.leaf_order]
        while len(cur_bboxes) > 1:
            n_nodes = math.ceil(len(cur_bboxes) / node_capacity)
            node_bb = np.empty((n_nodes, 4))
            starts = np.arange(n_nodes) * node_capacity
            for i in range(n_nodes):
                seg = cur_bboxes[i * node_capacity : (i + 1) * node_capacity]
                node_bb[i] = (
                    seg[:, 0].min(),
                    seg[:, 1].min(),
                    seg[:, 2].max(),
                    seg[:, 3].max(),
                )
            self.levels.append((starts, node_bb))
            cur_bboxes = node_bb

    def query(self, minx, miny, maxx, maxy) -> np.ndarray:
        """ids (into the original bbox array) whose boxes intersect the
        query rect."""
        n = len(self.bboxes)
        if n == 0:
            return np.empty(0, dtype=np.int64)
        if not self.levels:
            hit = self._intersects(self.bboxes, minx, miny, maxx, maxy)
            return np.nonzero(hit)[0].astype(np.int64)
        # descend from the top level
        cand = None  # node indices at current level
        for starts, node_bb in reversed(self.levels):
            if cand is None:
                hit = self._intersects(node_bb, minx, miny, maxx, maxy)
                cand = np.nonzero(hit)[0]
            else:
                # cand are nodes of the level ABOVE: expand to this level
                kids = np.concatenate(
                    [
                        np.arange(
                            c * self.node_capacity,
                            min((c + 1) * self.node_capacity, len(node_bb)),
                        )
                        for c in cand
                    ]
                ) if len(cand) else np.empty(0, dtype=np.int64)
                kids = kids.astype(np.int64)
                hit = self._intersects(node_bb[kids], minx, miny, maxx, maxy)
                cand = kids[hit]
            if len(cand) == 0:
                return np.empty(0, dtype=np.int64)
        # cand now indexes the lowest level nodes -> expand to leaves
        leaves = np.concatenate(
            [
                np.arange(
                    c * self.node_capacity,
                    min((c + 1) * self.node_capacity, len(self.leaf_order)),
                )
                for c in cand
            ]
        ).astype(np.int64)
        ids = self.leaf_order[leaves]
        hit = self._intersects(self.bboxes[ids], minx, miny, maxx, maxy)
        return ids[hit]

    @staticmethod
    def _intersects(bb, minx, miny, maxx, maxy):
        return (bb[:, 0] <= maxx) & (bb[:, 2] >= minx) & (bb[:, 1] <= maxy) & (bb[:, 3] >= miny)
