"""Sort-Tile-Recursive bounding-box tree (STRtree) — pure numpy, bulk-loaded, immutable.

The per-partition spatial index the north star requires ("stateful actor-pool stages
holding the S2 cell cover and STRtree per partition"): bulk-load once per actor from the
partition's cell rectangles / geometry bboxes, then answer bbox / point queries in
O(log n + k). Equivalent role to JTS STRtree used (via prepared geometries) in the
reference's ring classification (osm/package.scala:512-524) — here it serves the tile→cell
point-in-polygon assignment and kNN candidate pruning.

Classic STR packing (Leutenegger et al., 1997): sort by center-x into vertical slices,
sort each slice by center-y, pack leaves of size ``node_capacity``, recurse.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    def __init__(self, boxes: np.ndarray, node_capacity: int = 16):
        """boxes: (n, 4) float64 [xmin, ymin, xmax, ymax]."""
        self.boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        n = len(self.boxes)
        self.capacity = node_capacity
        if n == 0:
            self.levels: list[tuple[np.ndarray, np.ndarray]] = []
            return
        # leaf order: STR packing
        cx = (self.boxes[:, 0] + self.boxes[:, 2]) / 2
        cy = (self.boxes[:, 1] + self.boxes[:, 3]) / 2
        n_leaves = int(np.ceil(n / node_capacity))
        n_slices = int(np.ceil(np.sqrt(n_leaves)))
        slice_sz = n_slices * node_capacity
        order = np.argsort(cx, kind="stable")
        for s in range(0, n, slice_sz):
            sl = order[s : s + slice_sz]
            sl_sorted = sl[np.argsort(cy[sl], kind="stable")]
            order[s : s + slice_sz] = sl_sorted
        self.order = order  # original indices in leaf order

        # build level bboxes bottom-up: level 0 = items in leaf order
        item_boxes = self.boxes[order]
        self.levels = []
        cur = item_boxes
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / node_capacity))
            pad = m * node_capacity - len(cur)
            padded = np.vstack(
                [cur, np.repeat([[np.inf, np.inf, -np.inf, -np.inf]], pad, axis=0)]
            ).reshape(m, node_capacity, 4)
            parent = np.empty((m, 4))
            parent[:, 0] = padded[:, :, 0].min(axis=1)
            parent[:, 1] = padded[:, :, 1].min(axis=1)
            parent[:, 2] = padded[:, :, 2].max(axis=1)
            parent[:, 3] = padded[:, :, 3].max(axis=1)
            self.levels.append((cur, parent))
            cur = parent
        self._item_boxes = item_boxes

    def query_box(self, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
        """Original indices of boxes intersecting the query box."""
        n = len(self.boxes)
        if n == 0:
            return np.empty(0, np.int64)
        if not self.levels:
            hit = self._intersects(self._item_boxes, xmin, ymin, xmax, ymax)
            return self.order[hit]
        # walk down from the top level
        top = self.levels[-1][1]
        cand = np.nonzero(self._intersects(top, xmin, ymin, xmax, ymax))[0]
        for child_boxes, _ in reversed(self.levels):
            nxt = []
            for c in cand:
                lo = c * self.capacity
                hi = min(lo + self.capacity, len(child_boxes))
                idx = np.arange(lo, hi)
                hit = self._intersects(child_boxes[lo:hi], xmin, ymin, xmax, ymax)
                nxt.append(idx[hit])
            cand = np.concatenate(nxt) if nxt else np.empty(0, np.int64)
            if len(cand) == 0:
                return np.empty(0, np.int64)
        return self.order[cand.astype(np.int64)]

    def query_point(self, x: float, y: float) -> np.ndarray:
        return self.query_box(x, y, x, y)

    @staticmethod
    def _intersects(boxes: np.ndarray, xmin, ymin, xmax, ymax) -> np.ndarray:
        return (
            (boxes[:, 0] <= xmax)
            & (boxes[:, 2] >= xmin)
            & (boxes[:, 1] <= ymax)
            & (boxes[:, 3] >= ymin)
        )
