"""STR-packed bounding-box tree (Sort-Tile-Recursive, Leutenegger et al. 1997).

Replaces the reference's rtree / pandas ``sindex`` usage
(``topology.py:358-361``, ``split_buildings.py:136-143``). Built once per
tile/actor, queried per batch — pure NumPy, no external deps.
"""
from __future__ import annotations

import numpy as np


class STRtree:
    """Static packed R-tree over item bboxes (N,4): minx,miny,maxx,maxy."""

    def __init__(self, boxes: np.ndarray, leaf_size: int = 16):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.boxes = boxes
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        # STR packing: sort by x, slice into vertical strips, sort each by y
        nleaves = int(np.ceil(self.n / leaf_size))
        nstrips = int(np.ceil(np.sqrt(nleaves)))
        per_strip = int(np.ceil(self.n / nstrips))
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(self.n, dtype=np.int64)
        for s in range(nstrips):
            strip = by_x[s * per_strip:(s + 1) * per_strip]
            strip = strip[np.argsort(cy[strip], kind="stable")]
            order[s * per_strip:s * per_strip + len(strip)] = strip
        self.order = order
        self.leaf_size = leaf_size
        # build level bboxes bottom-up
        cur = boxes[order]
        self.levels = []
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / leaf_size))
            lv = np.empty((m, 4))
            for i in range(m):
                chunk = cur[i * leaf_size:(i + 1) * leaf_size]
                lv[i, 0] = chunk[:, 0].min(); lv[i, 1] = chunk[:, 1].min()
                lv[i, 2] = chunk[:, 2].max(); lv[i, 3] = chunk[:, 3].max()
            self.levels.append(lv)
            cur = lv

    def query_box(self, qminx, qminy, qmaxx, qmaxy) -> np.ndarray:
        """Indices of items whose bbox intersects the query box."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        if not self.levels:
            i = self.order[0]
            b = self.boxes[i]
            hit = not (b[2] < qminx or qmaxx < b[0] or b[3] < qminy or qmaxy < b[1])
            return self.order[:1] if hit else np.empty(0, dtype=np.int64)
        # descend from root level
        nodes = np.arange(len(self.levels[-1]))
        for depth in range(len(self.levels) - 1, -1, -1):
            lv = self.levels[depth]
            nb = lv[nodes]
            keep = ~((nb[:, 2] < qminx) | (qmaxx < nb[:, 0]) |
                     (nb[:, 3] < qminy) | (qmaxy < nb[:, 1]))
            nodes = nodes[keep]
            if len(nodes) == 0:
                return np.empty(0, dtype=np.int64)
            if depth > 0:
                children = (nodes[:, None] * self.leaf_size +
                            np.arange(self.leaf_size)[None, :]).ravel()
                nodes = children[children < len(self.levels[depth - 1])]
        children = (nodes[:, None] * self.leaf_size +
                    np.arange(self.leaf_size)[None, :]).ravel()
        children = children[children < self.n]
        items = self.order[children]
        b = self.boxes[items]
        keep = ~((b[:, 2] < qminx) | (qmaxx < b[:, 0]) |
                 (b[:, 3] < qminy) | (qmaxy < b[:, 1]))
        return items[keep]

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """For each point, candidate item indices (bbox contains point).
        Returns (point_idx, item_idx) candidate pair arrays."""
        pis, iis = [], []
        for i in range(len(px)):
            cands = self.query_box(px[i], py[i], px[i], py[i])
            if len(cands):
                pis.append(np.full(len(cands), i, dtype=np.int64))
                iis.append(cands)
        if not pis:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(pis), np.concatenate(iis)
