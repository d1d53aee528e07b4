"""Line-set canonicalization for set-theoretic geometry comparison.

The reference's golden tests compare steiner outputs with shapely's
set-theoretic ``equals`` (``tests/test_reblock.py:167,242``: a line
[0,0.5,1] equals [0,1]). This helper normalizes a collection of polylines
into a canonical set of atomic sub-segments: every segment is split at every
input vertex lying on it, then endpoint-ordered and rounded. Two line sets
are set-theoretically equal iff their canonical sets are equal.
"""
from __future__ import annotations

import numpy as np


def _round(p, nd=9):
    return (round(float(p[0]), nd), round(float(p[1]), nd))


def _collect(lines):
    segs = []
    pts = set()
    for line in lines:
        arr = np.asarray(line, dtype=np.float64).reshape(-1, 2)
        for a, b in zip(arr, arr[1:]):
            a, b = _round(a), _round(b)
            if a != b:
                segs.append((a, b))
                pts.add(a)
                pts.add(b)
    return segs, pts


def canonical_segments(lines, extra_points=()) -> frozenset:
    """Atomic sub-segment set; ``extra_points`` are additional split points
    (pass the other side's vertices when comparing two line sets)."""
    segs, pts = _collect(lines)
    pts |= set(extra_points)
    out = set()
    for a, b in segs:
        ax, ay = a
        bx, by = b
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        cuts = [0.0, 1.0]
        for (px, py) in pts:
            cross = dx * (py - ay) - dy * (px - ax)
            if abs(cross) > 1e-9 * max(1.0, L2):
                continue
            t = ((px - ax) * dx + (py - ay) * dy) / L2
            if 1e-12 < t < 1 - 1e-12:
                cuts.append(t)
        cuts.sort()
        for t0, t1 in zip(cuts, cuts[1:]):
            if t1 - t0 < 1e-12:
                continue
            p = _round((ax + t0 * dx, ay + t0 * dy))
            q = _round((ax + t1 * dx, ay + t1 * dy))
            if p != q:
                out.add((min(p, q), max(p, q)))
    return frozenset(out)


def lines_equal(lines_a, lines_b) -> bool:
    """Set-theoretic equality of two polyline collections (shapely
    ``equals`` semantics for line unions)."""
    _, pa = _collect(lines_a)
    _, pb = _collect(lines_b)
    allp = pa | pb
    return canonical_segments(lines_a, allp) == canonical_segments(lines_b, allp)


def offset_polyline(pts: np.ndarray, dist: float,
                    miter_limit: float = 4.0) -> np.ndarray:
    """Offset a polyline by ``dist`` on BOTH sides and close the ends →
    corridor polygon ring (the engine's ``parallel_offset``-pair, ref
    ``_reblock_graph.py:855-858``: left offset + right offset joined into
    a Polygon).  Miter joins at interior vertices, clamped to
    ``miter_limit × dist`` so near-reversals don't emit spikes.

    Returns a closed (n,2) ring: left-offset path forward, then
    right-offset path reversed."""
    p = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    if len(p) < 2:
        raise ValueError("offset_polyline needs >= 2 points")
    seg = p[1:] - p[:-1]
    L = np.hypot(seg[:, 0], seg[:, 1])
    keep = L > 0
    # drop zero-length segments (repeated vertices)
    if not keep.all():
        p = np.vstack([p[:1], p[1:][keep]])
        seg = p[1:] - p[:-1]
        L = np.hypot(seg[:, 0], seg[:, 1])
    d = seg / L[:, None]                      # unit directions per segment
    nrm = np.stack([-d[:, 1], d[:, 0]], axis=1)   # left normals

    def side(sign: float) -> np.ndarray:
        out = [p[0] + sign * dist * nrm[0]]
        for i in range(1, len(p) - 1):
            n0, n1 = nrm[i - 1], nrm[i]
            b = n0 + n1
            bl = np.hypot(b[0], b[1])
            if bl < 1e-12:                    # 180° reversal → bevel
                out.append(p[i] + sign * dist * n0)
                out.append(p[i] + sign * dist * n1)
                continue
            b = b / bl
            # miter length: dist / cos(theta/2) where cos = b·n0
            cosh = float(b @ n0)
            ml = dist / max(cosh, 1.0 / miter_limit)
            out.append(p[i] + sign * ml * b)
        out.append(p[-1] + sign * dist * nrm[-1])
        return np.asarray(out)

    left = side(+1.0)
    right = side(-1.0)[::-1]
    ring = np.vstack([left, right, left[:1]])
    from .core import shoelace_area
    if shoelace_area(ring) < 0:               # normalize to CCW shell
        ring = ring[::-1]
    return ring
