"""Polygon dissolve (geometric union) for edge-sharing polygon sets.

Reference analogues: A5 ``dissolve(by='uID')`` (``_parcels.py:165``) and A6
``unary_union`` (``blocks/_extract_blocks.py:34``, corridor polygons in
``_reblock_graph.py:895-900``).

Kernel: boundary-segment cancellation.  For polygons whose interiors do not
overlap (tessellation cells, reunion pieces, corridor strips split on
shared edges), every internal edge appears in ≥2 rings and cancels; the
union boundary is exactly the set of segments appearing once.  Cycles are
re-traced with a leftmost-turn walk (handles pinch vertices).  Coordinates
are matched after rounding to ``decimals`` so edges produced by separate
clips of the same bisector still cancel.

Precondition (documented per the custom-operator rule): inputs tile — no
partially-overlapping interiors.  That is the reference's dissolve use
case; a general overlap union would need full polygon clipping.
"""
from __future__ import annotations

import numpy as np

from .core import ensure_closed, shoelace_area


def _norm_ring(ring: np.ndarray, decimals: int) -> np.ndarray:
    r = ensure_closed(np.asarray(ring, dtype=np.float64))
    r = np.round(r, decimals)
    # drop consecutive duplicates introduced by rounding
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = np.any(r[1:] != r[:-1], axis=1)
    r = r[keep]
    if len(r) < 4 or np.any(r[0] != r[-1]):
        if len(r) >= 3 and np.any(r[0] != r[-1]):
            r = np.vstack([r, r[0]])
    if shoelace_area(r) < 0:            # normalize orientation to CCW
        r = r[::-1]
    return r


def dissolve_rings(rings: list[np.ndarray], decimals: int = 9
                   ) -> list[np.ndarray]:
    """Union of edge-sharing rings → list of boundary rings (CCW outer
    shells; CW rings are holes of the union)."""
    edge_count: dict[tuple, int] = {}
    directed: list[tuple[tuple, tuple]] = []
    for ring in rings:
        r = _norm_ring(ring, decimals)
        if len(r) < 4:
            continue
        for a, b in zip(r[:-1], r[1:]):
            ka, kb = (a[0], a[1]), (b[0], b[1])
            if ka == kb:
                continue
            und = (ka, kb) if ka <= kb else (kb, ka)
            edge_count[und] = edge_count.get(und, 0) + 1
            directed.append((ka, kb))

    boundary = [(a, b) for (a, b) in directed
                if edge_count[(a, b) if a <= b else (b, a)] == 1]
    if not boundary:
        return []

    # outgoing adjacency for the leftmost-turn walk
    out_edges: dict[tuple, list[tuple]] = {}
    for a, b in boundary:
        out_edges.setdefault(a, []).append(b)
    unused = set(boundary)

    def leftmost(prev: tuple, cur: tuple) -> tuple | None:
        cands = [b for b in out_edges.get(cur, ()) if (cur, b) in unused]
        if not cands:
            return None
        if len(cands) == 1:
            return cands[0]
        ax = np.arctan2(prev[1] - cur[1], prev[0] - cur[0])
        best, best_ang = None, None
        for b in cands:
            ang = (np.arctan2(b[1] - cur[1], b[0] - cur[0]) - ax) % (2 * np.pi)
            # smallest clockwise-from-incoming angle → leftmost turn for a
            # CCW-oriented boundary
            if best is None or ang < best_ang:
                best, best_ang = b, ang
        return best

    cycles: list[np.ndarray] = []
    for start_edge in boundary:
        if start_edge not in unused:
            continue
        a, b = start_edge
        unused.discard(start_edge)
        path = [a, b]
        while path[-1] != path[0]:
            nxt = leftmost(path[-2], path[-1])
            if nxt is None:        # open chain (inconsistent input) — drop
                path = None
                break
            unused.discard((path[-1], nxt))
            path.append(nxt)
        if path is not None and len(path) >= 4:
            cycles.append(np.asarray(path, dtype=np.float64))
    return cycles


def dissolve_by_id(items: list[tuple], decimals: int = 9) -> dict:
    """(id, ring) pairs → {id: [rings]} with each id's rings dissolved
    (the reference's ``dissolve(by='uID')``)."""
    groups: dict = {}
    for pid, ring in items:
        groups.setdefault(pid, []).append(ring)
    return {pid: (rs if len(rs) == 1 else dissolve_rings(rs, decimals))
            for pid, rs in groups.items()}
