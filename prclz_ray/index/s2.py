"""Vectorized S2 cell-id encoding (NumPy), from the published S2 geometry
algorithm (s2geometry.io; quadratic S↔T projection, Hilbert curve over cube
faces). This is the engine's tiling axis — the graft analogue of prclz's
GADM file-sharding (SURVEY §1.5): every geometry gets a ``cell: uint64``
partition key at LEVEL (default 14).

Implements:
  lnglat → XYZ → (face,u,v) → (s,t) → (i,j) → Hilbert position → cell id
  cell id → face/i/j → center lnglat (for ring expansion / debugging)
  parent/child prefix relations, same-face ij neighbor rings

The Hilbert traversal uses the standard 2-bit state machine with lookup
tables generated from the canonical order/orientation recurrence — no
third-party S2 code is imported.
"""
from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
DEFAULT_LEVEL = 14

# Hilbert state machine: position-in-parent (0..3) given (orientation, ij),
# and next orientation. Orientations encode swap|invert bits as in the
# published algorithm.
_SWAP, _INVERT = 1, 2
# canonical traversal order of sub-cells in (i,j) for orientation 0: the
# Hilbert "U" order (0,0) (0,1) (1,1) (1,0)
_POS_OF_IJ = np.zeros((4, 4), dtype=np.uint8)   # [orientation][ij] -> pos
_IJ_OF_POS = np.zeros((4, 4), dtype=np.uint8)   # [orientation][pos] -> ij
_NEXT_ORIENT = np.zeros((4, 4), dtype=np.uint8)  # [orientation][pos] -> orientation
_base_ij_of_pos = (0b00, 0b01, 0b11, 0b10)
_base_orient_of_pos = (_SWAP, 0, 0, _INVERT | _SWAP)
for _o in range(4):
    for _p in range(4):
        ij = _base_ij_of_pos[_p]
        if _o & _SWAP:
            ij = ((ij & 1) << 1) | (ij >> 1)
        if _o & _INVERT:
            ij ^= 3
        _POS_OF_IJ[_o, ij] = _p
        _IJ_OF_POS[_o, _p] = ij
        _NEXT_ORIENT[_o, _p] = _base_orient_of_pos[_p] ^ _o


def lnglat_to_xyz(lng_deg, lat_deg):
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return np.cos(lng) * cos_lat, np.sin(lng) * cos_lat, np.sin(lat)


def xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay,
                    np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2))
    # major-axis sign: faces 3,4,5 are the negative axes
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    for f in range(6):
        m = face == f
        if not np.any(m):
            continue
        xf, yf, zf = x[m], y[m], z[m]
        if f == 0:
            u[m], v[m] = yf / xf, zf / xf
        elif f == 1:
            u[m], v[m] = -xf / yf, zf / yf
        elif f == 2:
            u[m], v[m] = -xf / zf, -yf / zf
        elif f == 3:
            u[m], v[m] = zf / xf, yf / xf
        elif f == 4:
            u[m], v[m] = zf / yf, -xf / yf
        else:
            u[m], v[m] = -yf / zf, -xf / zf
    return face, u, v


def uv_to_st(u):
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(np.abs(1 - 3 * u)))


def st_to_ij(s):
    return np.clip((np.asarray(s) * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def face_ij_to_cellid(face, i, j, level=DEFAULT_LEVEL):
    """Hilbert-encode (face,i,j) at MAX_LEVEL, then truncate to ``level``."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = np.zeros(face.shape, dtype=np.uint64)
    # face orientation seed: odd faces start with the swap bit set
    orient = np.where(face % np.uint64(2) == 1, np.uint8(_SWAP), np.uint8(0)).astype(np.uint8)
    # NOTE: canonical S2 seeds orientation with (face & SWAP_MASK) — faces
    # 1,3,5 start swapped; this matches the published kPosToOrientation chain.
    for k in range(MAX_LEVEL - 1, -1, -1):
        ib = ((i >> k) & 1).astype(np.uint8)
        jb = ((j >> k) & 1).astype(np.uint8)
        ij = (ib << 1) | jb
        pos = _POS_OF_IJ[orient, ij]
        n = (n << np.uint64(2)) | pos.astype(np.uint64)
        orient = _NEXT_ORIENT[orient, pos]
    full = (face << np.uint64(2 * MAX_LEVEL + 1)) | (n << np.uint64(1)) | np.uint64(1)
    if level >= MAX_LEVEL:
        return full
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (full & ~(lsb - np.uint64(1)) & ~lsb) | lsb


def lnglat_to_cellid(lng_deg, lat_deg, level=DEFAULT_LEVEL) -> np.ndarray:
    """Main entry: vectorized lng/lat arrays → uint64 S2 cell ids."""
    x, y, z = lnglat_to_xyz(lng_deg, lat_deg)
    x = np.atleast_1d(x); y = np.atleast_1d(y); z = np.atleast_1d(z)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return face_ij_to_cellid(face, i, j, level)


def cellid_level(cid: np.ndarray) -> np.ndarray:
    cid = np.asarray(cid, dtype=np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return (MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2).astype(np.int64)).astype(np.int64)


def cellid_to_face_ij(cid, level=DEFAULT_LEVEL):
    """Decode a cell id back to (face, i, j) of its min-corner leaf at
    MAX_LEVEL resolution (center of cell for ring math)."""
    cid = np.asarray(cid, dtype=np.uint64)
    face = (cid >> np.uint64(2 * MAX_LEVEL + 1)).astype(np.int64)
    n = (cid >> np.uint64(1)) & ((np.uint64(1) << np.uint64(2 * MAX_LEVEL)) - np.uint64(1))
    orient = np.where(face % 2 == 1, np.uint8(_SWAP), np.uint8(0)).astype(np.uint8)
    i = np.zeros(cid.shape, dtype=np.int64)
    j = np.zeros(cid.shape, dtype=np.int64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        pos = ((n >> np.uint64(2 * k)) & np.uint64(3)).astype(np.uint8)
        ij = _IJ_OF_POS[orient, pos]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = _NEXT_ORIENT[orient, pos]
    return face, i, j


def cell_center_lnglat(cid, level=DEFAULT_LEVEL):
    face, i, j = cellid_to_face_ij(cid)
    # center of the level-cell: zero out trailing ij bits, add half step
    shift = MAX_LEVEL - level
    step = 1 << shift
    i = (i >> shift << shift) + step // 2
    j = (j >> shift << shift) + step // 2
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lng = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    return lng, lat


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (1.0 / 3.0) * (4 * s * s - 1), (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s)))


def _face_uv_to_xyz(face, u, v):
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    x = np.empty_like(u); y = np.empty_like(u); z = np.empty_like(u)
    specs = {
        0: lambda u, v: (np.ones_like(u), u, v),
        1: lambda u, v: (-u, np.ones_like(u), v),
        2: lambda u, v: (-u, -v, np.ones_like(u)),
        3: lambda u, v: (-np.ones_like(u), -v, -u),
        4: lambda u, v: (v, -np.ones_like(u), -u),
        5: lambda u, v: (v, u, -np.ones_like(u)),
    }
    for f, fn in specs.items():
        m = face == f
        if np.any(m):
            x[m], y[m], z[m] = fn(u[m], v[m])
    return x, y, z


def cover_bbox(minx: float, miny: float, maxx: float, maxy: float,
               level=DEFAULT_LEVEL, margin: int = 1) -> np.ndarray:
    """Cell ids covering a lon/lat bbox. Dense grid sampling at sub-cell
    spacing (every level-``level`` cell intersecting the box contains or
    adjoins a sample), then a ``margin``-ring dilation — exact across face
    boundaries, which cut diagonally through mid-latitudes.

    Sampling count scales with (box span / cell size); boxes beyond 256
    cells per side are rejected — pip_join_tiled's contract is polygons
    small relative to the tile level (SURVEY custom-operator rule); pick a
    coarser level for bigger geometries."""
    cell_deg = 90.0 / (1 << level)  # conservative min cell extent in degrees
    kx = int(np.ceil((maxx - minx) / cell_deg * 1.5)) + 1
    ky = int(np.ceil((maxy - miny) / cell_deg * 1.5)) + 1
    if max(kx, ky) > 384:
        raise ValueError(
            f"cover_bbox: box spans ~{max(kx, ky)} level-{level} cells per "
            "side; use a coarser level for geometries this large")
    gx = np.linspace(minx, maxx, max(kx, 2))
    gy = np.linspace(miny, maxy, max(ky, 2))
    xs, ys = np.meshgrid(gx, gy)
    x, y, z = lnglat_to_xyz(xs.ravel(), ys.ravel())
    face, u, v = xyz_to_face_uv(np.atleast_1d(x), np.atleast_1d(y),
                                np.atleast_1d(z))
    shift = MAX_LEVEL - level
    i = (st_to_ij(uv_to_st(u)) >> shift) << shift
    j = (st_to_ij(uv_to_st(v)) >> shift) << shift
    cids = np.unique(face_ij_to_cellid(face, i, j, level))
    if margin > 0:
        cids = np.unique(
            cell_neighbors_same_face(cids, level, ring=margin).ravel())
    return cids


def cell_neighbors_same_face(cid, level=DEFAULT_LEVEL, ring=1) -> np.ndarray:
    """Cell ids of the (2r+1)² ij-neighborhood on the same face (used for
    kNN cell-ring expansion; cross-face neighbors are out of scope for the
    synthetic corpora, documented limitation)."""
    face, i, j = cellid_to_face_ij(cid)
    shift = MAX_LEVEL - level
    ci = np.atleast_1d(i >> shift).astype(np.int64)
    cj = np.atleast_1d(j >> shift).astype(np.int64)
    face = np.atleast_1d(face)
    out = []
    lim = 1 << level
    for di in range(-ring, ring + 1):
        for dj in range(-ring, ring + 1):
            ni, nj = ci + di, cj + dj
            ok = (ni >= 0) & (ni < lim) & (nj >= 0) & (nj < lim)
            if ok.any():
                out.append(face_ij_to_cellid(
                    face[ok], (ni[ok] << shift).astype(np.uint64),
                    (nj[ok] << shift).astype(np.uint64), level))
    return np.unique(np.concatenate([np.atleast_1d(o) for o in out]))
