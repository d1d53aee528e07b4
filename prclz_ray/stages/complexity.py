"""k-complexity stage (reference: prclz ``_complexity.py``).

Per-block kernel: s0 = planar graph of the Voronoi decomposition of the
building centroids clipped to the block (``_complexity.py:16-45``), then
iterate the weak dual until empty; k = len(sequence) - 1 (``:57-68``).
Anchors on the block boundary and cells with < 3 vertices are dropped, and
a multi-part clip keeps the part containing its anchor (``:29-42``).

Pipeline shape (SURVEY §3.2): buildings → centroids → PIP join vs blocks →
groupby(block_id).map_groups(k kernel) on an actor-friendly group stage →
complexity table (block_id, geometry, complexity, centroids_multipoint).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import wkb
from ..geom.core import ensure_closed
from ..geom.predicates import point_in_ring
from ..geom.voronoi import clip_convex, voronoi_cells
from ..graph.planar import PlanarGraph, weak_dual_sequence_depth


def _snap_ring(ring: np.ndarray, decimals: int = 7) -> np.ndarray:
    """Snap-round cell vertices so degenerate Voronoi circumcenters (e.g.
    cocircular anchors) merge exactly; drop collapsed edges. The reference
    gets the equivalent from GEOS buffer(0) cleanup (``_complexity.py:33``).
    7 decimals (~1 cm in degrees) maximizes exact agreement with the DJI
    goldens: 6 merges true vertices of dense urban cells (building spacing
    ~1e-4°), ≥9 keeps circumcenter float noise apart — measured 143/152/
    152/151 exact at 5/7/9/10 decimals, best-bucket 152 at 7."""
    r = np.round(np.asarray(ring, dtype=np.float64), decimals)
    if len(r) == 0:
        return r
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = np.any(r[1:] != r[:-1], axis=1)
    r = r[keep]
    if len(r) < 4:
        return np.empty((0, 2))
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def s0_approximation(block_ring: np.ndarray, centroids: np.ndarray) -> PlanarGraph:
    block_ring = ensure_closed(np.asarray(block_ring, dtype=np.float64))
    boundary = {(float(x), float(y)) for x, y in block_ring}
    pts = np.asarray(centroids, dtype=np.float64).reshape(-1, 2)
    keep_rings: list[np.ndarray] = []
    # n ≤ 2 centroids yield no Voronoi cells (reference: pytess has no
    # Delaunay triangles → empty decomposition → k = 0, matching the DJI
    # goldens for 1-2-building blocks)
    cells = voronoi_cells(pts)
    for i, cell in cells.items():
        anchor = (float(pts[i, 0]), float(pts[i, 1]))
        if anchor in boundary or len(cell) - 1 <= 2:
            continue
        clipped = _snap_ring(clip_convex(block_ring, cell))
        if len(clipped) == 0:
            continue
        if not point_in_ring(anchor[0], anchor[1], clipped):
            continue  # multi-part intersection: keep only anchor's part
        keep_rings.append(clipped)
    return PlanarGraph.from_polygons(keep_rings)


def block_complexity(block_ring: np.ndarray, centroids: np.ndarray) -> int:
    return weak_dual_sequence_depth(s0_approximation(block_ring, centroids))


def complexity_pipeline(blocks, buildings_ds, max_buildings_per_block: int = 2000,
                        pip_broadcast_limit_bytes: int = 64 << 20):
    """blocks: pa.Table or Dataset (block_id, geometry[, cell]);
    buildings_ds: Dataset with WKB geometry. Output: COMPLEXITY schema.

    Buildings are centroided in a vectorized batch stage, PIP-joined to the
    blocks (broadcast while the blocks side fits
    ``pip_broadcast_limit_bytes``, co-partitioned tiled join past it —
    the 100× guard for continental blocks tables), then grouped per block
    for the CPU-heavy kernel — the group stage caps pathological groups
    (reference precedent: unbounded weak-dual loops, SURVEY §7.5.7) via
    ``max_buildings_per_block``."""
    from .joins import pip_join_auto

    def centroid_batch(batch: pa.Table) -> pa.Table:
        # M2 vectorized: batched shoelace over uniform WKB (ref
        # _complexity.py:104 geometry.centroid), no per-row decode
        xs, ys = wkb.polygon_centroids(batch["geometry"])
        out = batch.append_column("cx", pa.array(xs))
        return out.append_column("cy", pa.array(ys))

    blocks_sel = blocks.select(["block_id", "geometry"]) \
        if isinstance(blocks, pa.Table) \
        else blocks.select_columns(["block_id", "geometry"])
    cents = buildings_ds.map_batches(centroid_batch, batch_format="pyarrow")
    joined = pip_join_auto(cents.select_columns(["bldg_id", "cx", "cy"]),
                           blocks_sel,
                           id_col="block_id", x_col="cx", y_col="cy",
                           how="inner", attach_geom_col="block_geom",
                           broadcast_limit_bytes=pip_broadcast_limit_bytes)

    def per_block(group: pa.Table) -> pa.Table:
        bid = group["block_id"][0].as_py()
        ring = wkb.decode(group["block_geom"][0].as_py())[1][0]
        pts = np.stack([group["cx"].to_numpy(zero_copy_only=False),
                        group["cy"].to_numpy(zero_copy_only=False)], axis=1)
        status = "ok"
        if len(pts) > max_buildings_per_block:
            pts = pts[:max_buildings_per_block]
            status = "truncated"
        elif len(pts) == 2:
            # k decided by the 2-site aspect gate (geom/voronoi.py), whose
            # DJI calibration gap is (0.568, 0.617): flagged so users can
            # audit gate decisions on new data (round-2 advice)
            status = "2bldg_gate"
        k = block_complexity(ring, pts)
        return pa.table({
            "block_id": [bid],
            "geometry": pa.array([wkb.polygon(ring)], type=pa.binary()),
            "complexity": pa.array([k], type=pa.int32()),
            "centroids_multipoint": pa.array([wkb.multipoint(pts)], type=pa.binary()),
            "status": [status],
        })

    return joined.groupby("block_id").map_groups(per_block, batch_format="pyarrow")
