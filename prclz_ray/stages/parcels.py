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
from ..geom.core import (ensure_closed, point_segments_distance,
                         shoelace_area)
from ..geom.predicates import point_in_ring
from ..geom.voronoi import clip_convex, voronoi_cells


def tessellate_block(block_ring: np.ndarray, centroids: np.ndarray
                     ) -> list[tuple[int, list[np.ndarray]]]:
    """(building_index, [parcel_rings]) per building; single building →
    whole block.

    Orphan handling (reference ``_parcels.py:65-168``): on a NON-convex
    block a Voronoi cell ∩ block can be disconnected — Sutherland–Hodgman
    emits it as a pinched ring, split here into simple pieces.  The piece
    containing the building centroid is the parent parcel; every other
    piece is an ORPHAN, reunited with the parcel of the nearest building
    whose parent piece it touches (``find_parent_parcel_id`` walk,
    ``:105-149``), then geometrically dissolved into it (A5 ``dissolve``,
    ``:165``).  Orphans touching no parent are dropped, as the reference's
    NaN-uID dissolve does (``:143-147,165``)."""
    from ..geom.dissolve import dissolve_rings
    from ..geom.voronoi import split_pinched_ring

    block_ring = ensure_closed(np.asarray(block_ring, dtype=np.float64))
    pts = np.asarray(centroids, dtype=np.float64).reshape(-1, 2)
    if len(pts) == 0:
        return []
    if len(pts) == 1:
        return [(0, [block_ring])]

    # cells clipped to a rect covering the whole BLOCK (not just the point
    # bbox) so tessellation never loses outlying block area
    from ..geom.core import bbox as _bbox
    from ..geom.voronoi import halfplane_cells
    x0, y0, x1, y1 = _bbox(block_ring)
    m = 0.5 * max(x1 - x0, y1 - y0, 1e-9)
    rect = np.array([[x0 - m, y0 - m], [x1 + m, y0 - m],
                     [x1 + m, y1 + m], [x0 - m, y1 + m]])

    parents: dict[int, np.ndarray] = {}
    orphans: list[np.ndarray] = []
    for i, cell in halfplane_cells(pts, bounds=rect).items():
        clipped = clip_convex(block_ring, cell)
        if not len(clipped):
            continue
        pieces = split_pinched_ring(clipped)
        if len(pieces) <= 1:
            parents[i] = clipped
            continue
        own = None
        for p in pieces:
            if own is None and point_in_ring(pts[i, 0], pts[i, 1], p):
                own = p
            else:
                orphans.append(p)
        if own is None:          # centroid on a pinch vertex: keep largest
            areas = [abs(shoelace_area(p)) for p in pieces]
            own = pieces[int(np.argmax(areas))]
            # identity filter: `own in orphans` would compare numpy arrays
            # element-wise and raise on non-identical rings
            orphans = [o for o in orphans if o is not own]
        parents[i] = own

    return _reunite_orphans(parents, orphans, pts)


def _reunite_orphans(parents: dict[int, np.ndarray],
                     orphans: list[np.ndarray], anchors: np.ndarray
                     ) -> list[tuple[int, list[np.ndarray]]]:
    """Shared orphan reunion + dissolve (reference ``_parcels.py:105-168``):
    each orphan walks candidate parents by anchor distance ascending and
    joins the first whose parent ring it touches; joined groups are
    geometrically dissolved (A5)."""
    from ..geom.dissolve import dissolve_rings

    groups: dict[int, list[np.ndarray]] = {i: [r] for i, r in parents.items()}
    eps = 1e-9
    for orph in orphans:
        o = ensure_closed(orph)
        oc = o[:-1].mean(axis=0)
        order = np.argsort(((anchors - oc) ** 2).sum(axis=1), kind="stable")
        for i in order:
            if i not in parents:
                continue
            pr = ensure_closed(parents[i])
            touch = min(point_segments_distance(v, pr[:-1], pr[1:]).min()
                        for v in o[:-1]) <= eps
            if touch:
                groups[i].append(orph)
                break
        # else: orphan with no touching parent — dropped (reference :143)

    out: list[tuple[int, list[np.ndarray]]] = []
    for i in sorted(groups):
        rings = groups[i]
        if len(rings) > 1:
            rings = dissolve_rings(rings)
            # outer shells only (holes can't arise from reuniting
            # same-cell fragments; defensive filter)
            rings = [r for r in rings if shoelace_area(r) > 0] or rings
        out.append((i, rings))
    return out


def tessellate_block_footprints(block_ring: np.ndarray,
                                footprints: list,
                                sample_interval: float | None = None,
                                max_samples_per_bldg: int = 96
                                ) -> list[tuple[int, list[np.ndarray]]]:
    """Footprint-anchored morphological tessellation — the reference's
    momepy ``Tessellation(bldgs_gdf, unique_id='uID', limit=block)`` over
    building POLYGONS (``_parcels.py:52-63``), not centroids: sample points
    along each footprint boundary (momepy's boundary densification), take
    the Voronoi decomposition of the labeled samples, clip each cell to the
    block, and union the cells per building (A5 dissolve).  For point-like
    buildings this coincides with centroid Voronoi; for elongated
    footprints the parcel boundary runs equidistant between footprint
    EDGES.  Orphan pieces (non-convex blocks) reunite exactly as in the
    centroid path.

    ``footprints``: one entry per building — a single closed ring array or
    a list of outer rings (multipolygon building).  Samples are nudged a
    relative 1e-9 toward the footprint's vertex mean so shared-wall
    vertices of touching buildings separate symmetrically (momepy's inward
    offset, ``_parcels.py:55``)."""
    from collections import defaultdict

    from ..geom.core import bbox as _bbox
    from ..geom.dissolve import dissolve_rings
    from ..geom.voronoi import halfplane_cells, split_pinched_ring

    block_ring = ensure_closed(np.asarray(block_ring, dtype=np.float64))
    m = len(footprints)
    if m == 0:
        return []
    norm: list[list[np.ndarray]] = []
    for fp in footprints:
        rings = [fp] if isinstance(fp, np.ndarray) else list(fp)
        norm.append([ensure_closed(np.asarray(r, dtype=np.float64))
                     for r in rings])
    anchors = np.array([np.vstack([r[:-1] for r in rings]).mean(axis=0)
                        for rings in norm])
    if m == 1:
        return [(0, [block_ring])]

    x0, y0, x1, y1 = _bbox(block_ring)
    diag = float(np.hypot(x1 - x0, y1 - y0))
    if sample_interval is None:
        # boundary-position error of sampled-point Voronoi is second order
        # (≈ interval²/(8·gap)), so diag/24 resolves parcel boundaries to
        # ~0.1% of the block span at ~7× less clip work than diag/64
        sample_interval = diag / 24.0

    all_s, all_l = [], []
    for bi, rings in enumerate(norm):
        samples = []
        for r in rings:
            seg = r[1:] - r[:-1]
            slen = np.hypot(seg[:, 0], seg[:, 1])
            cnt = np.maximum(1, np.ceil(slen / sample_interval)).astype(np.int64)
            for k in range(len(seg)):
                t = (np.arange(cnt[k]) / cnt[k])[:, None]
                samples.append(r[k] + t * seg[k])
        s = np.vstack(samples)
        if len(s) > max_samples_per_bldg:
            s = s[np.unique(np.linspace(0, len(s) - 1,
                                        max_samples_per_bldg).astype(np.int64))]
        v = anchors[bi] - s
        nrm = np.hypot(v[:, 0], v[:, 1])
        eps = max(diag, 1e-9) * 1e-9
        nz = (nrm > 0)[:, None]
        s = s + np.where(nz, v / np.maximum(nrm, 1e-300)[:, None] * eps, 0.0)
        all_s.append(s)
        all_l.append(np.full(len(s), bi, dtype=np.int64))
    P = np.vstack(all_s)
    lbl = np.concatenate(all_l)
    # drop exact duplicates (identical samples from touching footprints)
    _, first = np.unique(np.round(P, 12), axis=0, return_index=True)
    keep = np.sort(first)
    P, lbl = P[keep], lbl[keep]

    mpad = 0.5 * max(x1 - x0, y1 - y0, 1e-9)
    rect = np.array([[x0 - mpad, y0 - mpad], [x1 + mpad, y0 - mpad],
                     [x1 + mpad, y1 + mpad], [x0 - mpad, y1 + mpad]])
    pieces: dict[int, list[np.ndarray]] = defaultdict(list)
    for i, cell in halfplane_cells(P, bounds=rect).items():
        clipped = clip_convex(block_ring, cell)
        if not len(clipped):
            continue
        for p in split_pinched_ring(clipped):
            pieces[int(lbl[i])].append(p)

    parents: dict[int, np.ndarray] = {}
    orphans: list[np.ndarray] = []
    for bi in sorted(pieces):
        rings = pieces[bi]
        shells = dissolve_rings(rings) if len(rings) > 1 \
            else [ensure_closed(rings[0])]
        shells = [r for r in shells if shoelace_area(r) > 0] or shells
        own = None
        for r in shells:
            if point_in_ring(anchors[bi][0], anchors[bi][1], r):
                own = r
                break
        if own is None:
            own = shells[int(np.argmax([abs(shoelace_area(r))
                                        for r in shells]))]
        parents[bi] = own
        orphans.extend(r for r in shells if r is not own)
    return _reunite_orphans(parents, orphans, anchors)


def parcels_pipeline(blocks, buildings_ds, method: str = "footprint",
                     pip_broadcast_limit_bytes: int = 64 << 20):
    """blocks: pa.Table/Dataset (block_id, geometry); buildings_ds: Dataset
    (bldg_id, geometry WKB). → PARCELS rows (block_id, parcel_id, geometry).

    ``method="footprint"`` (default, reference-faithful: momepy
    Tessellation over building polygons, ``_parcels.py:52-63``) anchors the
    Voronoi decomposition on boundary samples of each footprint;
    ``method="centroid"`` uses the one-point-per-building approximation
    (coincides for point-like buildings, cheaper).  The blocks join routes
    broadcast → tiled past ``pip_broadcast_limit_bytes`` (100× guard)."""
    from .joins import pip_join_auto

    if method not in ("footprint", "centroid"):
        raise ValueError(f"unknown tessellation method: {method}")

    def centroid_batch(batch: pa.Table) -> pa.Table:
        # M2 vectorized: batched shoelace over uniform WKB, no per-row decode
        xs, ys = wkb.polygon_centroids(batch["geometry"])
        out = batch.append_column("cx", pa.array(xs))
        return out.append_column("cy", pa.array(ys))

    point_cols = ["bldg_id", "cx", "cy"]
    if method == "footprint":
        point_cols.append("geometry")   # footprint WKB co-shuffles with rows
    blocks_sel = blocks.select(["block_id", "geometry"]) \
        if isinstance(blocks, pa.Table) \
        else blocks.select_columns(["block_id", "geometry"])
    cents = buildings_ds.map_batches(centroid_batch, batch_format="pyarrow")
    joined = pip_join_auto(cents.select_columns(point_cols), blocks_sel,
                           id_col="block_id", x_col="cx", y_col="cy",
                           how="inner", attach_geom_col="block_geom",
                           broadcast_limit_bytes=pip_broadcast_limit_bytes)

    def per_block(group: pa.Table) -> pa.Table:
        bid = group["block_id"][0].as_py()
        ring = wkb.decode(group["block_geom"][0].as_py())[1][0]
        pts = np.stack([group["cx"].to_numpy(zero_copy_only=False),
                        group["cy"].to_numpy(zero_copy_only=False)], axis=1)
        order = np.lexsort((pts[:, 1], pts[:, 0]))
        if method == "footprint":
            fps = []
            for j in order:
                t, v = wkb.decode(group["geometry"][int(j)].as_py())
                # outer ring(s) only: holes don't anchor tessellation
                fps.append([v[0]] if t == wkb.POLYGON
                           else [part[0] for part in v])
            parcels = tessellate_block_footprints(ring, fps)
        else:
            parcels = tessellate_block(ring, pts[order])
        ids, geoms, bldgs = [], [], []
        for seq, (bi, prings) in enumerate(parcels):
            ids.append(f"{bid}_p{seq}")
            geoms.append(wkb.polygon(prings[0]) if len(prings) == 1
                         else wkb.multipolygon([[r] for r in prings]))
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
    from .joins import pip_join
    from .relational import ds_to_table

    parcels_tbl = ds_to_table(parcels_ds) \
        if not isinstance(parcels_ds, pa.Table) else parcels_ds

    def centroid_batch(batch: pa.Table) -> pa.Table:
        # M2 vectorized: batched shoelace over uniform WKB, no per-row decode
        xs, ys = wkb.polygon_centroids(batch["geometry"])
        out = batch.append_column("cx", pa.array(xs))
        return out.append_column("cy", pa.array(ys))

    # STRtree-probed PIP (broadcast pack built once per actor) instead of
    # scanning every parcel per batch: O(points · log parcels)
    cents = buildings_ds.map_batches(centroid_batch, batch_format="pyarrow")
    joined = pip_join(cents.select_columns(["bldg_id", "cx", "cy"]),
                      parcels_tbl.select(["parcel_id", "geometry"]),
                      id_col="parcel_id", x_col="cx", y_col="cy",
                      how="inner")
    total = joined.groupby("parcel_id").count() \
        .map_batches(lambda t: t.rename_columns(["parcel_id", "n"]),
                     batch_format="pyarrow")
    return total.filter(expr="n > 1")


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
