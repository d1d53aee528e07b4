"""Spatial joins as Ray Data stages: point-in-polygon, kNN, zonal.

North-star operator set (BASELINE.json): "joined with point-in-polygon
(STRtree per tile, prepared-geometry tests), kNN (cell-ring expansion with
distance refinement), and raster↔vector zonal ops".

Reference semantics reproduced (SURVEY §2.4):
  J1/J2/J3/J4  gpd.sjoin(..., op="intersects") with inner/left/right
               variants → ``pip_join`` (broadcast) / ``pip_join_tiled``
  J5           semi/anti split (``_parcels.py:91-93``) → ``how="semi"/"anti"``
  J7           nearest-with-refinement (``_parcels.py:105-149``) → ``knn_join``

Scale design:
  - ``pip_join``: SMALL polygon side is broadcast once via ``ray.put``; each
    actor builds an STRtree over polygon bboxes in ``__init__`` (per-actor,
    not per-batch) and runs vectorized bbox-prefilter + ray-cast tests per
    batch. No shuffle of the big side.
  - ``pip_join_tiled``: BOTH sides large → co-partition by S2 cell
    (polygons replicated to every cell their bbox covers), groupby(cell),
    per-tile STRtree inside map_groups. One all-to-all shuffle, keyed by
    the shared tile key.
  - ``knn_join``: targets broadcast as a uniform-grid bucket index; ring
    expansion r=0,1,... with the standard lower-bound cutoff
    (r·cellsize > kth-best distance) then exact refinement.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..geom import wkb
from ..geom.predicates import points_in_polygon
from ..geom.strtree import STRtree


# ------------------------------------------------------------------ helpers

def _polygon_pack(polygons, id_col: str, geom_col: str = "geometry",
                  keep_wkb: bool = False):
    """Materialize the small polygon side into (ids, rings_list, bboxes,
    wkbs-or-None).  ``keep_wkb`` retains the raw WKB so the join can
    attach the matched polygon geometry as an output column (per-block
    pipelines co-shuffle the geometry with the rows instead of a second
    driver broadcast)."""
    if hasattr(polygons, "to_arrow_refs") or hasattr(polygons, "take_all"):
        from .relational import ds_to_table
        tbl = ds_to_table(polygons)
    elif isinstance(polygons, pa.Table):
        tbl = polygons
    else:
        tbl = pa.Table.from_pandas(polygons)
    ids = tbl[id_col].to_pylist()
    wkbs = tbl[geom_col].to_pylist()
    rings = []
    for buf in wkbs:
        t, v = wkb.decode(buf)
        if t == wkb.POLYGON:
            rings.append([v])          # single polygon: list of one rings-set
        elif t == wkb.MULTIPOLYGON:
            rings.append(v)
        else:
            raise ValueError("pip_join: geometry must be (Multi)Polygon")
    boxes = wkb.bboxes(wkbs)
    return ids, rings, boxes, (wkbs if keep_wkb else None)


class PIPJoiner:
    """Actor-pool stage: broadcast polygons, STRtree per actor, vectorized
    PIP per batch. Emits one output row per (point, matching polygon); for
    how='left' unmatched points carry a null polygon id."""

    def __init__(self, packed_ref, x_col: str, y_col: str, id_col: str,
                 how: str = "inner", out_id_col: Optional[str] = None,
                 attach_geom_col: Optional[str] = None):
        packed = ray.get(packed_ref) if isinstance(
            packed_ref, ray.ObjectRef) else packed_ref
        ids, rings, boxes, wkbs = packed
        self.ids = ids
        self.rings = rings
        self.wkbs = wkbs
        self.tree = STRtree(boxes)
        self.x_col, self.y_col = x_col, y_col
        self.how = how
        self.out_id = out_id_col or id_col
        self.attach_geom_col = attach_geom_col

    def match(self, px: np.ndarray, py: np.ndarray):
        """Returns (point_idx, poly_idx) match pairs."""
        cand_p, cand_g = self.tree.query_points(px, py)
        if len(cand_p) == 0:
            return cand_p, cand_g
        keep = np.zeros(len(cand_p), dtype=bool)
        # group candidate pairs by polygon → one vectorized PIP per polygon
        order = np.argsort(cand_g, kind="stable")
        cand_p, cand_g = cand_p[order], cand_g[order]
        starts = np.flatnonzero(np.diff(cand_g, prepend=-1))
        for s, e in zip(starts, np.append(starts[1:], len(cand_g))):
            gi = cand_g[s]
            pts = cand_p[s:e]
            hit = np.zeros(len(pts), dtype=bool)
            for poly_rings in (self.rings[gi] if isinstance(self.rings[gi][0], list) else [self.rings[gi]]):
                hit |= points_in_polygon(px[pts], py[pts], poly_rings)
            keep[s:e] = hit
        return cand_p[keep], cand_g[keep]

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False)
        py = batch[self.y_col].to_numpy(zero_copy_only=False)
        pi, gi = self.match(px, py)
        n = len(px)
        if self.how == "inner":
            out = batch.take(pa.array(pi))
            out = out.append_column(self.out_id, pa.array([self.ids[g] for g in gi]))
            if self.attach_geom_col:
                out = out.append_column(
                    self.attach_geom_col,
                    pa.array([self.wkbs[g] for g in gi], type=pa.binary()))
            return out
        if self.how == "left":
            matched = np.zeros(n, dtype=bool)
            matched[pi] = True
            un = np.flatnonzero(~matched)
            idx = np.concatenate([pi, un])
            vals = [self.ids[g] for g in gi] + [None] * len(un)
            out = batch.take(pa.array(idx))
            return out.append_column(self.out_id, pa.array(vals))
        if self.how in ("semi", "anti"):
            matched = np.zeros(n, dtype=bool)
            matched[pi] = True
            mask = matched if self.how == "semi" else ~matched
            return batch.filter(pa.array(mask))
        raise ValueError(self.how)


def pip_join(points_ds, polygons, id_col: str, x_col: str = "lng",
             y_col: str = "lat", how: str = "inner",
             out_id_col: Optional[str] = None, concurrency=(1, 4),
             batch_size: int = 8192, attach_geom_col: Optional[str] = None):
    """Broadcast PIP join: big point Dataset × small polygon table.
    The polygon pack is put in the object store ONCE and read by each actor
    in ``__init__`` — never re-shipped per batch.  ``attach_geom_col``
    additionally emits the matched polygon's WKB per output row (lets a
    downstream groupby co-shuffle the geometry instead of re-broadcasting
    the polygon table)."""
    packed = _polygon_pack(polygons, id_col,
                           keep_wkb=attach_geom_col is not None)
    ref = ray.put(packed)
    return points_ds.map_batches(
        PIPJoiner,
        fn_constructor_kwargs=dict(packed_ref=ref, x_col=x_col, y_col=y_col,
                                   id_col=id_col, how=how,
                                   out_id_col=out_id_col,
                                   attach_geom_col=attach_geom_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True)


# ------------------------------------------------------------- tiled join

def pip_join_tiled(points_ds, polygons_ds, id_col: str, x_col: str = "lng",
                   y_col: str = "lat", level: int = 12,
                   out_id_col: Optional[str] = None,
                   attach_geom_col: Optional[str] = None,
                   how: str = "inner"):
    """Both-sides-large PIP join, co-partitioned by S2 cell.

    polygons are replicated to every level-``level`` cell their bbox covers
    (flat_map), points carry their own cell; one groupby(cell) shuffle, then
    a per-tile STRtree join inside map_groups. Left/semi/anti semantics are
    exact per-tile: a point lives in exactly one cell group, so "unmatched
    in my tile" == "unmatched globally" (semi/anti emit each point at most
    once with point columns only, matching the broadcast ``PIPJoiner``).
    Partitioning assumption: polygon bboxes are small relative to the tile
    size (documented per SURVEY custom-operator rule)."""
    from ..index import s2

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"pip_join_tiled: how must be inner|left|semi|anti, got {how}")
    out_id = out_id_col or id_col

    def poly_cells(batch: pa.Table) -> pa.Table:
        # replicate each polygon row once per covered cell with ONE
        # arrow-level take over repeated indices (no per-row .as_py())
        boxes = wkb.bboxes(batch["geometry"].to_pylist())
        counts = np.empty(batch.num_rows, dtype=np.int64)
        cells: list[np.ndarray] = []
        for i in range(batch.num_rows):
            minx, miny, maxx, maxy = boxes[i]
            cids = s2.cover_bbox(minx, miny, maxx, maxy, level)
            counts[i] = len(cids)
            cells.append(np.asarray(cids, dtype=np.uint64))
        idx = np.repeat(np.arange(batch.num_rows), counts)
        out = batch.take(pa.array(idx))
        flat = np.concatenate(cells) if cells else np.empty(0, dtype=np.uint64)
        return out.append_column("cell", pa.array(flat))

    def point_cells(batch: pa.Table) -> pa.Table:
        cid = s2.lnglat_to_cellid(batch[x_col].to_numpy(zero_copy_only=False),
                                  batch[y_col].to_numpy(zero_copy_only=False), level)
        return batch.append_column("cell", pa.array(cid))

    polys = polygons_ds.map_batches(poly_cells, batch_format="pyarrow") \
        .map_batches(lambda t: t.append_column("_side", pa.array(np.ones(t.num_rows, dtype=np.int8))),
                     batch_format="pyarrow")
    pts = points_ds.map_batches(point_cells, batch_format="pyarrow") \
        .map_batches(lambda t: t.append_column("_side", pa.array(np.zeros(t.num_rows, dtype=np.int8))),
                     batch_format="pyarrow")

    # union the two sides with aligned schemas (missing columns → typed null)
    col_types: dict[str, pa.DataType] = {}
    for schema in (pts.schema(), polys.schema()):
        for name, typ in zip(schema.names, schema.types):
            col_types.setdefault(name, typ)
    all_cols = list(col_types)

    def align(t: pa.Table) -> pa.Table:
        for name in all_cols:
            if name not in t.column_names:
                t = t.append_column(name, pa.nulls(t.num_rows, type=col_types[name]))
        return t.select(all_cols)

    unioned = pts.map_batches(align, batch_format="pyarrow").union(
        polys.map_batches(align, batch_format="pyarrow"))

    # output keeps EVERY point-side column (plus cell + the joined id)
    point_out = [n for n in pts.schema().names if n != "_side"]
    out_types = {n: col_types[n] for n in point_out}
    id_type = col_types[id_col]

    semi_anti = how in ("semi", "anti")

    def join_tile(group: pa.Table) -> pa.Table:
        pts_t = group.filter(pc.equal(group["_side"], 0))
        pol_t = group.filter(pc.equal(group["_side"], 1))
        if pts_t.num_rows == 0 or (pol_t.num_rows == 0
                                   and how in ("inner", "semi")):
            empty = {n: pa.array([], type=out_types[n]) for n in point_out}
            if not semi_anti:
                empty[out_id] = pa.array([], type=id_type)
                if attach_geom_col:
                    empty[attach_geom_col] = pa.array([], type=pa.binary())
            return pa.table(empty)
        if pol_t.num_rows == 0:            # left/anti: all points unmatched
            out = pts_t.select(point_out)
            if how == "anti":
                return out
            out = out.append_column(out_id,
                                    pa.nulls(out.num_rows, type=id_type))
            if attach_geom_col:
                out = out.append_column(
                    attach_geom_col, pa.nulls(out.num_rows, pa.binary()))
            return out
        packed = _polygon_pack(pol_t.select([id_col, "geometry"]), id_col)
        joiner = PIPJoiner(packed, x_col, y_col, id_col, "inner", out_id)
        px = pts_t[x_col].to_numpy(zero_copy_only=False)
        py = pts_t[y_col].to_numpy(zero_copy_only=False)
        pi, gi = joiner.match(px, py)
        if semi_anti:
            matched = np.zeros(pts_t.num_rows, dtype=bool)
            matched[np.asarray(pi, dtype=np.int64)] = True
            mask = matched if how == "semi" else ~matched
            return pts_t.select(point_out).filter(pa.array(mask))
        gi = np.asarray(gi, dtype=np.int64)
        if how == "left":
            matched = np.zeros(pts_t.num_rows, dtype=bool)
            matched[np.asarray(pi, dtype=np.int64)] = True
            un = np.flatnonzero(~matched)
            pi = np.concatenate([np.asarray(pi, dtype=np.int64), un])
            gi = np.concatenate([gi, np.full(len(un), -1, dtype=np.int64)])
        out = pts_t.select(point_out).take(pa.array(pi))
        ids_arr = np.asarray(packed[0], dtype=object)
        id_vals = [None if g < 0 else ids_arr[g] for g in gi] \
            if how == "left" else ids_arr[gi]
        out = out.append_column(out_id, pa.array(id_vals, type=id_type))
        if attach_geom_col:
            geom = pol_t["geometry"].combine_chunks()
            if how == "left":
                gvals = [None if g < 0 else geom[int(g)].as_py() for g in gi]
                out = out.append_column(attach_geom_col,
                                        pa.array(gvals, type=pa.binary()))
            else:
                out = out.append_column(attach_geom_col,
                                        geom.take(pa.array(gi)))
        return out

    joined = unioned.groupby("cell").map_groups(join_tile, batch_format="pyarrow")
    # polygons were replicated across cells → a point on a tile edge can
    # match the same polygon once only (its own cell), so no dedup needed:
    # each point row lives in exactly one cell group.
    return joined


def pip_join_auto(points_ds, polygons, id_col: str, x_col: str = "lng",
                  y_col: str = "lat", how: str = "inner",
                  out_id_col: Optional[str] = None,
                  attach_geom_col: Optional[str] = None,
                  broadcast_limit_bytes: int = 64 << 20,
                  level: int = 12, **kw):
    """Size-routed PIP join: broadcast ``pip_join`` while the polygon side
    fits the per-actor budget, co-partitioned ``pip_join_tiled`` past it.

    This is the 100×-scale guard for the per-block geo pipelines: at
    continental coverage the blocks table is 10⁶-10⁷ polygons (GBs) — a
    broadcast pack per actor would exhaust worker heaps, so the join
    switches to the one-shuffle tiled shape instead.  Dataset polygon sides
    are materialized to the OBJECT STORE (spillable) to measure size; only
    the broadcast path ever driver-materializes them."""
    import ray.data as rd

    if isinstance(polygons, pa.Table):
        size = polygons.nbytes
        tbl, ds = polygons, None
    else:
        polygons = polygons.materialize()
        size = polygons.size_bytes() or 0
        tbl, ds = None, polygons
    if size <= broadcast_limit_bytes:
        if tbl is None:
            from .relational import ds_to_table
            tbl = ds_to_table(ds)
        return pip_join(points_ds, tbl, id_col=id_col, x_col=x_col,
                        y_col=y_col, how=how, out_id_col=out_id_col,
                        attach_geom_col=attach_geom_col, **kw)
    if ds is None:
        ds = rd.from_arrow(tbl)
    return pip_join_tiled(points_ds, ds, id_col=id_col, x_col=x_col,
                          y_col=y_col, level=level, out_id_col=out_id_col,
                          attach_geom_col=attach_geom_col, how=how)


# ------------------------------------------------------------------ kNN

class _GridIndex:
    """Uniform-grid bucket index over target points (broadcast state)."""

    def __init__(self, tx: np.ndarray, ty: np.ndarray, ids: list, cell: float):
        # pre-sort targets by id so that ascending INDEX order == ascending
        # id order: stable distance sorts then break exact-distance ties by
        # id for free (matches the ORDER BY dist, id oracle)
        ids_arr = np.asarray(ids)
        ord0 = np.argsort(ids_arr, kind="stable")
        self.tx, self.ty = tx[ord0], ty[ord0]
        self.ids = ids_arr[ord0].tolist()
        self.cell = cell
        gx = np.floor(self.tx / cell).astype(np.int64)
        gy = np.floor(self.ty / cell).astype(np.int64)
        self.buckets: dict[tuple[int, int], np.ndarray] = {}
        order = np.lexsort((gy, gx))
        keys = np.stack([gx[order], gy[order]], axis=1)
        if len(order):
            change = np.any(np.diff(keys, axis=0) != 0, axis=1)
            starts = np.concatenate([[0], np.flatnonzero(change) + 1, [len(order)]])
            for s, e in zip(starts, starts[1:]):
                self.buckets[(int(keys[s, 0]), int(keys[s, 1]))] = \
                    np.sort(order[s:e])

    def knn(self, px: float, py: float, k: int):
        """Ring expansion with distance refinement: grow rings until the
        kth-best exact distance is below the next ring's lower bound."""
        gx, gy = int(np.floor(px / self.cell)), int(np.floor(py / self.cell))
        best_idx: list[int] = []
        best_d: list[float] = []
        r = 0
        while True:
            # candidates on ring r
            cand = []
            if r == 0:
                cand.extend(self.buckets.get((gx, gy), ()))
            else:
                for dx in range(-r, r + 1):
                    for dy in (-r, r):
                        cand.extend(self.buckets.get((gx + dx, gy + dy), ()))
                for dy in range(-r + 1, r):
                    for dx in (-r, r):
                        cand.extend(self.buckets.get((gx + dx, gy + dy), ()))
            if cand:
                cand = np.asarray(cand, dtype=np.int64)
                d = np.sqrt((self.tx[cand] - px) ** 2 + (self.ty[cand] - py) ** 2)
                best_idx.extend(cand.tolist())
                best_d.extend(d.tolist())
            if len(best_d) >= k:
                # order by (distance, target id): exact-tie behavior matches
                # an ORDER BY dist, id oracle
                tie = np.asarray([self.ids[i] for i in best_idx])
                order = np.lexsort((tie, np.asarray(best_d)))[:k]
                kth = np.asarray(best_d)[order[-1]]
                # lower bound of ring r+1: r * cell (points at least this far)
                if kth <= r * self.cell:
                    bi = np.asarray(best_idx)[order]
                    bd = np.asarray(best_d)[order]
                    return bi, bd
            r += 1
            if r > 1_000_000:  # no targets at all
                return np.asarray(best_idx[:k], dtype=np.int64), np.asarray(best_d[:k])


class KNNJoiner:
    def __init__(self, packed_ref, x_col, y_col, k, id_col, out_prefix="nn"):
        tx, ty, ids, cell = ray.get(packed_ref) if isinstance(
            packed_ref, ray.ObjectRef) else packed_ref
        self.index = _GridIndex(tx, ty, ids, cell)
        self.x_col, self.y_col, self.k = x_col, y_col, k
        self.out_prefix = out_prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized common case: query points grouped by grid cell, one
        distance matrix per distinct cell against the 3×3-neighborhood
        candidates, stable top-k (tie-break by id via index pre-sort).
        Safe when the kth distance ≤ cell (ring-2 lower bound); points
        failing that bound fall back to per-point ring expansion."""
        ix = self.index
        k = self.k
        px = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        py = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(px)
        res_idx = np.full((n, k), -1, dtype=np.int64)
        res_d = np.full((n, k), np.inf)
        res_cnt = np.zeros(n, dtype=np.int64)

        gx = np.floor(px / ix.cell).astype(np.int64)
        gy = np.floor(py / ix.cell).astype(np.int64)
        order = np.lexsort((gy, gx))
        fallback: list[int] = []
        s = 0
        while s < n:
            e = s
            cx, cy = gx[order[s]], gy[order[s]]
            while e < n and gx[order[e]] == cx and gy[order[e]] == cy:
                e += 1
            grp = order[s:e]
            s = e
            cand_parts = [ix.buckets.get((cx + dx, cy + dy))
                          for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
            cand_parts = [c for c in cand_parts if c is not None]
            cand = np.sort(np.concatenate(cand_parts)) if cand_parts else \
                np.empty(0, dtype=np.int64)
            # sorted so ascending candidate POSITION == ascending id (index
            # order == id order after the constructor pre-sort): without it,
            # exact-distance ties across neighboring grid cells would break
            # by bucket iteration order, diverging from ORDER BY dist, id
            if len(cand) < k:
                fallback.extend(grp.tolist())
                continue
            d = np.sqrt((px[grp][:, None] - ix.tx[cand][None, :]) ** 2 +
                        (py[grp][:, None] - ix.ty[cand][None, :]) ** 2)
            # candidates ascend by id (index pre-sort) → stable sort ties
            sel = np.argsort(d, axis=1, kind="stable")[:, :k]
            kd = np.take_along_axis(d, sel, axis=1)
            ok = kd[:, k - 1] <= ix.cell  # ring-2 points are ≥ cell away
            good = grp[ok]
            res_idx[good] = cand[sel[ok]]
            res_d[good] = kd[ok]
            res_cnt[good] = k
            fallback.extend(grp[~ok].tolist())

        for i in fallback:
            bi, bd = ix.knn(float(px[i]), float(py[i]), k)
            m = len(bi)
            res_idx[i, :m] = bi
            res_d[i, :m] = bd
            res_cnt[i] = m

        rows = np.repeat(np.arange(n), res_cnt)
        flat_mask = (np.arange(k)[None, :] < res_cnt[:, None]).reshape(-1)
        flat_idx = res_idx.reshape(-1)[flat_mask]
        flat_d = res_d.reshape(-1)[flat_mask]
        ranks = (np.tile(np.arange(1, k + 1), n)[flat_mask]).astype(np.int32)
        ids_arr = np.asarray(ix.ids)
        out = batch.take(pa.array(rows))
        out = out.append_column(f"{self.out_prefix}_id",
                                pa.array(ids_arr[flat_idx]))
        out = out.append_column(f"{self.out_prefix}_rank", pa.array(ranks))
        out = out.append_column(f"{self.out_prefix}_dist",
                                pa.array(flat_d, type=pa.float64()))
        return out


def knn_join(points_ds, targets, k: int, id_col: str, x_col: str = "lng",
             y_col: str = "lat", tx_col: str = "lng", ty_col: str = "lat",
             cell_size: Optional[float] = None, out_prefix: str = "nn",
             concurrency=(1, 4), batch_size: int = 8192):
    """kNN join: each point gets its k nearest targets (broadcast target
    side, grid-bucket ring expansion + exact refinement)."""
    if isinstance(targets, pa.Table):
        tbl = targets
    else:
        from .relational import ds_to_table
        tbl = ds_to_table(targets)
    tx = tbl[tx_col].to_numpy(zero_copy_only=False).astype(np.float64)
    ty = tbl[ty_col].to_numpy(zero_copy_only=False).astype(np.float64)
    ids = tbl[id_col].to_pylist()
    if cell_size is None:
        # heuristic: ~match the target density so ring-0 holds a few points
        span = max(tx.max() - tx.min(), ty.max() - ty.min(), 1e-9)
        cell_size = span / max(1.0, np.sqrt(len(tx)))
    ref = ray.put((tx, ty, ids, float(cell_size)))
    return points_ds.map_batches(
        KNNJoiner,
        fn_constructor_kwargs=dict(packed_ref=ref, x_col=x_col, y_col=y_col,
                                   k=k, id_col=id_col, out_prefix=out_prefix),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True)


# ------------------------------------------------------------------ zonal

def zonal_stats(points_ds, polygons, id_col: str, value_col: str,
                x_col: str = "lng", y_col: str = "lat", **pip_kwargs):
    """Zonal aggregate: PIP join then per-zone count/sum/mean/min/max.
    Raster↔vector semantics = J1 with aggregate-over-cells (SURVEY §2.4)."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum
    joined = pip_join(points_ds, polygons, id_col, x_col, y_col,
                      how="inner", **pip_kwargs)
    return joined.groupby(id_col).aggregate(
        Count(alias_name="n"),
        Sum(value_col, alias_name="sum_value"),
        Mean(value_col, alias_name="mean_value"),
        Min(value_col, alias_name="min_value"),
        Max(value_col, alias_name="max_value"),
    )


def rasterize_points(points_ds, x_col: str = "lng", y_col: str = "lat",
                     value_col: Optional[str] = None, res: float = 0.01):
    """Vector→raster: aggregate points onto a uniform grid (pixel id =
    floor(x/res), floor(y/res)); partial aggregation inside map_batches
    before the small groupby shuffle."""
    def partial(batch: pa.Table) -> pa.Table:
        px = np.floor(batch[x_col].to_numpy(zero_copy_only=False) / res).astype(np.int64)
        py = np.floor(batch[y_col].to_numpy(zero_copy_only=False) / res).astype(np.int64)
        key = px * np.int64(1 << 32) + py
        vals = (batch[value_col].to_numpy(zero_copy_only=False)
                if value_col else np.ones(len(px)))
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uniq))
        np.add.at(sums, inv, vals)
        counts = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(counts, inv, 1)
        return pa.table({
            "pixel": uniq,
            "px": (uniq // (1 << 32)).astype(np.int64),
            "py": (uniq - (uniq // (1 << 32)) * (1 << 32)).astype(np.int64),
            "part_sum": sums, "part_n": counts,
        })

    from ray.data.aggregate import Max, Sum
    partials = points_ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("pixel").aggregate(
        Sum("part_sum", alias_name="value"),
        Sum("part_n", alias_name="n"),
        Max("px", alias_name="px"),
        Max("py", alias_name="py"),
    )


def raster_zonal(raster_ds, polygons, id_col: str, res: float = 0.01):
    """Raster→vector zonal: pixel centers PIP-joined to polygons, then
    aggregated per zone (value-weighted)."""
    def centers(batch: pa.Table) -> pa.Table:
        cx = (batch["px"].to_numpy(zero_copy_only=False) + 0.5) * res
        cy = (batch["py"].to_numpy(zero_copy_only=False) + 0.5) * res
        out = batch.append_column("cx", pa.array(cx))
        return out.append_column("cy", pa.array(cy))

    from ray.data.aggregate import Count, Sum
    with_centers = raster_ds.map_batches(centers, batch_format="pyarrow")
    joined = pip_join(with_centers, polygons, id_col, x_col="cx", y_col="cy",
                      how="inner")
    return joined.groupby(id_col).aggregate(
        Sum("value", alias_name="zone_value"),
        Sum("n", alias_name="zone_points"),
        Count(alias_name="zone_pixels"),
    )
