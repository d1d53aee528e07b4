"""Tiling utilities: cell assignment over Arrow batches, per-cell count
histograms and skew salting (SURVEY §4 "Skew / stragglers": detect hot
cells via groupby cell-count histogram, salt them before the shuffle).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import s2


def assign_cells_batch(batch: pa.Table, x_col: str = "lng", y_col: str = "lat",
                       level: int = s2.DEFAULT_LEVEL,
                       out_col: str = "cell") -> pa.Table:
    """map_batches-ready: append a uint64 S2 ``cell`` column."""
    lng = batch[x_col].to_numpy(zero_copy_only=False)
    lat = batch[y_col].to_numpy(zero_copy_only=False)
    cid = s2.lnglat_to_cellid(lng, lat, level)
    return batch.append_column(out_col, pa.array(cid, type=pa.uint64()))


def cell_histogram(ds, cell_col: str = "cell"):
    """Per-cell row counts (a small aggregate → safe to materialize).
    Reference analogue: none — prclz has no skew handling (SURVEY §4);
    this is the north rule's "groupby cell-count histograms"."""
    return ds.groupby(cell_col).count()


def salt_plan(hist_table: pa.Table, cell_col: str = "cell",
              count_col: str = "count()", threshold: int = 100_000,
              max_salt: int = 16) -> dict[int, int]:
    """cell → number of salt shards for cells whose count exceeds the
    threshold. Applied as ``salt = hash(row_key) % k`` inside the tile
    shuffle so one mega-tile fans out over k tasks."""
    cells = hist_table[cell_col].to_numpy(zero_copy_only=False)
    counts = hist_table[count_col].to_numpy(zero_copy_only=False)
    plan = {}
    for c, n in zip(cells, counts):
        if n > threshold:
            plan[int(c)] = int(min(max_salt, int(np.ceil(n / threshold))))
    return plan


def apply_salt_batch(batch: pa.Table, plan: dict[int, int],
                     cell_col: str = "cell", key_col: str | None = None,
                     out_col: str = "cell_salted") -> pa.Table:
    """Append a salted partition key: hot cells split into k sub-shards
    (deterministic by key hash so a group never spans shards when the key
    is the group key)."""
    cells = batch[cell_col].to_numpy(zero_copy_only=False)
    salt = np.zeros(len(cells), dtype=np.uint64)
    if plan:
        if key_col is not None:
            # stable across worker processes (python hash() is per-process
            # randomized — it would split a group across salt shards)
            import pandas as pd
            hashes = pd.util.hash_array(
                batch[key_col].to_numpy(zero_copy_only=False))
        else:
            hashes = np.arange(len(cells), dtype=np.uint64)
        for c, k in plan.items():
            m = cells == np.uint64(c)
            salt[m] = hashes[m] % np.uint64(k)
    salted = cells * np.uint64(64) + salt  # k ≤ 16 < 64 keeps keys distinct
    return batch.append_column(out_col, pa.array(salted, type=pa.uint64()))
