"""Relational operator helpers: broadcast joins, partitioned hash joins,
semi/anti joins, pre-aggregated groupbys, windowed aggregates.

These carry the reference's tabular semantics (sjoin/merge/groupby/concat,
SURVEY §2.4-2.6) onto Ray Data with the scale rules of the build brief:
broadcast small sides, pre-aggregate before shuffles, bucket both sides for
large-large joins.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def ds_to_table(ds) -> pa.Table:
    """Materialize a (small!) Dataset into one Arrow table WITHOUT the
    row-wise take_all()/from_pylist path: fetch the block refs and concat
    zero-copy."""
    if isinstance(ds, pa.Table):
        return ds
    tables = ray.get(ds.to_arrow_refs())
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return ray.get(ds.to_arrow_refs()[0])
    return pa.concat_tables(tables, promote_options="default")


def broadcast_join(big_ds, small, on: str, how: str = "inner",
                   suffix: str = "_r"):
    """Hash-join a big Dataset against a SMALL table: the small side is
    ray.put once and merged per batch (no shuffle)."""
    if not isinstance(small, (pa.Table, pd.DataFrame)):
        small = ds_to_table(small)
    sdf = small.to_pandas() if isinstance(small, pa.Table) else small
    ref = ray.put(sdf)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        return batch.merge(s, on=on, how=how, suffixes=("", suffix))

    return big_ds.map_batches(merge, batch_format="pandas")


def semi_join(big_ds, keys, on: str, anti: bool = False):
    """Semi/anti join: broadcast the key set, filter inside map_batches
    (guide pattern; reference analogue J5 ``_parcels.py:91-93``)."""
    if not isinstance(keys, (set, frozenset)):
        if hasattr(keys, "take_all"):
            keys = ds_to_table(keys.select_columns([on]))
        if isinstance(keys, pa.Table):
            keys = set(keys[on].to_pylist())
        else:
            keys = set(keys)
    ref = ray.put(keys)

    def f(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        col = batch[on].to_pylist()
        mask = np.array([c in ks for c in col])
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return big_ds.map_batches(f, batch_format="pyarrow")


def bucketed_hash_join(left_ds, right_ds, on: str, num_buckets: int = 32,
                       how: str = "inner"):
    """Large×large partitioned hash join: both sides get
    bucket = hash(key) % B, co-grouped by bucket, pairwise pandas merge per
    bucket (guide's portable pattern; salt hot keys upstream if skewed)."""
    def add_bucket(side):
        def f(batch: pa.Table) -> pa.Table:
            keys = batch[on].to_pylist()
            b = np.array([hash(k) % num_buckets for k in keys], dtype=np.int32)
            out = batch.append_column("_bucket", pa.array(b))
            return out.append_column("_bside", pa.array(
                np.full(batch.num_rows, side, dtype=np.int8)))
        return f

    l = left_ds.map_batches(add_bucket(0), batch_format="pyarrow")
    r = right_ds.map_batches(add_bucket(1), batch_format="pyarrow")

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group._bside == 0].dropna(axis=1, how="all")
        rg = group[group._bside == 1].dropna(axis=1, how="all")
        lg = lg.drop(columns=["_bucket", "_bside"], errors="ignore")
        rg = rg.drop(columns=["_bucket", "_bside"], errors="ignore")
        merged = lg.merge(rg, on=on, how=how, suffixes=("", "_r"))
        return merged

    # align the two sides' schemas (missing cols → nulls)
    types: dict[str, pa.DataType] = {}
    for sch in (l.schema(), r.schema()):
        for n, t in zip(sch.names, sch.types):
            types.setdefault(n, t)

    def align(t: pa.Table) -> pa.Table:
        for n in types:
            if n not in t.column_names:
                t = t.append_column(n, pa.nulls(t.num_rows, type=types[n]))
        return t.select(list(types))

    unioned = l.map_batches(align, batch_format="pyarrow").union(
        r.map_batches(align, batch_format="pyarrow"))
    return unioned.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def windowed_aggregate(events_ds, key_col: str, ts_col: str, value_col: str,
                       window_sec: int):
    """Tumbling-window aggregate: window id computed vectorized per batch
    (epoch // window), pre-aggregated per (key, window) inside the batch,
    then one small groupby merges partials (guide §Aggregation at scale)."""
    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        win = epoch // window_sec
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({key_col: keys, "window": win, "v": vals})
        agg = df.groupby([key_col, "window"], as_index=False).agg(
            part_sum=("v", "sum"), part_n=("v", "count"), part_max=("v", "max"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Max, Sum
    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby([key_col, "window"]).aggregate(
        Sum("part_sum", alias_name="sum_value"),
        Sum("part_n", alias_name="n_events"),
        Max("part_max", alias_name="max_value"),
    )
