"""Distributed graph algorithms over edge-list Datasets.

The reblocking graph kernels (``prclz_ray/graph/``) operate on per-block
graphs small enough for one task; these operators are the complement —
web-scale graphs (link graphs, similarity graphs) that live as
hash-partitioned (src, dst) edge Datasets and iterate via joins/groupbys,
the canonical BSP-on-a-dataflow shape.

PageRank power iteration, per round (E = edges, V = nodes):
  1. one bucketed co-shuffle join attaches the current rank to each edge
     by src (both sides hash-partitioned on the SAME key — the
     partitioning is reused every round);
  2. per-edge contribution r/outdeg, one groupby(dst) sum;
  3. the teleport term folds in by unioning a zero row per node BEFORE
     the sum (so in-linkless nodes survive without a second outer join).
Each round materializes — the barrier is inherent to power iteration.
Ranks round to ``round_dp`` decimals every round, making the float
trajectory identical across partitionings/merge orders and letting an
unrolled SQL twin reproduce it bit-for-bit at the compare grain.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def pagerank(edges_ds, nodes_ds, node_col: str = "v", src_col: str = "src",
             dst_col: str = "dst", iters: int = 3, damping: float = 0.85,
             round_dp: int = 9, num_buckets: int = 32,
             broadcast_limit_bytes: int = 64 << 20):
    """PageRank over an edge-list Dataset.  Returns a Dataset of
    (node_col, pagerank) after ``iters`` power-iteration rounds from the
    uniform vector.  Out-degrees are computed once and attached to the
    (materialized) edge set; dangling nodes (outdeg 0) simply contribute
    nothing, matching the unrolled-CTE SQL twin.

    Size guard (the repo's standard broadcast pattern): when the rank
    vector fits ``broadcast_limit_bytes`` (16 B/node), each round is ONE
    streaming map over the edges — ranks ship via ``ray.put``, per-batch
    contributions collapse to sparse (dst, c) partials, and the driver
    merges ≤ batch-bounded rows into the dense vector (same k×blocks
    merge shape as top-k).  Past the guard, the V-scale join path runs:
    per round one bucketed edges×ranks co-shuffle join + one
    groupby(dst) sum, nothing driver-sized."""
    from ray.data.aggregate import Count, Sum

    from .relational import bucketed_hash_join

    n = nodes_ds.count()
    teleport = (1.0 - damping) / n
    if n * 16 <= broadcast_limit_bytes:
        return _pagerank_broadcast(edges_ds, nodes_ds, node_col, src_col,
                                   dst_col, iters, damping, round_dp,
                                   teleport)

    outdeg = edges_ds.groupby(src_col).aggregate(Count(alias_name="outdeg"))
    edges_w = bucketed_hash_join(edges_ds, outdeg, on=src_col,
                                 num_buckets=num_buckets).materialize()

    r0 = np.round(1.0 / n, round_dp)

    def init(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch[node_col],
                         "r": pa.array(np.full(batch.num_rows, r0))})

    ranks = nodes_ds.map_batches(init, batch_format="pyarrow").materialize()

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch[node_col],
                         "c": pa.array(np.zeros(batch.num_rows))})

    base = nodes_ds.map_batches(zero_rows, batch_format="pyarrow")

    for _ in range(iters):
        def to_src(batch: pa.Table) -> pa.Table:
            return pa.table({src_col: batch[node_col], "r": batch["r"]})

        joined = bucketed_hash_join(
            edges_w, ranks.map_batches(to_src, batch_format="pyarrow"),
            on=src_col, num_buckets=num_buckets)

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch["r"].to_numpy(zero_copy_only=False)
            d = batch["outdeg"].to_numpy(zero_copy_only=False)
            return pa.table({node_col: batch[dst_col],
                             "c": pa.array(r / d)})

        sums = joined.map_batches(contrib, batch_format="pyarrow") \
            .union(base).groupby(node_col).aggregate(Sum("c", alias_name="c"))

        def formula(batch: pa.Table) -> pa.Table:
            c = batch["c"].to_numpy(zero_copy_only=False)
            r = np.round(teleport + damping * c, round_dp)
            return pa.table({node_col: batch[node_col], "r": pa.array(r)})

        ranks = sums.map_batches(formula, batch_format="pyarrow") \
            .materialize()

    def out(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch[node_col],
                         "pagerank": batch["r"]})

    return ranks.map_batches(out, batch_format="pyarrow")


def _pagerank_broadcast(edges_ds, nodes_ds, node_col, src_col, dst_col,
                        iters, damping, round_dp, teleport):
    import ray
    import ray.data as rd

    from .relational import ds_to_table

    ids = np.sort(np.concatenate(
        [b[node_col].to_numpy(zero_copy_only=False)
         for b in nodes_ds.iter_batches(batch_format="pyarrow")]
        or [np.array([], dtype=np.int64)]).astype(np.int64))
    ids_ref = ray.put(ids)
    V = len(ids)

    def sparse_partials(value_fn):
        """One streaming pass over edges → per-batch sparse (idx, c)
        partials, merged dense on the driver (rows bounded by
        min(V, batch) × blocks)."""
        def f(batch: pa.Table) -> pa.Table:
            _ids = ray.get(ids_ref)
            s = np.searchsorted(
                _ids, batch[src_col].to_numpy(zero_copy_only=False))
            d = np.searchsorted(
                _ids, batch[dst_col].to_numpy(zero_copy_only=False))
            idx, w = value_fn(s, d)
            uniq, inv = np.unique(idx, return_inverse=True)
            c = np.bincount(inv, weights=w)
            return pa.table({"i": pa.array(uniq.astype(np.int64)),
                             "c": pa.array(c)})

        t = ds_to_table(edges_ds.map_batches(f, batch_format="pyarrow"))
        dense = np.zeros(V)
        np.add.at(dense, t["i"].to_numpy(zero_copy_only=False),
                  t["c"].to_numpy(zero_copy_only=False))
        return dense

    outdeg = sparse_partials(lambda s, d: (s, np.ones(len(s))))
    outdeg_ref = ray.put(outdeg)

    r = np.round(np.full(V, 1.0 / V), round_dp)
    for _ in range(iters):
        r_ref = ray.put(r)

        def contrib(s, d, _r_ref=r_ref):
            rr = ray.get(_r_ref)
            od = ray.get(outdeg_ref)
            return d, rr[s] / od[s]

        c = sparse_partials(contrib)
        r = np.round(teleport + damping * c, round_dp)

    return rd.from_arrow(pa.table({node_col: pa.array(ids),
                                   "pagerank": pa.array(r)}))
