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


def triangle_count(edges_ds, src_col: str = "src",
                   dst_col: str = "dst") -> int:
    """Distributed triangle counting via common-neighbor (wedge)
    counting: normalize to distinct undirected edges, explode to
    adjacency rows, count common neighbors per unordered node pair with
    the vectorized ``cooccurrence_pairs`` kernel, then sum W(b,c) over
    the EDGE set — every triangle is counted once per edge, so
    triangles = Σ/3.  One adjacency groupby + one pair-key join; the
    wedge table is the standard O(Σ deg²) intermediate (cap disabled —
    correctness requires every neighbor pair).

    SQL twin: the classic 3-way self-join on (a<b) edges."""
    import pyarrow.compute as pc

    from .relational import (bucketed_hash_join, cooccurrence_pairs,
                             ds_to_table)

    def norm(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = batch[dst_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        a, b = np.minimum(s, d), np.maximum(s, d)
        t = pa.table({"ea": pa.array(a), "eb": pa.array(b)})
        return t.group_by(["ea", "eb"]).aggregate([])

    und = edges_ds.map_batches(norm, batch_format="pyarrow") \
        .groupby(["ea", "eb"]).map_groups(
            lambda g: g.head(1), batch_format="pandas")

    def adj(batch) -> pa.Table:
        t = pa.Table.from_pandas(batch, preserve_index=False) \
            if not isinstance(batch, pa.Table) else batch
        ea = t["ea"].to_numpy(zero_copy_only=False).astype(np.int64)
        eb = t["eb"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": pa.array(np.concatenate([ea, eb])),
            "nbr": pa.array(np.concatenate([eb, ea]))})

    und = und.materialize()
    wedges = cooccurrence_pairs(
        und.map_batches(adj, batch_format="pyarrow"),
        key_col="node", val_col="nbr", max_vals_per_key=None)

    # keep only wedge pairs that are themselves edges: one bucketed join
    # on the (a,b) pair — a space-joined STRING key (int packing would
    # overflow past 2^32 node ids; space is unambiguous for integers)
    def pairkey(t: pa.Table, a: str, b: str) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t[a], pa.string()), pc.cast(t[b], pa.string()), " ")
        return t.append_column("_pk", k)

    w = wedges.map_batches(lambda t: pairkey(t, "a", "b"),
                           batch_format="pyarrow")
    e = und.map_batches(lambda t: pairkey(t, "ea", "eb"),
                        batch_format="pyarrow")
    j = bucketed_hash_join(w, e, on="_pk")
    total = ds_to_table(j.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(np.sum(t["n_keys"].to_numpy(zero_copy_only=False)))],
            type=pa.int64())}), batch_format="pyarrow")).to_pandas()
    if "s" not in total.columns:  # triangle-free graph: empty join
        return 0
    return int(total["s"].sum()) // 3
