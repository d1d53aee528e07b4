"""Similarity search over an embedding column (list<float>).

  ann_bruteforce   exact top-k cosine per query: numpy matmul per batch
                   against a broadcast query matrix (the baseline)
  ann_ivf          IVF-style scale path: k-means-lite coarse centroids,
                   per-batch probe of the nprobe nearest lists
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _as_matrix(col) -> np.ndarray:
    """(n, dim) float32 from a list<float> column — zero-copy flatten when
    the lists are uniform length (the embedding-table invariant), pylist
    fallback otherwise."""
    try:
        arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
        offs = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
        if len(offs) and (offs == offs[0]).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(offs), offs[0]).astype(np.float32,
                                                           copy=False)
    except (AttributeError, ValueError):
        pass
    return np.asarray(col.to_pylist(), dtype=np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class BruteForceScorer:
    """Actor stage: queries broadcast once (ray.put), normalized in
    __init__; per batch computes cosine vs every row and emits per-query
    partial top-k rows (merged by a tiny final groupby)."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids, qm = q
        self.qm = _normalize(np.asarray(qm, dtype=np.float32))
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.qm @ m.T                     # (nq, nb)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in top[qi]:
                out_q.append(self.qids[qi])
                out_id.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table({"query_id": out_q, "match_id": out_id,
                         "cosine": pa.array(out_s, type=pa.float64())})


def ann_bruteforce(ds, queries: np.ndarray, query_ids: list, k: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   concurrency=(1, 4)):
    """Exact top-k cosine: per-batch partials → global top-k per query via
    a small sort/groupby (only nq×k×nbatches rows shuffle)."""
    from .util import cached_callable
    ref = ray.put((list(query_ids), np.asarray(queries, dtype=np.float32)))
    # task-based with per-worker state cache: an actor pool would respawn
    # per execution and cap the stage at the pool size (query state is
    # cheap; the matmul wants full width)
    partials = ds.map_batches(
        cached_callable(BruteForceScorer, queries_ref=ref, k=k,
                        vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow")

    def topk(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["cosine", "match_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return partials.groupby("query_id").map_groups(topk, batch_format="pandas")


# --------------------------------------------------------------------- IVF

def train_centroids(ds, vec_col="embedding", n_centroids=16, iters=5, seed=3,
                    sample_limit=4096):
    """k-means-lite on a driver-side sample (training is tiny; assignment
    is distributed)."""
    sample = ds.limit(sample_limit).take_all()
    X = _normalize(np.asarray([r[vec_col] for r in sample], dtype=np.float32))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


class IVFScorer:
    """Task-cached stage: rows assigned to their nearest centroid list;
    each batch scores only rows whose list is probed by some query."""

    def __init__(self, state_ref, k, vec_col, id_col):
        self.qids, self.qm, self.C, self.probe = ray.get(state_ref)
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        lists = np.argmax(m @ self.C.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(self.qm)):
            mask = np.isin(lists, self.probe[qi])
            if not mask.any():
                continue
            sims = m[mask] @ self.qm[qi]
            sel = np.argsort(-sims)[: self.k]
            sub_ids = ids[mask]
            for j in sel:
                out_q.append(self.qids[qi])
                out_id.append(int(sub_ids[j]))
                out_s.append(float(sims[j]))
        return pa.table({"query_id": out_q, "match_id": out_id,
                         "cosine": pa.array(out_s, type=pa.float64())})


def ann_ivf(ds, queries: np.ndarray, query_ids: list, centroids: np.ndarray,
            k: int = 10, nprobe: int = 4, vec_col="embedding",
            id_col="vec_id", concurrency=(1, 4)):
    """IVF path: rows assigned to their nearest centroid list inside
    map_batches; each batch scores only rows whose list is probed by some
    query. Same output shape as ann_bruteforce (approximate)."""
    C = _normalize(np.asarray(centroids, dtype=np.float32))
    qm = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(qm @ C.T), axis=1)[:, :nprobe]
    ref = ray.put((list(query_ids), qm, C, probe))

    from .util import cached_callable
    partials = ds.map_batches(
        cached_callable(IVFScorer, state_ref=ref, k=k, vec_col=vec_col,
                        id_col=id_col),
        batch_format="pyarrow")

    def topk(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["cosine", "match_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return partials.groupby("query_id").map_groups(topk, batch_format="pandas")
