"""Fuzzy string matching / entity resolution over Ray Data.

The reference engine has no fuzzy-join operator; this family covers the
record-linkage step every real-world corpus pipeline needs (Splink /
Dedupe-style blocked comparison): multi-pass blocking keys bound the
candidate space, a vectorized edit-distance kernel verifies candidates,
and the verified pairs feed the existing connected-components kernel
(``stages.dedup.connected_components``) for entity clusters.

Scale design: blocking is the contract — candidate volume is governed by
the user-supplied block length, never all-pairs.  Each (block) group is
verified independently inside sharded group tasks (one Python task per
shard, not per block, via ``_sharded_multi_groups``), so the shuffle
moves only (block_key, id, name) rows and the DP runs on C-speed numpy
arrays vectorized ACROSS candidate pairs.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["batch_edit_distance", "blocked_fuzzy_pairs"]


def batch_edit_distance(a_list, b_list) -> np.ndarray:
    """Levenshtein distance for n (a, b) string pairs at once.

    Classic row-by-row DP, vectorized across PAIRS: for DP row i the
    in-row dependency ``new[j] = min(base[j], new[j-1] + 1)`` unrolls to
    ``new[j] = j + cummin(base[j] - j)``, so each of the max_len(a) row
    steps is O(pairs x max_len(b)) numpy work with no per-pair Python.
    Rows past a pair's own length are frozen with a mask; the answer is
    read at column len(b) per pair.  Matches DuckDB ``levenshtein`` on
    unicode codepoints (strings are decoded to codepoint matrices).
    """
    n = len(a_list)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    la = np.fromiter((len(s) for s in a_list), dtype=np.int32, count=n)
    lb = np.fromiter((len(s) for s in b_list), dtype=np.int32, count=n)
    ma, mb = int(la.max()), int(lb.max())
    A = np.zeros((n, max(ma, 1)), dtype=np.uint32)
    B = np.zeros((n, max(mb, 1)), dtype=np.uint32)
    for i, s in enumerate(a_list):          # one C-speed decode per string
        if s:
            A[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32)
    for i, s in enumerate(b_list):
        if s:
            B[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32)

    cols = np.arange(mb + 1, dtype=np.int32)
    dp = np.broadcast_to(cols, (n, mb + 1)).copy()
    for i in range(1, ma + 1):
        active = i <= la
        cost = (B != A[:, i - 1 : i]).astype(np.int32)      # (n, mb)
        base = np.empty((n, mb + 1), dtype=np.int32)
        base[:, 0] = i
        # substitution / deletion candidates (no in-row dependency yet)
        np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost, out=base[:, 1:])
        # insertion chain via the cummin unroll
        new = np.minimum.accumulate(base - cols, axis=1) + cols
        dp = np.where(active[:, None], new, dp)
    return dp[np.arange(n), lb].astype(np.int32)


def _block_rows(side: int, id_col: str, text_col: str, block_len: int):
    """Per-record blocking rows: pass P emits the first ``block_len``
    codepoints, pass S the first ``block_len`` of the REVERSED string
    (suffix equality == reversed-prefix equality; never un-reversed).
    For single-edit pairs on strings of length >= 2*block_len this
    two-pass scheme is recall-complete: one edit cannot alter both the
    prefix and the suffix window."""

    def fn(t: pa.Table) -> pa.Table:
        nm = t[text_col]
        pre = pc.utf8_slice_codeunits(nm, 0, block_len)
        rev = pc.utf8_reverse(nm)
        suf = pc.utf8_slice_codeunits(rev, 0, block_len)
        ids = t[id_col].combine_chunks()
        n = len(t)
        block = pa.concat_arrays([
            pc.binary_join_element_wise(
                pa.array(["P"] * n), pre.combine_chunks().cast(pa.string()), ""),
            pc.binary_join_element_wise(
                pa.array(["S"] * n), suf.combine_chunks().cast(pa.string()), ""),
        ])
        return pa.table({
            "block": block,
            "id": pa.concat_arrays([ids, ids]).cast(pa.int64()),
            "nm": pa.concat_arrays([nm.combine_chunks().cast(pa.string())] * 2),
            "side": pa.array(np.full(2 * n, side, dtype=np.int8)),
        })

    return fn


def blocked_fuzzy_pairs(left_ds, right_ds, id_col: str = "id",
                        text_col: str = "nm", max_dist: int = 1,
                        block_len: int = 6, num_shards: int = 64):
    """Blocked fuzzy join left x right -> Dataset(a, b, dist).

    ``a`` is the left id, ``b`` the right id (caller guarantees the id
    spaces are disjoint when clustering downstream); a pair is emitted
    when the two records share a prefix- or suffix-``block_len`` block
    and ``levenshtein(a.nm, b.nm) <= max_dist``.  Candidate pairs found
    by both passes are deduped with the coarse-bucketed pair dedup.

    Group verification is vectorized: cartesian left x right index
    arrays, a |len(a)-len(b)| <= max_dist length prefilter, then ONE
    ``batch_edit_distance`` call for the whole block.
    """
    from .dedup import _dedupe_pairs, _sharded_multi_groups

    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                       ("dist", pa.int64())])

    def empty() -> pa.Table:
        return schema.empty_table()

    def verify(g: pd.DataFrame) -> pa.Table:
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        if left.empty or right.empty:
            return empty()
        ln = left["nm"].to_numpy()
        rn = right["nm"].to_numpy()
        ia = np.repeat(np.arange(len(left)), len(right))
        ib = np.tile(np.arange(len(right)), len(left))
        lla = np.fromiter((len(s) for s in ln), np.int32, len(ln))
        llb = np.fromiter((len(s) for s in rn), np.int32, len(rn))
        ok = np.abs(lla[ia] - llb[ib]) <= max_dist
        ia, ib = ia[ok], ib[ok]
        if not len(ia):
            return empty()
        d = batch_edit_distance(ln[ia].tolist(), rn[ib].tolist())
        keep = d <= max_dist
        return pa.table({
            "a": pa.array(left["id"].to_numpy()[ia[keep]], type=pa.int64()),
            "b": pa.array(right["id"].to_numpy()[ib[keep]], type=pa.int64()),
            "dist": pa.array(d[keep].astype(np.int64)),
        })

    rows = left_ds.map_batches(
        _block_rows(0, id_col, text_col, block_len), batch_format="pyarrow"
    ).union(right_ds.map_batches(
        _block_rows(1, id_col, text_col, block_len), batch_format="pyarrow"))
    pairs = _sharded_multi_groups(rows, ["block"], "id", verify, empty,
                                  num_shards=num_shards)
    return _dedupe_pairs(pairs)
