"""Geohash tiling index (Niemeyer base-32 geohash) — the third standard
cell index alongside S2 (`index/s2.py`) and the raster grid: bit-interleaved
lon/lat interval halving, 5 bits per character.

Fully vectorized encode: the first ``b`` halving bits of a coordinate are
exactly the top bits of ``floor(norm * 2^b)``, so the whole encode is two
float→int quantizations + a shift/mask interleave loop over BIT POSITIONS
(≤ 60 iterations of O(n) numpy ops, no per-row Python).  The SQL twin
reproduces the identical arithmetic with generate_series bit extraction,
which is what makes cell assignment hash-checkable.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lon: np.ndarray, lat: np.ndarray,
                   precision: int = 6) -> np.ndarray:
    """Vectorized geohash of float64 lon/lat arrays → object array of
    ``precision``-char strings."""
    bits = precision * 5
    nlon = (bits + 1) // 2
    nlat = bits // 2
    x = (lon + 180.0) / 360.0
    y = (lat + 90.0) / 180.0
    li = np.minimum(np.floor(x * float(1 << nlon)),
                    float((1 << nlon) - 1)).astype(np.int64)
    la = np.minimum(np.floor(y * float(1 << nlat)),
                    float((1 << nlat) - 1)).astype(np.int64)
    code = np.zeros(len(li), dtype=np.int64)
    for i in range(bits):
        if i % 2 == 0:  # even interleave positions take lon bits
            b = (li >> (nlon - 1 - i // 2)) & 1
        else:
            b = (la >> (nlat - 1 - i // 2)) & 1
        code = (code << 1) | b
    # split into 5-bit groups → base32 chars, vectorized via chararray
    chars = np.empty((precision, len(code)), dtype="U1")
    alphabet = np.array(list(BASE32))
    for c in range(precision):
        shift = 5 * (precision - 1 - c)
        chars[c] = alphabet[(code >> shift) & 31]
    out = chars[0]
    for c in range(1, precision):
        out = np.char.add(out, chars[c])
    return out.astype(object)


def geohash_batch(batch: pa.Table, lon_col: str = "lon",
                  lat_col: str = "lat", precision: int = 6,
                  out_col: str = "geohash") -> pa.Table:
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    gh = geohash_encode(lon.astype(np.float64), lat.astype(np.float64),
                        precision)
    return batch.append_column(out_col, pa.array(gh, type=pa.string()))


def geohash_sql_expr(lon_expr: str, lat_expr: str,
                     precision: int = 6) -> str:
    """DuckDB twin of ``geohash_encode`` for one point expression —
    returns a scalar SQL subquery string computing the identical
    geohash (same quantization arithmetic, bit extraction via
    generate_series, STRING_AGG in bit-group order)."""
    bits = precision * 5
    nlon = (bits + 1) // 2
    nlat = bits // 2
    return f"""(
  SELECT STRING_AGG(ch, '' ORDER BY ci) FROM (
    SELECT i // 5 AS ci,
           substr('{BASE32}',
                  CAST(SUM(b * (1 << (4 - (i % 5)))) AS INT) + 1, 1)
             AS ch
    FROM (
      SELECT i,
             CASE WHEN i % 2 = 0
               THEN (LEAST(CAST(FLOOR((({lon_expr}) + 180.0) / 360.0
                      * {1 << nlon}) AS BIGINT), {(1 << nlon) - 1})
                     >> ({nlon} - 1 - i // 2)) & 1
               ELSE (LEAST(CAST(FLOOR((({lat_expr}) + 90.0) / 180.0
                      * {1 << nlat}) AS BIGINT), {(1 << nlat) - 1})
                     >> ({nlat} - 1 - i // 2)) & 1
             END AS b
      FROM generate_series(0, {bits - 1}) AS t(i))
    GROUP BY i // 5)
  )"""
