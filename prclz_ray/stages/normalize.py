"""Schema-normalizing map stages (SURVEY §2.2 M1/M15).

  parse_ona_text   — survey-app export "y x t z; …" → Polygon WKB
                     (prclz ``utils.py:12-15``)
  clean_gadm_cols  — pick the highest GID_n level column, standardize to
                     (gadm_code, gadm) (prclz ``etl/_split_buildings.py:9-23``,
                     level resolution w/ fallback ``utils.py:17-24``)
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..geom import wkb

_GID = re.compile(r"^GID_(\d+)$")


def parse_ona_text(text: str) -> bytes | None:
    """"lat lng alt acc; lat lng alt acc; …" → Polygon WKB (lng=x, lat=y,
    matching the reference's (float(x), float(y)) for (y x) pairs —
    ``utils.py:14`` swaps to (x, y) order)."""
    pts = []
    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        fields = part.split()
        if len(fields) < 2:
            return None
        lat, lng = float(fields[0]), float(fields[1])
        pts.append((lng, lat))
    if len(pts) < 3:
        return None
    return wkb.polygon(np.asarray(pts, dtype=np.float64))


def parse_ona_batch(batch: pa.Table, text_col: str = "geo_text") -> pa.Table:
    geoms = [None if t is None else parse_ona_text(t)
             for t in batch[text_col].to_pylist()]
    return batch.append_column("geometry", pa.array(geoms, type=pa.binary()))


def resolve_gadm_level(column_names, target_level: int | None = None) -> str:
    """Highest GID_n present, or the requested level with fallback to the
    highest available (reference ``utils.py:17-24`` warns and falls back)."""
    levels = {int(m.group(1)): c for c in column_names
              for m in [_GID.match(c)] if m}
    if not levels:
        raise ValueError("no GID_n columns present")
    if target_level is not None and target_level in levels:
        return levels[target_level]
    return levels[max(levels)]


def clean_gadm_cols(batch: pa.Table, target_level: int | None = None) -> pa.Table:
    """M15: project (GID_*, geometry, …) → (gadm_code, gadm, geometry…)."""
    code_col = resolve_gadm_level(batch.column_names, target_level)
    gadm_col = "GID_0" if "GID_0" in batch.column_names else code_col
    keep = [c for c in batch.column_names if not _GID.match(c)]
    out = batch.select(keep)
    out = out.append_column("gadm_code", batch[code_col].cast(pa.string()))
    return out.append_column("gadm", batch[gadm_col].cast(pa.string()))
