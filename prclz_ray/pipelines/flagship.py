"""Flagship pipeline: pages corpus → text extraction → geocode → S2 tile
assignment → PIP join vs admin regions → skew histogram → partitioned,
resumable output.

This is the north-star headline workload (BASELINE.json metric:
"spatial-join + tile-assignment throughput (rows/sec) ... byte-identical
per-url text"). Every stage is a streaming Ray Data transform:

  read_parquet(pages)                              (column-pruned scan)
  → PageParser actor pool (one pass over html:     text + lat/lng + footprint,
    html projected away immediately — SURVEY §7.5.6)
  → url dedup, latest warc_ts wins                 (narrow-table shuffle AFTER
    html is dropped; dedup of the wide column is never shuffled)
  → S2 cell assign (vectorized encode)
  → PIP join vs broadcast regions (STRtree per actor)
  → per-cell histogram → salt plan (skew evidence)
  → partitioned resumable write + manifest
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom import wkb
from ..index import s2, tiling
from ..stages.extract_text import _ENTITIES


class PageParser:
    """Fused extract+geocode actor: ONE pass over the wide ``html`` column
    producing text (byte-identical per url), lat/lng and the optional
    footprint — then drops html so no later stage carries it."""

    def __init__(self, keep_footprint: bool = True):
        self.script = re.compile(rb"<(script|style)\b.*?</\1>", re.S | re.I)
        self.tag = re.compile(rb"<[^>]*>")
        self.ws = re.compile(rb"\s+")
        self.geo = re.compile(rb'<meta name="geo" content="([-0-9.]+);([-0-9.]+)"')
        self.ring = re.compile(rb'<div id="footprint" data-ring="([-0-9. ]+)"')
        self.keep_footprint = keep_footprint

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"]
        n = len(htmls)
        texts = [""] * n
        lat = np.full(n, np.nan)
        lng = np.full(n, np.nan)
        rings: list = [None] * n
        for i in range(n):
            h = htmls[i].as_py()
            s = self.script.sub(b" ", h)
            s = self.tag.sub(b" ", s)
            for ent, ch in _ENTITIES:
                s = s.replace(ent, ch)
            texts[i] = self.ws.sub(b" ", s).strip().decode("utf-8", errors="replace")
            m = self.geo.search(h)
            if m:
                lat[i] = float(m.group(1))
                lng[i] = float(m.group(2))
            if self.keep_footprint:
                r = self.ring.search(h)
                if r:
                    vals = np.array(r.group(1).split(), dtype=np.float64)
                    rings[i] = wkb.polygon(vals.reshape(-1, 2))
        out = batch.drop_columns(["html"])
        out = out.append_column("text_extracted", pa.array(texts, type=pa.string()))
        out = out.append_column("lat", pa.array(lat))
        out = out.append_column("lng", pa.array(lng))
        if self.keep_footprint:
            out = out.append_column("footprint", pa.array(rings, type=pa.binary()))
        return out


def dedup_latest_by_url(ds):
    """Exact url dedup, latest ``warc_ts`` wins (SURVEY §2.7 D6; the
    ``warc_ts`` tie-break rule of §2.10). Hash-partition groupby on the
    narrow post-extraction table."""
    def latest(group: pa.Table) -> pa.Table:
        i = pc.index(group["warc_ts"], pc.max(group["warc_ts"])).as_py()
        return group.slice(i, 1)

    return ds.groupby("url").map_groups(latest, batch_format="pyarrow")


def assign_cells(ds, level: int = s2.DEFAULT_LEVEL):
    return ds.map_batches(
        lambda b: tiling.assign_cells_batch(b, "lng", "lat", level),
        batch_format="pyarrow", zero_copy_batch=True)


def run_flagship(pages_ds, regions_tbl: pa.Table, level: int = s2.DEFAULT_LEVEL,
                 out_dir: str | None = None, concurrency=(2, 8),
                 salt_threshold: int = 50_000):
    """Returns (joined_ds, info dict). joined_ds streams; nothing is
    materialized except the small per-cell histogram (and the optional
    resumable write consumes the stream)."""
    from ..stages.joins import pip_join

    parsed = pages_ds.map_batches(
        PageParser, batch_format="pyarrow", batch_size=2048,
        concurrency=concurrency, zero_copy_batch=True)
    deduped = dedup_latest_by_url(parsed)
    tiled = assign_cells(deduped, level)
    joined = pip_join(tiled, regions_tbl, id_col="gadm_code",
                      x_col="lng", y_col="lat", how="left")

    info: dict = {"level": level}
    if out_dir is not None:
        from ..runtime import checkpoint
        hist = tiling.cell_histogram(joined).to_pandas()
        plan = tiling.salt_plan(
            pa.Table.from_pandas(hist), threshold=salt_threshold)
        info["hot_cells"] = plan
        info["n_cells"] = len(hist)
        # partition by region for the resumable sink (cells per region are
        # contiguous; region is the operator-friendly partition size here)
        sink = joined.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("gadm_code"), "gadm_code",
                pc.fill_null(t["gadm_code"], "UNMATCHED")),
            batch_format="pyarrow")
        info["write"] = checkpoint.write_partitioned_resumable(
            sink, out_dir, "gadm_code")
    return joined, info
