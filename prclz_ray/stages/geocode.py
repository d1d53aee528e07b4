"""Geocode stage: derive geometry from page payloads.

Graft analogue of prclz's ``parse_ona_text`` survey-format parser
(``utils.py:12-15`` — text payload → geometry): pages embed
``<meta name="geo" content="{lat};{lng}">`` and optionally a building
footprint ring in ``<div id="footprint" data-ring="x y x y ...">``.
Emits ``lat``/``lng`` float64 columns + ``footprint`` (WKB polygon or null).

Stateful actor stage (compiled regexes per actor), zero-copy Arrow in/out.
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..geom import wkb

_GEO = re.compile(rb'<meta name="geo" content="([-0-9.]+);([-0-9.]+)"')
_RING = re.compile(rb'<div id="footprint" data-ring="([-0-9. ]+)"')


class Geocoder:
    def __init__(self):
        self.geo = re.compile(rb'<meta name="geo" content="([-0-9.]+);([-0-9.]+)"')
        self.ring = re.compile(rb'<div id="footprint" data-ring="([-0-9. ]+)"')

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"]
        n = len(htmls)
        lat = np.full(n, np.nan)
        lng = np.full(n, np.nan)
        rings: list = [None] * n
        for i in range(n):
            h = htmls[i].as_py()
            m = self.geo.search(h)
            if m:
                lat[i] = float(m.group(1))
                lng[i] = float(m.group(2))
            r = self.ring.search(h)
            if r:
                vals = np.array(r.group(1).split(), dtype=np.float64)
                rings[i] = wkb.polygon(vals.reshape(-1, 2))
        out = batch.append_column("lat", pa.array(lat, type=pa.float64()))
        out = out.append_column("lng", pa.array(lng, type=pa.float64()))
        out = out.append_column("footprint", pa.array(rings, type=pa.binary()))
        return out


def geocode_batch(batch: pa.Table) -> pa.Table:
    """Stateless-function variant (for small/one-off uses)."""
    return Geocoder()(batch)
