"""Block-extraction strategy parity: the reference's default
BufferedLineDifference (``blocks/_methods.py:17-40``) vs
IntersectionPolygonization (``:43-106``) — documented-equal strategies must
produce the same block decomposition on the synth grid."""
import numpy as np

from prclz_ray.geom import wkb
from prclz_ray.geom.core import shoelace_area
from prclz_ray.io import synth
from prclz_ray.stages.blocks import (BufferedLineDifference,
                                     IntersectionPolygonization)


def _region_inputs():
    reg = synth.regions_table()
    lin = synth.lines_table()
    gadm = reg["gadm_code"][0].as_py()
    rring = wkb.decode(reg["geometry"][0].as_py())[1][0]
    lines = [wkb.decode(b.as_py())[1]
             for g, b in zip(lin["gadm_code"].to_pylist(), lin["geometry"])
             if g == gadm]
    return rring, lines


def test_strategies_same_block_count():
    rring, lines = _region_inputs()
    ip = IntersectionPolygonization().extract(rring, lines)
    bld = BufferedLineDifference(epsilon=1e-3).extract(rring, lines)
    assert len(ip) == len(bld) == 16     # 4×4 grid per synth region

    # each buffered face is the ε-shrunk version of exactly one
    # polygonized face: match by centroid, compare areas
    def cent(f):
        return tuple(np.round(f[:-1].mean(axis=0), 3))

    by_c = {cent(f): abs(shoelace_area(f)) for f in ip}
    for f in bld:
        c = cent(f)
        assert c in by_c
        a_full, a_shrunk = by_c[c], abs(shoelace_area(f))
        assert a_shrunk < a_full                # strictly inside the tube
        assert a_full - a_shrunk < 4 * 1e-3 * np.sqrt(a_full) * 2


def test_buffered_no_roads_returns_region():
    rring, _ = _region_inputs()
    out = BufferedLineDifference(epsilon=1e-3).extract(rring, [])
    assert len(out) == 1
    assert abs(abs(shoelace_area(out[0])) - abs(shoelace_area(rring))) < 1e-9
