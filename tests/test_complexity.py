"""k-complexity kernel tests: structural goldens + conformance against the
reference's own DJI golden fixture
(``example_data/complexity/Africa/DJI/complexity_DJI.1.1_1.csv``).

The DJI check runs the kernel on the exact golden inputs (block polygon +
centroids_multipoint from the fixture) and compares k. The engine's own
Voronoi (vs the reference's pytess) yields 158/196 exact matches with all
diffs within ±2 (152 before the 2-site aspect gate in voronoi_cells, 137
before the 7-decimal snap); the thresholds below pin that floor.
No Ray session needed (pure kernel)."""
import os

import numpy as np
import pandas as pd
import pytest

from prclz_ray.geom import wkb
from prclz_ray.stages.complexity import block_complexity

DJI = "/root/reference/example_data/complexity/Africa/DJI/complexity_DJI.1.1_1.csv"


def test_structural_goldens():
    block = np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], dtype=float)
    assert block_complexity(block, np.empty((0, 2))) == 0
    assert block_complexity(block, np.array([[5.0, 5.0]])) == 0
    ang = np.linspace(0, 2 * np.pi, 9)[:-1]
    ring1 = np.stack([5 + 3 * np.cos(ang), 5 + 3 * np.sin(ang)], axis=1)
    # one ring of buildings: dual is an 8-cycle, whose single inner face
    # survives one more level as an isolated dual node (the reference's
    # self-match self-loop, ``topology.py:367-373``) -> k = 2
    assert block_complexity(block, ring1) == 2


def test_boundary_anchor_excluded():
    block = np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], dtype=float)
    # anchors exactly on block corners are dropped (s0 has no faces)
    pts = np.array([(0.0, 0.0), (10.0, 0.0), (5.0, 5.0), (4.0, 5.0)])
    k = block_complexity(block, pts)
    assert k >= 0  # runs; boundary anchors contribute no cells


@pytest.mark.skipif(not os.path.exists(DJI), reason="reference fixture absent")
def test_dji_golden_conformance():
    df = pd.read_csv(DJI)
    ok = 0
    diffs = []
    for _, row in df.iterrows():
        t, v = wkb.decode(wkb.from_wkt(row.geometry))
        ring = v[0] if t == wkb.POLYGON else v[0][0]
        _, vc = wkb.decode(wkb.from_wkt(row.centroids_multipoint))
        k = block_complexity(ring, np.asarray(vc).reshape(-1, 2))
        diffs.append(abs(k - row.complexity))
        ok += k == row.complexity
    assert ok >= 156, f"exact k matches regressed: {ok}/196"
    assert max(diffs) <= 2
    assert float(np.mean(diffs)) <= 0.24
