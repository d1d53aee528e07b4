"""Parcel orphan reunion + dissolve (reference ``_parcels.py:65-168``)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from prclz_ray.geom.core import shoelace_area
from prclz_ray.geom.dissolve import dissolve_rings
from prclz_ray.geom.predicates import point_in_ring
from prclz_ray.stages.parcels import check_parcels_qc, tessellate_block

# U-shaped block: [0,3]² minus the middle column [1,2]×[1,3]
U_BLOCK = np.array([[0, 0], [3, 0], [3, 3], [2, 3], [2, 1],
                    [1, 1], [1, 3], [0, 3], [0, 0]], dtype=float)
U_AREA = 9.0 - 2.0


class TestDissolve:
    def test_rect_union(self):
        a = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
        b = np.array([[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]], float)
        out = dissolve_rings([a, b])
        assert len(out) == 1
        assert abs(shoelace_area(out[0]) - 2.0) < 1e-12

    def test_grid_union_and_hole(self):
        sq = lambda x, y: np.array([[x, y], [x + 1, y], [x + 1, y + 1],
                                    [x, y + 1], [x, y]], float)
        out = dissolve_rings([sq(i, j) for i in range(2) for j in range(2)])
        assert len(out) == 1 and abs(shoelace_area(out[0]) - 4.0) < 1e-12
        ring8 = [sq(i, j) for i in range(3) for j in range(3)
                 if not (i == 1 and j == 1)]
        areas = sorted(round(shoelace_area(r), 9)
                       for r in dissolve_rings(ring8))
        assert areas == [-1.0, 9.0]     # CW hole + CCW shell


class TestOrphanReunion:
    def test_u_block_orphan_reunited(self):
        """Two buildings across the U's gap: the bisector strands a piece
        of one cell in the far arm — it must dissolve into the touching
        neighbor parcel, and total area must be preserved."""
        cents = np.array([[0.5, 2.5], [2.5, 0.5]])
        parcels = tessellate_block(U_BLOCK, cents)
        assert len(parcels) == 2                       # one parcel per bldg
        # every parcel is simple ring(s); total area == block area
        total = 0.0
        for bi, rings in parcels:
            for r in rings:
                a = shoelace_area(r)
                assert a > 0
                total += a
            # the parcel contains its own building
            assert any(point_in_ring(cents[bi][0], cents[bi][1], r)
                       for r in rings)
        assert abs(total - U_AREA) < 1e-6
        # the reunion dissolved the orphan: each parcel is ONE simple ring
        assert all(len(rings) == 1 for _, rings in parcels)

    def test_pinch_vertex_centroid_no_crash(self):
        """Pinched-cell split on an hourglass block (centroid on the pinch
        vertex) must not crash and must conserve area."""
        block = np.array([[0, 0], [4, 0], [2, 1], [4, 2], [0, 2], [2, 1],
                          [0, 0]], float)
        cents = np.array([[2.0, 1.0], [2.0, 1.8]])
        parcels = tessellate_block(block, cents)
        assert 1 <= len(parcels) <= 2
        total = sum(abs(shoelace_area(r)) for _, rs in parcels for r in rs)
        assert total <= 4.0 + 1e-9      # never exceeds the block area

    def test_degenerate_no_containing_piece(self, monkeypatch):
        """Regression (ADVICE r2): when NO split piece contains the
        centroid (centroid on a pinch vertex / outside-block edge case),
        the largest piece is kept as the parent.  The old code did
        ``own in orphans`` — numpy elementwise comparison inside ``in``
        raises ValueError — so this path crashed whenever reached."""
        from prclz_ray.stages import parcels as pmod
        monkeypatch.setattr(pmod, "point_in_ring",
                            lambda x, y, ring: False)
        block = np.array([[0, 0], [4, 0], [2, 1], [4, 2], [0, 2], [2, 1],
                          [0, 0]], float)
        cents = np.array([[2.0, 1.0], [2.0, 1.8]])
        parcels = pmod.tessellate_block(block, cents)
        assert len(parcels) >= 1
        total = sum(abs(shoelace_area(r)) for _, rs in parcels for r in rs)
        assert total <= 4.0 + 1e-9

    def test_convex_block_unchanged(self):
        block = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
        cents = np.array([[0.5, 1.0], [1.5, 1.0]])
        parcels = tessellate_block(block, cents)
        assert len(parcels) == 2
        assert all(len(rings) == 1 for _, rings in parcels)
        total = sum(shoelace_area(r) for _, rs in parcels for r in rs)
        assert abs(total - 4.0) < 1e-9


class TestFootprintTessellation:
    """Reference parity (momepy Tessellation over building POLYGONS,
    ``_parcels.py:52-63``): parcel boundaries run equidistant between
    footprint EDGES, not centroids."""
    BLOCK = np.array([[0, 0], [10, 0], [10, 4], [0, 4], [0, 0]], float)
    # A: elongated vertical rectangle; B: small square far right
    A = np.array([[1, 0.5], [2, 0.5], [2, 3.5], [1, 3.5], [1, 0.5]], float)
    B = np.array([[7, 1.75], [7.5, 1.75], [7.5, 2.25], [7, 2.25],
                  [7, 1.75]], float)

    def _parcel_of(self, parcels, bi):
        return dict(parcels)[bi]

    def test_boundary_follows_edges_not_centroids(self):
        from prclz_ray.stages.parcels import tessellate_block_footprints
        parcels = tessellate_block_footprints(self.BLOCK, [self.A, self.B])
        assert sorted(i for i, _ in parcels) == [0, 1]
        total = sum(shoelace_area(r) for _, rs in parcels for r in rs)
        assert abs(total - 40.0) < 1e-5
        # probe points between the centroid bisector (x=4.375) and the
        # edge bisector (x=4.5): footprint mode assigns them to A
        pa_rings = self._parcel_of(parcels, 0)
        pb_rings = self._parcel_of(parcels, 1)
        for (x, y) in [(4.45, 2.0), (4.6, 0.6)]:
            assert any(point_in_ring(x, y, r) for r in pa_rings), (x, y)
            assert not any(point_in_ring(x, y, r) for r in pb_rings), (x, y)
        # centroid mode puts the same probes in B — semantics differ
        cents = np.array([[1.5, 2.0], [7.25, 2.0]])
        cpar = tessellate_block(self.BLOCK, cents)
        cb = self._parcel_of(cpar, 1)
        for (x, y) in [(4.45, 2.0), (4.6, 0.6)]:
            assert any(point_in_ring(x, y, r) for r in cb), (x, y)
        # each parcel contains its own footprint
        assert any(point_in_ring(1.5, 2.0, r) for r in pa_rings)
        assert any(point_in_ring(7.25, 2.0, r) for r in pb_rings)

    def test_single_and_empty(self):
        from prclz_ray.stages.parcels import tessellate_block_footprints
        assert tessellate_block_footprints(self.BLOCK, []) == []
        one = tessellate_block_footprints(self.BLOCK, [self.A])
        assert len(one) == 1 and len(one[0][1]) == 1
        assert abs(shoelace_area(one[0][1][0]) - 40.0) < 1e-9

    def test_touching_buildings_share_wall(self):
        """Row-house pair sharing a wall at x=2: the parcel boundary runs
        along the shared wall (symmetric split via the inward nudge)."""
        from prclz_ray.stages.parcels import tessellate_block_footprints
        block = np.array([[0, 0], [4, 0], [4, 2], [0, 2], [0, 0]], float)
        h1 = np.array([[1, 0.5], [2, 0.5], [2, 1.5], [1, 1.5], [1, 0.5]], float)
        h2 = np.array([[2, 0.5], [3, 0.5], [3, 1.5], [2, 1.5], [2, 0.5]], float)
        parcels = tessellate_block_footprints(block, [h1, h2])
        assert sorted(i for i, _ in parcels) == [0, 1]
        total = sum(shoelace_area(r) for _, rs in parcels for r in rs)
        assert abs(total - 8.0) < 1e-5
        a0 = sum(shoelace_area(r) for r in dict(parcels)[0])
        a1 = sum(shoelace_area(r) for r in dict(parcels)[1])
        assert abs(a0 - a1) < 0.1       # symmetric split
        # probes on either side of the wall
        assert any(point_in_ring(1.9, 1.0, r) for r in dict(parcels)[0])
        assert any(point_in_ring(2.1, 1.0, r) for r in dict(parcels)[1])

    def test_u_block_footprint_orphan_reunited(self):
        """Non-convex block: stranded fragments reunite exactly as in the
        centroid path."""
        from prclz_ray.stages.parcels import tessellate_block_footprints
        sq = lambda cx, cy, w: np.array(
            [[cx - w, cy - w], [cx + w, cy - w], [cx + w, cy + w],
             [cx - w, cy + w], [cx - w, cy - w]], float)
        parcels = tessellate_block_footprints(
            U_BLOCK, [sq(0.5, 2.5, 0.2), sq(2.5, 0.5, 0.2)])
        assert sorted(i for i, _ in parcels) == [0, 1]
        total = sum(shoelace_area(r) for _, rs in parcels for r in rs)
        assert abs(total - U_AREA) < 1e-4


class TestParcelsQC:
    def test_qc_flags_multibuilding_parcel(self):
        from prclz_ray.geom import wkb
        big = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
        small = np.array([[5, 0], [6, 0], [6, 1], [5, 1], [5, 0]], float)
        parcels = pa.table({
            "parcel_id": ["p_big", "p_small"],
            "geometry": pa.array([wkb.polygon(big), wkb.polygon(small)],
                                 type=pa.binary()),
        })
        sq = lambda x, y: np.array([[x, y], [x + .2, y], [x + .2, y + .2],
                                    [x, y + .2], [x, y]], float)
        bldgs = pa.table({
            "bldg_id": ["b0", "b1", "b2"],
            "geometry": pa.array([wkb.polygon(sq(1, 1)), wkb.polygon(sq(2, 2)),
                                  wkb.polygon(sq(5.2, 0.2))],
                                 type=pa.binary()),
        })
        bad = check_parcels_qc(parcels, rd.from_arrow(bldgs)).to_pandas()
        assert list(bad["parcel_id"]) == ["p_big"]
        assert list(bad["n"]) == [2]
