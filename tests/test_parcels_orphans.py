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
