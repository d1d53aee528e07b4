"""M8/M9/M10 reblock prep semantics (reference ``_reblock.py:21-132``)."""
import numpy as np
import pytest

from prclz_ray.stages.reblock import (add_outside_node,
                                      drop_buildings_intersecting_block,
                                      snap_block)
from prclz_ray.geom.core import convex_hull, ensure_closed
from prclz_ray.geom.predicates import point_in_ring


def grid_parcels(n=3):
    """Unit square split into n×n cell parcels."""
    rings = []
    for i in range(n):
        for j in range(n):
            x0, y0 = i / n, j / n
            x1, y1 = (i + 1) / n, (j + 1) / n
            rings.append(np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1],
                                   [x0, y0]]))
    return rings


BLOCK = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)


class TestDropBuildings:
    def test_boundary_parcels_dropped(self):
        """Reference semantics: only buildings in parcels NOT touching the
        block boundary stay (``_reblock.py:62-69``).  In a 3×3 grid only
        the center cell is interior."""
        rings = grid_parcels(3)
        cents = np.array([[(i + 0.5) / 3, (j + 0.5) / 3]
                          for i in range(3) for j in range(3)])
        kept, unmatched = drop_buildings_intersecting_block(rings, cents, BLOCK)
        assert unmatched == 0
        assert kept.shape == (1, 2)
        assert np.allclose(kept[0], [0.5, 0.5])

    def test_unmatched_counted_and_dropped(self):
        rings = grid_parcels(3)
        cents = np.array([[0.5, 0.5], [5.0, 5.0]])  # second outside all
        kept, unmatched = drop_buildings_intersecting_block(rings, cents, BLOCK)
        assert unmatched == 1
        assert kept.shape == (1, 2)

    def test_all_connected_returns_empty(self):
        rings = grid_parcels(2)  # every cell touches the boundary
        cents = np.array([[0.25, 0.25], [0.75, 0.75]])
        kept, _ = drop_buildings_intersecting_block(rings, cents, BLOCK)
        assert kept.shape == (0, 2)


class TestOutsideNode:
    def test_l_shape_point_outside_hull_inside_rect(self):
        """L-shaped block: rect − hull is nonempty; the dummy point must be
        outside the block hull (ref ``_reblock.py:85-89``)."""
        L = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2], [0, 0]],
                     dtype=float)
        out = add_outside_node(L, np.zeros((0, 2)))
        assert out.shape == (1, 2)
        p = out[0]
        hull = ensure_closed(convex_hull(L[:-1]))
        assert not point_in_ring(p[0], p[1], hull, boundary=False)
        # inside the (axis-aligned, for this L) min rotated rect
        assert -1e-9 <= p[0] <= 2 + 1e-9 and -1e-9 <= p[1] <= 2 + 1e-9

    def test_rect_block_nudges_outside(self):
        out = add_outside_node(BLOCK, np.array([[0.5, 0.5]]))
        assert out.shape == (2, 2)
        p = out[-1]
        assert not point_in_ring(p[0], p[1], BLOCK, boundary=True)

    def test_appends_not_replaces(self):
        cents = np.array([[0.2, 0.2], [0.8, 0.8]])
        out = add_outside_node(BLOCK, cents)
        assert out.shape == (3, 2)
        assert np.allclose(out[:2], cents)


class TestSnapBlock:
    def test_snaps_eps_shift_exactly(self):
        """Block coords shifted by 1e-9 must snap EXACTLY onto parcel
        vertices (ref ``_reblock.py:93-132``: downstream matches graph
        nodes, so bitwise equality is the requirement)."""
        rings = grid_parcels(2)
        shifted = BLOCK + 1e-9
        snapped = snap_block(shifted, rings)
        P = np.vstack([r[:-1] for r in rings])
        for v in snapped:
            assert any(np.array_equal(v, p) for p in P)
        # corners map to the true corners
        assert np.array_equal(snapped[0], np.array([0.0, 0.0]))

    def test_update_edge_types_zero_unmatched(self):
        """End-to-end M10 goal: after snapping, every block coord is a
        graph node → unmatched counter is 0."""
        from prclz_ray.graph.reblock_graph import ReblockGraph
        rings = grid_parcels(3)
        g = ReblockGraph.from_polygons(rings)
        snapped = snap_block(BLOCK + 3e-10, rings)
        missing, total = g.update_edge_types(snapped, check=True)
        assert total > 0 and missing == 0


class TestKernelEndToEnd:
    def test_reblock_block_prep_chain(self):
        """Full kernel on the 3×3 fixture: one interior terminal + the
        outside terminal; new roads reach the boundary (outside access)."""
        from prclz_ray.stages.reblock import reblock_block
        rings = grid_parcels(3)
        cents = np.array([[(i + 0.5) / 3, (j + 0.5) / 3]
                          for i in range(3) for j in range(3)])
        res = reblock_block(BLOCK, rings, cents)
        s = res["summary"]
        assert s["bldg_count"] == 1          # 8 dropped as street-connected
        assert s["bldg_dropped"] == 8
        assert s["bldg_unmatched"] == 0
        assert s["num_block_coords_unmatched"] == 0
        assert res["new"], "must build a road to the interior building"

    def test_all_connected_block_skipped(self):
        from prclz_ray.stages.reblock import reblock_block
        rings = grid_parcels(2)
        cents = np.array([[0.25, 0.25], [0.75, 0.75]])
        assert reblock_block(BLOCK, rings, cents) is None


class TestCorridorSimplify:
    def test_wide_corridor_collapses_to_endpoints(self):
        from prclz_ray.graph.reblock_graph import ReblockGraph
        zig = np.array([[0, 0], [1, 0.1], [2, -0.1], [3, 0.05], [4, 0]])
        out = ReblockGraph._simplify_chain(zig, half_width=0.5)
        assert len(out) == 2
        assert np.allclose(out, [[0, 0], [4, 0]])

    def test_narrow_corridor_keeps_detour(self):
        from prclz_ray.graph.reblock_graph import ReblockGraph
        detour = np.array([[0, 0], [1, 0], [2, 1.0], [3, 0], [4, 0]])
        out = ReblockGraph._simplify_chain(detour, half_width=0.05)
        # the 1-unit bump cannot be cut with a 0.05 corridor
        assert len(out) > 2
        assert any(np.allclose(p, [2, 1.0]) for p in out)

    def test_graph_chains_and_streets(self):
        """A steiner path of 4 jittered collinear edges simplifies to one
        straight segment inside a generous corridor."""
        from prclz_ray.graph.reblock_graph import ReblockGraph
        g = ReblockGraph()
        pts = [(0.0, 0.0), (1.0, 0.05), (2.0, -0.05), (3.0, 0.02), (4.0, 0.0)]
        for a, b in zip(pts, pts[1:]):
            g.add_edge(a, b, steiner=True)
            g.g.edges[a, b]["width"] = 1.0
        lines = g.simplify_streets()
        assert len(lines) == 1
        assert len(lines[0]) == 2
        assert np.allclose(lines[0], [[0, 0], [4, 0]])


class TestGraphPickle:
    def test_roundtrip_preserves_steiner_output(self):
        """S10 (ref ``topology.py:259-267,395-401``): serialize → restore →
        identical steiner linestrings and edge order."""
        from prclz_ray.stages.reblock import reblock_block
        from prclz_ray.graph.reblock_graph import ReblockGraph
        g = ReblockGraph.from_polygons(grid_parcels(3))
        g.add_buildings(np.array([[0.5, 0.5], [0.2, 0.9]]))
        g.update_edge_types(BLOCK, check=False)
        g.steiner_tree_approx()
        buf = g.to_bytes()
        g2 = ReblockGraph.from_bytes(buf)
        n1, e1 = g.get_steiner_linestrings()
        n2, e2 = g2.get_steiner_linestrings()
        assert len(n1) == len(n2) and len(e1) == len(e2)
        for a, b in zip(n1, n2):
            assert np.array_equal(a, b)
        assert g2.g.number_of_nodes() == g.g.number_of_nodes()
        assert g2.terminals() == g.terminals()
