"""The four Steiner golden tests ported from the reference semantics
(``tests/test_reblock.py:72-308``) — exact answer sets, tie-tolerant where
the reference is. Pure kernel tests: no Ray session needed."""
import numpy as np
import pytest

from prclz_ray.geom.lines import canonical_segments, lines_equal
from prclz_ray.graph.reblock_graph import ReblockGraph


def make_square(ll, w=1.0):
    x, y = ll
    return np.array([(x, y), (x + w, y), (x + w, y + w), (x, y + w), (x, y)])


def create_test_grid(n):
    lines = []
    for i in range(n):
        for j in range(n):
            if i == 0 and j == 1:
                lines.append(np.array([(0, 1), (1, 1), (1, 2), (0, 1)], dtype=float))
            else:
                lines.append(make_square((i, j), 1.0))
    return ReblockGraph.from_lines(lines)


POINTS = [(2, 2), (0, 0.2), (1.8, 1), (0.8, 2)]


def grid_with_terminals(k):
    g = create_test_grid(2)
    for pt in POINTS[:k]:
        g.add_node_to_closest_edge(pt, terminal=True)
    return g


def wkt_set(lines):
    out = set()
    for seg in lines:
        def f(v):
            return str(int(v)) if v == int(v) else repr(float(v))
        out.add("LINESTRING ({} {}, {} {})".format(
            f(seg[0][0]), f(seg[0][1]), f(seg[1][0]), f(seg[1][1])))
    return out


class TestBasicSteinerApprox:
    def test_basic2pt(self):
        g = grid_with_terminals(2)
        g.steiner_tree_approx()
        new, existing = g.get_steiner_linestrings()
        assert canonical_segments(new) == canonical_segments(
            [[(0, 1), (1, 2)], [(0, 1), (0, 0.2)], [(1, 2), (2, 2)]])
        assert existing == []

    def test_basic3pt(self):
        g = grid_with_terminals(3)
        g.steiner_tree_approx()
        new, _ = g.get_steiner_linestrings()
        assert canonical_segments(new) == canonical_segments(
            [[(1, 1), (0, 1)], [(2, 1), (2, 2)], [(0, 1), (0, 0.2)],
             [(1, 1), (1.8, 1)], [(2, 1), (1.8, 1)]])

    def test_basic4pt(self):
        g = grid_with_terminals(4)
        g.steiner_tree_approx()
        new, _ = g.get_steiner_linestrings()
        assert canonical_segments(new) == canonical_segments(
            [[(2, 1), (2, 2)], [(1, 2), (2, 2)], [(0, 1), (0, 0.2)],
             [(2, 1), (1.8, 1)], [(0, 1), (0.9, 1.9)], [(1, 2), (0.9, 1.9)]])


def square_with_diagonal():
    lines = [
        np.array([(0, 0), (1, 0), (1, 1), (0, 0)], dtype=float),
        np.array([(0, 0), (1, 1), (0, 1), (0, 0)], dtype=float),
    ]
    g = ReblockGraph.from_lines(lines)
    g.add_node_to_closest_edge((0, 0), terminal=True)
    g.add_node_to_closest_edge((1, 1), terminal=True)
    return g


class TestExistingSteinerApprox:
    def test_no_block(self):
        g = square_with_diagonal()
        g.steiner_tree_approx()
        new, existing = g.get_steiner_linestrings()
        assert lines_equal(new, [[(0, 0), (1, 1)]])
        assert existing == []

    def test_w_block(self):
        g = square_with_diagonal()
        block = make_square((0, 0), 1.0)
        missing, total = g.update_edge_types(block, check=True)
        assert missing == 0
        g.steiner_tree_approx()
        new, existing = g.get_steiner_linestrings()
        assert new == []
        ok = (lines_equal(existing, [[(0, 0), (0, 1)], [(0, 1), (1, 1)]]) or
              lines_equal(existing, [[(0, 0), (1, 0)], [(1, 0), (1, 1)]]))
        assert ok


class TestWidthSteinerApprox:
    def test_w_width(self):
        lines = [
            np.array([(0, 0), (1, 0), (1, 1), (0.5, 0.5), (0, 0)], dtype=float),
            np.array([(0, 0), (0.5, 0.5), (1, 1), (0, 1), (0, 0)], dtype=float),
        ]
        g = ReblockGraph.from_lines(lines)
        g.add_node_to_closest_edge((0, 0), terminal=True)
        g.add_node_to_closest_edge((1, 1), terminal=True)
        eps = 0.00001
        house = np.array([(0.5, 0.5 + eps), (0.55, 0.55 + eps),
                          (0.55, 0.55 + 2 * eps), (0.5, 0.5 + 2 * eps),
                          (0.5, 0.5 + eps)])
        g.set_edge_width([house], simplify=True)
        g.calc_edge_weight()
        g.steiner_tree_approx()
        new, existing = g.get_steiner_linestrings()
        ok = (lines_equal(new, [[(0, 0), (0, 1)], [(0, 1), (1, 1)]]) or
              lines_equal(new, [[(0, 0), (1, 0)], [(1, 0), (1, 1)]]))
        assert ok
        assert existing == []


class TestAddingThruStreets:
    def _make(self):
        lines = [
            make_square((0, 0), 3.0),
            np.array([(0, 0), (0.9, 0.9)]),
            np.array([(2.1, 2.1), (3, 3)]),
            np.array([(0.9, 0.9), (2.1, 2.1)]),
        ]
        g = ReblockGraph.from_lines(lines)
        g.add_node_to_closest_edge((0.9, 0.9), terminal=True)
        g.add_node_to_closest_edge((2.1, 2.1), terminal=True)
        g.add_node_to_closest_edge((0, 1), terminal=True)
        return g, make_square((0, 0), 3.0)

    def test_no_thru(self):
        g, block = self._make()
        g.update_edge_types(block, check=True)
        g.steiner_tree_approx()
        new, existing = g.get_steiner_linestrings()
        assert lines_equal(new, [[(0, 0), (0.9, 0.9)], [(2.1, 2.1), (3, 3)]])
        ok = (lines_equal(existing, [[(0, 0), (0, 3)], [(0, 3), (3, 3)]]) or
              lines_equal(existing, [[(3, 3), (3, 0)], [(3, 0), (0, 0)]]))
        assert ok

    def test_add_thru(self):
        g, block = self._make()
        g.update_edge_types(block, check=True)
        g.steiner_tree_approx()
        g.add_through_lines(ratio_cutoff=2)
        new, existing = g.get_steiner_linestrings()
        assert lines_equal(new, [[(0, 0), (3, 3)]])
        ok = (lines_equal(existing, [[(0, 0), (0, 3)], [(0, 3), (3, 3)]]) or
              lines_equal(existing, [[(3, 3), (3, 0)], [(3, 0), (0, 0)]]))
        assert ok


class TestConnectNTopK:
    """--connect_n parity: top-k through streets (ref _reblock.py:221-254)."""

    def test_top_k_matches_cutoff_choice(self):
        base = TestAddingThruStreets()
        g, block = base._make()
        g.update_edge_types(block, check=True)
        g.steiner_tree_approx()
        g.add_through_lines(top_k=1)
        new_k, _ = g.get_steiner_linestrings()
        g2, block2 = base._make()
        g2.update_edge_types(block2, check=True)
        g2.steiner_tree_approx()
        g2.add_through_lines(ratio_cutoff=2)
        new_c, _ = g2.get_steiner_linestrings()
        assert lines_equal(new_k, new_c)

    def test_top_zero_adds_nothing(self):
        base = TestAddingThruStreets()
        g, block = base._make()
        g.update_edge_types(block, check=True)
        g.steiner_tree_approx()
        g.add_through_lines(top_k=0)
        new, _ = g.get_steiner_linestrings()
        assert lines_equal(new, [[(0, 0), (0.9, 0.9)], [(2.1, 2.1), (3, 3)]])


class TestCorridorsAndGeodesic:
    def test_corridor_golden_2x2(self):
        """Width-corridor output (ref get_steiner_linestrings return_polys,
        _reblock_graph.py:855-858) on the 2-terminal 2x2-grid golden: the
        new-road chains offset by width w tile into CCW polygons whose
        total area matches sum(chain_len x 2w) up to miter-corner terms."""
        from prclz_ray.geom.core import shoelace_area
        g = grid_with_terminals(2)
        g.steiner_tree_approx()
        w = 0.05
        for e in g.g.edges:
            g.g.edges[e]["width"] = w
        new_polys, ex_polys = g.get_steiner_corridors()
        assert ex_polys == []
        assert len(new_polys) >= 1
        total = sum(shoelace_area(r) for r in new_polys)
        # chain length: (0,0.2)-(0,1)-(1,2)-(2,2) = 0.8 + sqrt2 + 1
        L = 0.8 + np.sqrt(2.0) + 1.0
        assert all(shoelace_area(r) > 0 for r in new_polys)  # CCW shells
        assert abs(total - L * 2 * w) < 4 * w * w + 1e-9     # miter slack

    def test_offset_polyline_straight_and_bend(self):
        from prclz_ray.geom.core import shoelace_area
        from prclz_ray.geom.lines import offset_polyline
        r = offset_polyline(np.array([[0.0, 0.0], [3.0, 0.0]]), 0.25)
        assert abs(shoelace_area(r) - 3.0 * 0.5) < 1e-12
        # right-angle bend: area = L*2d exactly for miter joins
        r = offset_polyline(np.array([[0, 0], [1, 0], [1, 1]], float), 0.1)
        assert abs(abs(shoelace_area(r)) - 2 * 0.2) < 1e-9

    def test_geodesic_projection_distance(self):
        """add_node_to_closest_edge reports the haversine projection
        distance in metres (ref distance_meters, _reblock_graph.py:76-82,
        552): a point 0.001 deg latitude off an equatorial edge projects
        ~111.2 m."""
        from prclz_ray.geom.crs import haversine_m
        g = ReblockGraph()
        g.add_edge((0.0, 0.0), (0.01, 0.0))
        edge, dist_m = g.add_node_to_closest_edge((0.005, 0.001),
                                                  get_edge=True)
        assert edge == ((0.0, 0.0), (0.01, 0.0))
        assert abs(dist_m - 111.2) < 0.3
        assert g.g.number_of_nodes() == 2      # get_edge does not modify
        d = g.add_node_to_closest_edge((0.005, 0.001), terminal=True)
        assert abs(d - dist_m) < 1e-9
        assert g.g.number_of_nodes() == 3      # split happened
        # kernel sanity: one degree of longitude at the equator
        assert abs(float(haversine_m(0, 0, 1, 0)) - 111195.08) < 1.0
