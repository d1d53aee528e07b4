"""Reblocking graph kernel: Steiner-tree street networks per block.

Fresh implementation on networkx of the semantics of prclz
``reblock/_reblock_graph.py`` (reference is igraph-based):

  - nodes are exact coordinate tuples, deduped (``:255-276``); node attr
    ``terminal`` marks Steiner targets
  - edge attrs: ``weight``, ``eucl_dist``, ``steiner``, ``edge_type``
    ('highway' = existing road), ``width``, ``is_through_line``
  - add_node_to_closest_edge: project point onto nearest edge (clamped
    projection, ``:371-398,504-556``), split that edge (``:337-369``)
  - update_edge_types(block): for each consecutive pair of block-boundary
    coords present in the graph, mark the shortest path's edges 'highway';
    afterwards all highway edges get weight 0 (``:589-662``)
  - steiner_tree_approx: metric closure over terminals (Dijkstra,
    ``:326-335``) → MST → unroll paths, mark ``steiner`` (``:665-710``) —
    the classic Kou–Markowsky–Berman 2-approximation
  - set_edge_width / calc_edge_weight: width = min edge↔building distance,
    weight = eucl/width × (edge_type != 'highway') (``:1069-1139``)
  - add_through_lines: reweight with cost eucl/width (edge type ignored),
    ratio = (distance through steiner subgraph) / (distance through full
    graph) per terminal pair; pairs over ``ratio_cutoff`` (or top-k) get
    their full-graph shortest path marked ``is_through_line`` (``:712-774``)
  - get_steiner_linestrings: steiner|through edges split into (new,
    existing) by weight == 0 (``:810-909``)

This object is per-block worker state inside ``map_groups`` — it never
crosses a Ray task boundary.
"""
from __future__ import annotations

from itertools import combinations
from typing import Callable, Optional

import networkx as nx
import numpy as np

from ..geom.core import dist, polyline_polygon_distance, project_point_to_segment

Coord = tuple[float, float]


class ReblockGraph:
    def __init__(self):
        self.g = nx.Graph()
        self._edge_order: list[tuple[Coord, Coord]] = []

    # ------------------------------------------------------------ builders
    @staticmethod
    def from_lines(lines) -> "ReblockGraph":
        """Build from a sequence of coordinate polylines ((N,2) arrays)."""
        rg = ReblockGraph()
        for line in lines:
            pts = [(float(x), float(y)) for x, y in np.asarray(line, dtype=np.float64)]
            for a, b in zip(pts, pts[1:]):
                rg.add_edge(a, b)
        return rg

    @staticmethod
    def from_polygons(rings, parcel_ids=None) -> "ReblockGraph":
        rg = ReblockGraph()
        for pid, ring in enumerate(rings):
            pts = [(float(x), float(y)) for x, y in np.asarray(ring, dtype=np.float64)]
            if pts[0] != pts[-1]:
                pts.append(pts[0])
            for a, b in zip(pts, pts[1:]):
                rg.add_edge(a, b, parcel_id=parcel_ids[pid] if parcel_ids else pid)
        return rg

    # ------------------------------------------------------------ mutation
    def add_node(self, c: Coord, terminal: bool = False) -> None:
        if c in self.g:
            self.g.nodes[c]["terminal"] = terminal
        else:
            self.g.add_node(c, terminal=terminal)

    def add_edge(self, c0: Coord, c1: Coord, terminal0=False, terminal1=False,
                 parcel_id=None, **attrs) -> None:
        if c0 == c1:
            return
        self.add_node(c0, terminal0 or self.g.nodes.get(c0, {}).get("terminal", False))
        self.add_node(c1, terminal1 or self.g.nodes.get(c1, {}).get("terminal", False))
        if not self.g.has_edge(c0, c1):
            d = dist(c0, c1)
            attrs.setdefault("weight", d)
            attrs.setdefault("eucl_dist", d)
            attrs.setdefault("steiner", False)
            self.g.add_edge(c0, c1, **attrs)
            self._edge_order.append((c0, c1))
        if parcel_id is not None:
            pids = self.g.edges[c0, c1].setdefault("parcel_id", set())
            pids.add(parcel_id)

    def _edges_in_order(self):
        for (a, b) in self._edge_order:
            if self.g.has_edge(a, b):
                yield a, b

    def split_edge_by_node(self, edge: tuple[Coord, Coord], c: Coord,
                           terminal: bool = False) -> None:
        a, b = edge
        if c == a or c == b:
            self.g.nodes[c]["terminal"] = terminal
            return
        attrs = dict(self.g.edges[a, b])
        self.g.remove_edge(a, b)
        self.add_edge(a, c, terminal1=terminal)
        self.add_edge(c, b, terminal0=terminal)
        for e in ((a, c), (c, b)):
            if "edge_type" in attrs:
                self.g.edges[e]["edge_type"] = attrs["edge_type"]

    def add_node_to_closest_edge(self, coords, terminal: bool = False,
                                 get_edge: bool = False):
        """Project ``coords`` onto the nearest edge and split it there
        (ref ``_reblock_graph.py:504-556``).  Returns the geodesic
        projection distance in metres (haversine twin of the reference's
        geopy ``distance_meters``, ``:76-82,552``) — a diagnostic only,
        never a graph weight.  ``get_edge=True`` returns ``(edge,
        dist_m)`` WITHOUT modifying the graph (ref ``get_edge`` path)."""
        from ..geom.crs import haversine_m
        p = (float(coords[0]), float(coords[1]))
        best = None
        for a, b in self._edges_in_order():
            x, y, d = project_point_to_segment(p, a, b)
            if best is None or d < best[0]:
                best = (d, (a, b), (x, y))
        if best is None:
            self.add_node(p, terminal)
            return None
        _, edge, q = best
        q = (float(q[0]), float(q[1]))
        dist_m = float(haversine_m(p[0], p[1], q[0], q[1]))
        if get_edge:
            return edge, dist_m
        self.split_edge_by_node(edge, q, terminal=terminal)
        return dist_m

    def add_buildings(self, centroids) -> list[float]:
        """Insert each centroid as a terminal; returns the per-terminal
        geodesic projection distances (metres) for the summary
        diagnostic."""
        out = []
        for c in centroids:
            d = self.add_node_to_closest_edge(c, terminal=True)
            if d is not None:
                out.append(d)
        return out

    # ------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        """S10 graph persistence (ref ``topology.py:259-267,395-401``
        pickles the PlanarGraph): a stable tuple payload — nodes with
        attrs, edges with attrs, insertion order — so a reblock graph can
        checkpoint to a binary column and resume in another worker."""
        import pickle
        nodes = [(n, dict(d)) for n, d in self.g.nodes(data=True)]
        edges = [(a, b, dict(d)) for a, b, d in self.g.edges(data=True)]
        return pickle.dumps((nodes, edges, list(self._edge_order)),
                            protocol=pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def from_bytes(buf: bytes) -> "ReblockGraph":
        import pickle
        nodes, edges, order = pickle.loads(buf)
        rg = ReblockGraph()
        for n, d in nodes:
            rg.g.add_node(n, **d)
        for a, b, d in edges:
            rg.g.add_edge(a, b, **d)
        rg._edge_order = [tuple(map(tuple, e)) if isinstance(e, list) else e
                          for e in order]
        return rg

    # ---------------------------------------------------------- analysis
    def terminals(self) -> list[Coord]:
        return [n for n, d in self.g.nodes(data=True) if d.get("terminal")]

    def clean_graph(self) -> int:
        """Keep largest connected component (``:568-587``); returns the
        number of components found."""
        comps = list(nx.connected_components(self.g))
        if len(comps) > 1:
            comps.sort(key=len)
            keep = comps[-1]
            drop = [n for n in self.g if n not in keep]
            self.g.remove_nodes_from(drop)
            self._edge_order = [(a, b) for a, b in self._edge_order if self.g.has_edge(a, b)]
        return len(comps)

    def update_edge_types(self, block_ring, check: bool = False) -> tuple:
        coords_list = [(float(x), float(y)) for x, y in np.asarray(block_ring, dtype=np.float64)]
        missing = total = None
        if check:
            nodes = set(self.g.nodes)
            uniq = set(coords_list)
            total = len(uniq)
            missing = sum(1 for c in uniq if c not in nodes)
        for prev, cur in zip(coords_list, coords_list[1:]):
            if prev in self.g and cur in self.g:
                try:
                    path = nx.dijkstra_path(self.g, prev, cur, weight="weight")
                except nx.NetworkXNoPath:
                    continue
                for e in zip(path, path[1:]):
                    self.g.edges[e]["edge_type"] = "highway"
        for a, b, d in self.g.edges(data=True):
            if d.get("edge_type") == "highway":
                d["weight"] = 0.0
        return (missing, total)

    @staticmethod
    def _w_tiebreak(u, v, d):
        # zero-weight (existing-road) ties are broken by euclidean length so
        # shortest-path side choices are deterministic and side-consistent
        # (the reference's fixed igraph iteration order has the same effect)
        return d["weight"] + 1e-9 * d["eucl_dist"]

    def metric_closure(self, terminals: list[Coord]) -> nx.Graph:
        """Complete graph over terminals; edge attrs weight (shortest-path
        distance) and path (list of node-pair edges in self)."""
        H = nx.Graph()
        for u, v in combinations(terminals, 2):
            path = nx.dijkstra_path(self.g, u, v, weight=self._w_tiebreak)
            edges = list(zip(path, path[1:]))
            length = sum(self.g.edges[e]["weight"] for e in edges)
            H.add_edge(u, v, weight=length, path=edges)
        return H

    def steiner_tree_approx(self) -> None:
        terms = self.terminals()
        if len(terms) < 2:
            return
        H = self.metric_closure(terms)
        mst = nx.minimum_spanning_edges(H, data=True)
        for u, v, d in mst:
            for e in d["path"]:
                self.g.edges[e]["steiner"] = True

    def set_edge_width(self, building_rings, simplify: bool = True) -> None:
        for a, b in self.g.edges:
            line = np.array([a, b])
            ds = [polyline_polygon_distance(line, r) for r in building_rings]
            self.g.edges[a, b]["width"] = min(ds) if ds else 1.0
        if simplify:
            self._simplify_edge_width()

    def _continuous_chain(self, v: Coord) -> set[Coord]:
        """Maximal set of degree-2 chained vertices containing v
        (``:1007-1035``)."""
        visited = {v}
        stack = [v]
        while stack:
            cur = stack.pop()
            nbrs = list(self.g.neighbors(cur))
            if len(nbrs) != 2:
                continue
            for n in nbrs:
                if n not in visited:
                    visited.add(n)
                    stack.append(n)
        return visited

    def _simplify_edge_width(self) -> None:
        for v in list(self.g.nodes):
            if self.g.degree(v) == 2:
                chain = self._continuous_chain(v)
                edges = [(a, b) for a, b in self.g.edges(chain) if a in chain and b in chain]
                if not edges:
                    continue
                mw = min(self.g.edges[e].get("width", 1.0) for e in edges)
                for e in edges:
                    self.g.edges[e]["width"] = mw

    def calc_edge_weight(self, cost_fn: Optional[Callable[[dict], float]] = None,
                         use_edge_type: bool = True) -> None:
        has_width = any("width" in d for _, _, d in self.g.edges(data=True))
        if cost_fn is None:
            if use_edge_type:
                def cost_fn(d):
                    return (d["eucl_dist"] / d.get("width", 1.0)) * (d.get("edge_type") != "highway")
            else:
                def cost_fn(d):
                    return d["eucl_dist"] / d.get("width", 1.0)
        for _, _, d in self.g.edges(data=True):
            d["weight"] = float(cost_fn(d))
        if not has_width:
            for _, _, d in self.g.edges(data=True):
                d.pop("width", None)

    def add_through_lines(self, top_k: Optional[int] = None,
                          ratio_cutoff: Optional[float] = None,
                          cost_fn: Optional[Callable[[dict], float]] = None) -> list:
        orig_weights = {tuple(sorted(e)): self.g.edges[e]["weight"] for e in self.g.edges}
        if cost_fn is None:
            def cost_fn(d):
                return d["eucl_dist"] / d.get("width", 1.0)
        for _, _, d in self.g.edges(data=True):
            d["weight"] = float(cost_fn(d))

        terms = self.terminals()
        orig_mc = self.metric_closure(terms)
        opt = ReblockGraph()
        for a, b, d in self.g.edges(data=True):
            if d.get("steiner"):
                opt.add_edge(a, b, weight=d["weight"], eucl_dist=d["eucl_dist"])
        for t in terms:
            if t in opt.g:
                opt.g.nodes[t]["terminal"] = True
        opt_mc = opt.metric_closure(opt.terminals())

        ratios = []
        for u, v in orig_mc.edges:
            if opt_mc.has_edge(u, v):
                denom = orig_mc.edges[u, v]["weight"]
                num = opt_mc.edges[u, v]["weight"]
                ratio = num / denom if denom > 0 else (float("inf") if num > 0 else 1.0)
            else:
                ratio = float("inf")
            ratios.append(((u, v), ratio))

        for e in self.g.edges:
            self.g.edges[e]["is_through_line"] = False
        added = []
        if top_k is not None:
            chosen = [e for e, _ in sorted(ratios, key=lambda t: -t[1])[: int(top_k)]]
        elif ratio_cutoff is not None:
            chosen = [e for e, r in ratios if r > ratio_cutoff]
        else:
            chosen = []
        for (u, v) in chosen:
            for e in orig_mc.edges[u, v]["path"]:
                self.g.edges[e]["is_through_line"] = True
            added.append(orig_mc.edges[u, v]["path"])

        for e in self.g.edges:
            self.g.edges[e]["weight"] = orig_weights[tuple(sorted(e))]
        return added

    def get_steiner_linestrings(self) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """(new_lines, existing_lines): each a list of 2-point coordinate
        arrays; existing = weight 0 (highway), new = everything else."""
        new, existing = [], []
        for a, b in self._edges_in_order():
            d = self.g.edges[a, b]
            if d.get("steiner") or d.get("is_through_line"):
                seg = np.array([a, b], dtype=np.float64)
                (existing if d["weight"] == 0 else new).append(seg)
        return new, existing

    def get_terminal_points(self) -> np.ndarray:
        return np.array(self.terminals(), dtype=np.float64).reshape(-1, 2)

    def get_steiner_corridors(self) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """Width-corridor polygons for the optimal paths (ref
        ``get_steiner_linestrings(return_polys=True)``,
        ``_reblock_graph.py:855-858``: parallel_offset left+right per edge
        path, joined into polygons).  The engine offsets each maximal road
        CHAIN by its corridor width (min edge width along the chain — the
        same width the DP simplifier uses), one CCW ring per chain, so
        junction coverage comes from chains meeting at shared vertices
        rather than the reference's per-vertex patch rectangles.
        Returns (new_polys, existing_polys)."""
        from ..geom.lines import offset_polyline
        out: list[list[np.ndarray]] = []
        for new in (True, False):
            polys = []
            for path, w in self._road_chains(new=new):
                polys.append(offset_polyline(
                    np.asarray(path, dtype=np.float64), float(w)))
            out.append(polys)
        return out[0], out[1]

    # ------------------------------------------------------- simplification
    def _new_road_chains(self) -> list[tuple[list[Coord], float]]:
        return self._road_chains(new=True)

    def _road_chains(self, new: bool = True) -> list[tuple[list[Coord], float]]:
        """Maximal chains of steiner/through edges (``new=True``: weight≠0
        non-highway roads; ``new=False``: weight-0 existing streets),
        split at junctions (degree ≠ 2 within the subgraph) — the engine's
        ``to_pieces`` (ref ``_reblock_graph.py:1141-1152``).  Each chain
        carries its corridor half-width (min edge width along it)."""
        sub = nx.Graph()
        for a, b, d in self.g.edges(data=True):
            if (d.get("steiner") or d.get("is_through_line")) \
                    and (d["weight"] != 0) == new:
                sub.add_edge(a, b, width=d.get("width", 1.0))
        chains: list[tuple[list[Coord], float]] = []
        seen = set()
        junctions = [n for n in sub if sub.degree(n) != 2]
        starts = junctions if junctions else (list(sub)[:1] if len(sub) else [])
        for s in starts:
            for nbr in sub.neighbors(s):
                if (s, nbr) in seen:
                    continue
                path = [s, nbr]
                seen.add((s, nbr)); seen.add((nbr, s))
                while sub.degree(path[-1]) == 2:
                    nxts = [x for x in sub.neighbors(path[-1]) if x != path[-2]]
                    if not nxts or (path[-1], nxts[0]) in seen:
                        break
                    seen.add((path[-1], nxts[0])); seen.add((nxts[0], path[-1]))
                    path.append(nxts[0])
                w = min(sub.edges[e].get("width", 1.0)
                        for e in zip(path, path[1:]))
                chains.append((path, w))
        return chains

    @staticmethod
    def _simplify_chain(coords: np.ndarray, half_width: float,
                        samples_per_seg: int = 8) -> np.ndarray:
        """Corridor Douglas–Peucker (ref ``simplify_linestring``,
        ``_reblock_graph.py:41-74``): start from the endpoints; while the
        candidate line leaves the corridor (any sampled candidate point
        farther than ``half_width`` from the ORIGINAL line), insert the
        original vertex farthest from the candidate."""
        from ..geom.core import point_segments_distance
        pts = np.asarray(coords, dtype=np.float64)
        n = len(pts)
        if n <= 2:
            return pts
        oa, ob = pts[:-1], pts[1:]
        idxs = [0, n - 1]

        def dist_to_orig(p):
            return point_segments_distance(p, oa, ob).min()

        for _ in range(n):
            cand = pts[idxs]
            ca, cb = cand[:-1], cand[1:]
            # does the candidate stay inside the corridor?
            t = np.linspace(0.0, 1.0, samples_per_seg)[None, :, None]
            samples = (ca[:, None, :] * (1 - t) + cb[:, None, :] * t
                       ).reshape(-1, 2)
            if max(dist_to_orig(p) for p in samples) <= half_width:
                break
            # insert the original vertex farthest from the candidate
            d = [point_segments_distance(p, ca, cb).min() for p in pts]
            far = int(np.argmax(d))
            if far in idxs:
                break
            idxs.append(far)
            idxs.sort()
        return pts[idxs]

    def simplify_streets(self) -> list[np.ndarray]:
        """G10 street straightening (ref ``simplify_streets`` /
        ``simplify_reblocked_graph``, ``_reblock.py:256-270``,
        ``_reblock_graph.py:1141-1166``): per new-road chain, the simplest
        polyline between its junction endpoints that stays inside the
        chain's width corridor.  Returns simplified coordinate polylines;
        the graph itself is untouched (output-only, as the reference)."""
        out = []
        for path, w in self._new_road_chains():
            out.append(self._simplify_chain(np.asarray(path), max(w, 1e-9)))
        return out

    def simplify(self) -> None:
        """Collapse degree-2 non-terminal nodes; edge 'path' accumulates the
        removed chain (``:923-983``)."""
        for e in self.g.edges:
            self.g.edges[e].setdefault("path", [])
        for v in list(self.g.nodes):
            if v not in self.g:
                continue
            nbrs = list(self.g.neighbors(v))
            if len(nbrs) != 2 or self.g.nodes[v].get("terminal"):
                continue
            n0, n1 = nbrs
            if self.g.has_edge(n0, n1):
                continue
            e0 = self.g.edges[n0, v]
            e1 = self.g.edges[v, n1]
            w = e0["weight"] + e1["weight"]
            path = list(e0["path"]) + [v] + list(e1["path"])
            steiner = e0.get("steiner", False) and e1.get("steiner", False)
            self.g.remove_node(v)
            self.add_edge(n0, n1, weight=w, eucl_dist=dist(n0, n1),
                          steiner=steiner, path=path)
