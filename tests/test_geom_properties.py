"""Property-based checks (hypothesis) for the geometry kernels — the
invariants every downstream stage relies on, exercised over random inputs
rather than fixtures."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from prclz_ray.geom.core import (bbox, convex_hull, ensure_closed,
                                 min_rotated_rect, point_segments_distance,
                                 shoelace_area)
from prclz_ray.geom.dissolve import dissolve_rings
from prclz_ray.geom.predicates import point_in_ring, points_in_ring

coord = st.floats(min_value=-1e3, max_value=1e3, allow_nan=False,
                  allow_infinity=False, width=32)
points_strat = st.lists(st.tuples(coord, coord), min_size=3, max_size=40)


@settings(max_examples=60, deadline=None)
@given(points_strat)
def test_convex_hull_contains_all_points(pts):
    P = np.asarray(pts, dtype=np.float64)
    hull = convex_hull(P)
    if len(hull) < 3:        # collinear/degenerate input
        return
    ring = ensure_closed(hull)
    scale = max(1.0, float(np.abs(P).max()))
    # CCW orientation up to float noise on near-collinear hulls
    assert shoelace_area(ring) >= -1e-12 * scale * scale
    inside = points_in_ring(P[:, 0], P[:, 1], ring, boundary=True)
    # boundary-inclusive containment with float tolerance: any point the
    # ray-cast calls outside must still be within eps of the hull boundary
    for i in np.flatnonzero(~inside):
        d = point_segments_distance(P[i], ring[:-1], ring[1:]).min()
        assert d < 1e-6 * max(1.0, np.abs(P).max())


@settings(max_examples=60, deadline=None)
@given(points_strat)
def test_min_rotated_rect_bounds_hull(pts):
    P = np.asarray(pts, dtype=np.float64)
    hull = convex_hull(P)
    if len(hull) < 3:
        return
    rect = min_rotated_rect(P)
    # rect area ≤ axis-aligned bbox area (it minimizes over rotations,
    # including 0°) and ≥ hull area
    x0, y0, x1, y1 = bbox(P)
    rect_area = abs(shoelace_area(ensure_closed(rect)))
    hull_area = abs(shoelace_area(ensure_closed(hull)))
    assert rect_area <= (x1 - x0) * (y1 - y0) + 1e-6 * max(1, rect_area)
    assert rect_area >= hull_area - 1e-6 * max(1, hull_area)
    # every hull vertex inside the rect (tolerance for float rotation)
    rring = ensure_closed(rect)
    for v in hull:
        if not point_in_ring(v[0], v[1], rring, boundary=True):
            d = point_segments_distance(v, rring[:-1], rring[1:]).min()
            assert d < 1e-6 * max(1.0, np.abs(P).max())


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=5), st.integers(min_value=1, max_value=5))
def test_dissolve_grid_area_additivity(nx, ny):
    sq = lambda x, y: np.array([[x, y], [x + 1, y], [x + 1, y + 1],
                                [x, y + 1], [x, y]], dtype=float)
    rings = [sq(i, j) for i in range(nx) for j in range(ny)]
    out = dissolve_rings(rings)
    shells = [r for r in out if shoelace_area(r) > 0]
    holes = [r for r in out if shoelace_area(r) < 0]
    assert len(shells) == 1 and not holes
    assert abs(shoelace_area(shells[0]) - nx * ny) < 1e-9


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=4, max_size=30),
       st.integers(min_value=2, max_value=64))
def test_stable_bucket_deterministic_and_width_invariant(vals, nb):
    import pandas as pd
    from prclz_ray.stages.relational import stable_bucket
    xs = np.asarray([v[0] for v in vals])
    i64 = xs.astype(np.int64)
    i32 = i64.astype(np.int32)
    b64 = stable_bucket(i64, nb)
    b32 = stable_bucket(i32.astype(np.int64), nb)
    # int32 and int64 representations of equal values land identically
    mask = i64 == i32                          # values that survived narrowing
    assert (b64[mask] == stable_bucket(i32, nb)[mask]).all()
    # repeated calls agree (process-stable by construction)
    assert (stable_bucket(i64, nb) == b64).all()
    assert ((b64 >= 0) & (b64 < nb)).all()


def test_polygon_centroids_fast_path_parity():
    """Vectorized WKB centroid kernel == scalar ring_centroid per row, on
    uniform (fast path), mixed-size (fallback), degenerate, and multipolygon
    inputs."""
    import numpy as np
    from prclz_ray.geom import wkb
    from prclz_ray.geom.core import ring_centroid

    def sq(x, y, s):
        return np.array([(x, y), (x + s, y), (x + s, y + s), (x, y + s),
                         (x, y)], dtype=np.float64)

    uniform = [wkb.polygon(sq(i, 2 * i, 1 + 0.1 * i)) for i in range(50)]
    xs, ys = wkb.polygon_centroids(uniform)
    for i, b in enumerate(uniform):
        ex, ey = ring_centroid(wkb.decode(b)[1][0])
        assert abs(xs[i] - ex) < 1e-12 and abs(ys[i] - ey) < 1e-12

    tri = np.array([(0, 0), (4, 0), (0, 3), (0, 0)], dtype=np.float64)
    degen = np.array([(0, 0), (1, 1), (2, 2), (0, 0)], dtype=np.float64)
    mixed = [wkb.polygon(sq(0, 0, 2)), wkb.polygon(tri), wkb.polygon(degen),
             wkb.multipolygon([[sq(5, 5, 1)]])]
    xs, ys = wkb.polygon_centroids(mixed)
    expect = [ring_centroid(sq(0, 0, 2)), ring_centroid(tri),
              ring_centroid(degen), ring_centroid(sq(5, 5, 1))]
    for i, (ex, ey) in enumerate(expect):
        assert abs(xs[i] - ex) < 1e-12 and abs(ys[i] - ey) < 1e-12

    # uniform-length degenerate among uniform squares still exact
    uni_deg = [wkb.polygon(sq(0, 0, 1)),
               wkb.polygon(np.array([(0, 0), (1, 1), (2, 2), (3, 3), (0, 0)],
                                    dtype=np.float64))]
    xs, ys = wkb.polygon_centroids(uni_deg)
    ex, ey = ring_centroid(np.array([(0, 0), (1, 1), (2, 2), (3, 3)],
                                    dtype=np.float64))
    assert abs(xs[1] - ex) < 1e-12 and abs(ys[1] - ey) < 1e-12
