"""Spatial joins vs brute-force NumPy oracles: PIP (broadcast + tiled),
kNN with refinement, zonal stats, raster grid."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from prclz_ray.geom import wkb
from prclz_ray.stages import joins

RNG = np.random.default_rng(11)


def _polys():
    # 3x3 grid of unit squares with ids p0..p8
    ids, geoms = [], []
    for r in range(3):
        for c in range(3):
            ids.append(f"p{r * 3 + c}")
            x0, y0 = float(c), float(r)
            geoms.append(wkb.polygon(np.array(
                [(x0, y0), (x0 + 1, y0), (x0 + 1, y0 + 1), (x0, y0 + 1),
                 (x0, y0)])))
    return pa.table({"poly_id": ids,
                     "geometry": pa.array(geoms, type=pa.binary())})


def _points(n=500):
    # interior points only (offset off the grid lines) + some outside
    px = RNG.uniform(0.01, 2.99, n)
    py = RNG.uniform(0.01, 2.99, n)
    px[:20] = RNG.uniform(5, 6, 20)  # unmatched
    return pa.table({"pt_id": np.arange(n, dtype=np.int64),
                     "lng": px, "lat": py})


def _oracle_pip(pts: pa.Table):
    px = pts["lng"].to_numpy()
    py = pts["lat"].to_numpy()
    out = []
    for x, y in zip(px, py):
        if 0 <= x < 3 and 0 <= y < 3:
            out.append(f"p{int(y) * 3 + int(x)}")
        else:
            out.append(None)
    return out


def test_pip_join_inner_and_left():
    pts = _points()
    oracle = _oracle_pip(pts)
    n_match = sum(o is not None for o in oracle)

    inner = joins.pip_join(rd.from_arrow(pts).repartition(4), _polys(),
                           id_col="poly_id", how="inner").to_pandas()
    assert len(inner) == n_match
    got = inner.set_index("pt_id")["poly_id"].to_dict()
    for pid, o in zip(pts["pt_id"].to_pylist(), oracle):
        if o is not None:
            assert got[pid] == o

    left = joins.pip_join(rd.from_arrow(pts).repartition(4), _polys(),
                          id_col="poly_id", how="left").to_pandas()
    assert len(left) == len(pts)
    assert left["poly_id"].isna().sum() == len(pts) - n_match


def test_pip_join_tiled_matches_broadcast():
    pts = _points(300)
    bc = joins.pip_join(rd.from_arrow(pts), _polys(), id_col="poly_id",
                        how="inner").to_pandas()
    tiled = joins.pip_join_tiled(rd.from_arrow(pts).repartition(3),
                                 rd.from_arrow(_polys()),
                                 id_col="poly_id").to_pandas()
    a = bc.sort_values("pt_id")[["pt_id", "poly_id"]].reset_index(drop=True)
    b = tiled.sort_values("pt_id")[["pt_id", "poly_id"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_knn_join_matches_bruteforce():
    n_t = 40
    targets = pa.table({
        "t_id": [f"t{i}" for i in range(n_t)],
        "lng": RNG.uniform(0, 10, n_t),
        "lat": RNG.uniform(0, 10, n_t),
    })
    pts = pa.table({"pt_id": np.arange(60, dtype=np.int64),
                    "lng": RNG.uniform(0, 10, 60),
                    "lat": RNG.uniform(0, 10, 60)})
    k = 3
    out = joins.knn_join(rd.from_arrow(pts).repartition(4), targets, k=k,
                         id_col="t_id").to_pandas()
    assert len(out) == 60 * k

    tx = targets["lng"].to_numpy()
    ty = targets["lat"].to_numpy()
    px = pts["lng"].to_numpy()
    py = pts["lat"].to_numpy()
    for pid in range(60):
        rows = out[out["pt_id"] == pid].sort_values("nn_rank")
        d2 = (tx - px[pid]) ** 2 + (ty - py[pid]) ** 2
        # oracle orders by (dist, id) like the engine's tie-break
        order = np.lexsort((np.array([f"t{i}" for i in range(len(tx))]),
                            np.sqrt(d2)))[:k]
        assert list(rows["nn_id"]) == [f"t{i}" for i in order]
        assert np.allclose(rows["nn_dist"], np.sqrt(d2[order]))


def test_knn_tiebreak_across_grid_cells():
    """Exact-distance ties where the tied targets sit in DIFFERENT grid
    cells must still break by id (ORDER BY dist, id): the vectorized path
    concatenates 3x3-neighborhood buckets in dx/dy order, so without the
    post-concat index sort the tie would resolve by bucket order ("b")."""
    targets = pa.table({"t_id": ["a", "b"],
                        "lng": [1.0, -1.0], "lat": [0.0, 0.0]})
    pts = pa.table({"pt_id": np.array([0], dtype=np.int64),
                    "lng": [0.0], "lat": [0.0]})
    out = joins.knn_join(rd.from_arrow(pts), targets, k=1, id_col="t_id",
                         cell_size=1.5).to_pandas()
    assert list(out["nn_id"]) == ["a"]
    assert np.allclose(out["nn_dist"], [1.0])


def test_zonal_and_raster():
    pts = _points(400)
    vals = RNG.uniform(0, 100, 400)
    pts = pts.append_column("v", pa.array(vals))
    oracle = _oracle_pip(pts)

    z = joins.zonal_stats(rd.from_arrow(pts).repartition(4), _polys(),
                          id_col="poly_id", value_col="v").to_pandas()
    df = pd.DataFrame({"poly_id": oracle, "v": vals}).dropna()
    expect = df.groupby("poly_id")["v"].agg(["count", "sum", "mean"])
    z = z.set_index("poly_id")
    for pid, row in expect.iterrows():
        assert z.loc[pid, "n"] == row["count"]
        assert np.isclose(z.loc[pid, "sum_value"], row["sum"])
        assert np.isclose(z.loc[pid, "mean_value"], row["mean"])

    # raster grid counts: res=1.0 over the same points == zonal counts
    r = joins.rasterize_points(rd.from_arrow(pts).repartition(4),
                               res=1.0).to_pandas()
    grid_total = r["n"].sum()
    assert grid_total == 400


def test_asof_join_semantics():
    """Constructed as-of: exact-tie timestamps match (<=), unmatched left
    rows drop (inner), a legitimately-null right VALUE survives, keys land
    across buckets."""
    from prclz_ray.stages import relational
    left = pa.table({
        "eid": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "k": pa.array([10, 10, 10, 20, 30], type=pa.int64()),
        "t": pa.array([100, 205, 300, 150, 50], type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array([10, 10, 20, 20], type=pa.int64()),
        "t": pa.array([90, 205, 100, 160], type=pa.int64()),
        "val": pa.array([1.0, None, 3.0, 4.0], type=pa.float64()),
    })
    out = relational.asof_join(rd.from_arrow(left).repartition(3),
                               rd.from_arrow(right).repartition(2),
                               on="t", by="k", num_buckets=4).to_pandas()
    got = {int(r.eid): (None if pd.isna(r.val) else float(r.val))
           for r in out.itertuples()}
    # eid1: t=100 -> right t=90 val 1.0; eid2: exact tie t=205 -> null val
    # kept; eid3: t=300 -> latest t=205; eid4: t=150 -> right t=100 (160 is
    # future); eid5: k=30 has no right rows -> dropped
    assert got == {1: 1.0, 2: None, 3: None, 4: 3.0}
    assert out["eid"].dtype == np.int64 and out["t"].dtype == np.int64


def test_band_join_semantics():
    """Pairs straddling a bucket boundary are found once (replication, no
    dupes), |diff| == radius is inclusive, out-of-band excluded."""
    from prclz_ray.stages import relational
    left = pa.table({"lid": pa.array([1, 2, 3], type=pa.int64()),
                     "v": pa.array([10, 95, 200], type=pa.int64())})
    right = pa.table({"rid": pa.array([7, 8, 9, 10], type=pa.int64()),
                      "v": pa.array([110, 104, 300, 11], type=pa.int64())})
    out = relational.band_join(rd.from_arrow(left).repartition(2),
                               rd.from_arrow(right).repartition(3),
                               on="v", radius=100).to_pandas()
    pairs = sorted(zip(out["lid"], out["rid"]))
    # lid1(v10): rid7(110,d100 inclusive), rid8(104,d94), rid10(11,d1)
    # lid2(v95): rid7(d15), rid8(d9), rid10(d84)
    # lid3(v200): rid7(d90), rid8(d96), rid9(d100 inclusive)
    assert pairs == [(1, 7), (1, 8), (1, 10), (2, 7), (2, 8), (2, 10),
                     (3, 7), (3, 8), (3, 9)]
    assert len(out) == len(out.drop_duplicates(["lid", "rid"]))
    assert out["v_r"].dtype == np.int64


def test_deterministic_sample():
    from prclz_ray.stages import relational
    tbl = pa.table({"k": pa.array(range(10000), pa.int64()),
                    "v": pa.array(range(10000), pa.int64())})
    ds = rd.from_arrow(tbl).repartition(4)
    out = relational.deterministic_sample(ds, "k", rate_ppm=50_000, seed=1) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    # reproducible: identical selection on re-run and at other parallelism
    out2 = relational.deterministic_sample(
        rd.from_arrow(tbl).repartition(11), "k", 50_000, seed=1) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out.equals(out2)
    # ~5% rate, exact arithmetic
    k = np.arange(10000, dtype=np.uint64)
    h = (k + np.uint64(1)) * np.uint64(relational.SAMPLE_MIX)
    expect = k[(h % np.uint64(1_000_000)) < np.uint64(50_000)]
    assert np.array_equal(out["k"].to_numpy(np.uint64), expect)
    # different seed → different sample
    out3 = relational.deterministic_sample(ds, "k", 50_000, seed=7).to_pandas()
    assert set(out3["k"]) != set(out["k"])


def test_pip_auto_tiled_matches_broadcast_in_geo_pipelines():
    """100x guard e2e: forcing broadcast_limit_bytes=0 routes the
    complexity/parcels pipelines through the tiled PIP join; outputs must
    match the broadcast path exactly."""
    import pyarrow as _pa

    from prclz_ray.io import synth
    from prclz_ray.stages.blocks import extract_blocks
    from prclz_ray.stages.complexity import complexity_pipeline
    from prclz_ray.stages.parcels import parcels_pipeline

    blocks = _pa.Table.from_pylist(
        extract_blocks(rd.from_arrow(synth.regions_table()),
                       rd.from_arrow(synth.lines_table())).take_all())
    bldgs = synth.buildings_table()

    def norm(ds, cols):
        return ds.to_pandas()[cols].sort_values(cols).reset_index(drop=True)

    cols_c = ["block_id", "complexity"]
    a = norm(complexity_pipeline(blocks, rd.from_arrow(bldgs)), cols_c)
    b = norm(complexity_pipeline(blocks, rd.from_arrow(bldgs),
                                 pip_broadcast_limit_bytes=0), cols_c)
    pd.testing.assert_frame_equal(a, b)

    cols_p = ["block_id", "parcel_id", "bldg_id"]
    a = norm(parcels_pipeline(blocks, rd.from_arrow(bldgs)), cols_p)
    b = norm(parcels_pipeline(blocks, rd.from_arrow(bldgs),
                              pip_broadcast_limit_bytes=0), cols_p)
    pd.testing.assert_frame_equal(a, b)


def test_pip_tiled_left_matches_broadcast_left():
    """Tiled left join: unmatched points carry null ids, exactly as the
    broadcast left join does (a point lives in exactly one tile, so
    per-tile unmatched == globally unmatched)."""
    pts = pa.table({
        "pt_id": np.arange(40, dtype=np.int64),
        "lng": np.concatenate([RNG.uniform(0, 10, 30),
                               RNG.uniform(50, 60, 10)]),  # 10 far outside
        "lat": np.concatenate([RNG.uniform(0, 10, 30),
                               RNG.uniform(50, 60, 10)]),
    })
    bc = joins.pip_join(rd.from_arrow(pts), _polys(), id_col="poly_id",
                        how="left").to_pandas()
    tiled = joins.pip_join_tiled(rd.from_arrow(pts).repartition(3),
                                 rd.from_arrow(_polys()),
                                 id_col="poly_id", how="left").to_pandas()
    cols = ["pt_id", "poly_id"]
    a = bc[cols].sort_values(cols).reset_index(drop=True)
    b = tiled[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert b["poly_id"].isna().sum() >= 10


def test_pip_tiled_semi_anti_match_broadcast():
    """Tiled semi/anti joins (VERDICT r3 item #3): each point lives in
    exactly one tile, so per-tile match flags are globally exact. The
    tiled result must equal the broadcast PIPJoiner's semi/anti filter,
    including when the auto-router is forced past the broadcast budget."""
    pts = _points(300)
    for how in ("semi", "anti"):
        bc = joins.pip_join(rd.from_arrow(pts), _polys(), id_col="poly_id",
                            how=how).to_pandas()
        tiled = joins.pip_join_tiled(rd.from_arrow(pts).repartition(3),
                                     rd.from_arrow(_polys()),
                                     id_col="poly_id", how=how).to_pandas()
        auto = joins.pip_join_auto(rd.from_arrow(pts).repartition(3),
                                   _polys(), id_col="poly_id", how=how,
                                   broadcast_limit_bytes=0).to_pandas()
        want = sorted(bc["pt_id"].tolist())
        assert sorted(tiled["pt_id"].tolist()) == want
        assert sorted(auto["pt_id"].tolist()) == want
        # point columns only, each point at most once
        assert "poly_id" not in tiled.columns
        assert tiled["pt_id"].is_unique
    n_match = sum(o is not None for o in _oracle_pip(pts))
    assert len(bc) == len(pts) - n_match  # anti from the loop's last turn
