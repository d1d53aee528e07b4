"""S2 index + tiling: encode/decode roundtrip, bbox covering, neighbor
rings, skew histogram → salt plan → salted groupby."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from prclz_ray.index import s2, tiling


def test_cellid_roundtrip_center():
    rng = np.random.default_rng(3)
    lng = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-85, 85, 500)
    cid = s2.lnglat_to_cellid(lng, lat)
    assert (s2.cellid_level(cid) == s2.DEFAULT_LEVEL).all()
    clng, clat = s2.cell_center_lnglat(cid)
    # the center of a point's cell must re-encode to the same cell
    cid2 = s2.lnglat_to_cellid(clng, clat)
    assert (cid == cid2).all()
    # and the center is close to the original point (level-14 cell ~ 600 m)
    assert np.abs(clng - lng).max() < 0.05
    assert np.abs(clat - lat).max() < 0.05


def test_cover_bbox_contains_inner_points():
    cells = set(s2.cover_bbox(10.0, 10.0, 10.2, 10.2, level=10).tolist())
    rng = np.random.default_rng(4)
    lng = rng.uniform(10.0, 10.2, 200)
    lat = rng.uniform(10.0, 10.2, 200)
    pts = s2.lnglat_to_cellid(lng, lat, level=10)
    assert set(pts.tolist()) <= cells


def test_neighbors_include_adjacent_point_cells():
    cid = s2.lnglat_to_cellid(np.array([10.0]), np.array([10.0]))[0]
    ring = set(s2.cell_neighbors_same_face(np.array([cid])).tolist())
    # tiny offsets stay within the 3x3 neighborhood
    for d in (-0.004, 0.004):
        n = s2.lnglat_to_cellid(np.array([10.0 + d]), np.array([10.0]))[0]
        assert n in ring or n == cid
        n = s2.lnglat_to_cellid(np.array([10.0]), np.array([10.0 + d]))[0]
        assert n in ring or n == cid


def test_salt_plan_splits_hot_cells():
    cells = np.array([1] * 900 + [2] * 50 + [3] * 50, dtype=np.uint64)
    ds = rd.from_arrow(pa.table({
        "cell": cells,
        "block_id": [f"b{i % 7}" for i in range(1000)],
    })).repartition(4)
    hist = tiling.cell_histogram(ds)
    plan = tiling.salt_plan(pa.Table.from_pandas(hist.to_pandas()),
                            threshold=100)
    assert set(plan) == {1}
    assert plan[1] == 9

    salted = ds.map_batches(
        lambda b: tiling.apply_salt_batch(b, plan, key_col="block_id"),
        batch_format="pyarrow")
    df = salted.to_pandas()
    df["salt"] = df["cell_salted"].astype(np.uint64) % 64
    # hot cell fans out across salts, cold cells get salt 0 only
    hot = df[df["cell"] == 1]
    assert hot["salt"].nunique() > 1
    assert (df[df["cell"] != 1]["salt"] == 0).all()
    # same block_id always lands in the same salt (block never split)
    per_block = hot.groupby("block_id")["salt"].nunique()
    assert (per_block == 1).all()
