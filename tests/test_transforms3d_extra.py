"""Round-2 3D transform breadth (SURVEY #27 gap): crop/dropout family,
chromatic augmentations, feature composition — all tracking row selection
through select_rows (labels/feats/mapping follow)."""

import numpy as np
import pytest

from deepviewagg_tpu.data import transforms3d as t3


@pytest.fixture
def cloud(rng):
    n = 500
    return {
        "pos": rng.uniform(0, 4, (n, 3)).astype(np.float32),
        "rgb": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "labels": rng.integers(0, 4, n).astype(np.int32),
        "origin_id": np.arange(n, dtype=np.int64),
    }


def _rows_consistent(c):
    n = len(c["pos"])
    assert len(c["rgb"]) == n and len(c["labels"]) == n
    assert len(c["origin_id"]) == n
    return n


def test_crops_reduce_and_stay_consistent(cloud, rng):
    n0 = len(cloud["pos"])
    for tf in (t3.SphereCrop(radius=1.5), t3.CubeCrop(c=1.2),
               t3.EllipsoidCrop(1.5, 1.2, 1.0)):
        out = tf(cloud, np.random.default_rng(5))
        n = _rows_consistent(out)
        assert 16 <= n < n0
        # original rows preserved (origin_id is a subset)
        assert set(out["origin_id"]) <= set(cloud["origin_id"])
    # SphereCrop: all kept points inside SOME 1.0-radius sphere around a point
    out = t3.SphereCrop(radius=1.0)(cloud, np.random.default_rng(3))
    span = out["pos"].max(0) - out["pos"].min(0)
    assert (span <= 2.0 + 1e-5).all()


def test_sphere_dropouts(cloud, rng):
    out = t3.RandomSphereDropout(num_sphere=3, radius=0.7)(cloud, rng)
    n = _rows_consistent(out)
    assert n < len(cloud["pos"])
    c = cloud["pos"][10]
    out2 = t3.FixedSphereDropout([c], radius=0.5)(cloud, rng)
    d = np.linalg.norm(out2["pos"] - c, axis=1)
    assert (d >= 0.5).all()


def test_random_walk_dropout_and_density_filter(cloud, rng):
    out = t3.RandomWalkDropout(dropout_ratio=0.1, num_iter=200)(cloud, rng)
    assert 16 <= _rows_consistent(out) < len(cloud["pos"])
    # add an isolated far point: DensityFilter must remove it
    iso = dict(cloud)
    iso["pos"] = np.concatenate([cloud["pos"],
                                 np.array([[99, 99, 99]], np.float32)])
    iso["rgb"] = np.concatenate([cloud["rgb"], np.zeros((1, 3), np.float32)])
    iso["labels"] = np.concatenate([cloud["labels"], [0]]).astype(np.int32)
    iso["origin_id"] = np.arange(len(iso["pos"]), dtype=np.int64)
    out = t3.DensityFilter(radius_nn=0.5, min_num=2)(iso, rng)
    assert len(iso["pos"]) - 1 not in out["origin_id"]


def test_periodic_sampling_and_shuffle(cloud, rng):
    out = t3.PeriodicSampling(period=0.5, prop=0.3)(cloud, rng)
    assert 16 <= _rows_consistent(out) < len(cloud["pos"])
    sh = t3.ShuffleData()(cloud, rng)
    assert not np.array_equal(sh["origin_id"], cloud["origin_id"])
    # rows stay aligned through the permutation
    i = int(np.nonzero(sh["origin_id"] == 7)[0][0])
    np.testing.assert_array_equal(sh["pos"][i], cloud["pos"][7])


def test_shift_voxels_and_translation(cloud, rng):
    q = t3.quantize_cloud(cloud, 0.2)
    out = t3.ShiftVoxels()(q, np.random.default_rng(1))
    delta = out["coords"] - q["coords"]
    assert (delta == delta[0]).all() and (delta[0] >= 0).all()
    tr = t3.RandomTranslation(delta=0.5)(cloud, rng)
    shift = tr["pos"] - cloud["pos"]
    assert np.allclose(shift, shift[0]) and np.abs(shift).max() <= 0.5


def test_chromatic_transforms_stay_in_unit_range(cloud):
    rng = np.random.default_rng(0)
    for tf in (t3.ChromaticTranslation(0.3, p=1.0),
               t3.ChromaticAutoContrast(p=1.0),
               t3.ChromaticJitter(0.05, p=1.0)):
        out = tf(cloud, rng)
        assert out["rgb"].min() >= 0 and out["rgb"].max() <= 1
        assert not np.array_equal(out["rgb"], cloud["rgb"])
    z = t3.DropFeature(drop_proba=1.0)(cloud, rng)
    assert (z["rgb"] == 0).all()


def test_feature_composition(cloud, rng):
    c = t3.XYZFeature(add_z=True, add_x=False, add_y=False)(cloud)
    c = t3.AddOnes()(c)
    c = t3.AddFeatsByKeys(["rgb", "xyz_feat", "ones"])(c)
    assert c["feats"].shape == (len(c["pos"]), 5)
    np.testing.assert_array_equal(c["feats"][:, :3], c["rgb"])
    np.testing.assert_array_equal(c["feats"][:, 3], c["pos"][:, 2])
    assert (c["feats"][:, 4] == 1).all()
    with pytest.raises(KeyError):
        t3.AddFeatsByKeys(["nope"])(cloud)


def test_round2_parity_transforms(rng):
    import numpy as np
    from deepviewagg_tpu.data import transforms3d as T

    n = 200
    cloud = {
        "pos": rng.normal(size=(n, 3)).astype(np.float32) * 3,
        "rgb": (rng.random((n, 3)) * 255).astype(np.float32),
        "labels": rng.integers(0, 4, n).astype(np.int32),
        "normal": np.tile(np.float32([0, 0, 1]), (n, 1)),
    }
    # 3-axis rotation preserves norms and rotates normals
    out = T.Random3AxisRotation(rot_x=10, rot_y=10, rot_z=180)(cloud, rng)
    np.testing.assert_allclose(
        np.linalg.norm(out["pos"], axis=1),
        np.linalg.norm(cloud["pos"], axis=1), rtol=1e-5)
    assert not np.allclose(out["normal"], cloud["normal"])

    out = T.RandomCoordsFlip(ignored_axis="z", p=1.0)(cloud, rng)
    np.testing.assert_allclose(out["pos"][:, 0],
                               cloud["pos"][:, 0].max() - cloud["pos"][:, 0],
                               rtol=1e-5)
    np.testing.assert_array_equal(out["pos"][:, 2], cloud["pos"][:, 2])

    out = T.NormalizeRGB()(cloud)
    assert out["rgb"].max() <= 1.0 and out["rgb"].min() >= 0.0
    # already-normalized rgb is left alone
    again = T.NormalizeRGB()(out)
    np.testing.assert_array_equal(again["rgb"], out["rgb"])

    out = T.NormalizeFeature("rgb")(cloud)
    assert out["rgb"].min() == 0.0 and abs(out["rgb"].max() - 1.0) < 1e-6
    out = T.NormalizeFeature("rgb", standardize=True)(cloud)
    assert abs(out["rgb"].mean()) < 1e-5

    out = T.ScalePos(2.0)(cloud)
    np.testing.assert_allclose(out["pos"], cloud["pos"] * 2.0)

    out = T.RemoveAttributes(["rgb", "nope"])(cloud)
    assert "rgb" not in out and "pos" in out
    try:
        T.RemoveAttributes(["nope"], strict=True)(cloud)
        assert False, "strict must raise"
    except KeyError:
        pass

    out = T.AddFeatByKey("rgb")(dict(cloud, feats=cloud["pos"]))
    assert out["feats"].shape == (n, 6)

    out = T.LotteryTransform([T.ScalePos(2.0), T.ScalePos(2.0)])(cloud, rng)
    np.testing.assert_allclose(out["pos"], cloud["pos"] * 2.0)

    out = T.RandomParamTransform(
        T.ScalePos, {"scale": {"min": 1.5, "max": 1.5}})(cloud, rng)
    np.testing.assert_allclose(out["pos"], cloud["pos"] * 1.5)

    out = T.IrregularSampling(d_half=1.0)(cloud, rng)
    assert 0 < len(out["pos"]) <= n
    assert len(out["labels"]) == len(out["pos"])

    out = T.CylinderNormalizeScale()(cloud)
    assert np.abs(out["pos"][:, :2]).max() <= 1.0
    assert np.abs(out["pos"][:, 2]).max() <= 1.0

    flat = {"pos": np.concatenate(
        [rng.normal(size=(n, 2)).astype(np.float32) * 3,
         rng.normal(size=(n, 1)).astype(np.float32) * 0.01], axis=1)}
    assert not T.planarity_filter(flat, thresh=0.3)          # planar -> fails leq
    assert T.planarity_filter(flat, thresh=0.3, is_leq=False)
    blob = {"pos": rng.normal(size=(n, 3)).astype(np.float32)}
    assert T.planarity_filter(blob, thresh=0.3)
