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
