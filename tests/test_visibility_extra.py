"""Biasutti visibility + KITTI-360 fisheye calib parsing."""

import os

import numpy as np

from deepviewagg_tpu.core.cameras import Camera, project
from deepviewagg_tpu.core.visibility import biasutti_visibility


def test_biasutti_foreground_visible(rng):
    """A near wall must occlude a far wall behind it (same pixels)."""
    n = 400
    near = np.zeros((n, 3), np.float32)
    near[:, 0] = 2.0
    near[:, 1] = rng.uniform(-1, 1, n)
    near[:, 2] = rng.uniform(-1, 1, n)
    far = near.copy()
    far[:, 0] = 8.0
    far[:, 1:] *= 4.0     # same angular extent -> same pixels
    pos = np.concatenate([near, far])
    cam = Camera(model="s3dis_equirectangular", size=(128, 64),
                 pos=np.zeros(3, np.float32),
                 opk=np.zeros(3, np.float32), r_min=0.1, r_max=30.0)
    x, y, dist, valid = project(pos, cam)
    vis = np.asarray(biasutti_visibility(x, y, dist, valid, k=16,
                                         threshold=0.7))
    assert vis[:n].mean() > 0.8          # near wall visible (alpha ~ 1)
    assert vis[n:].mean() < 0.3          # far wall occluded (alpha ~ e^-1)


def test_fisheye_calib_parsing(tmp_path):
    from deepviewagg_tpu.data.datasets.kitti360 import (
        read_cam_to_pose, read_fisheye_calib, read_imu_poses,
    )

    yml = tmp_path / "image_02.yaml"
    yml.write_text(
        "%YAML:1.0\n"
        "mirror_parameters:\n   xi: 2.21\n"
        "distortion_parameters:\n   k1: 0.01\n   k2: -0.002\n"
        "projection_parameters:\n   gamma1: 1336.0\n   gamma2: 1336.0\n"
        "   u0: 716.9\n   v0: 705.7\n"
    )
    fe = read_fisheye_calib(str(yml))
    assert fe is not None and fe[0] == np.float32(2.21)

    c2p = tmp_path / "calib_cam_to_pose.txt"
    m = " ".join(str(v) for v in np.eye(4)[:3].flatten())
    c2p.write_text(f"image_02: {m}\n")
    d = read_cam_to_pose(str(c2p))
    assert "image_02" in d and d["image_02"].shape == (4, 4)

    poses = tmp_path / "poses.txt"
    poses.write_text("0 " + m + "\n10 " + m + "\n")
    p = read_imu_poses(str(poses))
    assert set(p) == {0, 10}


def test_visibility_method_dispatch_biasutti_and_depth():
    """VisibilityParams.method routes the mapping factory through
    BiasuttiVisibility / DepthBasedVisibility (ref VisibilityModel
    dispatcher, visibility.py:1677-1801)."""
    import numpy as np

    from deepviewagg_tpu.core import visibility as vis
    from deepviewagg_tpu.data import synthetic
    from deepviewagg_tpu.data.geometric import pca_features
    from deepviewagg_tpu.data.mapping_factory import (VisibilityParams,
                                                      build_mappings)

    scene = synthetic.make_scene(seed=0, density=120.0, n_cameras=2,
                                 image_size=(64, 32))
    geo = pca_features(scene.pos, k=8)

    m_b = build_mappings(
        scene.pos, scene.cameras,
        VisibilityParams(voxel=0.08, method="biasutti", biasutti_k=16,
                         biasutti_margin=4),
        geometric=geo, nn_idx=geo["nn_idx"],
    )
    assert m_b.num_views > 0 and m_b.num_pixels == m_b.num_views
    assert np.isfinite(m_b.view_feats[m_b.view_valid]).all()
    m_b.check()

    # depth maps from the splatting z-buffer double as sensor depths: the
    # winning points must be re-identified as visible
    depth_maps = []
    for cam in scene.cameras:
        out = vis.splat_zbuffer(cam, scene.pos, voxel=0.08, geo=None)
        depth_maps.append(np.asarray(out[1]))
    m_d = build_mappings(
        scene.pos, scene.cameras,
        VisibilityParams(voxel=0.08, method="depth", depth_threshold=0.1),
        geometric=geo, nn_idx=geo["nn_idx"],
        depth_maps=depth_maps,
    )
    assert m_d.num_views > 0
    m_d.check()

    # depth method without maps is an explicit error
    import pytest

    with pytest.raises(ValueError):
        build_mappings(scene.pos, scene.cameras,
                       VisibilityParams(method="depth"), geometric=geo,
                       nn_idx=geo["nn_idx"])
