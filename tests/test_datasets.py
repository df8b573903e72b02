"""Dataset loaders on fabricated raw data in the reference formats.

Builds miniature S3DIS / ScanNet / KITTI-360 trees (annotation txts, pose
JSONs, PLYs, calib files, images) and runs the full preprocess -> cache ->
sphere/cylinder-sample -> collate pipeline.
"""

import json
import os

import numpy as np
import pytest

from deepviewagg_tpu.utils.ply import read_ply, write_ply


def test_ply_roundtrip(tmp_path, rng):
    n = 100
    fields = {
        "x": rng.normal(size=n).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": rng.normal(size=n).astype(np.float32),
        "red": rng.integers(0, 255, n).astype(np.uint8),
        "semantic": rng.integers(0, 40, n).astype(np.int32),
    }
    p = str(tmp_path / "t.ply")
    write_ply(p, fields)
    back = read_ply(p)
    for k, v in fields.items():
        np.testing.assert_array_equal(back[k], v)


def _fake_s3dis(root, rng):
    from PIL import Image

    from deepviewagg_tpu.data import synthetic

    scene = synthetic.make_scene(seed=7, density=60.0, n_cameras=2,
                                 image_size=(128, 64))
    area = os.path.join(root, "Area_1")
    room = os.path.join(area, "office_1", "Annotations")
    os.makedirs(room)
    # split points between two "objects"
    half = len(scene.pos) // 2
    for name, sl in [("wall_1.txt", slice(0, half)),
                     ("chair_1.txt", slice(half, None))]:
        data = np.concatenate(
            [scene.pos[sl], (scene.rgb[sl] * 255).astype(np.float32)], axis=1
        )
        np.savetxt(os.path.join(room, name), data, fmt="%.4f")
    pose_dir = os.path.join(area, "data", "pose")
    rgb_dir = os.path.join(area, "data", "rgb")
    os.makedirs(pose_dir)
    os.makedirs(rgb_dir)
    for i, cam in enumerate(scene.cameras):
        with open(os.path.join(pose_dir, f"camera_{i}_office_1_pose.json"), "w") as f:
            json.dump({
                "camera_location": [float(v) for v in cam.pos],
                "final_camera_rotation": [float(v) for v in cam.opk],
            }, f)
        img = (rng.uniform(0, 255, (64, 128, 3))).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(rgb_dir, f"camera_{i}_office_1_rgb.png")
        )
    # area 5 as eval fold: symlink same content
    os.symlink(area, os.path.join(root, "Area_5"))
    return root


def test_s3dis_pipeline(tmp_path, rng):
    from deepviewagg_tpu.data.datasets.s3dis import (
        NUM_CLASSES, make_s3dis_dataset,
    )

    root = str(tmp_path / "s3dis")
    os.makedirs(root)
    _fake_s3dis(root, rng)
    # train on all-but-5 => only Area_1 exists of those
    ds = make_s3dis_dataset(
        root, train=True, fold=5, radius=2.5, voxel_size=0.2,
        image_slots=2, samples_per_epoch=3, image_size=(128, 64),
    )
    assert ds.num_classes == NUM_CLASSES
    s = ds[0]
    assert s is not None
    assert s.coords.shape[1] == 3 and len(s.feats) == len(s.coords)
    assert s.mapping is not None and s.images is not None
    s.mapping.check()
    # labels must be wall(2) or chair(7)
    u = set(np.unique(s.labels[s.labels >= 0]).tolist())
    assert u <= {2, 7}


def test_scannet_pipeline(tmp_path, rng):
    from PIL import Image

    from deepviewagg_tpu.data import synthetic
    from deepviewagg_tpu.data.datasets.scannet import (
        make_scannet_dataset, NUM_CLASSES,
    )

    scene = synthetic.make_scene(seed=9, density=60.0, n_cameras=2,
                                 image_size=(64, 48), camera_model="scannet")
    root = str(tmp_path / "scannet")
    scan = os.path.join(root, "scans", "scene0000_00")
    for sub in ("pose", "color", "intrinsic"):
        os.makedirs(os.path.join(scan, sub))
    write_ply(os.path.join(scan, "scene0000_00_vh_clean_2.ply"), {
        "x": scene.pos[:, 0], "y": scene.pos[:, 1], "z": scene.pos[:, 2],
        "red": (scene.rgb[:, 0] * 255).astype(np.uint8),
        "green": (scene.rgb[:, 1] * 255).astype(np.uint8),
        "blue": (scene.rgb[:, 2] * 255).astype(np.uint8),
    })
    # labels ply: NYU40 ids (wall=1, floor=2 ...)
    nyu = np.where(scene.labels == 0, 2, 1).astype(np.uint16)
    write_ply(os.path.join(scan, "scene0000_00_vh_clean_2.labels.ply"), {
        "x": scene.pos[:, 0], "y": scene.pos[:, 1], "z": scene.pos[:, 2],
        "label": nyu,
    })
    for i, cam in enumerate(scene.cameras):
        # the synthetic scannet extrinsic IS the cam->world pose file content
        np.savetxt(os.path.join(scan, "pose", f"{i}.txt"), cam.extrinsic)
        img = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(scan, "color", f"{i}.jpg"))
    np.savetxt(os.path.join(scan, "intrinsic", "intrinsic_color.txt"),
               np.asarray(cam.intrinsic, np.float32))
    ds = make_scannet_dataset(
        root, train=True, voxel_size=0.2, image_slots=2, radius=2.5,
        samples_per_epoch=2, image_size=(64, 48), frame_step=1,
    )
    assert ds.num_classes == NUM_CLASSES
    s = ds[0]
    assert s is not None and s.mapping is not None
    s.mapping.check()
    u = set(np.unique(s.labels[s.labels >= 0]).tolist())
    assert u <= {0, 1}  # wall, floor train ids


def test_kitti360_pipeline(tmp_path, rng):
    from PIL import Image

    from deepviewagg_tpu.data.datasets.kitti360 import (
        ID2TRAINID, NUM_CLASSES, TRAINID2ID, make_kitti360_dataset,
        write_submission,
    )

    assert ID2TRAINID[26] == 13 and TRAINID2ID[13] == 26  # car roundtrip
    root = str(tmp_path / "k360")
    seq = "2013_05_28_drive_0000_sync"
    static = os.path.join(root, "data_3d_semantics", seq, "static")
    os.makedirs(static)
    n = 4000
    pos = rng.uniform(0, 30, (n, 3)).astype(np.float32)
    pos[:, 2] = rng.uniform(0, 4, n)
    sem = rng.choice([7, 8, 11, 26], n).astype(np.int32)
    write_ply(os.path.join(static, "0000000000_0000000100.ply"), {
        "x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2],
        "red": rng.integers(0, 255, n).astype(np.uint8),
        "green": rng.integers(0, 255, n).astype(np.uint8),
        "blue": rng.integers(0, 255, n).astype(np.uint8),
        "semantic": sem,
    })
    # poses + calib + one image
    poses_dir = os.path.join(root, "data_poses", seq)
    os.makedirs(poses_dir)
    rows = []
    for frame in range(0, 100, 10):
        m = np.eye(4)
        m[:3, 3] = [15.0, 15.0, 1.7]
        rows.append([frame] + list(m.flatten()))
    np.savetxt(os.path.join(poses_dir, "cam0_to_world.txt"), np.array(rows))
    calib_dir = os.path.join(root, "calibration")
    os.makedirs(calib_dir)
    with open(os.path.join(calib_dir, "perspective.txt"), "w") as f:
        p = [552.55, 0.0, 682.05, 0.0, 0.0, 552.55, 238.77, 0.0,
             0.0, 0.0, 1.0, 0.0]
        f.write("P_rect_00: " + " ".join(str(v) for v in p) + "\n")
    img_dir = os.path.join(root, "data_2d_raw", seq, "image_00", "data_rect")
    os.makedirs(img_dir)
    for frame in range(0, 100, 10):
        img = rng.integers(0, 255, (376, 1408, 3)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"{frame:010d}.png"))

    ds = make_kitti360_dataset(
        root, train=True, radius=8.0, voxel_size=0.3, image_slots=2,
        samples_per_epoch=2, image_size=(352, 94), frame_step=10,
    )
    assert ds.num_classes == NUM_CLASSES
    s = ds[0]
    assert s is not None
    u = set(np.unique(s.labels[s.labels >= 0]).tolist())
    assert u <= {0, 1, 2, 13}

    # submission writer
    z = write_submission(
        str(tmp_path / "sub"),
        {f"{seq}_0000000000_0000000100": np.array([0, 13, 18])},
    )
    assert os.path.exists(z)
