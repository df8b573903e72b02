"""KITTI-360 camera families: pinhole + NATIVE-ASPECT fisheye in one batch
(VERDICT r2 #2 — ref ``SameSettingImageData`` settings groups,
core/multimodal/image.py:177,1208-1219)."""

import os

import numpy as np
import pytest

from deepviewagg_tpu.utils.ply import write_ply


SEQ = "2013_05_28_drive_0000_sync"


@pytest.fixture(scope="module")
def k360_root(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    root = str(tmp_path_factory.mktemp("k360f"))
    static = os.path.join(root, "data_3d_semantics", SEQ, "static")
    os.makedirs(static)
    n = 3000
    pos = rng.uniform(0, 30, (n, 3)).astype(np.float32)
    pos[:, 2] = rng.uniform(0, 6, n)
    write_ply(os.path.join(static, "0000000000_0000000100.ply"), {
        "x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2],
        "red": rng.integers(0, 255, n).astype(np.uint8),
        "green": rng.integers(0, 255, n).astype(np.uint8),
        "blue": rng.integers(0, 255, n).astype(np.uint8),
        "semantic": rng.choice([7, 8, 11, 26], n).astype(np.int32),
    })
    poses_dir = os.path.join(root, "data_poses", SEQ)
    os.makedirs(poses_dir)
    cam_rows, imu_rows = [], []
    # pinhole optical axis (camera +z) along world +x so it actually sees
    # the cloud; camera x -> world -y, camera y -> world -z (down)
    r_cam = np.array([[0.0, 0.0, 1.0],
                      [-1.0, 0.0, 0.0],
                      [0.0, -1.0, 0.0]])
    for frame in range(0, 100, 10):
        m = np.eye(4)
        m[:3, :3] = r_cam
        m[:3, 3] = [15.0, 15.0, 1.7]
        cam_rows.append([frame] + list(m.flatten()))
        imu = np.eye(4)
        imu[:3, 3] = [15.0, 15.0, 1.7]
        imu_rows.append([frame] + list(imu[:3].flatten()))
    np.savetxt(os.path.join(poses_dir, "cam0_to_world.txt"),
               np.array(cam_rows))
    np.savetxt(os.path.join(poses_dir, "poses.txt"), np.array(imu_rows))
    calib = os.path.join(root, "calibration")
    os.makedirs(calib)
    with open(os.path.join(calib, "perspective.txt"), "w") as f:
        p = [552.55, 0.0, 682.05, 0.0, 0.0, 552.55, 238.77, 0.0,
             0.0, 0.0, 1.0, 0.0]
        f.write("P_rect_00: " + " ".join(str(v) for v in p) + "\n")
    with open(os.path.join(calib, "calib_cam_to_pose.txt"), "w") as f:
        e = np.eye(4)[:3].flatten()
        f.write("image_02: " + " ".join(str(v) for v in e) + "\n")
    with open(os.path.join(calib, "image_02.yaml"), "w") as f:
        f.write(
            "%YAML:1.0\n"
            "mirror_parameters:\n   xi: 2.2\n"
            "distortion_parameters:\n   k1: 0.02\n   k2: -0.01\n"
            "projection_parameters:\n"
            "   gamma1: 1320.0\n   gamma2: 1320.0\n"
            "   u0: 700.0\n   v0: 700.0\n"
        )
    pin_dir = os.path.join(root, "data_2d_raw", SEQ, "image_00", "data_rect")
    fe_dir = os.path.join(root, "data_2d_raw", SEQ, "image_02", "data_rgb")
    os.makedirs(pin_dir)
    os.makedirs(fe_dir)
    for frame in range(0, 100, 10):
        Image.fromarray(
            rng.integers(0, 255, (94, 352, 3)).astype(np.uint8)
        ).save(os.path.join(pin_dir, f"{frame:010d}.png"))
        Image.fromarray(
            rng.integers(0, 255, (140, 140, 3)).astype(np.uint8)
        ).save(os.path.join(fe_dir, f"{frame:010d}.png"))
    return root


def test_fisheye_family_native_aspect_batch(k360_root):
    """One sample maps through pinhole AND fisheye; collate ships each
    family at its own native aspect; the model consumes both buckets."""
    import jax

    from deepviewagg_tpu.data.collate import Bucket, collate, device_view
    from deepviewagg_tpu.data.toy import flagship_spec
    from deepviewagg_tpu.data.datasets.kitti360 import make_kitti360_dataset
    from deepviewagg_tpu.models.segmentation import build_model

    pin, fe = (352, 94), (180, 180)
    ds = make_kitti360_dataset(
        k360_root, train=True, radius=10.0, voxel_size=0.3, image_slots=6,
        samples_per_epoch=4, image_size=pin, fisheye_size=fe, frame_step=10,
        max_images=12,
    )
    assert ds.image_families == [pin, fe]
    s = None
    for i in range(4):
        cand = ds[i]
        if cand is not None and cand.image_family is not None and \
                len(np.unique(cand.image_family)) == 2:
            s = cand
            break
    assert s is not None, "no sample saw both camera families"
    # storage canvas is the max family size; families recorded per image
    assert s.images.shape[1:3] == (max(pin[0], fe[0]), max(pin[1], fe[1]))

    m = s.mapping
    vc = m.view_capacity
    fam_of_view = np.asarray(s.image_family)[m.image_id[m.view_valid]]
    assert (fam_of_view == 0).any() and (fam_of_view == 1).any()
    # fisheye pixel coords live inside the native fisheye frame
    pv = np.minimum(m.pix_view, vc - 1)
    pix_fam = np.asarray(s.image_family)[m.image_id[pv]]
    fe_pix = m.pix_valid & (pix_fam == 1)
    assert fe_pix.any()
    assert m.pix_x[fe_pix].max() < fe[0] and m.pix_y[fe_pix].max() < fe[1]

    ladder = [pin, fe]
    bucket = Bucket(
        level_caps=[4096, 2048, 1024, 512, 512], num_batches=1,
        view_cap=16384, pix_cap=131072, image_cap=12,
        image_size=s.images.shape[1:3], image_ladder=ladder,
        ladder_image_caps=[8, 8], ladder_pix_caps=[131072, 131072],
    )
    batch = collate([s], bucket, branch_levels=(0,))
    buckets = batch["mappings"][0]["buckets"]
    assert batch["bucket_images"][0].shape[1:3] == pin
    assert batch["bucket_images"][1].shape[1:3] == fe       # native 1:1
    assert any(b["pix_valid"].any() for b in buckets)

    spec = flagship_spec(num_classes=ds.num_classes,
                         backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)
    model = build_model(spec)
    dev = device_view(batch)
    out = model.init_with_output(
        jax.random.PRNGKey(0), dev, train=False)[0]
    logits = out["logits"]
    assert logits.shape == (4096, ds.num_classes)
    assert bool(np.isfinite(np.asarray(logits)).all())


def test_pointpyramid_five_branches_faithful():
    """Res16UNet34-PointPyramid-early-cityscapes-interpolate builds FIVE
    level-0 branches (Cityscapes truncations L0..L4 pooled to
    32/32/64/128/256, +512 concatenated pre-stem — sparseconv3d.yaml:
    7275-7352)."""
    import warnings

    from deepviewagg_tpu.config.zoo import get_model_spec

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # scratch-weights warning expected
        spec = get_model_spec(
            "Res16UNet34-PointPyramid-early-cityscapes-interpolate", 19)
    levels = [lvl for lvl, _ in spec.branches]
    assert levels == [0, 0, 0, 0, 0]
    outs = [b.out_channels for _, b in spec.branches]
    assert outs == [32, 32, 64, 128, 256] and sum(outs) == 512
    towers = [b.tower for _, b in spec.branches]
    assert towers == [f"resnet18_l{i}" for i in range(5)]
    assert all(b.tower_deep_stem for _, b in spec.branches)
    assert all(b.num_groups == 4 and b.fusion_mode == "concat"
               for _, b in spec.branches)
    # per-level grouping used by the model
    assert len(spec.branch_levels()[0]) == 5


def test_multi_branch_forward_tiny():
    """Two branches sharing level 0 fuse sequentially (concat chain) and
    produce one x_seen union."""
    import dataclasses

    import jax
    import numpy as np

    from deepviewagg_tpu.data.toy import flagship_spec, toy_batch
    from deepviewagg_tpu.models.segmentation import build_model

    spec0 = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                          num_groups=2)
    (lvl, b0), = spec0.branches
    b1 = dataclasses.replace(b0, tower="resnet18_l0", out_channels=16)
    spec = dataclasses.replace(spec0, branches=((0, b0), (0, b1)))
    model = build_model(spec)
    batch, _, _ = toy_batch(n_samples=1, density=25.0, image_size=(64, 32),
                            n_cameras=1)
    batch = {k: v for k, v in batch.items() if k != "meta"}
    out, variables = model.init_with_output(
        jax.random.PRNGKey(0), batch, train=False)
    assert "branch_l0" in variables["params"]
    assert "branch_l0_1" in variables["params"]
    assert bool(np.isfinite(np.asarray(out["logits"])).all())
    assert out["x_seen"].dtype == bool
