"""Numerical parity of the projection/visibility stage against the ACTUAL
reference kernels.

``/root/reference/torch_points3d/core/multimodal/visibility.py`` is executed
verbatim (torch-CPU) through tests/reference_shims.py: its ``@njit`` CPU
kernels are pure numpy and run un-jitted via the numba passthrough shim, and
the pykeops ``LazyTensor`` kNN is shimmed densely in plain torch.  The same
random scenes then run through this repo's jitted camera/visibility pipeline
(core/cameras.py, core/visibility.py) and the outputs are compared:

  * camera_projection_cpu  vs  cameras.project      (all 4 camera models)
  * SplattingVisibility    vs  splat_zbuffer        (winner maps + features)
  * BiasuttiVisibility     vs  biasutti_visibility  (incl. X-wrap margin)
  * visibility_from_depth_map vs depth_map_visibility (16-bit PNG path)

The reference runs float64 numpy, this repo float32 XLA, so pixel winners can
legitimately flip where a splat-bbox ``round()`` lands within one f32 ulp of
a half-integer or two depths near-tie at one pixel; the assertions therefore
demand exact agreement on >=99% of mappings (observed agreement is higher)
and exact value agreement on the agreeing rows.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from reference_shims import load_reference_visibility

from deepviewagg_tpu.core import cameras as C
from deepviewagg_tpu.core import visibility as V

SIZE = (96, 48)
R_MIN, R_MAX = 0.5, 30.0


@pytest.fixture(scope="module")
def rv():
    return load_reference_visibility()


def _rot(rng):
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def _equirect_scene(rng, n=2500, center=(3.0, -1.0, 1.5)):
    """Points in a latitude band (polar 60-120 deg) so splat x-widths stay
    bounded away from the panorama poles."""
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = rng.uniform(np.deg2rad(60), np.deg2rad(120), n)
    r = rng.uniform(1.0, 12.0, n)
    rel = np.stack([
        r * np.sin(phi) * np.cos(theta),
        r * np.sin(phi) * np.sin(theta),
        r * np.cos(phi),
    ], 1)
    c = np.asarray(center, np.float32)
    return (rel + c).astype(np.float32), c


def _pinhole_scene(rng, pose, k, n=2500, z=(2.0, 15.0)):
    """Backproject random in-frustum pixels at random depths through the
    cam->world pose."""
    u = rng.uniform(2, SIZE[0] - 2, n)
    v = rng.uniform(2, SIZE[1] - 2, n)
    zz = rng.uniform(*z, n)
    pc = np.stack([(u - k[0, 2]) * zz / k[0, 0],
                   (v - k[1, 2]) * zz / k[1, 1], zz], 1)
    return (pc @ pose[:3, :3].T + pose[:3, 3]).astype(np.float32)


def _fisheye_scene(rng, pose, n=2000, cone_deg=45.0):
    """Directions within a cone of the camera +z axis, radius 1.5-10."""
    a = rng.uniform(0, np.deg2rad(cone_deg), n)
    b = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([np.sin(a) * np.cos(b), np.sin(a) * np.sin(b), np.cos(a)], 1)
    r = rng.uniform(1.5, 10.0, n)[:, None]
    return ((d * r) @ pose[:3, :3].T + pose[:3, 3]).astype(np.float32)


_K = np.array([[50.0, 0, 48, 0], [0, 50.0, 24, 0],
               [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
_FISH = np.array([1.2, 0.05, -0.01, 30.0, 30.0, 48.0, 24.0], np.float32)


def _setup(model, rng):
    """(xyz, our Camera, ref kwargs, ref img_xyz) for one camera model."""
    if model == "s3dis_equirectangular":
        xyz, c = _equirect_scene(rng)
        opk = np.array([0.1, -0.2, 0.7], np.float32)
        cam = C.Camera(model=model, size=SIZE, pos=c, opk=opk,
                       crop_top=4, crop_bottom=4, r_min=R_MIN, r_max=R_MAX)
        return xyz, cam, {"img_opk": torch.from_numpy(opk)}, c
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = _rot(rng)
    if model == "kitti360_fisheye":
        # camera at the world origin: the reference's fisheye splat swell
        # uses |xyz| in WORLD frame (visibility.py:877-886), which matches
        # the camera distance only when the center is at the origin
        xyz = _fisheye_scene(rng, pose)
        cam = C.Camera(model=model, size=SIZE, extrinsic=pose,
                       fisheye=_FISH, r_min=R_MIN, r_max=R_MAX)
        return xyz, cam, {
            "img_extrinsic": torch.from_numpy(pose),
            "img_intrinsic_fisheye": torch.from_numpy(_FISH),
        }, pose[:3, 3]
    pose[:3, 3] = np.asarray([2.0, -1.0, 0.5], np.float32)
    xyz = _pinhole_scene(rng, pose, _K)
    cam = C.Camera(model=model, size=SIZE, extrinsic=pose, intrinsic=_K,
                   r_min=R_MIN, r_max=R_MAX)
    return xyz, cam, {
        "img_extrinsic": torch.from_numpy(pose),
        "img_intrinsic_pinhole": torch.from_numpy(_K),
    }, pose[:3, 3]


MODELS = ["s3dis_equirectangular", "scannet", "kitti360_perspective",
          "kitti360_fisheye"]


@pytest.mark.parametrize("model", MODELS)
def test_projection_parity(rv, model):
    rng = np.random.default_rng(7)
    xyz, cam, kw, c = _setup(model, rng)
    ref_idx, ref_dist, ref_x, ref_y = rv.camera_projection(
        torch.from_numpy(xyz), torch.from_numpy(np.asarray(c, np.float32)),
        img_size=SIZE, crop_top=cam.crop_top, crop_bottom=cam.crop_bottom,
        r_min=R_MIN, r_max=R_MAX, camera=model, **kw)
    x, y, dist, valid = C.project(xyz, cam)
    ours = np.nonzero(np.asarray(valid))[0]
    ref = np.asarray(ref_idx)
    # r_min/r_max and FOV edges can flip in f32 vs the reference's f64
    sym = len(set(ours) ^ set(ref))
    assert sym <= max(2, 0.002 * len(ref)), (sym, len(ref))
    common = np.asarray(sorted(set(ours) & set(ref)))
    ref_pos = {int(i): j for j, i in enumerate(ref)}
    take = np.asarray([ref_pos[int(i)] for i in common])
    np.testing.assert_allclose(np.asarray(x)[common],
                               np.asarray(ref_x)[take], atol=5e-2)
    np.testing.assert_allclose(np.asarray(y)[common],
                               np.asarray(ref_y)[take], atol=5e-2)
    np.testing.assert_allclose(np.asarray(dist)[common],
                               np.asarray(ref_dist)[take], atol=1e-3)


def _geo(rng, n):
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return {
        "linearity": rng.uniform(0, 1, n).astype(np.float32),
        "planarity": rng.uniform(0, 1, n).astype(np.float32),
        "scattering": rng.uniform(0, 1, n).astype(np.float32),
        "normal": nrm.astype(np.float32),
    }


@pytest.mark.parametrize("model,exact", [
    ("s3dis_equirectangular", False),
    ("s3dis_equirectangular", True),
    ("scannet", False),
    ("kitti360_perspective", False),
    ("kitti360_fisheye", False),
])
def test_splatting_parity(rv, model, exact):
    """Full SplattingVisibility vs splat_zbuffer: same pixel->winner map and
    the same 6 viewing-condition features for the winners."""
    rng = np.random.default_rng(3)
    xyz, cam, kw, c = _setup(model, rng)
    n = len(xyz)
    geo = _geo(rng, n)
    voxel, k_swell, d_swell, max_splat = 0.1, 1.0, 1000.0, 10

    ref_model = rv.SplattingVisibility(
        voxel=voxel, k_swell=k_swell, d_swell=d_swell, exact=exact,
        img_size=SIZE, crop_top=cam.crop_top, crop_bottom=cam.crop_bottom,
        r_min=R_MIN, r_max=R_MAX, camera=model)
    ref = ref_model(
        torch.from_numpy(xyz), torch.from_numpy(np.asarray(c, np.float32)),
        linearity=torch.from_numpy(geo["linearity"]),
        planarity=torch.from_numpy(geo["planarity"]),
        scattering=torch.from_numpy(geo["scattering"]),
        normals=torch.from_numpy(geo["normal"]), **kw)
    ref_map = {(int(x), int(y)): int(i) for x, y, i in
               zip(ref["x"], ref["y"], ref["idx"])}

    out = V.splat_zbuffer(cam, xyz, voxel=voxel, k_swell=k_swell,
                          d_swell=d_swell, exact=exact, max_splat=max_splat,
                          geo=geo)
    idx_map, feats6 = np.asarray(out[0]), np.asarray(out[6])
    xs, ys = np.nonzero(idx_map >= 0)
    our_map = {(int(x), int(y)): int(idx_map[x, y]) for x, y in zip(xs, ys)}

    keys = set(ref_map) | set(our_map)
    agree = sum(ref_map.get(k2) == our_map.get(k2) for k2 in keys)
    assert agree / len(keys) >= 0.99, (agree, len(keys), model, exact)

    # features of agreeing winners match the reference's postprocess
    ref_feat = np.asarray(ref["features"], np.float32)
    ref_rows = {(int(x), int(y)): r for x, y, r in
                zip(ref["x"], ref["y"], ref_feat)}
    checked = 0
    for k2, i in our_map.items():
        if ref_map.get(k2) == i:
            np.testing.assert_allclose(
                feats6[i], ref_rows[k2], atol=3e-3,
                err_msg=f"{model} feats at {k2}")
            checked += 1
    assert checked > 0.9 * len(ref_map)


@pytest.mark.parametrize("threshold,x_margin", [(0.7, None), (None, 8)])
def test_biasutti_parity(rv, threshold, x_margin):
    """BiasuttiVisibility (dense-shimmed keops kNN) vs biasutti_visibility,
    with and without the equirectangular X-wrap margin."""
    rng = np.random.default_rng(11)
    xyz, cam, kw, c = _setup("s3dis_equirectangular", rng)
    k = 16
    ref_model = rv.BiasuttiVisibility(
        k=k, margin=x_margin, threshold=threshold, img_size=SIZE,
        crop_top=cam.crop_top, crop_bottom=cam.crop_bottom,
        r_min=R_MIN, r_max=R_MAX, camera="s3dis_equirectangular")
    ref = ref_model(
        torch.from_numpy(xyz), torch.from_numpy(np.asarray(c, np.float32)),
        **kw)
    ref_seen = set(int(i) for i in ref["idx"])

    x, y, dist, valid = C.project(xyz, cam)
    mask = V.biasutti_visibility(
        x, y, dist, valid, k=k, threshold=threshold,
        x_margin=x_margin, x_width=SIZE[0])
    our_seen = set(np.nonzero(np.asarray(mask))[0].tolist())
    sym = len(ref_seen ^ our_seen)
    # kNN distance near-ties (f32 vs f64) can swap borderline neighbors
    assert sym <= max(3, 0.02 * len(ref_seen)), (sym, len(ref_seen))


def test_depth_map_parity(rv, tmp_path):
    """visibility_from_depth_map (16-bit PNG, 1/512 m quantization) vs
    depth_map_visibility fed the reference's own decoded map."""
    from PIL import Image

    rng = np.random.default_rng(5)
    xyz, cam, kw, c = _setup("s3dis_equirectangular", rng)
    w, h = SIZE
    depth = rng.uniform(1.0, 12.0, (h, w)).astype(np.float64)
    png = np.round(depth * 512).astype(np.uint16)
    png[0, :4] = 2 ** 16 - 1                          # some empty pixels
    path = str(tmp_path / "depth.png")
    Image.fromarray(png).save(path)

    ref_idx, ref_dist, ref_x, ref_y = rv.camera_projection(
        torch.from_numpy(xyz), torch.from_numpy(np.asarray(c, np.float32)),
        img_size=SIZE, crop_top=cam.crop_top, crop_bottom=cam.crop_bottom,
        r_min=R_MIN, r_max=R_MAX, camera="s3dis_equirectangular", **kw)
    out_idx, _, _ = rv.visibility_from_depth_map(
        ref_x, ref_y, ref_dist, depth_map_path=path, img_size=SIZE,
        depth_threshold=0.5)
    ref_seen = set(int(ref_idx[i]) for i in out_idx)

    decoded = np.asarray(rv.read_s3dis_depth_map(path, img_size=SIZE,
                                                 empty=-1), np.float32)
    x, y, dist, valid = C.project(xyz, cam)
    mask = np.asarray(valid) & np.asarray(
        V.depth_map_visibility(x, y, dist, decoded, depth_threshold=0.5))
    our_seen = set(np.nonzero(mask)[0].tolist())
    sym = len(ref_seen ^ our_seen)
    assert sym <= max(2, 0.005 * len(ref_seen)), (sym, len(ref_seen))
