"""COMPOSED offline-preprocessing parity (VERDICT r4 missing #3).

The reference's full ``MapImages.__call__`` chain executes verbatim on a
synthetic scene — per-image sphere subsample -> ``SplattingVisibility`` ->
proj_upscale/crop/downscale coordinate conversion -> ``lexargunique`` dedup
-> ``ImageMapping.from_dense`` -> seen-image reindex
(core/data_transform/multimodal/image.py:162-428) — followed by
``NeighborhoodBasedMappingFeatures`` (:431-612) appending the density and
occlusion columns.  The SAME scene then runs through this repo's
``data/mapping_factory.build_mappings`` and the resulting mapping tables are
compared row-for-row: view keys (point, image), per-view pixel sets, and all
8 mapping features.

The reference z-buffer runs float64 numpy (un-jitted numba), this repo
float32 XLA, so pixel winners can flip where two depths near-tie; the
assertions demand exact agreement on >=99% of view rows (observed higher)
and feature agreement on the common rows — the same statistical contract as
tests/test_reference_visibility_parity.py, now applied to the COMPOSED
pipeline output rather than its kernels.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from reference_shims import load_reference_image, \
    load_reference_mm_image_transforms

from deepviewagg_tpu.core import cameras as C
from deepviewagg_tpu.data.mapping_factory import VisibilityParams, \
    build_mappings

SIZE = (96, 48)
R_MIN, R_MAX = 0.5, 30.0
VOXEL, K_SWELL, D_SWELL = 0.1, 1.0, 1000.0
KNN_K = 8
N_IMG = 3

_K4 = np.array([[50.0, 0, 48, 0], [0, 50.0, 24, 0],
                [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def ri():
    return load_reference_image()


@pytest.fixture(scope="module")
def rt():
    return load_reference_mm_image_transforms()


def _rot(rng):
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def _scene(rng, n_per=900):
    """Points backprojected through three pinhole cameras (plus far-away
    outliers beyond r_max, so the reference's per-image SphereSampling does
    real work)."""
    poses, pts = [], []
    for i in range(N_IMG):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = _rot(rng)
        pose[:3, 3] = np.asarray([2.0 * i, -1.0, 0.5], np.float32)
        u = rng.uniform(2, SIZE[0] - 2, n_per)
        v = rng.uniform(2, SIZE[1] - 2, n_per)
        z = rng.uniform(2.0, 15.0, n_per)
        pc = np.stack([(u - _K4[0, 2]) * z / _K4[0, 0],
                       (v - _K4[1, 2]) * z / _K4[1, 1], z], 1)
        pts.append((pc @ pose[:3, :3].T + pose[:3, 3]).astype(np.float32))
        poses.append(pose)
    # outliers: a shell at ~3*r_max from the first camera
    d = rng.normal(size=(200, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts.append((poses[0][:3, 3] + d * 3 * R_MAX).astype(np.float32))
    xyz = np.concatenate(pts).astype(np.float32)
    return xyz, poses


def _geo(rng, n):
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return {
        "linearity": rng.uniform(0, 1, n).astype(np.float32),
        "planarity": rng.uniform(0, 1, n).astype(np.float32),
        "scattering": rng.uniform(0, 1, n).astype(np.float32),
        "normal": nrm.astype(np.float32),
    }


def _ref_pipeline(ri, rt, xyz, geo, images, camera, crop_top=0,
                  crop_bottom=0):
    """Run MapImages + NeighborhoodBasedMappingFeatures verbatim; return
    {(point, image): (feats8, {(x, y), ...})}."""
    n = len(xyz)
    data = rt.Data(
        pos=torch.from_numpy(xyz),
        mapping_index=torch.arange(n),
        linearity=torch.from_numpy(geo["linearity"]),
        planarity=torch.from_numpy(geo["planarity"]),
        scattering=torch.from_numpy(geo["scattering"]),
        norm=torch.from_numpy(geo["normal"]),
    )
    data, images = rt.MapImages(
        method="SplattingVisibility", proj_upscale=1, ref_size=SIZE,
        camera=camera, voxel=VOXEL, k_swell=K_SWELL, d_swell=D_SWELL,
        exact=False, r_min=R_MIN, r_max=R_MAX, crop_top=crop_top,
        crop_bottom=crop_bottom,
    )(data, images)
    data, images = rt.NeighborhoodBasedMappingFeatures(
        k=KNN_K, voxel=VOXEL, density=True, occlusion=True, use_faiss=False,
    )(data, images)

    return _ref_to_rows(images.mappings)


def _pinhole_images(ri, poses):
    ext = torch.from_numpy(np.stack(poses)).double()
    return ri.SameSettingImageData(
        path=np.array([f"img_{i}.png" for i in range(N_IMG)]),
        pos=ext[:, :3, 3].clone(),
        extrinsic=ext,
        fx=torch.full((N_IMG,), float(_K4[0, 0])).double(),
        fy=torch.full((N_IMG,), float(_K4[1, 1])).double(),
        mx=torch.full((N_IMG,), float(_K4[0, 2])).double(),
        my=torch.full((N_IMG,), float(_K4[1, 2])).double(),
        ref_size=SIZE, proj_upscale=1,
    )


def _ref_to_rows(m):
    assert m.features.shape[1] == 8
    ptr = m.pointers
    pts = torch.arange(m.num_groups).repeat_interleave(ptr[1:] - ptr[:-1])
    sub = m.values[1]
    pix = m.pixels
    out = {}
    for v in range(len(m.images)):
        rows = pix[sub.pointers[v]:sub.pointers[v + 1]]
        out[(int(pts[v]), int(m.images[v]))] = (
            m.features[v].numpy(),
            {(int(x), int(y)) for x, y in rows.tolist()},
        )
    return out


def _our_pipeline(xyz, cams, geo):
    m = build_mappings(
        xyz, cams,
        VisibilityParams(voxel=VOXEL, k_swell=K_SWELL, d_swell=D_SWELL,
                         exact=False, max_splat=10, knn_k=KNN_K,
                         method="splatting"),
        geometric=geo,
    )
    out = {}
    starts = np.searchsorted(m.pix_view, np.arange(len(m.point_id) + 1))
    for v in range(len(m.point_id)):
        out[(int(m.point_id[v]), int(m.image_id[v]))] = (
            m.view_feats[v],
            {(int(x), int(y)) for x, y in
             zip(m.pix_x[starts[v]:starts[v + 1]],
                 m.pix_y[starts[v]:starts[v + 1]])},
        )
    return out


def test_composed_preprocessing_parity_pinhole(ri, rt):
    rng = np.random.default_rng(11)
    xyz, poses = _scene(rng)
    geo = _geo(rng, len(xyz))

    ref = _ref_pipeline(ri, rt, xyz, geo, _pinhole_images(ri, poses),
                        "scannet")
    cams = [C.Camera(model="scannet", size=SIZE, extrinsic=p, intrinsic=_K4,
                     r_min=R_MIN, r_max=R_MAX) for p in poses]
    ours = _our_pipeline(xyz, cams, geo)

    # 1. view keys: f32-vs-f64 winner flips only
    keys = set(ref) | set(ours)
    common = sorted(set(ref) & set(ours))
    assert len(common) / len(keys) >= 0.99, \
        (len(common), len(keys), len(ref), len(ours))

    # outliers beyond r_max never map
    n_inlier = len(xyz) - 200
    assert all(p < n_inlier for p, _ in keys)

    # 2. pixels: the deduped (x, y) sets agree on nearly all common views
    pix_same = sum(ref[k][1] == ours[k][1] for k in common)
    assert pix_same / len(common) >= 0.99, (pix_same, len(common))

    # 3. features: viewing conditions (0-5) on rows whose pixel sets agree;
    # density (6) everywhere; occlusion (7) is exact except where a
    # neighbor's visibility flipped (bounded by 1 flip per k+1)
    exact_occ = 0
    for k in common:
        rf, of = ref[k][0], ours[k][0]
        if ref[k][1] == ours[k][1]:
            np.testing.assert_allclose(of[:6], rf[:6], atol=3e-3,
                                       err_msg=str(k))
        np.testing.assert_allclose(of[6], rf[6], rtol=1e-3, atol=1e-5,
                                   err_msg=f"density {k}")
        assert abs(of[7] - rf[7]) <= 1.5 / (KNN_K + 1) + 1e-6, \
            f"occlusion {k}: {of[7]} vs {rf[7]}"
        exact_occ += abs(of[7] - rf[7]) <= 1e-6
    assert exact_occ / len(common) >= 0.9, (exact_occ, len(common))


def test_composed_preprocessing_parity_equirect(ri, rt):
    """The S3DIS flagship camera family: opk-posed equirectangular panoramas
    with crop_top/crop_bottom, through the same composed chain."""
    rng = np.random.default_rng(13)
    centers = np.asarray([[3.0, -1.0, 1.5], [1.0, 2.0, 1.2],
                          [-2.0, 0.5, 1.8]], np.float32)
    opks = np.asarray([[0.1, -0.2, 0.7], [-0.3, 0.1, 2.1],
                       [0.2, 0.3, -1.4]], np.float32)
    pts = []
    for c in centers:
        theta = rng.uniform(0, 2 * np.pi, 800)
        phi = rng.uniform(np.deg2rad(60), np.deg2rad(120), 800)
        r = rng.uniform(1.0, 12.0, 800)
        rel = np.stack([r * np.sin(phi) * np.cos(theta),
                        r * np.sin(phi) * np.sin(theta),
                        r * np.cos(phi)], 1)
        pts.append((rel + c).astype(np.float32))
    xyz = np.concatenate(pts)
    geo = _geo(rng, len(xyz))
    crop_top, crop_bottom = 4, 4

    images = ri.SameSettingImageData(
        path=np.array([f"pano_{i}.png" for i in range(N_IMG)]),
        pos=torch.from_numpy(centers).double(),
        opk=torch.from_numpy(opks).double(),
        ref_size=SIZE, proj_upscale=1,
    )
    ref = _ref_pipeline(ri, rt, xyz, geo, images, "s3dis_equirectangular",
                        crop_top=crop_top, crop_bottom=crop_bottom)
    cams = [C.Camera(model="s3dis_equirectangular", size=SIZE, pos=c,
                     opk=o, crop_top=crop_top, crop_bottom=crop_bottom,
                     r_min=R_MIN, r_max=R_MAX)
            for c, o in zip(centers, opks)]
    ours = _our_pipeline(xyz, cams, geo)

    keys = set(ref) | set(ours)
    common = sorted(set(ref) & set(ours))
    assert len(common) / len(keys) >= 0.99, (len(common), len(keys))
    pix_same = sum(ref[k][1] == ours[k][1] for k in common)
    assert pix_same / len(common) >= 0.99, (pix_same, len(common))
    exact_occ = 0
    for k in common:
        rf, of = ref[k][0], ours[k][0]
        if ref[k][1] == ours[k][1]:
            np.testing.assert_allclose(of[:6], rf[:6], atol=3e-3,
                                       err_msg=str(k))
        np.testing.assert_allclose(of[6], rf[6], rtol=1e-3, atol=1e-5,
                                   err_msg=f"density {k}")
        assert abs(of[7] - rf[7]) <= 1.5 / (KNN_K + 1) + 1e-6, \
            f"occlusion {k}: {of[7]} vs {rf[7]}"
        exact_occ += abs(of[7] - rf[7]) <= 1e-6
    assert exact_occ / len(common) >= 0.9, (exact_occ, len(common))
