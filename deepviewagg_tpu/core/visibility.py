"""Occlusion-aware visibility: splat z-buffering + viewing-condition features.

TPU-native reformulation of the reference's visibility kernels
(torch_points3d/core/multimodal/visibility.py:631-1605).  The reference CUDA
path already uses the array formulation we want (flatten every splat to pixel
ids, ``scatter_min`` over depth — visibility.py:1198-1285); the TPU version
makes it static-shape:

  * every point gets a fixed ``max_splat x max_splat`` pixel grid; pixels
    outside the point's actual splat bbox are masked;
  * the z-buffer is two masked scatter-min passes over a dense ``W*H`` map
    (depth race then deterministic index tie-break), so results are
    reproducible — unlike the reference's GPU ``scatter_min`` which the repo
    itself papers over with a CPU fallback (modules.py:200-211);
  * outputs are dense ``idx_map``/``depth_map`` images; sparse point<->pixel
    mappings are extracted host-side at preprocessing time
    (:mod:`deepviewagg_tpu.data.mapping_factory`).

Splat-size model (visibility.py:647-875): angular width
``(1 + k_swell * exp(-dist / ln(d_swell))) * voxel / dist``, converted to
pixels per camera model; equirectangular x-width additionally divides by
``sin(pi * y / H)`` (latitude correction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import cameras as _cam

__all__ = [
    "splat_bboxes",
    "splat_zbuffer",
    "normalize_depth",
    "orientation_to_normal",
    "postprocess_features",
    "depth_map_visibility",
    "biasutti_visibility",
]


def _clamp_bbox(x_a, x_b, y_a, y_b, size, crop_top, crop_bottom):
    w, h = size
    x_a = jnp.clip(x_a, 0, w - 1)
    x_b = jnp.clip(x_b, 1, w)
    y_a = jnp.clip(y_a, crop_top, h - crop_bottom - 1)
    y_b = jnp.clip(y_b, crop_top + 1, h - crop_bottom)
    return x_a, x_b, y_a, y_b


def splat_bboxes(camera: _cam.Camera, xyz, x_proj, y_proj, dist,
                 voxel=0.1, k_swell=1.0, d_swell=1000.0):
    """Per-point splat bbox (x_a, x_b, y_a, y_b) in pixels, reference
    semantics (equirectangular/pinhole/fisheye splats, visibility.py:631-1012)."""
    w, h = camera.size
    swell = 1.0 + k_swell * jnp.exp(-dist / jnp.log(d_swell))

    if camera.model == "s3dis_equirectangular":
        angular_width = swell * voxel / jnp.maximum(dist, 1e-6)
        res_y = angular_width * h / jnp.pi
        a = angular_width * w / (2.0 * jnp.pi)
        b = jnp.pi / h
        res_x = a / (jnp.sin(b * y_proj) + 0.001)
        width_x, width_y = res_x, res_y
    elif camera.model in ("scannet", "kitti360_perspective"):
        s = swell * voxel / jnp.maximum(dist, 1e-6)
        k = jnp.asarray(camera.intrinsic, jnp.float32)
        width_x = s * k[0, 0]
        width_y = s * k[1, 1]
    elif camera.model == "kitti360_fisheye":
        # Project the voxel-top offset and use the pixel displacement as the
        # splat radius proxy (visibility.py:875-930).
        z_off = jnp.zeros_like(xyz).at[:, 2].set(swell * voxel / 2)
        x2, y2, _ = _cam.fisheye_projection(
            xyz + z_off, camera.extrinsic, camera.fisheye
        )
        r = 2 * jnp.sqrt((x_proj - x2) ** 2 + (y_proj - y2) ** 2)
        width_x = width_y = r
    else:
        raise ValueError(camera.model)

    x_a = jnp.round(x_proj - width_x / 2).astype(jnp.int32)
    x_b = jnp.round(x_proj + width_x / 2 + 1).astype(jnp.int32)
    y_a = jnp.round(y_proj - width_y / 2).astype(jnp.int32)
    y_b = jnp.round(y_proj + width_y / 2 + 1).astype(jnp.int32)
    return _clamp_bbox(
        x_a, x_b, y_a, y_b, camera.size, camera.crop_top, camera.crop_bottom
    )


@functools.partial(jax.jit, static_argnames=("size", "max_splat", "exact"))
def _zbuffer(x_proj, y_proj, dist, valid, bbox, size, max_splat, exact):
    w, h = size
    n = x_proj.shape[0]
    x_a, x_b, y_a, y_b = bbox

    # Static (dx, dy) offset grid: every point contributes max_splat^2
    # candidate pixels; out-of-bbox offsets are masked.  This replaces the
    # dynamic repeat_interleave flattening of the reference CUDA path.
    dx = jax.lax.broadcasted_iota(jnp.int32, (max_splat, max_splat), 0)
    dy = jax.lax.broadcasted_iota(jnp.int32, (max_splat, max_splat), 1)
    px = x_a[:, None, None] + dx[None]                      # [N, S, S]
    py = y_a[:, None, None] + dy[None]
    m = (
        valid[:, None, None]
        & (px < x_b[:, None, None])
        & (py < y_b[:, None, None])
    )
    flat_pix = (px * h + py).reshape(-1)                    # [N*S*S]
    flat_pix = jnp.where(m.reshape(-1), flat_pix, w * h)    # drop slot
    flat_depth = jnp.broadcast_to(
        dist[:, None, None], (n, max_splat, max_splat)
    ).reshape(-1)
    flat_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None, None], (n, max_splat, max_splat)
    ).reshape(-1)

    big = jnp.float32(1e30)
    depth_map = jnp.full((w * h + 1,), big, jnp.float32)
    depth_map = depth_map.at[flat_pix].min(flat_depth, mode="drop")

    # Deterministic tie-break: among entries whose depth equals the pixel
    # minimum, keep the smallest point index.
    is_win = flat_depth <= depth_map[flat_pix]
    cand = jnp.where(is_win & m.reshape(-1), flat_idx, n)
    idx_map = jnp.full((w * h + 1,), n, jnp.int32)
    idx_map = idx_map.at[flat_pix].min(cand, mode="drop")

    depth_map = jnp.where(depth_map >= big / 2, -1.0, depth_map)[: w * h]
    idx_map = jnp.where(idx_map >= n, -1, idx_map)[: w * h]

    if exact:
        # Keep only winning points, re-mapped to their center projection
        # pixel (visibility.py:1164-1187, 1273-1284): sparse exact mappings.
        seen = (
            jnp.zeros((n,), jnp.int32)
            .at[jnp.maximum(idx_map, 0)]
            .max((idx_map >= 0).astype(jnp.int32))
            .astype(bool)
        )
        xc = jnp.clip(x_proj.astype(jnp.int32), 0, w - 1)
        yc = jnp.clip(y_proj.astype(jnp.int32), 0, h - 1)
        center_pix = xc * h + yc
        idx_map = jnp.full((w * h,), -1, jnp.int32)
        pix = jnp.where(seen & valid, center_pix, w * h)  # w*h drops
        # Last writer wins is fine here: centers of distinct seen points
        # rarely collide, and the reference's sequential loop has the same
        # collision semantics.
        idx_map = idx_map.at[pix].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop"
        )
        depth_map = jnp.where(
            idx_map >= 0, dist[jnp.maximum(idx_map, 0)], -1.0
        )

    return idx_map.reshape(w, h), depth_map.reshape(w, h)


@functools.partial(
    jax.jit,
    static_argnames=("model", "size", "crop_top", "crop_bottom", "r_min",
                     "r_max", "max_splat", "exact", "with_features"),
)
def _splat_pipeline(
    xyz, cam_arrays, geo, voxel, k_swell, d_swell,
    *, model, size, crop_top, crop_bottom, r_min, r_max, max_splat, exact,
    with_features,
):
    """Fused per-image pass: projection + FOV cull + splat bbox + z-buffer
    (+ the 6 projection-time viewing-condition features for ALL points —
    fixed [N] shapes, so one compile serves every image of a camera family;
    the caller subsets seen points host-side)."""
    camera = _cam.Camera(
        model=model, size=size, crop_top=crop_top, crop_bottom=crop_bottom,
        r_min=r_min, r_max=r_max, **cam_arrays,
    )
    xyz = jnp.asarray(xyz, jnp.float32)
    x_proj, y_proj, dist, valid = _cam.project(xyz, camera)
    bbox = splat_bboxes(
        camera, xyz, x_proj, y_proj, dist,
        voxel=voxel, k_swell=k_swell, d_swell=d_swell,
    )
    idx_map, depth_map = _zbuffer(
        x_proj, y_proj, dist, valid, bbox, size, max_splat, exact
    )
    feats6 = None
    if with_features:
        to_img = xyz - camera.center()
        feats6 = postprocess_features(
            to_img, y_proj, dist,
            geo["linearity"], geo["planarity"], geo["scattering"],
            geo["normal"], img_height=size[1], r_min=r_min, r_max=r_max,
        )
    return idx_map, depth_map, x_proj, y_proj, dist, valid, feats6


def _camera_arrays(camera: _cam.Camera) -> dict:
    out = {}
    for f in ("pos", "opk", "extrinsic", "intrinsic", "fisheye", "mask"):
        v = getattr(camera, f)
        if v is not None:
            out[f] = jnp.asarray(v)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("model", "size", "crop_top", "crop_bottom", "r_min",
                     "r_max", "max_splat", "exact", "with_features"),
)
def _splat_pipeline_batch(
    xyz, cam_stack, geo, voxel, k_swell, d_swell,
    *, model, size, crop_top, crop_bottom, r_min, r_max, max_splat, exact,
    with_features,
):
    """vmap of :func:`_splat_pipeline` over a stacked camera family — ONE
    device dispatch for many images (the per-camera dispatch + readback
    round-trips dominate preprocessing on the tunneled TPU)."""
    def one(ca):
        return _splat_pipeline(
            xyz, ca, geo, voxel, k_swell, d_swell, model=model, size=size,
            crop_top=crop_top, crop_bottom=crop_bottom, r_min=r_min,
            r_max=r_max, max_splat=max_splat, exact=exact,
            with_features=with_features,
        )

    return jax.vmap(one)(cam_stack)


def splat_zbuffer_batch(
    cameras,
    xyz,
    voxel=0.1,
    k_swell=1.0,
    d_swell=1000.0,
    exact=False,
    max_splat=8,
    geo=None,
    chunk: int = 6,
):
    """Splatting visibility for a SAME-SETTING camera family in chunked
    batched dispatches.  Returns ``(idx_maps [C, W, H], feats6 [C, N, 6] or
    None)`` with leaves still on device (callers slice before readback).
    ``chunk`` bounds the vmap'd intermediate footprint ([N*S*S] buffers per
    camera) and additionally shrinks with cloud size (the batched program's
    splat buffers must stay well under HBM / remote-compile limits)."""
    c0 = cameras[0]
    xyz = jnp.asarray(xyz, jnp.float32)
    geo_in = geo if geo is not None else {}
    # cap total splat-candidate rows per dispatch at ~48M
    rows_per_cam = max(1, xyz.shape[0] * int(max_splat) ** 2)
    chunk = max(1, min(int(chunk), 48_000_000 // rows_per_cam))

    def one_by_one(group):
        outs = [
            splat_zbuffer(c, xyz, voxel=voxel, k_swell=k_swell,
                          d_swell=d_swell, exact=exact, max_splat=max_splat,
                          geo=geo if geo is not None else None)
            for c in group
        ]
        ims = jnp.stack([o[0] for o in outs])
        f6 = (jnp.stack([o[6] for o in outs]) if geo is not None else None)
        return ims, f6

    idx_maps, feats = [], []
    for lo in range(0, len(cameras), chunk):
        group = cameras[lo:lo + chunk]
        if chunk == 1:
            out01 = one_by_one(group)
            idx_maps.append(out01[0])
            if geo is not None:
                feats.append(out01[1])
            continue
        cam_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[_camera_arrays(c) for c in group]
        )
        try:
            out = _splat_pipeline_batch(
                xyz, cam_stack, geo_in,
                jnp.float32(voxel), jnp.float32(k_swell),
                jnp.float32(d_swell),
                model=c0.model, size=c0.size,
                crop_top=c0.crop_top, crop_bottom=c0.crop_bottom,
                r_min=float(c0.r_min), r_max=float(c0.r_max),
                max_splat=int(max_splat), exact=bool(exact),
                with_features=geo is not None,
            )
            idx_maps.append(out[0])
            if geo is not None:
                feats.append(out[6])
        except Exception:  # remote-compile / HBM limits: serial fallback
            out01 = one_by_one(group)
            idx_maps.append(out01[0])
            if geo is not None:
                feats.append(out01[1])
    idx_maps = jnp.concatenate(idx_maps) if len(idx_maps) > 1 else idx_maps[0]
    feats6 = None
    if geo is not None:
        feats6 = jnp.concatenate(feats) if len(feats) > 1 else feats[0]
    return idx_maps, feats6


def splat_zbuffer(
    camera: _cam.Camera,
    xyz,
    voxel=0.1,
    k_swell=1.0,
    d_swell=1000.0,
    exact=False,
    max_splat=8,
    geo=None,
):
    """Full splatting visibility for one camera (one fused jit dispatch).

    Returns ``(idx_map [W,H] int32, depth_map [W,H] f32, x_proj, y_proj,
    depth, valid[, feats6])`` — dense maps hold -1 where no point is
    visible.  Pass ``geo`` (linearity/planarity/scattering/normal arrays) to
    also get the 6 projection-time view features for every point.
    """
    out = _splat_pipeline(
        jnp.asarray(xyz, jnp.float32),
        _camera_arrays(camera),
        geo if geo is not None else {},
        jnp.float32(voxel), jnp.float32(k_swell), jnp.float32(d_swell),
        model=camera.model, size=camera.size,
        crop_top=camera.crop_top, crop_bottom=camera.crop_bottom,
        r_min=float(camera.r_min), r_max=float(camera.r_max),
        max_splat=int(max_splat), exact=bool(exact),
        with_features=geo is not None,
    )
    if geo is None:
        return out[:6]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("model", "size", "crop_top", "crop_bottom", "r_min",
                     "r_max", "with_features"),
)
def _project_features_jit(xyz, cam_arrays, geo, *, model, size, crop_top,
                          crop_bottom, r_min, r_max, with_features):
    camera = _cam.Camera(
        model=model, size=size, crop_top=crop_top, crop_bottom=crop_bottom,
        r_min=r_min, r_max=r_max, **cam_arrays,
    )
    x_proj, y_proj, dist, valid = _cam.project(xyz, camera)
    feats6 = None
    if with_features:
        to_img = xyz - camera.center()
        feats6 = postprocess_features(
            to_img, y_proj, dist,
            geo["linearity"], geo["planarity"], geo["scattering"],
            geo["normal"], img_height=size[1], r_min=r_min, r_max=r_max,
        )
    return x_proj, y_proj, dist, valid, feats6


def project_features(camera: _cam.Camera, xyz, geo=None):
    """Projection + FOV cull (+ the 6 viewing-condition features) WITHOUT a
    visibility model — the shared front half of the non-splatting
    visibility methods (DepthBasedVisibility / BiasuttiVisibility,
    visibility.py:1779,1790)."""
    return _project_features_jit(
        jnp.asarray(xyz, jnp.float32), _camera_arrays(camera),
        geo if geo is not None else {},
        model=camera.model, size=camera.size,
        crop_top=camera.crop_top, crop_bottom=camera.crop_bottom,
        r_min=float(camera.r_min), r_max=float(camera.r_max),
        with_features=geo is not None,
    )


def depth_map_visibility(x_proj, y_proj, dist, depth_map, depth_threshold=0.05):
    """Visibility by comparison against a provided sensor depth map
    (S3DIS 16-bit PNG path, visibility.py:1360-1388): a point is seen if
    ``|depth_map[x, y] - dist| <= depth_threshold`` (ABSOLUTE meters, the
    reference's rule); empty pixels hold a negative sentinel and can never
    pass for positive distances."""
    depth_map = jnp.asarray(depth_map, jnp.float32)
    w, h = depth_map.shape
    xi = jnp.clip(x_proj.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y_proj.astype(jnp.int32), 0, h - 1)
    d_ref = depth_map[xi, yi]
    return jnp.abs(d_ref - dist) <= depth_threshold


def biasutti_visibility(x_proj, y_proj, dist, valid, k: int = 75,
                        threshold=None, x_margin=None, x_width=None):
    """Image-space kNN visibility (Biasutti et al.; reference
    ``visibility_biasutti`` visibility.py:1464-1500 over a pykeops kNN): a
    point is visible when ``alpha = exp(-((d - d_min)/(d_max - d_min))^2)``
    over its k nearest *projected* neighbors is ``>= threshold`` (default:
    the mean alpha, the reference's rule) — no splatting, no z-buffer.

    ``x_margin``/``x_width`` enable the reference's X-wrapped neighbor
    search for equirectangular panoramas (``k_nn_image_system``,
    visibility.py:1395-1460): points within ``x_margin`` pixels of either
    border also appear shifted by ±``x_width`` in the search set.

    Returns a bool mask over points (static shape: invalid points stay
    False and never appear as neighbors).
    """
    from ..ops.knn import knn

    x_proj = jnp.asarray(x_proj, jnp.float32)
    y_proj = jnp.asarray(y_proj, jnp.float32)
    dist = jnp.asarray(dist, jnp.float32)
    valid = jnp.asarray(valid, bool)
    pix = jnp.stack([x_proj, y_proj], axis=1)
    wrap = (x_margin is not None and x_margin > 0
            and x_width is not None and x_width > 0)
    if wrap:
        off = jnp.asarray([[float(x_width), 0.0]], jnp.float32)
        search = jnp.concatenate([pix, pix + off, pix - off])
        search_valid = jnp.concatenate([
            valid,
            valid & (x_proj <= x_margin),
            valid & (x_proj >= x_width - x_margin),
        ])
        nbr_dist_src = jnp.concatenate([dist] * 3)
    else:
        search, search_valid, nbr_dist_src = pix, valid, dist
    d2, idx = knn(pix, search, k=k, valid=search_valid)
    nbr_depth = nbr_dist_src[idx]
    # rows with fewer than k valid candidates get filler indices (their d2
    # is the 1e30 sentinel) — exclude those neighbors from the depth range
    ok = d2 < 1e29
    d_min = jnp.min(jnp.where(ok, nbr_depth, jnp.inf), axis=1)
    d_max = jnp.max(jnp.where(ok, nbr_depth, -jnp.inf), axis=1)
    span_ok = jnp.isfinite(d_min) & jnp.isfinite(d_max)
    alpha = jnp.exp(-(((dist - d_min)
                       / jnp.maximum(d_max - d_min, 1e-12)) ** 2))
    alpha = jnp.where(valid & span_ok, alpha, jnp.nan)
    if threshold is None:
        n_valid = jnp.maximum(jnp.sum(valid), 1)
        threshold = jnp.nansum(jnp.where(valid, alpha, 0.0)) / n_valid
    return valid & span_ok & (alpha >= threshold)


def normalize_depth(dist, r_min=0.5, r_max=30.0):
    """Rescale distances by the camera range (visibility.py:1503-1518)."""
    return (dist - r_min) / (r_max + 1e-4)


def orientation_to_normal(view_dir_unit, normals):
    """|cos| of the angle between the viewing ray and the surface normal
    (visibility.py:1521-1545)."""
    return jnp.abs(jnp.sum(view_dir_unit * normals, axis=1))


def postprocess_features(
    xyz_to_img, y_proj, dist, linearity, planarity, scattering, normals,
    img_height, r_min=0.5, r_max=30.0,
):
    """The 6 projection-time viewing-condition features, fixed order
    (SURVEY.md §A.3; visibility.py:1548-1582): normalized depth, linearity,
    planarity, scattering, orientation-to-surface, normalized pixel height.
    Density and occlusion (features 7-8) are appended by the kNN pass in the
    mapping factory."""
    view_dir = xyz_to_img / (dist[:, None] + 1e-4)
    feats = [
        normalize_depth(dist, r_min, r_max),
        linearity,
        planarity,
        scattering,
        orientation_to_normal(view_dir, normals),
        y_proj / img_height,
    ]
    return jnp.stack(feats, axis=1).astype(jnp.float32)
