"""Camera models: equirectangular, pinhole and MEI-fisheye projections.

TPU-native (vectorized jnp, static-shape, mask-based) counterpart of the
reference's dual numba/torch projection kernels
(torch_points3d/core/multimodal/visibility.py:58-630).  Instead of filtering
points (dynamic shapes), every function projects ALL points and returns a
validity mask; downstream consumers (z-buffer, mapping extraction) honor the
mask.

Conventions (verified against the reference, SURVEY.md §A.1):
  * ``s3dis_equirectangular`` — camera position + omega/phi/kappa Euler
    triplet; ``t = atan2(y, x)``, ``p = acos(z / r)``;
    ``w = ((W-1)(1 - t/pi)/2) mod W``, ``h = ((H-1) p/pi) mod H``
    (visibility.py:151-216).
  * ``scannet`` — 4x4 cam->world pose (inverted to world->cam inside, as
    the reference does), pinhole ``u = fx px/pz + mx``
    (visibility.py:220-285).
  * ``kitti360_perspective`` — 4x4 cam->world extrinsic, ``p = R^T (x - T)``
    then pinhole (visibility.py:238-247).
  * ``kitti360_fisheye`` — cam->world extrinsic + MEI model
    (xi, k1, k2, gamma1, gamma2, u0, v0): unit-sphere normalize,
    ``x / (z + xi)``, radial distortion ``1 + k1 r^2 + k2 r^4``, affine
    (visibility.py:289-339).  The reference's CUDA twin reads all seven
    intrinsics from index [0] (a known defect, SURVEY.md §A.10.1) — we
    implement the correct CPU semantics only.

``x`` below is the image WIDTH coordinate and ``y`` the HEIGHT coordinate,
matching the reference's (x_pix, y_pix) ordering.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

CAMERA_MODELS = (
    "s3dis_equirectangular",
    "scannet",
    "kitti360_perspective",
    "kitti360_fisheye",
)


@dataclasses.dataclass(frozen=True)
class Camera:
    """Static description of one posed camera.

    Array fields are per-camera parameters; ``model``/``size``/crops are
    Python statics so projection dispatch stays trace-free.
    """

    model: str                      # one of CAMERA_MODELS (static)
    size: tuple                     # (W, H) pixels (static)
    pos: np.ndarray | None = None   # [3] camera center (world)
    opk: np.ndarray | None = None   # [3] omega,phi,kappa (equirectangular)
    extrinsic: np.ndarray | None = None  # [4,4]
    intrinsic: np.ndarray | None = None  # [4,4]-ish pinhole K (fx,fy,mx,my used)
    fisheye: np.ndarray | None = None    # [7] xi,k1,k2,gamma1,gamma2,u0,v0
    crop_top: int = 0
    crop_bottom: int = 0
    r_min: float = 0.5
    r_max: float = 30.0
    mask: Optional[np.ndarray] = None    # [W, H] bool static-pixel mask

    def center(self):
        """World-space camera center for distance computations.

        For both pinhole conventions and the fisheye model the stored
        extrinsic is the cam->world pose, so the center is its translation
        column — the reference reads ScanNet centers the same way
        (datasets/segmentation/multimodal/scannet.py:192:
        ``xyz = extrinsic[:, :3, 3]``); projection inverts internally for
        the scannet model (visibility.py:234-236)."""
        if self.pos is not None:
            return jnp.asarray(self.pos, jnp.float32)
        e = jnp.asarray(self.extrinsic, jnp.float32)
        return e[:3, 3]


def opk_to_rotation(opk):
    """Rotation matrix from an omega/phi/kappa triplet (visibility.py:58-90)."""
    o, p, k = opk[0], opk[1], opk[2]
    co, so = jnp.cos(o), jnp.sin(o)
    cp, sp = jnp.cos(p), jnp.sin(p)
    ck, sk = jnp.cos(k), jnp.sin(k)
    m_o = jnp.array([[1.0, 0.0, 0.0], [0.0, co, -so], [0.0, so, co]])
    m_p = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    m_k = jnp.array([[ck, -sk, 0.0], [sk, ck, 0.0], [0.0, 0.0, 1.0]])
    return m_o @ m_p @ m_k


def equirectangular_projection(xyz_to_img, radius, opk, size):
    """Project camera-centered points onto an equirectangular panorama.

    Returns float (x_pix, y_pix); all rows valid by construction (z>0 test
    does not apply to panoramas).
    """
    rot = opk_to_rotation(jnp.asarray(opk, jnp.float32))
    v = xyz_to_img @ rot.T
    t = jnp.arctan2(v[:, 1], v[:, 0])
    p = jnp.arccos(jnp.clip(v[:, 2] / jnp.maximum(radius, 1e-8), -1.0, 1.0))
    w, h = size
    x_pix = ((w - 1) * (1 - t / jnp.pi) / 2) % w
    y_pix = ((h - 1) * p / jnp.pi) % h
    x_pix = jnp.nan_to_num(x_pix)
    y_pix = jnp.nan_to_num(y_pix)
    return x_pix, y_pix, jnp.ones_like(x_pix)


def pinhole_projection(xyz, extrinsic, intrinsic, model="scannet"):
    """Pinhole projection; returns (x_pix, y_pix, z_cam)."""
    e = jnp.asarray(extrinsic, jnp.float32)
    if model == "scannet":
        cam_to_world = jnp.linalg.inv(e)
        r, t = cam_to_world[:3, :3], cam_to_world[:3, 3]
        p = xyz @ r.T + t
    elif model == "kitti360_perspective":
        r, t = e[:3, :3], e[:3, 3]
        p = (xyz - t) @ r
    else:
        raise ValueError(f"unknown pinhole model {model}")
    k = jnp.asarray(intrinsic, jnp.float32)
    z = p[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    x = p[:, 0] * k[0, 0] / zs + k[0, 2]
    y = p[:, 1] * k[1, 1] / zs + k[1, 2]
    return x, y, z


def fisheye_projection(xyz, extrinsic, fisheye):
    """MEI-model fisheye projection (KITTI-360 cam2/cam3)."""
    e = jnp.asarray(extrinsic, jnp.float32)
    r, t = e[:3, :3], e[:3, 3]
    p = (xyz - t) @ r
    f = jnp.asarray(fisheye, jnp.float32)
    xi, k1, k2, g1, g2, u0, v0 = f[0], f[1], f[2], f[3], f[4], f[5], f[6]
    norm = jnp.linalg.norm(p, axis=1)
    denom = norm + 1e-4
    x = p[:, 0] / denom
    y = p[:, 1] / denom
    z = p[:, 2] / denom
    x = x / (z + xi)
    y = y / (z + xi)
    r2 = x**2 + y**2
    r4 = r2**2
    d = 1 + k1 * r2 + k2 * r4
    x_pix = g1 * d * x + u0
    y_pix = g2 * d * y + v0
    z_out = norm * p[:, 2] / (jnp.abs(p[:, 2]) + 1e-4)
    return x_pix, y_pix, z_out


def field_of_view_mask(x_pix, y_pix, z, size, crop_top=0, crop_bottom=0, img_mask=None):
    """Validity mask: in image bounds, in crop band, in front of camera,
    and on unmasked (non-static) pixels (visibility.py:396-478)."""
    w, h = size
    ok = (
        (x_pix >= 0)
        & (x_pix < w)
        & (y_pix >= crop_top)
        & (y_pix < h - crop_bottom)
        & (z > 0)
    )
    if img_mask is not None:
        xi = jnp.clip(jnp.floor(x_pix).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.floor(y_pix).astype(jnp.int32), 0, h - 1)
        ok = ok & jnp.asarray(img_mask)[xi, yi]
    return ok


def project(xyz, camera: Camera):
    """Project all points through ``camera``.

    Returns ``(x_pix, y_pix, depth, valid)`` — depth is the euclidean
    distance to the camera center; ``valid`` combines the r_min/r_max range
    gate and the field-of-view gate (visibility.py:480-630), but no point is
    dropped: static shapes everywhere.
    """
    xyz = jnp.asarray(xyz, jnp.float32)
    center = camera.center()
    to_img = xyz - center
    dist = jnp.linalg.norm(to_img, axis=1)
    in_range = (dist > camera.r_min) & (dist < camera.r_max)

    if camera.model == "s3dis_equirectangular":
        x, y, z = equirectangular_projection(to_img, dist, camera.opk, camera.size)
    elif camera.model in ("scannet", "kitti360_perspective"):
        x, y, z = pinhole_projection(
            xyz, camera.extrinsic, camera.intrinsic, model=camera.model
        )
    elif camera.model == "kitti360_fisheye":
        x, y, z = fisheye_projection(xyz, camera.extrinsic, camera.fisheye)
    else:
        raise ValueError(f"unknown camera model {camera.model}")

    fov = field_of_view_mask(
        x, y, z, camera.size, camera.crop_top, camera.crop_bottom, camera.mask
    )
    return x, y, dist, in_range & fov
