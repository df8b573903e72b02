"""3D transforms: augmentation + sampling, host-side numpy.

The reference's ~60-transform chain (core/data_transform/transforms.py,
grid_transform.py, features.py) reduced to the set its multimodal configs
actually compose (conf/data/segmentation/multimodal/*.yaml), operating on a
plain dict cloud ``{pos, rgb?, labels?, normal?, mapping?, ...}``:

  RandomRotate / RandomScaleAnisotropic / RandomNoise / RandomSymmetry
  (transforms.py:463-565, features.py:30-108), ElasticDistortion
  (grid_transform.py:194), RandomDropout (transforms.py:726+), sphere and
  cylinder sampling with id tracking (transforms.py:301,353), and quantized
  re-voxelization that merges the mappings through the voxel inverse
  (GridSampling3D, grid_transform.py:87 + SelectMappingFromPointId).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..ops import voxel as _voxel

__all__ = [
    "Compose", "RandomRotate", "RandomScaleAnisotropic", "RandomNoise",
    "RandomSymmetry", "ElasticDistortion", "RandomDropout",
    "sphere_select", "cylinder_select", "quantize_cloud",
]


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, cloud: dict, rng: np.random.Generator) -> dict:
        for t in self.transforms:
            cloud = t(cloud, rng)
        return cloud


def _rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class RandomRotate:
    """Rotate about an axis (default z, the reference's vertical-axis
    augmentation).  Rotates ``pos`` and ``normal``."""

    def __init__(self, axis: str = "z", degrees: Optional[float] = None):
        self.axis = axis
        self.degrees = degrees  # None = full circle

    def __call__(self, cloud, rng):
        lim = np.pi if self.degrees is None else np.deg2rad(self.degrees)
        theta = rng.uniform(-lim, lim)
        r = _rot_z(theta)
        if self.axis != "z":
            perm = {"x": [2, 0, 1], "y": [1, 2, 0]}[self.axis]
            p = np.eye(3, dtype=np.float32)[perm]
            r = p.T @ r @ p
        cloud = dict(cloud)
        cloud["pos"] = cloud["pos"] @ r.T
        if cloud.get("normal") is not None:
            cloud["normal"] = cloud["normal"] @ r.T
        return cloud


class RandomScaleAnisotropic:
    def __init__(self, scale_min=0.9, scale_max=1.1):
        self.lo, self.hi = scale_min, scale_max

    def __call__(self, cloud, rng):
        s = rng.uniform(self.lo, self.hi, 3).astype(np.float32)
        cloud = dict(cloud)
        cloud["pos"] = cloud["pos"] * s
        if cloud.get("normal") is not None:
            n = cloud["normal"] / s
            cloud["normal"] = n / (np.linalg.norm(n, axis=1, keepdims=True) + 1e-9)
        return cloud


class RandomNoise:
    def __init__(self, sigma=0.01, clip=0.05):
        self.sigma, self.clip = sigma, clip

    def __call__(self, cloud, rng):
        cloud = dict(cloud)
        noise = np.clip(
            rng.normal(0, self.sigma, cloud["pos"].shape), -self.clip, self.clip
        ).astype(np.float32)
        cloud["pos"] = cloud["pos"] + noise
        return cloud


class RandomSymmetry:
    def __init__(self, axes=(True, False, False)):
        self.axes = axes

    def __call__(self, cloud, rng):
        cloud = dict(cloud)
        pos = cloud["pos"].copy()
        for i, on in enumerate(self.axes):
            if on and rng.random() < 0.5:
                pos[:, i] = -pos[:, i]
                if cloud.get("normal") is not None:
                    n = cloud["normal"].copy()
                    n[:, i] = -n[:, i]
                    cloud["normal"] = n
        cloud["pos"] = pos
        return cloud


class ElasticDistortion:
    """Smoothed random displacement field (grid_transform.py:194-240)."""

    def __init__(self, granularity=(0.2, 0.8), magnitude=(0.04, 0.16)):
        self.granularity = granularity
        self.magnitude = magnitude

    def __call__(self, cloud, rng):
        cloud = dict(cloud)
        pos = cloud["pos"].astype(np.float32)
        for g, m in zip(self.granularity, self.magnitude):
            lo = pos.min(0)
            dims = np.maximum(((pos.max(0) - lo) / g).astype(int) + 3, 2)
            noise = rng.normal(0, 1, tuple(dims) + (3,)).astype(np.float32)
            # cheap separable box blur x3
            for ax in range(3):
                k = np.ones(3) / 3
                noise = np.apply_along_axis(
                    lambda a: np.convolve(a, k, mode="same"), ax, noise
                )
            idx = ((pos - lo) / g).astype(int) + 1
            idx = np.minimum(idx, np.array(dims) - 1)
            disp = noise[idx[:, 0], idx[:, 1], idx[:, 2]]
            pos = pos + disp * m
        cloud["pos"] = pos
        return cloud


class RandomDropout:
    """Drop a random fraction of points, tracking row selection through
    labels/feats/mapping (transforms.py:726+)."""

    def __init__(self, dropout_ratio=0.2, p=0.5):
        self.ratio, self.p = dropout_ratio, p

    def __call__(self, cloud, rng):
        if rng.random() > self.p:
            return cloud
        n = len(cloud["pos"])
        keep = np.sort(
            rng.choice(n, int(n * (1 - self.ratio)), replace=False)
        )
        return select_rows(cloud, keep)


def select_rows(cloud: dict, keep: np.ndarray) -> dict:
    """Row-subset every per-point array + the mapping ('pick' semantics)."""
    out = {}
    n = len(cloud["pos"])
    for k, v in cloud.items():
        if k == "mapping" and v is not None:
            out[k] = v.select_points(keep).compact()
        elif isinstance(v, np.ndarray) and v.ndim >= 1 and len(v) == n:
            out[k] = v[keep]
        else:
            out[k] = v
    return out


def sphere_select(cloud: dict, center, radius: float) -> dict:
    d = np.linalg.norm(cloud["pos"] - np.asarray(center)[None], axis=1)
    return select_rows(cloud, np.nonzero(d < radius)[0])


def cylinder_select(cloud: dict, center, radius: float) -> dict:
    d = np.linalg.norm(
        cloud["pos"][:, :2] - np.asarray(center)[None, :2], axis=1
    )
    return select_rows(cloud, np.nonzero(d < radius)[0])


def quantize_cloud(cloud: dict, voxel_size: float) -> dict:
    """Re-voxelize after augmentation: points falling into the same voxel are
    merged (features averaged, labels majority), and the mapping follows
    through ``merge_points`` — the role of train-time GridSampling3D with
    ``quantize_coords`` (grid_transform.py:87) + mapping reindex."""
    pos = cloud["pos"]
    feats = cloud.get("rgb")
    g = _voxel.grid_sample(pos, voxel_size, feats=feats,
                           labels=cloud.get("labels"))
    out = dict(cloud)
    out["pos"] = g["pos"]
    out["coords"] = g["coords"][:, 1:]
    if feats is not None:
        out["rgb"] = g["feats"]
    if cloud.get("labels") is not None:
        out["labels"] = g["labels"]
    if cloud.get("normal") is not None:
        m = len(g["coords"])
        acc = np.zeros((m, 3), np.float32)
        np.add.at(acc, g["inverse"], cloud["normal"])
        out["normal"] = acc / (np.linalg.norm(acc, axis=1, keepdims=True) + 1e-9)
    if cloud.get("origin_id") is not None:
        first = np.full(len(g["coords"]), -1, np.int64)
        first[g["inverse"][::-1]] = np.arange(len(pos))[::-1]
        out["origin_id"] = cloud["origin_id"][first]
    if cloud.get("mapping") is not None:
        out["mapping"] = cloud["mapping"].merge_points(
            g["inverse"], len(g["coords"])
        ).compact()
    return out
