"""Runtime image/mapping selection transforms, host-side.

The reference's __getitem__-time 2D chain (SURVEY.md §3.4,
core/data_transform/multimodal/image.py): after sphere sampling restricts
mappings to the sample's points, pick which images to actually load and
train on:

  * :func:`pick_images_by_area` — ``PickImagesFromMappingArea`` (:713):
    drop images whose mappings cover too few points;
  * :func:`pick_images_by_credit` — ``PickImagesFromMemoryCredit`` (:765):
    greedy stochastic knapsack under a total pixel budget, sampling images
    with probability ∝ size + coverage-of-unseen;
  * :func:`jitter_mapping_features` — ``JitterMappingFeatures`` (:934);
  * image normalization helpers (``ToFloatImage``/``Normalize``).

The TPU twist: the knapsack targets a *fixed image-slot count* per bucket
(deterministic shapes), the reference's credit is mapped to slots x (W*H).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from .mapping import MultiViewMapping

__all__ = [
    "pick_images_by_area",
    "pick_images_by_credit",
    "jitter_mapping_features",
    "normalize_images",
]


def _points_per_image(m: MultiViewMapping) -> np.ndarray:
    counts = np.zeros(m.num_images, np.int64)
    np.add.at(counts, m.image_id[m.view_valid], 1)
    return counts


def pick_images_by_area(
    cloud: dict, min_points: int = 64, use_bbox: bool = False
) -> dict:
    """Drop images seeing fewer than ``min_points`` sample points
    (PickImagesFromMappingArea with area->count simplification)."""
    m: MultiViewMapping = cloud["mapping"]
    counts = _points_per_image(m)
    keep = np.nonzero(counts >= min_points)[0]
    if len(keep) == m.num_images:
        return cloud
    out = dict(cloud)
    out["mapping"] = m.select_images(keep).compact()
    if cloud.get("images") is not None:
        out["images"] = cloud["images"][keep]
    if cloud.get("cameras") is not None:
        out["cameras"] = [cloud["cameras"][i] for i in keep]
    return out


def pick_images_by_credit(
    cloud: dict,
    n_slots: int,
    rng: np.random.Generator,
    k_coverage: float = 2.0,
) -> dict:
    """Stochastic greedy selection of exactly ``<= n_slots`` images.

    Reference semantics (image.py:765-874): iteratively sample an image with
    probability ∝ ``w_size + k_coverage * w_unseen`` where ``w_unseen`` is
    the normalized count of sample points not covered by already-picked
    images; here every image has equal pixel size (bucketed), so ``w_size``
    is uniform and the coverage term drives selection.
    """
    m: MultiViewMapping = cloud["mapping"]
    n_img = m.num_images
    if n_img <= n_slots:
        return cloud
    v = m.view_valid
    img_of_view = m.image_id[v]
    pid_of_view = m.point_id[v]

    unseen = np.ones(m.num_points, bool)
    remaining = np.ones(n_img, bool)
    picked = []
    for _ in range(n_slots):
        idx = np.nonzero(remaining)[0]
        if len(idx) == 0:
            break
        w_unseen = np.zeros(n_img, np.float64)
        np.add.at(w_unseen, img_of_view, unseen[pid_of_view].astype(np.float64))
        w = 1.0 + k_coverage * (w_unseen / max(w_unseen.max(), 1e-9))
        w = np.where(remaining, w, 0.0)
        p = w / w.sum()
        choice = rng.choice(n_img, p=p)
        picked.append(choice)
        remaining[choice] = False
        unseen[pid_of_view[img_of_view == choice]] = False
    picked = np.sort(np.array(picked, np.int64))
    out = dict(cloud)
    out["mapping"] = m.select_images(picked).compact()
    if cloud.get("images") is not None:
        out["images"] = cloud["images"][picked]
    if cloud.get("cameras") is not None:
        out["cameras"] = [cloud["cameras"][i] for i in picked]
    return out


def jitter_mapping_features(
    cloud: dict, sigma: float = 0.02, rng: Optional[np.random.Generator] = None
) -> dict:
    """Gaussian jitter on the viewing-condition features
    (JitterMappingFeatures, image.py:934)."""
    m: MultiViewMapping = cloud["mapping"]
    out = dict(cloud)
    feats = m.view_feats + rng.normal(0, sigma, m.view_feats.shape).astype(
        np.float32
    )
    import dataclasses
    out["mapping"] = dataclasses.replace(m, view_feats=feats)
    return out


def normalize_images(
    images: np.ndarray,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
) -> np.ndarray:
    """ToFloatImage + Normalize (image.py:1221,1235) — ImageNet statistics."""
    img = np.asarray(images, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    return (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
