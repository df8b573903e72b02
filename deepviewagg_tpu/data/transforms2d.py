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
    "select_images_by_coverage",
    "jitter_mapping_features",
    "normalize_images",
    "center_roll",
    "crop_images",
    "random_horizontal_flip",
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


def select_images_by_coverage(m: MultiViewMapping, n: int) -> np.ndarray:
    """Deterministic greedy max-coverage subset of ``n`` images (sorted ids).

    Preprocess-time counterpart of :func:`pick_images_by_credit` (reference
    selects preprocessing images by mapping area / pixel credit,
    data_transform/multimodal/image.py:713,765): each step keeps the image
    seeing the most not-yet-covered points, tie-broken by total view count
    then index — so a ``max_images`` cap keeps the views that matter instead
    of the first N cameras."""
    if m.num_images <= n:
        return np.arange(m.num_images)
    v = m.view_valid
    img_of_view = m.image_id[v]
    pid_of_view = m.point_id[v]
    totals = np.bincount(img_of_view, minlength=m.num_images).astype(np.int64)

    unseen = np.ones(m.num_points, bool)
    remaining = np.ones(m.num_images, bool)
    picked = []
    for _ in range(n):
        gain = np.zeros(m.num_images, np.int64)
        np.add.at(gain, img_of_view, unseen[pid_of_view])
        # lexicographic argmax (gain, totals, -index) over remaining images
        score = np.where(remaining, gain * (totals.max() + 1) + totals, -1)
        choice = int(np.argmax(score))
        if score[choice] < 0:
            break
        picked.append(choice)
        remaining[choice] = False
        unseen[pid_of_view[img_of_view == choice]] = False
    return np.sort(np.asarray(picked, np.int64))


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


def center_roll(cloud: dict, angular_res: int = 16) -> dict:
    """Circular-roll each equirectangular image so its mapped pixels are
    centered (``CenterRoll``, data_transform/multimodal/image.py:962-1037):
    among ``angular_res`` candidate rolls (256-bin coordinates), pick the one
    minimizing ``span + |center - 128|`` of the mapped x coordinates; roll
    pixel mappings and the image columns accordingly.  Enables tight crops
    on panoramas."""
    m: MultiViewMapping = cloud["mapping"]
    if cloud.get("images") is None or m.num_pixels == 0:
        return cloud
    images = cloud["images"]
    w = images.shape[1]
    vc = m.view_capacity
    pv = np.minimum(m.pix_view, vc - 1)
    pix_img = np.where(m.pix_valid, m.image_id[pv], -1)

    new_x = m.pix_x.copy()
    new_images = images.copy()
    candidates = (np.arange(angular_res) * 256) // angular_res
    for i in range(m.num_images):
        sel = pix_img == i
        if not sel.any():
            continue
        bins = (m.pix_x[sel].astype(np.int64) * 256) // w
        best_cost, best_r = None, 0
        for r in candidates:
            rolled = (bins + r) % 256
            lo, hi = rolled.min(), rolled.max()
            cost = (hi - lo) + abs((hi + lo) / 2 - 128)
            if best_cost is None or cost < best_cost:
                best_cost, best_r = cost, int(r)
        shift = (best_r * w) // 256
        if shift == 0:
            continue
        new_x[sel] = (m.pix_x[sel].astype(np.int64) + shift) % w
        new_images[i] = np.roll(images[i], shift, axis=0)
    import dataclasses
    out = dict(cloud)
    out["mapping"] = dataclasses.replace(m, pix_x=new_x.astype(np.int32))
    out["images"] = new_images
    return out


def crop_images(cloud: dict, crop_size: Tuple[int, int]) -> dict:
    """Crop every image to one static ``(w, h)`` window centered on its
    mapped-pixel bbox; mappings shift into crop coordinates and the few
    pixels falling outside become padding.

    Static-shape stand-in for ``CropImageGroups``' power-of-two families
    (image.py:1040-1141): one bucketed crop size per batch instead of
    per-sample families (SURVEY.md §7 move 1).
    """
    m: MultiViewMapping = cloud["mapping"]
    images = cloud.get("images")
    if images is None:
        return cloud
    full_w, full_h = images.shape[1], images.shape[2]
    cw, ch = crop_size
    if cw >= full_w and ch >= full_h:
        return cloud
    cw, ch = min(cw, full_w), min(ch, full_h)
    vc = m.view_capacity
    pv = np.minimum(m.pix_view, vc - 1)
    pix_img = np.where(m.pix_valid, m.image_id[pv], -1)

    new_images = np.zeros((len(images), cw, ch, images.shape[3]),
                          images.dtype)
    new_x = m.pix_x.copy()
    new_y = m.pix_y.copy()
    keep = m.pix_valid.copy()
    for i in range(m.num_images):
        sel = pix_img == i
        if sel.any():
            # clamp so the crop window [x0, x0+cw) stays inside the image
            # for odd sizes too (x0 <= full_w - cw)
            cx = int(np.clip((m.pix_x[sel].min() + m.pix_x[sel].max()) // 2,
                             cw // 2, full_w - (cw - cw // 2)))
            cy = int(np.clip((m.pix_y[sel].min() + m.pix_y[sel].max()) // 2,
                             ch // 2, full_h - (ch - ch // 2)))
        else:
            cx, cy = cw // 2, ch // 2
        x0, y0 = cx - cw // 2, cy - ch // 2
        new_images[i] = images[i, x0:x0 + cw, y0:y0 + ch]
        nx = m.pix_x[sel] - x0
        ny = m.pix_y[sel] - y0
        inside = (nx >= 0) & (nx < cw) & (ny >= 0) & (ny < ch)
        new_x[sel] = np.clip(nx, 0, cw - 1)
        new_y[sel] = np.clip(ny, 0, ch - 1)
        keep[sel] &= inside
    # invariant: every valid view keeps >= 1 pixel — views whose pixels all
    # fell outside the crop retain their first pixel with clamped coords
    # (the reference sizes crops to contain the bbox, image.py:1082-1118;
    # a static single-size crop can cut corners instead)
    kept_per_view = np.zeros(vc + 1, np.int64)
    np.add.at(kept_per_view, np.where(m.pix_valid, pv, vc), keep.astype(np.int64))
    uviews, first_idx = np.unique(
        np.where(m.pix_valid, pv, vc), return_index=True
    )
    for v, fi in zip(uviews, first_idx):
        if v < vc and m.view_valid[v] and kept_per_view[v] == 0:
            keep[fi] = True

    import dataclasses
    out = dict(cloud)
    # pixels outside the crop become pads (re-point at view capacity, tail)
    pix_view = np.where(keep, m.pix_view, vc)
    order = np.argsort(pix_view, kind="stable")
    out["mapping"] = dataclasses.replace(
        m,
        pix_view=pix_view[order].astype(np.int32),
        pix_x=new_x[order].astype(np.int32),
        pix_y=new_y[order].astype(np.int32),
        pix_valid=keep[order],
    )
    out["images"] = new_images
    return out


def random_horizontal_flip(cloud: dict, rng: np.random.Generator,
                           p: float = 0.5) -> dict:
    """Flip images along x and mirror the pixel mappings
    (``RandomHorizontalFlip``, image.py:1195-1219)."""
    if rng.random() > p or cloud.get("images") is None:
        return cloud
    import dataclasses
    m: MultiViewMapping = cloud["mapping"]
    w = cloud["images"].shape[1]
    out = dict(cloud)
    out["images"] = cloud["images"][:, ::-1].copy()
    out["mapping"] = dataclasses.replace(
        m, pix_x=np.where(m.pix_valid, w - 1 - m.pix_x, m.pix_x).astype(np.int32)
    )
    return out


def normalize_images(
    images: np.ndarray,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
) -> np.ndarray:
    """ToFloatImage + Normalize (image.py:1221,1235) — ImageNet statistics."""
    integer = np.issubdtype(np.asarray(images).dtype, np.integer)
    img = np.asarray(images, np.float32)
    if integer or (img.size and img.max() > 1.5):
        img = img / 255.0
    return (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
