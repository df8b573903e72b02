"""Panoptic segmentation: semantic head + instance offsets + clustering.

Coverage of the reference's panoptic task stack (datasets/panoptic +
PointGroup-style models): alongside the semantic logits, every point
regresses an offset to its instance center; instances are recovered by
clustering the shifted points (host-side connected components over a voxel
grid — deterministic, no CUDA clustering kernels).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.res16unet import Res16UNet

__all__ = ["PanopticSeg", "instance_loss", "cluster_instances",
           "panoptic_quality"]


class PanopticSeg(nn.Module):
    """Sparse UNet with two heads: semantics + instance center offsets."""

    num_classes: int
    backbone: str = "Res16UNet14"
    max_offset: float = 2.0

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        x = Res16UNet.preset(self.backbone, name="backbone")(
            batch["feats"], batch["graph"], train=train
        )
        logits = nn.Dense(self.num_classes, name="sem_head")(x)
        offsets = jnp.tanh(nn.Dense(3, name="offset_head")(x)) * self.max_offset
        return {"logits": logits, "offsets": offsets}


def instance_loss(offsets, pos, instance_ids, num_instances: Optional[int] = None,
                  valid=None):
    """L1 between predicted offsets and (instance centroid - point), the
    PointGroup offset loss.  ``instance_ids`` int32, -1 = stuff/ignore.

    ``num_instances`` must be a static int when calling under jit (it sizes
    the centroid table); with host numpy ids it defaults to max(ids)+1.
    """
    import jax

    ids = jnp.asarray(instance_ids)
    mask = ids >= 0
    if valid is not None:
        mask = mask & valid
    if num_instances is None:
        if not isinstance(instance_ids, np.ndarray):
            raise ValueError(
                "pass static num_instances when instance_ids is traced"
            )
        num_instances = int(instance_ids.max()) + 1 if len(instance_ids) else 0
    n_inst = num_instances
    if n_inst <= 0:
        return jnp.float32(0.0)
    safe = jnp.maximum(ids, 0)
    w = mask.astype(jnp.float32)
    pos = jnp.asarray(pos, jnp.float32)
    cent_sum = jax.ops.segment_sum(pos * w[:, None], safe, num_segments=n_inst)
    cent_cnt = jax.ops.segment_sum(w, safe, num_segments=n_inst)
    centroids = cent_sum / jnp.maximum(cent_cnt[:, None], 1.0)
    target = centroids[safe] - pos
    l1 = jnp.abs(offsets - target).sum(axis=1)
    return jnp.sum(jnp.where(mask, l1, 0.0)) / jnp.maximum(mask.sum(), 1)


def panoptic_quality(pred_sem, pred_inst, gt_sem, gt_inst, num_classes: int,
                     thing_classes, iou_thresh: float = 0.5) -> Dict:
    """Panoptic Quality (Kirillov et al.): PQ = SQ x RQ per class, averaged.

    Things match instance-to-instance at point-IoU >= ``iou_thresh``; stuff
    classes match as single segments.  Host-side numpy evaluation.
    """
    pred_sem = np.asarray(pred_sem)
    gt_sem = np.asarray(gt_sem)
    pred_inst = np.asarray(pred_inst)
    gt_inst = np.asarray(gt_inst)
    pqs = []
    per_class = {}
    for c in range(num_classes):
        if c in thing_classes:
            p_ids = [i for i in np.unique(pred_inst[(pred_sem == c)]) if i >= 0]
            g_ids = [i for i in np.unique(gt_inst[(gt_sem == c)]) if i >= 0]
            p_masks = [(pred_inst == i) & (pred_sem == c) for i in p_ids]
            g_masks = [(gt_inst == i) & (gt_sem == c) for i in g_ids]
        else:
            p_masks = [pred_sem == c] if (pred_sem == c).any() else []
            g_masks = [gt_sem == c] if (gt_sem == c).any() else []
        if not g_masks and not p_masks:
            continue
        matched_p = set()
        tp, iou_sum = 0, 0.0
        for gm in g_masks:
            best_iou, best_j = 0.0, -1
            for j, pm in enumerate(p_masks):
                if j in matched_p:
                    continue
                inter = np.logical_and(gm, pm).sum()
                union = np.logical_or(gm, pm).sum()
                iou = inter / union if union else 0.0
                if iou > best_iou:
                    best_iou, best_j = iou, j
            if best_iou >= iou_thresh:
                tp += 1
                iou_sum += best_iou
                matched_p.add(best_j)
        fn = len(g_masks) - tp
        fp = len(p_masks) - tp
        denom = tp + 0.5 * fp + 0.5 * fn
        pq = iou_sum / denom if denom else 0.0
        per_class[f"PQ_{c}"] = float(pq)
        pqs.append(pq)
    out = {"PQ": float(np.mean(pqs)) if pqs else 0.0}
    out.update(per_class)
    return out


def cluster_instances(pos, offsets, sem_preds, thing_classes,
                      cell: float = 0.3, min_points: int = 10):
    """Host-side clustering of center-shifted points into instance ids.

    Shifted points of 'thing' classes are voxelized at ``cell``; connected
    voxels (26-neighborhood within the same semantic class) form instances.
    Returns int32 instance ids (-1 for stuff / tiny clusters).
    """
    pos = np.asarray(pos)
    shifted = pos + np.asarray(offsets)
    sem = np.asarray(sem_preds)
    out = np.full(len(pos), -1, np.int32)
    next_id = 0
    for cls in thing_classes:
        sel = np.nonzero(sem == cls)[0]
        if len(sel) == 0:
            continue
        cells = np.floor(shifted[sel] / cell).astype(np.int64)
        # union-find over points sharing or adjacent in cell space
        key = {}
        parent = np.arange(len(sel))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for li, c in enumerate(map(tuple, cells)):
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        nb = (c[0] + dx, c[1] + dy, c[2] + dz)
                        if nb in key:
                            ra, rb = find(li), find(key[nb])
                            if ra != rb:
                                parent[ra] = rb
            key[c] = li
        roots = np.array([find(i) for i in range(len(sel))])
        for r in np.unique(roots):
            members = sel[roots == r]
            if len(members) >= min_points:
                out[members] = next_id
                next_id += 1
    return out
