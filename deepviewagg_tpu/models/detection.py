"""VoteNet-style 3D object detection (deep Hough voting).

Coverage of the reference's VoteNet family (modules/VoteNet/ + the
object_detection task stack): seed points vote toward object centers, votes
are clustered into proposals, and a proposal head regresses objectness /
center / size / class (Qi et al. 2019).  Static-shape TPU form:

  * seeds: one SA level of the pointnet graph (host-precomputed FPS/ball
    tables);
  * votes: per-seed MLP offset (bounded by tanh * max_offset);
  * proposals: the CLUSTER tables are precomputed host-side on the *seed*
    positions (vote clusters move with the seeds only slightly; the
    reference's dynamic FPS-on-votes is replaced by seed-anchored clusters —
    a static approximation that keeps the step jittable);
  * losses: vote-to-nearest-GT-center L1, objectness CE by proximity,
    center/size regression on positive proposals.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.pointnet2 import _PointMLP

__all__ = ["VoteNetDet", "votenet_loss"]


class VoteNetDet(nn.Module):
    """Backbone features -> votes -> seed-anchored proposals."""

    num_classes: int
    max_offset: float = 1.5
    vote_channels: int = 64
    sa_channels: Sequence[Sequence[int]] = ((32, 64), (64, 128))

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        graph = batch["pn_graph"]
        levels = graph["levels"]
        pos = [jnp.asarray(p, jnp.float32) for p in graph["pos"]]
        x = batch["feats"]
        valid = batch["valid"]
        # --- encoder to the seed level (last SA level) --------------------
        for li, lvl in enumerate(levels):
            group = lvl["group"]
            rel = pos[li][group] - pos[li + 1][:, None, :]
            g = jnp.concatenate(
                [rel, x[group]], axis=-1
            )
            m, k, c = g.shape
            h = _PointMLP(self.sa_channels[li])(
                g.reshape(m * k, c),
                jnp.repeat(lvl["center_valid"], k), train=train,
            ).reshape(m, k, -1)
            slot = jnp.arange(k)[None, :]
            ok = slot < jnp.maximum(lvl["group_count"][:, None], 1)
            x = jnp.max(jnp.where(ok[..., None], h, -1e30), axis=1)
            x = jnp.where(lvl["center_valid"][:, None], x, 0.0)
            valid = lvl["center_valid"]
        seed_pos = pos[len(levels)]
        seed_valid = valid

        # --- voting --------------------------------------------------------
        v = _PointMLP([self.vote_channels])(x, seed_valid, train=train)
        offset = jnp.tanh(nn.Dense(3, name="vote_offset")(v)) * self.max_offset
        vote_pos = seed_pos + offset
        vote_feat = x + nn.Dense(x.shape[-1], name="vote_feat")(v)

        # --- proposals: seed-anchored clusters -----------------------------
        cl = batch["det_clusters"]            # {"group", "group_count",
        #                                        "center_valid"} over seeds
        group = cl["group"]
        rel = vote_pos[group] - vote_pos[cl["centers"]][:, None, :]
        g = jnp.concatenate([rel, vote_feat[group]], axis=-1)
        m, k, c = g.shape
        h = _PointMLP([128, 128])(
            g.reshape(m * k, c), jnp.repeat(cl["center_valid"], k),
            train=train,
        ).reshape(m, k, -1)
        slot = jnp.arange(k)[None, :]
        ok = slot < jnp.maximum(cl["group_count"][:, None], 1)
        agg = jnp.max(jnp.where(ok[..., None], h, -1e30), axis=1)
        agg = jnp.where(cl["center_valid"][:, None], agg, 0.0)

        head = _PointMLP([128])(agg, cl["center_valid"], train=train)
        objectness = nn.Dense(2, name="objectness")(head)
        center = (vote_pos[cl["centers"]]
                  + jnp.tanh(nn.Dense(3, name="center")(head)) * self.max_offset)
        size = jax.nn.softplus(nn.Dense(3, name="size")(head)) + 1e-3
        cls_logits = nn.Dense(self.num_classes, name="cls")(head)
        return {
            "vote_pos": vote_pos, "seed_pos": seed_pos,
            "seed_valid": seed_valid,
            "objectness": objectness, "center": center, "size": size,
            "cls_logits": cls_logits,
            "proposal_valid": cl["center_valid"],
        }


def votenet_loss(out: Dict, gt_boxes, gt_classes=None,
                 near_thresh: float = 0.6, far_thresh: float = 1.2):
    """Compact VoteNet loss: vote L1 + objectness CE + center/size L1
    (+ class CE).  ``gt_boxes [B, 6]`` center+size; padded rows size<=0."""
    gt_boxes = jnp.asarray(gt_boxes, jnp.float32)
    gt_ok = gt_boxes[:, 3:].min(axis=1) > 0
    centers = gt_boxes[:, :3]
    big = 1e6

    def nearest(p):
        d = jnp.linalg.norm(p[:, None, :] - centers[None], axis=-1)
        d = jnp.where(gt_ok[None, :], d, big)
        j = jnp.argmin(d, axis=1)
        return j, jnp.min(d, axis=1)

    # vote regression: only seeds INSIDE a GT box vote to its center
    # (VoteNet's on-object seed selection)
    j_seed, _ = nearest(out["seed_pos"])
    seed_rel = jnp.abs(out["seed_pos"] - centers[j_seed])
    inside = jnp.all(
        seed_rel <= gt_boxes[j_seed, 3:] / 2 + 0.1, axis=1
    ) & gt_ok[j_seed]
    vote_mask = out["seed_valid"] & inside
    vote_l1 = jnp.abs(out["vote_pos"] - centers[j_seed]).sum(axis=1)
    vote_loss = jnp.sum(jnp.where(vote_mask, vote_l1, 0.0)) / jnp.maximum(
        vote_mask.sum(), 1
    )

    # proposals
    jp, dp = nearest(out["center"])
    pos_mask = out["proposal_valid"] & (dp < near_thresh)
    neg_mask = out["proposal_valid"] & (dp > far_thresh)
    obj_target = pos_mask.astype(jnp.int32)
    logp = jax.nn.log_softmax(out["objectness"], axis=-1)
    obj_nll = -jnp.take_along_axis(logp, obj_target[:, None], 1)[:, 0]
    obj_mask = pos_mask | neg_mask
    obj_loss = jnp.sum(jnp.where(obj_mask, obj_nll, 0.0)) / jnp.maximum(
        obj_mask.sum(), 1
    )

    center_l1 = jnp.abs(out["center"] - centers[jp]).sum(axis=1)
    size_l1 = jnp.abs(out["size"] - gt_boxes[jp, 3:]).sum(axis=1)
    box_loss = jnp.sum(
        jnp.where(pos_mask, center_l1 + size_l1, 0.0)
    ) / jnp.maximum(pos_mask.sum(), 1)

    total = vote_loss + obj_loss + box_loss
    if gt_classes is not None:
        cls_lp = jax.nn.log_softmax(out["cls_logits"], axis=-1)
        tgt = jnp.asarray(gt_classes)[jp]
        cls_nll = -jnp.take_along_axis(cls_lp, tgt[:, None], 1)[:, 0]
        total = total + jnp.sum(jnp.where(pos_mask, cls_nll, 0.0)) / \
            jnp.maximum(pos_mask.sum(), 1)
    return total, {"vote": vote_loss, "obj": obj_loss, "box": box_loss}
