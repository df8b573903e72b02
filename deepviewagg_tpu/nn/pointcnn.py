"""PointCNN: X-transformed convolution over neighbor sets.

Coverage of the reference's PointCNN family (modules/PointCNN/): each
representative point learns a k x k transform X from its neighbors' relative
coordinates; the transform permutes/weights the (lifted) neighbor features
before a shared dense convolution — Li et al. 2018.  Batched matmuls map
straight onto the MXU; neighborhoods come from the same host-precomputed
pointnet graph tables.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .norm import MaskedBatchNorm

__all__ = ["XConv", "PointCNNSeg"]


class XConv(nn.Module):
    out_channels: int
    lift_channels: int = 16

    @nn.compact
    def __call__(self, feats, rel_pos, nbr_idx, nbr_count, valid,
                 train: bool = True):
        m, k, _ = rel_pos.shape
        # lift relative coords to point features (MLP_delta)
        delta = nn.relu(nn.Dense(self.lift_channels)(rel_pos))
        delta = nn.relu(nn.Dense(self.lift_channels)(delta))
        g = jnp.concatenate([delta, feats[nbr_idx]], axis=-1)   # [M,k,C']
        # learn the k x k X-transform from the neighborhood geometry
        x_flat = nn.relu(nn.Dense(k * k)(rel_pos.reshape(m, k * 3)))
        x_flat = nn.Dense(k * k)(x_flat)
        x_mat = x_flat.reshape(m, k, k)
        # mask filler slots so they neither contribute nor receive
        slot_ok = jnp.arange(k)[None, :] < jnp.maximum(nbr_count[:, None], 1)
        x_mat = x_mat * slot_ok[:, None, :] * slot_ok[:, :, None]
        h = jnp.einsum("mij,mjc->mic", x_mat.astype(jnp.bfloat16),
                       g.astype(jnp.bfloat16)).astype(jnp.float32)
        out = nn.Dense(self.out_channels, use_bias=False)(
            h.reshape(m, k * g.shape[-1])
        )
        out = MaskedBatchNorm()(out, valid, train=train)
        return nn.relu(jnp.where(valid[:, None], out, 0.0))


class PointCNNSeg(nn.Module):
    """Compact X-Conv encoder-decoder over a pointnet-style graph."""

    num_classes: int
    channels: Sequence[int] = (32, 64, 128)

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        graph = batch["pn_graph"]
        levels = graph["levels"]
        pos = [jnp.asarray(p, jnp.float32) for p in graph["pos"]]
        x = batch["feats"]
        valid = batch["valid"]
        skips = [(x, valid)]
        for li, (lvl, c) in enumerate(zip(levels, self.channels)):
            rel = pos[li][lvl["group"]] - pos[li + 1][:, None, :]
            x = XConv(c, name=f"xconv{li}")(
                x, rel, lvl["group"], lvl["group_count"],
                lvl["center_valid"], train=train,
            )
            valid = lvl["center_valid"]
            skips.append((x, valid))
        for li in reversed(range(len(levels))):
            fine_x, fine_valid = skips[li]
            w = 1.0 / jnp.maximum(levels[li]["up_d2"], 1e-10)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            up = jnp.sum(x[levels[li]["up_idx"]] * w[..., None], axis=1)
            x = jnp.concatenate([up, fine_x], axis=-1)
            x = nn.Dense(max(self.channels[max(li - 1, 0)], 16),
                         use_bias=False)(x)
            x = MaskedBatchNorm()(x, fine_valid, train=train)
            x = nn.relu(x)
            valid = fine_valid
        return {"logits": nn.Dense(self.num_classes, name="head")(x)}
