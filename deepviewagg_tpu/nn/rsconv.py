"""RSConv: relation-shape convolution (static-shape, batched).

Coverage of the reference's RSConv family (modules/RSConv/): the
convolutional weight for each neighbor is *generated* from its low-level
spatial relation (rel xyz, distances) by a shared MLP, then applied to the
neighbor features — "relation-shape" learning.  Formulation over the same
host-precomputed FPS/ball-query tables as PointNet++/KPConv:

    h_ij = MLP_rel([d_ij, rel_ij, x_i, x_j_pos...])   # [M, k, C]
    out_i = norm(max_j (h_ij * f_j) W)                # channel-wise gating
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .norm import MaskedBatchNorm

__all__ = ["RSConvLayer", "RSConvSeg"]


class RSConvLayer(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, feats, rel_pos, nbr_idx, nbr_count, valid,
                 train: bool = True):
        m, k, _ = rel_pos.shape
        d = jnp.linalg.norm(rel_pos, axis=-1, keepdims=True)
        relation = jnp.concatenate([d, rel_pos], axis=-1)      # [M, k, 4]
        f = feats[nbr_idx]                                     # [M, k, C]
        # weight-generating MLP on the relation (rsconv core)
        w = nn.Dense(f.shape[-1], use_bias=False)(nn.relu(
            nn.Dense(16, use_bias=False)(relation)
        ))
        h = w * f                                              # gated
        slot_ok = jnp.arange(k)[None, :] < jnp.maximum(nbr_count[:, None], 1)
        h = jnp.where(slot_ok[..., None], h, -1e30)
        agg = jnp.max(h, axis=1)
        agg = jnp.where(valid[:, None], agg, 0.0)
        out = nn.Dense(self.out_channels, use_bias=False)(agg)
        out = MaskedBatchNorm()(out, valid, train=train)
        return nn.relu(out)


class RSConvSeg(nn.Module):
    """Compact RSConv encoder-decoder over a pointnet-style graph."""

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
            x = RSConvLayer(c, name=f"rs{li}")(
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
