"""PPNet / PosPool (Liu et al. 2020) — position-pooling point backbone.

Reference: ``modules/PPNet/{ops.py,blocks.py}`` — a parameter-free
neighborhood aggregation: neighbor features are modulated by a positional
prior (raw relative xyz, or sinusoidal embeddings of it) and reduced; all
learned capacity lives in 1x1 convs around it.  TPU form: the neighbor
tables are host-built (build_pointnet_graph, like KPConv/RSConv here) and
the aggregation is gather -> broadcast-multiply -> masked mean — pure
VPU/MXU work with static shapes.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .norm import MaskedBatchNorm

__all__ = ["PosPoolLayer", "PPNetSeg"]


def _position_prior(rel: jnp.ndarray, channels: int,
                    embedding: str) -> jnp.ndarray:
    """[N, M, 3] relative positions -> [N, M, channels] prior
    (ref ops.py:60-101: 'xyz' tiles the 3 coords across channels; 'sin_cos'
    interleaves sin/cos at geometric wavelengths, alpha=100, base 1000)."""
    n, m, _ = rel.shape
    if embedding == "xyz":
        assert channels % 3 == 0, "xyz prior needs channels % 3 == 0"
        return jnp.repeat(rel, channels // 3, axis=-1)
    if embedding == "sin_cos":
        feat_dim = max(channels // 6, 1)
        rng = jnp.arange(feat_dim, dtype=rel.dtype)
        dim_mat = jnp.power(1000.0, rng / feat_dim)
        pos = 100.0 * rel[..., None] / dim_mat          # [N, M, 3, F]
        emb = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], -1)
        emb = emb.reshape(n, m, 6 * feat_dim)
        if emb.shape[-1] < channels:                    # channels % 6 != 0
            emb = jnp.concatenate([emb, rel], -1)[..., :channels]
        return emb[..., :channels]
    raise ValueError(embedding)


class PosPoolLayer(nn.Module):
    """One PosPool aggregation (ref ops.py:7-137).

    ``feats [P, C]`` gathered by ``group [N, M]`` (pad = P), modulated by
    the positional prior of ``rel = nbr_pos - center``, masked-mean reduced
    over the neighborhood, then an optional 1x1 out conv."""

    out_channels: int
    radius: float
    embedding: str = "xyz"        # 'xyz' | 'sin_cos'
    reduction: str = "avg"        # 'avg' | 'sum' | 'max'

    @nn.compact
    def __call__(self, feats, rel, group, count, center_valid,
                 train: bool = True):
        n, m = group.shape
        c = feats.shape[-1]
        pad_f = jnp.concatenate([feats, jnp.zeros_like(feats[:1])])
        nbr = pad_f[jnp.minimum(group, feats.shape[0])]   # [N, M, C]
        prior = _position_prior(rel / self.radius, c, self.embedding)
        agg = nbr * prior
        mask = (jnp.arange(m)[None, :] < count[:, None])[..., None]
        if self.reduction == "max":
            agg = jnp.where(mask, agg, -6.5e4)
            x = jnp.max(agg, axis=1)
        else:
            x = jnp.sum(jnp.where(mask, agg, 0.0), axis=1)
            if self.reduction == "avg":
                x = x / jnp.maximum(count[:, None], 1)
        x = MaskedBatchNorm(momentum=0.98)(x, center_valid, train=train)
        x = nn.leaky_relu(x, 0.2)
        if self.out_channels != c:
            x = nn.Dense(self.out_channels, use_bias=False)(x)
            x = MaskedBatchNorm(momentum=0.98)(x, center_valid, train=train)
            x = nn.leaky_relu(x, 0.2)
        return x


class _Bottleneck(nn.Module):
    """PPNet residual bottleneck (ref blocks.py): 1x1 down -> PosPool ->
    1x1 up + shortcut."""

    channels: int
    radius: float
    embedding: str = "xyz"

    @nn.compact
    def __call__(self, x, rel, group, count, valid, train: bool = True):
        c = self.channels
        h = nn.Dense(c // 4, use_bias=False)(x)
        h = MaskedBatchNorm(momentum=0.98)(h, valid, train=train)
        h = nn.leaky_relu(h, 0.2)
        h = PosPoolLayer(c // 4, self.radius, self.embedding,
                         name="pospool")(h, rel, group, count, valid,
                                         train=train)
        h = nn.Dense(c, use_bias=False)(h)
        h = MaskedBatchNorm(momentum=0.98)(h, valid, train=train)
        sc = x if x.shape[-1] == c else nn.Dense(c, use_bias=False)(x)
        return nn.leaky_relu(sc + h, 0.2)


class PPNetSeg(nn.Module):
    """Compact PPNet encoder-decoder over a pointnet-style graph (the same
    host-table pattern as KPConvSeg/RSConv here; ref models built from
    conf/models/segmentation/ppnet.yaml)."""

    num_classes: int
    # widths divisible by 12 so both the stage pools (C) and the bottleneck
    # inner pools (C/4) tile the 3-channel xyz prior (the reference's PPNet
    # configs use 144-based widths for the same reason)
    channels: Sequence[int] = (48, 96, 192)
    radii: Sequence[float] = (0.15, 0.3, 0.6)
    embedding: str = "xyz"

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        graph = batch["pn_graph"]
        levels = graph["levels"]
        pos = [jnp.asarray(p, jnp.float32) for p in graph["pos"]]
        x = batch["feats"]
        valid = batch["valid"]
        # lift raw inputs to the first width so priors tile cleanly
        x = nn.Dense(self.channels[0], use_bias=False)(x)
        x = MaskedBatchNorm(momentum=0.98)(x, valid, train=train)
        x = nn.leaky_relu(x, 0.2)
        skips = [(x, valid)]
        for li, (lvl, c, r) in enumerate(
            zip(levels, self.channels, self.radii)
        ):
            group = lvl["group"]
            pad_pos = jnp.concatenate([pos[li], jnp.zeros((1, 3))])
            nbr_pos = pad_pos[jnp.minimum(group, pos[li].shape[0])]
            rel = nbr_pos - pos[li + 1][:, None, :]
            x = PosPoolLayer(c, radius=r, embedding=self.embedding,
                             name=f"pool{li}")(
                x, rel, group, lvl["group_count"], lvl["center_valid"],
                train=train,
            )
            valid = lvl["center_valid"]
            if "self_group" in lvl:
                # same-level resnet bottleneck (ref blocks.py) — needs the
                # graph built with build_pointnet_graph(self_k=...)
                sg = lvl["self_group"]
                pad_c = jnp.concatenate([pos[li + 1], jnp.zeros((1, 3))])
                srel = pad_c[jnp.minimum(sg, pos[li + 1].shape[0])] \
                    - pos[li + 1][:, None, :]
                x = _Bottleneck(c, r * 2, self.embedding,
                                name=f"block{li}")(
                    x, srel, sg, lvl["self_count"], valid, train=train,
                )
            skips.append((x, valid))
        for li in reversed(range(len(levels))):
            fine_x, fine_valid = skips[li]
            w = 1.0 / jnp.maximum(levels[li]["up_d2"], 1e-10)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            up = jnp.sum(x[levels[li]["up_idx"]] * w[..., None], axis=1)
            x = jnp.concatenate([up, fine_x], axis=-1)
            x = nn.Dense(self.channels[max(li - 1, 0)], use_bias=False)(x)
            x = MaskedBatchNorm(momentum=0.98)(x, fine_valid, train=train)
            x = nn.leaky_relu(x, 0.2)
            valid = fine_valid
        return {"logits": nn.Dense(self.num_classes, name="head")(x)}
