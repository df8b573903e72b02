"""Plain PointNet (Qi et al. 2016) — classification + segmentation heads.

The reference keeps the original PointNet as a baseline family
(``modules/PointNet/modules.py``: STN3D input/feature transforms, shared
MLPs, global max pool; ``models/segmentation/pointnet.py``).  TPU form: the
batch is the standard collate contract (concatenated padded rows + per-level
``batch_idx``/``valid``), global pooling is a masked segment reduce, and the
input/feature T-Nets are small dense networks — everything lands on the MXU.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops import segment as seg
from .norm import MaskedBatchNorm

__all__ = ["TNet", "PointNetEncoder", "PointNetCls", "PointNetSeg"]


class TNet(nn.Module):
    """Spatial/feature transform net (STN3D, modules/PointNet/modules.py):
    shared MLP -> global max -> FC -> ``[B, d, d]`` transform, initialized
    at identity."""

    dim: int
    num_batches: int

    @nn.compact
    def __call__(self, x, batch_idx, valid, train: bool = True):
        h = x
        for c in (64, 128, 1024):
            h = nn.Dense(c, use_bias=False)(h)
            h = MaskedBatchNorm()(h, valid, train=train)
            h = nn.relu(h)
        g = seg.segment_reduce(h, batch_idx, self.num_batches + 1, "max",
                               valid)[: self.num_batches]
        for c in (512, 256):
            g = nn.relu(nn.Dense(c)(g))
        d = self.dim
        m = nn.Dense(d * d, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(g)
        return m.reshape(-1, d, d) + jnp.eye(d)[None]


class PointNetEncoder(nn.Module):
    """Shared-MLP trunk -> per-point features + global descriptor."""

    num_batches: int
    local_channels: Sequence[int] = (64, 64)
    global_channels: Sequence[int] = (64, 128, 1024)
    input_transform: bool = True
    feature_transform: bool = True

    @nn.compact
    def __call__(self, pos, feats, batch_idx, valid, train: bool = True):
        x = jnp.concatenate([pos, feats], axis=-1) if feats is not None \
            else pos
        if self.input_transform:
            t = TNet(3, self.num_batches, name="stn3")(
                x, batch_idx, valid, train=train
            )
            pos = jnp.einsum("nd,nde->ne", pos, t[batch_idx])
            x = jnp.concatenate([pos, feats], axis=-1) if feats is not None \
                else pos
        for c in self.local_channels:
            x = nn.Dense(c, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train=train)
            x = nn.relu(x)
        if self.feature_transform:
            t = TNet(x.shape[-1], self.num_batches, name="stnf")(
                x, batch_idx, valid, train=train
            )
            x = jnp.einsum("nd,nde->ne", x, t[batch_idx])
        local = x
        for c in self.global_channels:
            x = nn.Dense(c, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train=train)
            x = nn.relu(x)
        global_feat = seg.segment_reduce(
            x, batch_idx, self.num_batches + 1, "max", valid
        )[: self.num_batches]
        return local, global_feat


class PointNetCls(nn.Module):
    """Classification head: global descriptor -> FC stack -> logits."""

    num_classes: int
    num_batches: int = 1

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        lvl = batch["graph"]["levels"][0]
        _, g = PointNetEncoder(self.num_batches, name="encoder")(
            batch.get("pos", batch["feats"][:, :3]), batch["feats"],
            lvl["batch_idx"], lvl["valid"], train=train,
        )
        h = nn.relu(nn.Dense(512)(g))
        h = nn.relu(nn.Dense(256)(h))
        if train:
            h = nn.Dropout(0.3, deterministic=not self.has_rng("dropout"))(h)
        return {"logits": nn.Dense(self.num_classes, name="head")(h)}


class PointNetSeg(nn.Module):
    """Segmentation head: per-point locals concat broadcast global
    (models/segmentation/pointnet.py)."""

    num_classes: int
    num_batches: int = 1

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        lvl = batch["graph"]["levels"][0]
        batch_idx, valid = lvl["batch_idx"], lvl["valid"]
        local, g = PointNetEncoder(self.num_batches, name="encoder")(
            batch.get("pos", batch["feats"][:, :3]), batch["feats"],
            batch_idx, valid, train=train,
        )
        pad_g = jnp.concatenate([g, jnp.zeros_like(g[:1])])
        x = jnp.concatenate(
            [local, pad_g[jnp.minimum(batch_idx, self.num_batches)]], axis=-1
        )
        for c in (512, 256, 128):
            x = nn.Dense(c, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train=train)
            x = nn.relu(x)
        return {"logits": nn.Dense(self.num_classes, name="head")(x)}
