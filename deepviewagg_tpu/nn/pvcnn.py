"""PVCNN: point-voxel convolution (dense 3D convs on the MXU).

Coverage of the reference's PVCNN family (modules/PVCNN/, which relies on a
CUDA voxelization kernel).  The TPU formulation is the most natural of all
the families: scatter point features onto a small dense grid
(``segment_mean`` over flattened voxel keys), run dense 3D convolutions
(XLA maps them straight onto the MXU), trilinearly devoxelize back to the
points, and fuse with a point-wise MLP branch — the PVConv block of Liu et
al. 2019.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import segment as seg
from .norm import MaskedBatchNorm

__all__ = ["normalize_to_grid", "PVConv", "PVCNNSeg"]


def normalize_to_grid(pos, batch_idx, valid, resolution: int,
                      num_batches: int):
    """Host-side: per-sample normalized coordinates in [0, R-1].

    Returns float32 [N, 3] grid coords (continuous, for trilinear) and the
    flattened voxel key [N] of the containing cell (pad -> B*R^3 drop slot).
    """
    pos = np.asarray(pos, np.float32)
    batch_idx = np.asarray(batch_idx)
    gc = np.zeros_like(pos)
    r = resolution
    for b in range(num_batches):
        sel = (batch_idx == b) & np.asarray(valid)
        if not sel.any():
            continue
        lo = pos[sel].min(axis=0)
        hi = pos[sel].max(axis=0)
        gc[sel] = (pos[sel] - lo) / np.maximum(hi - lo, 1e-6) * (r - 1)
    cell = np.clip(gc.astype(np.int64), 0, r - 1)
    key = ((batch_idx.astype(np.int64) * r + cell[:, 0]) * r
           + cell[:, 1]) * r + cell[:, 2]
    key = np.where(np.asarray(valid), key, num_batches * r**3)
    return gc.astype(np.float32), key.astype(np.int32)


class PVConv(nn.Module):
    """One point-voxel block: voxel 3D-conv branch + point MLP branch."""

    out_channels: int
    resolution: int = 24
    num_batches: int = 1

    @nn.compact
    def __call__(self, feats, grid_coords, voxel_key, batch_idx, valid,
                 train: bool = True):
        r = self.resolution
        b = self.num_batches
        c = feats.shape[-1]
        # --- voxelize: mean of point features per cell -------------------
        # keys are NOT sorted -> use unsorted segment ops here
        ones = jnp.where(valid, 1.0, 0.0)
        dense_sum = jax.ops.segment_sum(
            feats * ones[:, None], voxel_key, num_segments=b * r**3 + 1
        )[: b * r**3]
        dense_cnt = jax.ops.segment_sum(
            ones, voxel_key, num_segments=b * r**3 + 1
        )[: b * r**3]
        grid = (dense_sum / jnp.maximum(dense_cnt[:, None], 1.0)).reshape(
            b, r, r, r, c
        )
        # --- dense 3D conv stack (MXU) ------------------------------------
        h = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                    use_bias=False)(grid.astype(jnp.bfloat16)).astype(jnp.float32)
        h = nn.GroupNorm(num_groups=min(8, self.out_channels))(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME",
                    use_bias=False)(h.astype(jnp.bfloat16)).astype(jnp.float32)
        h = nn.GroupNorm(num_groups=min(8, self.out_channels))(h)
        h = nn.relu(h)
        # --- trilinear devoxelize -----------------------------------------
        gc = grid_coords
        f0 = jnp.floor(gc).astype(jnp.int32)
        t = gc - f0
        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    cx = jnp.clip(f0[:, 0] + dx, 0, r - 1)
                    cy = jnp.clip(f0[:, 1] + dy, 0, r - 1)
                    cz = jnp.clip(f0[:, 2] + dz, 0, r - 1)
                    w = (
                        (t[:, 0] if dx else 1 - t[:, 0])
                        * (t[:, 1] if dy else 1 - t[:, 1])
                        * (t[:, 2] if dz else 1 - t[:, 2])
                    )
                    out = out + h[batch_idx, cx, cy, cz] * w[:, None]
        # --- point branch + fuse ------------------------------------------
        p = nn.Dense(self.out_channels, use_bias=False)(feats)
        p = MaskedBatchNorm()(p, valid, train=train)
        return nn.relu(out + p)


class PVCNNSeg(nn.Module):
    num_classes: int
    channels: Sequence[int] = (32, 64, 128)
    resolutions: Sequence[int] = (24, 16, 12)
    num_batches: int = 1

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        feats = batch["feats"]
        valid = batch["valid"]
        gc = batch["pv_grid_coords"]
        batch_idx = batch["pv_batch_idx"]
        x = feats
        skips = []
        for c, r in zip(self.channels, self.resolutions):
            key = batch[f"pv_key_r{r}"]
            x = PVConv(c, resolution=r, num_batches=self.num_batches)(
                x, gc * (r - 1) / (batch["pv_resolution"] - 1), key,
                batch_idx, valid, train=train,
            )
            skips.append(x)
        x = jnp.concatenate(skips, axis=-1)
        x = nn.Dense(self.channels[-1], use_bias=False)(x)
        x = MaskedBatchNorm()(x, valid, train=train)
        x = nn.relu(x)
        return {"logits": nn.Dense(self.num_classes, name="head")(x)}
