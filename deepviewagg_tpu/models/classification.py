"""Shape classification: encoder + global pool + classifier head.

Coverage of the reference's classification task stack
(datasets/classification ModelNet + models/classification): any of the
point/voxel encoders followed by a per-sample masked global pool
(``ops/sparse_conv.sparse_global_pool``) and an MLP classifier.
"""

from __future__ import annotations

from typing import Dict

from flax import linen as nn
import jax.numpy as jnp

from ..nn.res16unet import RES16_PRESETS, DownStage, Stem
from ..ops.sparse_conv import sparse_global_pool

__all__ = ["SparseConv3dCls"]


class SparseConv3dCls(nn.Module):
    """Res16UNet encoder + global mean/max pool + classifier."""

    num_classes: int
    backbone: str = "Res16UNet14"
    num_batches: int = 1

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        layers, planes, block = RES16_PRESETS[self.backbone]
        n_down = len(layers) // 2
        x = Stem(name="stem")(batch["feats"], batch["graph"], train=train)
        for i in range(n_down):
            x = DownStage(planes[i], layers[i], block, name=f"down{i}")(
                x, batch["graph"], i, train=train
            )
        lvl = batch["graph"]["levels"][n_down]
        pooled_mean = sparse_global_pool(
            x, lvl["batch_idx"], self.num_batches + 1, valid=lvl["valid"],
            reduce="mean",
        )[: self.num_batches]
        pooled_max = sparse_global_pool(
            x, lvl["batch_idx"], self.num_batches + 1, valid=lvl["valid"],
            reduce="max",
        )[: self.num_batches]
        h = jnp.concatenate([pooled_mean, pooled_max], axis=-1)
        h = nn.relu(nn.Dense(128)(h))
        if train:
            h = nn.Dropout(0.3, deterministic=not self.has_rng("dropout"))(h)
        return {"logits": nn.Dense(self.num_classes, name="head")(h)}
