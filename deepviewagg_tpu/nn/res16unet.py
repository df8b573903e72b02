"""The Res16UNet sparse-voxel UNet family — the paper's 3D backbone.

TPU re-design of modules/MinkowskiEngine/res16unet.py (Res16UNet14/18/34 and
A/B/C width variants): a stem conv (kernel 5), four stride-2 encoder stages of
residual blocks, and four transpose-conv decoder stages with skip
concatenation.  All spatial indexing is precomputed host-side into a "graph"
pytree (one entry per resolution level, see
:func:`deepviewagg_tpu.ops.sparse_graph.graph_to_device`); the device code is
pure gathers + MXU matmuls.

The encoder/decoder stages are standalone modules so the multimodal models
(models/segmentation/multimodal) can interleave image branches between stages
— the role of ``UnwrappedUnetBasedModel`` + ``MultimodalBlockDown`` in the
reference (models/base_architectures/unet.py:339,
modules/multimodal/modules.py:23).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .sparse_blocks import BottleneckBlock, ResBlock, SparseConvNormRelu

__all__ = [
    "Stem",
    "DownStage",
    "UpStage",
    "Res16UNet",
    "RES16_PRESETS",
]

# (layers, planes, block) per named variant — widths/depths follow
# modules/MinkowskiEngine/res16unet.py:246-560.
RES16_PRESETS = {
    "Res16UNet14": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 96, 96), "basic"),
    "Res16UNet18": ((2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96), "basic"),
    "Res16UNet34": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96), "basic"),
    "Res16UNet50": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96), "bottleneck"),
    # A/B/C decoder-width variants of Res16UNet34
    "Res16UNet34A": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 64), "basic"),
    "Res16UNet34B": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 32), "basic"),
    "Res16UNet34C": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96), "basic"),
    # tiny config for CPU tests / smoke runs (not a reference preset)
    "Res16UNetTest": ((1, 1, 1, 1, 1, 1, 1, 1), (8, 8, 16, 16, 16, 8, 8, 8), "basic"),
}


def _block_cls(name: str):
    return {"basic": ResBlock, "bottleneck": BottleneckBlock}[name]


class Stem(nn.Module):
    """Initial submanifold conv (kernel 5 in the reference presets)."""

    out_channels: int = 32

    @nn.compact
    def __call__(self, feats, graph, train: bool = True):
        lvl = graph["levels"][0]
        return SparseConvNormRelu(self.out_channels, submanifold=True)(
            feats, graph["conv0_nbr"], lvl["valid"], train=train
        )


class DownStage(nn.Module):
    """Stride-2 conv into the next level + N residual blocks there."""

    out_channels: int
    num_blocks: int
    block: str = "basic"

    @nn.compact
    def __call__(self, feats, graph, level_in: int, train: bool = True):
        src = graph["levels"][level_in]
        dst = graph["levels"][level_in + 1]
        x = SparseConvNormRelu(feats.shape[-1])(
            feats, src["down_nbr"], dst["valid"], train=train,
            nbr_t=src["up_nbr"],   # precomputed transpose: gather-only bwd
        )
        blk = _block_cls(self.block)
        for _ in range(self.num_blocks):
            x = blk(self.out_channels)(x, dst["sub_nbr"], dst["valid"], train=train)
        return x


class UpStage(nn.Module):
    """Transpose stride-2 conv back up + skip concat + N residual blocks."""

    out_channels: int
    num_blocks: int
    block: str = "basic"

    @nn.compact
    def __call__(self, feats, skip, graph, level_out: int, train: bool = True):
        dst = graph["levels"][level_out]
        x = SparseConvNormRelu(self.out_channels)(
            feats, dst["up_nbr"], dst["valid"], train=train,
            nbr_t=dst["down_nbr"],  # transpose of the up map = the down map
        )
        x = jnp.concatenate([x, skip], axis=-1)
        blk = _block_cls(self.block)
        for _ in range(self.num_blocks):
            x = blk(self.out_channels)(x, dst["sub_nbr"], dst["valid"], train=train)
        return x


class Res16UNet(nn.Module):
    """Full encoder/decoder; returns per-voxel features at level 0.

    ``graph`` is the device pytree from ``graph_to_device`` with
    ``1 + len(layers)//2`` levels (5 for the presets).
    """

    layers: Sequence[int] = RES16_PRESETS["Res16UNet34"][0]
    planes: Sequence[int] = RES16_PRESETS["Res16UNet34"][1]
    block: str = "basic"
    init_dim: int = 32

    @classmethod
    def preset(cls, arch: str, **kw) -> "Res16UNet":
        layers, planes, block = RES16_PRESETS[arch]
        return cls(layers=layers, planes=planes, block=block, **kw)

    @nn.compact
    def __call__(self, feats, graph, train: bool = True):
        n_down = len(self.layers) // 2
        x = Stem(self.init_dim)(feats, graph, train=train)
        skips = [x]
        for i in range(n_down):
            x = DownStage(self.planes[i], self.layers[i], self.block)(
                x, graph, i, train=train
            )
            if i < n_down - 1:
                skips.append(x)
        for j in range(n_down):
            lvl_out = n_down - 1 - j
            x = UpStage(self.planes[n_down + j], self.layers[n_down + j], self.block)(
                x, skips[lvl_out], graph, lvl_out, train=train
            )
        return x
