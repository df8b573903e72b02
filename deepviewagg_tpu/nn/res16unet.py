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

from .sparse_blocks import (BottleneckBlock, ResBlock, SEBottleneckBlock,
                            SEResBlock, SparseConvNormRelu)

__all__ = [
    "Stem",
    "DownStage",
    "UpStage",
    "Res16UNet",
    "RES16_PRESETS",
]

# (layers, planes, block) per named variant — widths/depths follow
# modules/MinkowskiEngine/res16unet.py:246-588: the base class planes are
# (32,64,128,256,256,256,256,256); named letter variants override decoder
# widths; 50/101 swap in the bottleneck block (101 deepens stage 4 to 23).
_BASE = (32, 64, 128, 256, 256, 256, 256, 256)
RES16_PRESETS = {
    # NOTE: the names 14/18/34 here follow the DeepViewAgg compact configs'
    # channel plan (34C-style narrowing decoders — multimodal
    # sparseconv3d.yaml:6622 up_conv_nn), which is what the paper's models
    # and the published param counts (28.1M) use — NOT the raw ME class
    # defaults (those are the *Full variants below).
    "Res16UNet14": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 96, 96), "basic"),
    "Res16UNet18": ((2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96), "basic"),
    "Res16UNet34": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96), "basic"),
    # ME class defaults (res16unet.py:246-533 PLANES)
    "Res16UNet14Full": ((1, 1, 1, 1, 1, 1, 1, 1), _BASE, "basic"),
    "Res16UNet18Full": ((2, 2, 2, 2, 2, 2, 2, 2), _BASE, "basic"),
    "Res16UNet34Full": ((2, 3, 4, 6, 2, 2, 2, 2), _BASE, "basic"),
    "Res16UNet50": ((2, 3, 4, 6, 2, 2, 2, 2), _BASE, "bottleneck"),
    "Res16UNet101": ((2, 3, 4, 23, 2, 2, 2, 2), _BASE, "bottleneck"),
    # decoder-width letter variants (res16unet.py:536-588)
    "Res16UNet14A": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 96, 96), "basic"),
    "Res16UNet14A2": ((1, 1, 1, 1, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96), "basic"),
    "Res16UNet14B": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 128, 128), "basic"),
    "Res16UNet14B2": ((1, 1, 1, 1, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 128, 128), "basic"),
    "Res16UNet14B3": ((2, 2, 2, 2, 1, 1, 1, 1), (32, 64, 128, 256, 128, 128, 128, 128), "basic"),
    "Res16UNet14C": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 192, 192, 128, 128), "basic"),
    "Res16UNet14D": ((1, 1, 1, 1, 1, 1, 1, 1), (32, 64, 128, 256, 384, 384, 384, 384), "basic"),
    "Res16UNet18A": ((2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 96, 96), "basic"),
    "Res16UNet18B": ((2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 128, 128, 128, 128), "basic"),
    "Res16UNet18D": ((2, 2, 2, 2, 2, 2, 2, 2), (32, 64, 128, 256, 384, 384, 384, 384), "basic"),
    "Res16UNet32B": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 64, 64, 64), "basic"),
    "Res16UNet34A": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 64), "basic"),
    "Res16UNet34B": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 32), "basic"),
    "Res16UNet34C": ((2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96), "basic"),
    # squeeze-excitation family (SEBasicBlock, modules.py:295; SELayer :276)
    "SERes16UNet34": ((2, 3, 4, 6, 2, 2, 2, 2), _BASE, "se_basic"),
    "SERes16UNet50": ((2, 3, 4, 6, 2, 2, 2, 2), _BASE, "se_bottleneck"),
    # tiny config for CPU tests / smoke runs (not a reference preset)
    "Res16UNetTest": ((1, 1, 1, 1, 1, 1, 1, 1), (8, 8, 16, 16, 16, 8, 8, 8), "basic"),
}


def _block_cls(name: str):
    return {
        "basic": ResBlock,
        "bottleneck": BottleneckBlock,
        "se_basic": SEResBlock,
        "se_bottleneck": SEBottleneckBlock,
    }[name]


class Stem(nn.Module):
    """Initial submanifold conv; the kernel size lives in the collate-time
    graph (``conv0_nbr``) — 3 in every DeepViewAgg multimodal config
    (sparseconv3d.yaml:6622), 5 only in the raw ME class default."""

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
            x = blk(self.out_channels)(x, dst["sub_nbr"], dst["valid"],
                                       train=train, batch_idx=dst["batch_idx"])
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
            x = blk(self.out_channels)(x, dst["sub_nbr"], dst["valid"],
                                       train=train, batch_idx=dst["batch_idx"])
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
