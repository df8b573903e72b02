"""Sparse-voxel conv blocks as flax modules.

The parameterized counterparts of the reference's backend-switched sparse conv
modules (modules/SparseConv3d/modules.py:10-220, built over torchsparse /
MinkowskiEngine).  Convolution itself is the gather + single-MXU-matmul of
:func:`deepviewagg_tpu.ops.sparse_conv.sparse_conv`; these modules own the
weights and the norm/activation plumbing.

All blocks take ``(feats [cap, C], nbr int32 [K, cap_out], valid bool)`` and
return ``[cap_out, C']`` — neighbor tables come from the host-side graph
builder (:mod:`deepviewagg_tpu.ops.sparse_graph`), never computed on device.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse_conv import (
    sparse_conv, sparse_conv_pair, sparse_conv_submanifold,
)
from .norm import MaskedBatchNorm

__all__ = [
    "SparseConv",
    "SparseConvNormRelu",
    "ResBlock",
    "BottleneckBlock",
    "SqueezeExcite",
    "SEResBlock",
    "SEBottleneckBlock",
]


def _kernel_init(key, shape, dtype=jnp.float32):
    """He-normal over fan_in = K * Cin (what torch's kaiming gives the
    reference's sparse convs)."""
    k, cin, _ = shape
    std = (2.0 / (k * cin)) ** 0.5
    import jax.random as jrandom

    return jrandom.normal(key, shape, dtype) * std


class SparseConv(nn.Module):
    """Bare sparse convolution: weights ``[K, Cin, Cout]`` + optional bias.

    ``submanifold=True`` (same in/out coords, centered odd kernel) enables
    the gather-only custom VJP — backward runs the transposed kernel map as
    another gather-GEMM instead of a scatter-add (PERF.md).
    """

    out_channels: int
    use_bias: bool = False
    submanifold: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, nbr, nbr_t=None):
        k = nbr.shape[0]
        cin = feats.shape[-1]
        w = self.param("kernel", _kernel_init, (k, cin, self.out_channels))
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        if self.submanifold and feats.shape[0] == nbr.shape[1]:
            out = sparse_conv_submanifold(feats, w, nbr, self.compute_dtype)
        elif nbr_t is not None:
            # strided conv with a precomputed transpose map: gather-only bwd
            out = sparse_conv_pair(feats, w, nbr, nbr_t, self.compute_dtype)
        else:
            return sparse_conv(feats, w, nbr, bias=b,
                               compute_dtype=self.compute_dtype)
        return out if b is None else out + b


class SparseConvNormRelu(nn.Module):
    """Conv -> masked BN -> ReLU, the reference's conv/norm/act triplet."""

    out_channels: int
    relu: bool = True
    momentum: float = 0.9
    submanifold: bool = False

    @nn.compact
    def __call__(self, feats, nbr, valid, train: bool = True, nbr_t=None):
        x = SparseConv(self.out_channels, submanifold=self.submanifold)(
            feats, nbr, nbr_t=nbr_t
        )
        x = MaskedBatchNorm(momentum=self.momentum)(x, valid, train=train)
        if self.relu:
            x = nn.relu(x)
        return x


class ResBlock(nn.Module):
    """Basic residual block (conv-bn-relu-conv-bn + skip), submanifold.

    Mirrors modules/SparseConv3d/modules.py ResBlock /
    MinkowskiEngine BasicBlock: a 1x1 (here: plain linear) downsample path
    when channel counts differ.
    """

    out_channels: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, feats, nbr, valid, train: bool = True, batch_idx=None):
        x = SparseConvNormRelu(self.out_channels, momentum=self.momentum,
                               submanifold=True)(
            feats, nbr, valid, train=train
        )
        x = SparseConvNormRelu(
            self.out_channels, relu=False, momentum=self.momentum,
            submanifold=True,
        )(x, nbr, valid, train=train)
        if feats.shape[-1] != self.out_channels:
            skip = nn.Dense(self.out_channels, use_bias=False)(feats)
            skip = MaskedBatchNorm(momentum=self.momentum)(skip, valid, train=train)
        else:
            skip = feats
        return nn.relu(x + skip)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (Res16UNet50/101 variants,
    modules/MinkowskiEngine/res16unet.py Bottleneck)."""

    out_channels: int
    reduction: int = 4
    momentum: float = 0.9

    @nn.compact
    def __call__(self, feats, nbr, valid, train: bool = True, batch_idx=None):
        mid = self.out_channels // self.reduction
        x = nn.Dense(mid, use_bias=False)(feats)
        x = MaskedBatchNorm(momentum=self.momentum)(x, valid, train=train)
        x = nn.relu(x)
        x = SparseConvNormRelu(mid, momentum=self.momentum,
                               submanifold=True)(x, nbr, valid, train=train)
        x = nn.Dense(self.out_channels, use_bias=False)(x)
        x = MaskedBatchNorm(momentum=self.momentum)(x, valid, train=train)
        if feats.shape[-1] != self.out_channels:
            skip = nn.Dense(self.out_channels, use_bias=False)(feats)
            skip = MaskedBatchNorm(momentum=self.momentum)(skip, valid, train=train)
        else:
            skip = feats
        return nn.relu(x + skip)


class SqueezeExcite(nn.Module):
    """Per-sample channel gating (``SELayer``, MinkowskiEngine modules.py:276):
    global mean pool per batch sample -> bottleneck MLP -> sigmoid scale.

    ``batch_idx`` is the sorted per-voxel sample index from the collated
    graph (pad rows carry the extra slot and are masked by ``valid``);
    ``max_batches`` is a static bound on samples per batch.
    """

    reduction: int = 16
    max_batches: int = 32

    @nn.compact
    def __call__(self, x, batch_idx, valid):
        from ..ops import segment as seg

        c = x.shape[-1]
        pooled = seg.segment_mean(
            x, batch_idx, self.max_batches + 1, valid=valid
        )                                                   # [B+1, C]
        y = nn.Dense(max(c // self.reduction, 1))(pooled)
        y = nn.relu(y)
        y = jax.nn.sigmoid(nn.Dense(c)(y))
        return x * y[jnp.clip(batch_idx, 0, self.max_batches)]


class SEResBlock(nn.Module):
    """ResBlock with squeeze-excitation on the residual branch before the
    skip-add (``SEBasicBlock``, MinkowskiEngine modules.py:295-321)."""

    out_channels: int
    momentum: float = 0.9
    se_reduction: int = 16

    @nn.compact
    def __call__(self, feats, nbr, valid, train: bool = True, batch_idx=None):
        assert batch_idx is not None, "SE blocks need the graph batch_idx"
        x = SparseConvNormRelu(self.out_channels, momentum=self.momentum,
                               submanifold=True)(feats, nbr, valid, train=train)
        x = SparseConvNormRelu(
            self.out_channels, relu=False, momentum=self.momentum,
            submanifold=True,
        )(x, nbr, valid, train=train)
        x = SqueezeExcite(self.se_reduction)(x, batch_idx, valid)
        if feats.shape[-1] != self.out_channels:
            skip = nn.Dense(self.out_channels, use_bias=False)(feats)
            skip = MaskedBatchNorm(momentum=self.momentum)(skip, valid, train=train)
        else:
            skip = feats
        return nn.relu(x + skip)


class SEBottleneckBlock(nn.Module):
    """Bottleneck + squeeze-excitation (``SEBottleneck``, modules.py:336)."""

    out_channels: int
    reduction: int = 4
    momentum: float = 0.9
    se_reduction: int = 16

    @nn.compact
    def __call__(self, feats, nbr, valid, train: bool = True, batch_idx=None):
        assert batch_idx is not None, "SE blocks need the graph batch_idx"
        mid = self.out_channels // self.reduction
        x = nn.Dense(mid, use_bias=False)(feats)
        x = MaskedBatchNorm(momentum=self.momentum)(x, valid, train=train)
        x = nn.relu(x)
        x = SparseConvNormRelu(mid, momentum=self.momentum,
                               submanifold=True)(x, nbr, valid, train=train)
        x = nn.Dense(self.out_channels, use_bias=False)(x)
        x = MaskedBatchNorm(momentum=self.momentum)(x, valid, train=train)
        x = SqueezeExcite(self.se_reduction)(x, batch_idx, valid)
        if feats.shape[-1] != self.out_channels:
            skip = nn.Dense(self.out_channels, use_bias=False)(feats)
            skip = MaskedBatchNorm(momentum=self.momentum)(skip, valid, train=train)
        else:
            skip = feats
        return nn.relu(x + skip)
