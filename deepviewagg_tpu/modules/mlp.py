"""MLP with masked BatchNorm — the reference's ``MLP`` Seq building block
(core/common_modules/base_modules.py:39-49: Linear -> FastBatchNorm1d ->
LeakyReLU(0.2) per layer), validity-mask aware for padded rows."""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from ..nn.norm import MaskedBatchNorm

__all__ = ["MLP"]


class MLP(nn.Module):
    channels: Sequence[int]
    norm: bool = True
    final_activation: bool = True
    momentum: float = 0.9
    # the reference MLP's default activation is LeakyReLU(0.2), not ReLU
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, valid=None, train: bool = True):
        for i, c in enumerate(self.channels):
            last = i == len(self.channels) - 1
            x = nn.Dense(c, use_bias=not self.norm)(x)
            if self.norm:
                x = MaskedBatchNorm(momentum=self.momentum)(x, valid, train=train)
            if not last or self.final_activation:
                x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        return x
