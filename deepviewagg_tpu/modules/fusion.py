"""Bimodal fusion: merging pooled 2D features into the 3D backbone stream.

Reference ``BimodalFusion`` (modules/multimodal/fusion.py:7-53): 'residual'
adds, 'concatenation' concats, 'both' does residual then concat, 'modality'
replaces.  Channel adaptation (when residual dims differ) is a linear
projection, as the reference does inside its fusion MLP path.
"""

from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp

__all__ = ["BimodalFusion"]


class BimodalFusion(nn.Module):
    mode: str = "residual"  # residual | concatenation | both | modality

    @nn.compact
    def __call__(self, x_3d, x_mod):
        if self.mode == "modality":
            return x_mod
        if self.mode == "residual":
            if x_mod.shape[-1] != x_3d.shape[-1]:
                x_mod = nn.Dense(x_3d.shape[-1], use_bias=False, name="proj")(x_mod)
            return x_3d + x_mod
        if self.mode in ("concatenation", "concat"):
            return jnp.concatenate([x_3d, x_mod], axis=-1)
        if self.mode == "both":
            # reference order: cat((main, main + mod)) (fusion.py:30)
            if x_mod.shape[-1] != x_3d.shape[-1]:
                res = nn.Dense(x_3d.shape[-1], use_bias=False, name="proj")(x_mod)
            else:
                res = x_mod
            return jnp.concatenate([x_3d, x_3d + res], axis=-1)
        raise ValueError(self.mode)
