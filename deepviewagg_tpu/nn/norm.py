"""Validity-masked normalization layers.

The reference normalizes sparse-voxel features with BatchNorm over all active
voxels (MinkowskiEngine / torchsparse BatchNorm consumed via
modules/SparseConv3d/nn/__init__.py).  Our static-shape sparse tensors carry
padding rows, so the statistics must be computed over *valid* rows only.

Under ``jit`` with a sharded batch, plain ``jnp.sum`` over the sharded axis
already yields global (cross-device) statistics — XLA inserts the collectives
— so the same module works single-chip and under a data-parallel mesh with no
axis_name plumbing.  Inside ``shard_map``, pass ``axis_name`` to get explicit
``psum`` cross-device stats.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MaskedBatchNorm", "bn_axis_name", "bn_momentum"]

# Trainer-scoped default axis name for cross-device (sync) batch norm inside
# ``shard_map`` — set during step tracing so every MaskedBatchNorm in the
# model psums its statistics without threading a field through all modules.
_BN_AXIS = [None]
# Trainer-scoped momentum override: the reference's BN-momentum scheduler
# (core/schedulers/bn_schedulers.py) decays momentum across epochs; the
# override is a trace-time constant, so each new value costs one recompile
# (schedule it coarsely).
_BN_MOMENTUM = [None]


@contextlib.contextmanager
def bn_axis_name(name: Optional[str]):
    """While tracing inside ``shard_map(axis_names=(name,))``, make all
    MaskedBatchNorm layers reduce statistics over that axis (sync BN)."""
    _BN_AXIS.append(name)
    try:
        yield
    finally:
        _BN_AXIS.pop()


@contextlib.contextmanager
def bn_momentum(value: Optional[float]):
    """Override every MaskedBatchNorm's momentum during tracing."""
    _BN_MOMENTUM.append(value)
    try:
        yield
    finally:
        _BN_MOMENTUM.pop()


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the row axis with a validity mask.

    ``x`` is ``[N, C]``; ``valid`` is ``bool [N]``.  Running statistics live
    in the ``batch_stats`` collection (flax convention).  ``momentum`` follows
    the torch default the reference uses (running = 0.9*old + 0.1*new,
    models/base_model.py BN usage).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None, train: bool = True):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        xf = x.astype(jnp.float32)
        if train:
            if valid is None:
                w = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
            else:
                w = valid.astype(jnp.float32).reshape(valid.shape + (1,))
            s1 = jnp.sum(xf * w, axis=tuple(range(xf.ndim - 1)))
            s2 = jnp.sum(xf * xf * w, axis=tuple(range(xf.ndim - 1)))
            n = jnp.sum(w)
            axis = self.axis_name if self.axis_name is not None else _BN_AXIS[-1]
            if axis is not None:
                s1 = jax.lax.psum(s1, axis)
                s2 = jax.lax.psum(s2, axis)
                n = jax.lax.psum(n, axis)
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                mom = (self.momentum if _BN_MOMENTUM[-1] is None
                       else _BN_MOMENTUM[-1])
                ra_mean.value = mom * ra_mean.value + (1 - mom) * mean
                ra_var.value = mom * ra_var.value + (1 - mom) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


# NOTE: the dense image towers use flax ``nn.GroupNorm`` directly
# (modules/image_encoders.py) — torch-identical on dense [N, W, H, C]
# inputs, so no masked variant is needed there; sparse point paths use
# MaskedBatchNorm above.
