"""KPConv: kernel-point convolution (static-shape, batched).

Coverage of the reference's KPConv family (modules/KPConv/: blocks.py,
kernels.py with Lloyd-optimized kernel dispositions, convolution_ops.py over
torch-points-kernels CUDA neighbor ops).  TPU formulation:

  * kernel point dispositions: a deterministic repulsion relaxation on the
    sphere (the role of the reference's pre-baked .ply dispositions /
    Lloyd generation);
  * neighbors: host-side ball query tables (ops/spatial.py), like all other
    index structures;
  * the conv: influence weights ``max(0, 1 - |y_n - x - k_p|/sigma)``
    (linear correlation) contracted with per-kernel-point weight matrices —
    one einsum on the MXU.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .norm import MaskedBatchNorm

__all__ = ["kernel_point_dispositions", "KPConvLayer", "KPConvSeg"]


@functools.lru_cache(maxsize=8)
def kernel_point_dispositions(num_points: int = 15, radius: float = 1.0,
                              iters: int = 100, seed: int = 0) -> np.ndarray:
    """Deterministic kernel-point layout: one center point + repulsion-relaxed
    shell points in the ball (kernels.py kernel_point_optimization_debug
    equivalent, without the .ply cache)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(num_points, 3))
    pts[0] = 0.0
    for _ in range(iters):
        diff = pts[:, None] - pts[None]                    # [K, K, 3]
        d = np.linalg.norm(diff, axis=-1) + 1e-9
        rep = (diff / d[..., None] / (d[..., None] ** 2 + 1e-3)).sum(axis=1)
        pts[1:] += 0.01 * rep[1:]
        norms = np.linalg.norm(pts[1:], axis=1, keepdims=True)
        pts[1:] = np.where(norms > 1.0, pts[1:] / norms, pts[1:])
        pts[0] = 0.0
    return (pts * radius).astype(np.float32)


class KPConvLayer(nn.Module):
    """One rigid KPConv: ``out[i] = sum_n sum_k h(|rel_nk|) f_n W_k``."""

    out_channels: int
    num_kernel_points: int = 15
    radius: float = 0.3          # neighborhood radius (sigma = radius/2.5)

    @nn.compact
    def __call__(self, feats, rel_pos, nbr_feat_idx, nbr_count, valid,
                 train: bool = True):
        """rel_pos f32 [M, k, 3] (neighbor - center), nbr_feat_idx int32
        [M, k] rows into ``feats``, nbr_count [M]."""
        kp = jnp.asarray(
            kernel_point_dispositions(self.num_kernel_points,
                                      self.radius * 0.66)
        )
        sigma = self.radius / 2.5
        cin = feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.num_kernel_points, cin, self.out_channels),
        )
        m, k, _ = rel_pos.shape
        # influences [M, k, K]
        d = jnp.linalg.norm(
            rel_pos[:, :, None, :] - kp[None, None, :, :], axis=-1
        )
        infl = jnp.maximum(0.0, 1.0 - d / sigma)
        slot_ok = (
            jnp.arange(k)[None, :] < jnp.maximum(nbr_count[:, None], 1)
        )
        infl = infl * slot_ok[..., None]
        f = feats[nbr_feat_idx].astype(jnp.bfloat16)       # [M, k, Cin]
        # accumulate per kernel point: [M, K, Cin] then contract with W
        fk = jnp.einsum("mkp,mkc->mpc", infl.astype(jnp.bfloat16), f)
        out = jax.lax.dot_general(
            fk, w.astype(jnp.bfloat16),
            dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.where(valid[:, None], out, 0.0)


class KPConvSeg(nn.Module):
    """Compact KPConv encoder-decoder over a pointnet-style graph
    (build_pointnet_graph supplies FPS/ball-query/up tables)."""

    num_classes: int
    channels: Sequence[int] = (64, 128, 256)
    radii: Sequence[float] = (0.15, 0.3, 0.6)

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        graph = batch["pn_graph"]
        levels = graph["levels"]
        pos = [jnp.asarray(p, jnp.float32) for p in graph["pos"]]
        x = batch["feats"]
        valid = batch["valid"]
        skips = [(x, valid)]
        for li, (lvl, c, r) in enumerate(zip(levels, self.channels, self.radii)):
            group = lvl["group"]
            rel = pos[li][group] - pos[li + 1][:, None, :]
            x = KPConvLayer(c, radius=r, name=f"kp{li}")(
                x, rel, group, lvl["group_count"], lvl["center_valid"],
                train=train,
            )
            x = MaskedBatchNorm()(x, lvl["center_valid"], train=train)
            x = nn.relu(x)
            valid = lvl["center_valid"]
            skips.append((x, valid))
        for li in reversed(range(len(levels))):
            fine_x, fine_valid = skips[li]
            w = 1.0 / jnp.maximum(levels[li]["up_d2"], 1e-10)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            up = jnp.sum(x[levels[li]["up_idx"]] * w[..., None], axis=1)
            x = jnp.concatenate([up, fine_x], axis=-1)
            x = nn.Dense(self.channels[max(li - 1, 0)], use_bias=False)(x)
            x = MaskedBatchNorm()(x, fine_valid, train=train)
            x = nn.relu(x)
            valid = fine_valid
        return {"logits": nn.Dense(self.num_classes, name="head")(x)}
