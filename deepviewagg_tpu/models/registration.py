"""Point-cloud registration: siamese descriptors + Kabsch alignment.

Coverage of the reference's registration task stack (datasets/registration
3DMatch etc. + FCGF-style models): a shared sparse encoder produces
per-point descriptors for two fragments; mutual-nearest-neighbor
correspondences feed a closed-form weighted Kabsch/Procrustes solve.  The
reference's pycuda TSDF fusion is dataset preprocessing and out of scope
(SURVEY.md §2.9 'registration only').
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.res16unet import Res16UNet

__all__ = ["RegistrationNet", "kabsch", "mutual_nearest", "hardest_contrastive"]


class RegistrationNet(nn.Module):
    """Shared sparse UNet -> L2-normalized per-point descriptors."""

    descriptor_dim: int = 32
    backbone: str = "Res16UNet14"

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        x = Res16UNet.preset(self.backbone, name="backbone")(
            batch["feats"], batch["graph"], train=train
        )
        d = nn.Dense(self.descriptor_dim, name="desc")(x)
        # rsqrt(sum + eps): unlike norm(), differentiable at the all-zero
        # rows padding produces (0 * NaN poisons grads otherwise)
        return d * jax.lax.rsqrt(jnp.sum(d * d, axis=1, keepdims=True) + 1e-12)


def mutual_nearest(desc_a, desc_b, valid_a=None, valid_b=None):
    """Mutual nearest neighbors in descriptor space ->
    (idx_a [M], idx_b [M], mask [M]) with M = len(desc_a)."""
    sim = desc_a @ desc_b.T
    if valid_b is not None:
        sim = jnp.where(jnp.asarray(valid_b)[None, :], sim, -1e9)
    if valid_a is not None:
        sim = jnp.where(jnp.asarray(valid_a)[:, None], sim, -1e9)
    ab = jnp.argmax(sim, axis=1)
    ba = jnp.argmax(sim, axis=0)
    idx_a = jnp.arange(desc_a.shape[0])
    mutual = ba[ab] == idx_a
    if valid_a is not None:
        mutual = mutual & jnp.asarray(valid_a)
    return idx_a, ab, mutual


def kabsch(src, dst, weights=None):
    """Closed-form rigid alignment: R, t minimizing ||R src + t - dst||²."""
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    if weights is None:
        weights = jnp.ones(src.shape[0], jnp.float32)
    w = weights / jnp.maximum(weights.sum(), 1e-8)
    mu_s = (src * w[:, None]).sum(axis=0)
    mu_d = (dst * w[:, None]).sum(axis=0)
    h = ((src - mu_s) * w[:, None]).T @ (dst - mu_d)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    s = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    r = vt.T @ s @ u.T
    t = mu_d - r @ mu_s
    return r, t


def hardest_contrastive(desc_a, desc_b, pos_pairs, margin_pos=0.1,
                        margin_neg=1.4, num_neg: int = 256, valid_b=None):
    """FCGF-style hardest-contrastive loss over known positive pairs
    ``pos_pairs int32 [P, 2]`` (same physical point in both fragments).
    Pass ``valid_b`` so cap-padding rows (all-zero descriptors, distance
    ~1 from any unit vector) never become the 'hardest' negatives."""
    def safe_norm(x, axis):
        # eps inside the sqrt: d/dx ||0|| is NaN otherwise (identical pairs)
        return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-12)

    da = desc_a[pos_pairs[:, 0]]
    db = desc_b[pos_pairs[:, 1]]
    pos_d = safe_norm(da - db, 1)
    # hardest negatives among a subsample
    sub = desc_b[:num_neg]
    d_an = safe_norm(da[:, None] - sub[None], -1)
    if valid_b is not None:
        ok = jnp.asarray(valid_b)[:num_neg]
        d_an = jnp.where(ok[None, :], d_an, 1e9)
    # mask out the true positive column when inside the subsample
    col = pos_pairs[:, 1]
    in_sub = col < num_neg
    d_an = jnp.where(
        (jnp.arange(num_neg)[None, :] == col[:, None]) & in_sub[:, None],
        1e9, d_an,
    )
    neg_d = jnp.min(d_an, axis=1)
    loss_pos = jnp.maximum(pos_d - margin_pos, 0.0) ** 2
    loss_neg = jnp.maximum(margin_neg - neg_d, 0.0) ** 2
    return jnp.mean(loss_pos) + jnp.mean(loss_neg)
