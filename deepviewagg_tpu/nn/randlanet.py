"""RandLA-Net-style backbone: random sampling + local spatial encoding +
attentive pooling.

Coverage of the reference's RandLANet family (modules/RandLANet/). The
defining pieces (Hu et al. 2020):

  * aggressive *random* downsampling between levels (cheap; accuracy
    recovered by the strong local encoder) — here the level structure is
    precomputed host-side like every other index structure;
  * LocSE: relative position encoding (rel xyz, distances, absolute pos)
    concatenated to neighbor features;
  * attentive pooling: learned softmax over the k neighbors instead of max.

Reuses the pointnet-style graph tables (ball query / kNN upsampling); the
random level is selected host-side in :func:`build_randla_graph`.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import knn as _knn
from ..ops import spatial as sp
from .norm import MaskedBatchNorm
from .pointnet2 import _separated

__all__ = ["build_randla_graph", "RandLANetSeg"]


def build_randla_graph(
    pos: np.ndarray,
    batch_idx: np.ndarray,
    valid: np.ndarray,
    decimation: int = 4,
    num_levels: int = 3,
    k: int = 16,
    seed: int = 0,
) -> Dict:
    """Random decimation levels + kNN neighborhoods per level."""
    rng = np.random.default_rng(seed)
    sep = _separated(pos, batch_idx)
    levels = []
    cur_pos, cur_valid = sep, np.asarray(valid, bool)
    all_pos = [sep]
    for _ in range(num_levels):
        n = len(cur_pos)
        m = max(16, n // decimation)
        # random sampling among valid points (RandLA's core trick)
        cand = np.nonzero(cur_valid)[0]
        if len(cand) == 0:
            cand = np.arange(n)
        centers = np.sort(rng.choice(cand, min(m, len(cand)), replace=False))
        d2, nbr = _knn.knn(cur_pos, cur_pos, k=k, valid=cur_valid)
        up_d2, up_idx = _knn.knn(cur_pos, cur_pos[centers], k=1)
        levels.append({
            "nbr": nbr.astype(np.int32),          # kNN at the FINE level
            "nbr_d2": d2.astype(np.float32),
            "centers": centers.astype(np.int32),
            "center_valid": cur_valid[centers],
            "up_idx": up_idx.astype(np.int32),    # fine -> nearest center
            "up_d2": up_d2.astype(np.float32),
        })
        cur_pos = cur_pos[centers]
        cur_valid = cur_valid[centers]
        all_pos.append(cur_pos)
    return {"levels": levels, "pos": all_pos}


class _AttentivePool(nn.Module):
    """Softmax-scored neighbor aggregation (RandLA attentive pooling)."""

    out_channels: int

    @nn.compact
    def __call__(self, feats_nk):
        # feats_nk: [N, k, C]
        scores = nn.Dense(feats_nk.shape[-1], use_bias=False)(feats_nk)
        attn = jnp.exp(scores - jnp.max(scores, axis=1, keepdims=True))
        attn = attn / jnp.maximum(jnp.sum(attn, axis=1, keepdims=True), 1e-9)
        agg = jnp.sum(feats_nk * attn, axis=1)
        return nn.Dense(self.out_channels, use_bias=False)(agg)


class RandLANetSeg(nn.Module):
    num_classes: int
    channels: Sequence[int] = (32, 64, 128)

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        graph = batch["rl_graph"]
        levels = graph["levels"]
        pos = [jnp.asarray(p, jnp.float32) for p in graph["pos"]]
        x = batch["feats"]
        valid = batch["valid"]
        skips = []
        for li, (lvl, c) in enumerate(zip(levels, self.channels)):
            nbr = lvl["nbr"]
            p = pos[li]
            rel = p[nbr] - p[:, None, :]                       # [N, k, 3]
            d = jnp.sqrt(jnp.maximum(lvl["nbr_d2"], 0.0))[..., None]
            locse = jnp.concatenate(
                [rel, d, jnp.broadcast_to(p[:, None, :], rel.shape)], axis=-1
            )
            locse = nn.Dense(c // 2, use_bias=False)(locse)
            g = jnp.concatenate([locse, x[nbr]], axis=-1)
            h = _AttentivePool(c)(g)
            h = MaskedBatchNorm()(h, valid, train=train)
            h = nn.relu(h)
            skips.append((h, valid, li))
            # random decimation
            x = h[lvl["centers"]]
            valid = lvl["center_valid"]
        for h_fine, fine_valid, li in reversed(skips):
            lvl = levels[li]
            up = x[lvl["up_idx"][:, 0]]
            x = jnp.concatenate([up, h_fine], axis=-1)
            x = nn.Dense(h_fine.shape[-1], use_bias=False)(x)
            x = MaskedBatchNorm()(x, fine_valid, train=train)
            x = nn.relu(x)
            valid = fine_valid
        return {"logits": nn.Dense(self.num_classes, name="head")(x)}
