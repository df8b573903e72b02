"""PointNet++-style set-abstraction backbone (static-shape, batched).

Coverage of the reference's point-based 3D families
(modules/pointnet2, consumed by models/segmentation/pointnet2.py): a compact
SA (sample + group + pointwise-MLP + max) / FP (kNN-interpolate + MLP)
encoder-decoder over the padded point batch.  TPU adaptations:

  * FPS / ball query / interpolation are the static-shape ops of
    :mod:`deepviewagg_tpu.ops.spatial`, precomputed HOST-side per batch into
    index tables (like the sparse-conv kernel maps) so the jitted forward is
    pure gathers + matmuls;
  * samples never mix: grouping runs on per-sample-offset coordinates.

Use :func:`build_pointnet_graph` at collate time, then
:class:`PointNet2Seg`.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import spatial as sp
from .norm import MaskedBatchNorm

__all__ = ["build_pointnet_graph", "PointNet2Seg"]


def _separated(pos, batch_idx, gap=1e4):
    """Shift each sample far apart so neighbor ops never cross samples."""
    return np.asarray(pos, np.float32) + np.asarray(batch_idx)[:, None] * gap


def build_pointnet_graph(
    pos: np.ndarray,
    batch_idx: np.ndarray,
    valid: np.ndarray,
    n_points: Sequence[int] = (4096, 1024, 256, 64),
    radii: Sequence[float] = (0.1, 0.2, 0.4, 0.8),
    k: int = 32,
    self_k: int = 0,
) -> Dict:
    """Host-side: FPS centers, ball-query groups and upsampling kNN per SA
    level.  Returns a jit-ready dict pytree of index tables.

    ``self_k > 0`` additionally stores per-level SAME-level neighbor tables
    among the centers (``self_group``/``self_count``) — PPNet's resnet
    bottlenecks aggregate within a level (ref modules/PPNet/blocks.py)."""
    sep = _separated(pos, batch_idx)
    levels: List[Dict] = []
    cur_pos, cur_valid = sep, np.asarray(valid, bool)
    cur_idx = np.arange(len(sep))
    for m, r in zip(n_points, radii):
        m = min(m, len(cur_pos))
        centers = np.asarray(sp.farthest_point_sample(cur_pos, m, cur_valid))
        cpos = cur_pos[centers]
        group, counts = sp.ball_query(cpos, cur_pos, r, k, valid=cur_valid)
        up_d2, up_idx = None, None
        levels.append({
            "centers": centers.astype(np.int32),
            "group": group,
            "group_count": counts.astype(np.int32),
            "center_valid": cur_valid[centers],
        })
        if self_k:
            sg, sc = sp.ball_query(cpos, cpos, r * 2, self_k,
                                   valid=cur_valid[centers])
            levels[-1]["self_group"] = sg
            levels[-1]["self_count"] = sc.astype(np.int32)
        cur_pos = cpos
        cur_valid = cur_valid[centers]
    # FP: interpolation indices from level l+1 -> l (and level 0 -> input)
    all_pos = [sep]
    for lvl in levels:
        all_pos.append(all_pos[-1][lvl["centers"]])
    for i, lvl in enumerate(levels):
        d2, idx = sp.knn(all_pos[i], all_pos[i + 1], k=3)
        lvl["up_idx"] = idx.astype(np.int32)
        lvl["up_d2"] = d2.astype(np.float32)
    return {"levels": levels, "pos": all_pos}


class _PointMLP(nn.Module):
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x, valid, train=True):
        for c in self.channels:
            x = nn.Dense(c, use_bias=False)(x)
            x = MaskedBatchNorm()(x, valid, train=train)
            x = nn.relu(x)
        return x


class PointNet2Seg(nn.Module):
    """SA/FP segmentation net over a precomputed pointnet graph."""

    num_classes: int
    sa_channels: Sequence[Sequence[int]] = (
        (32, 32, 64), (64, 64, 128), (128, 128, 256), (256, 256, 512),
    )
    fp_channels: Sequence[Sequence[int]] = (
        (128, 128), (256, 128), (256, 256), (256, 256),
    )

    @nn.compact
    def __call__(self, batch: Dict, train: bool = True):
        graph = batch["pn_graph"]
        levels = graph["levels"]
        pos = [jnp.asarray(p, jnp.float32) for p in graph["pos"]]
        x = batch["feats"]
        valid = batch["graph"]["levels"][0]["valid"] if "graph" in batch \
            else batch["valid"]

        skips = [(x, valid)]
        for li, lvl in enumerate(levels):
            group = lvl["group"]                      # [M, k]
            cpos = pos[li + 1]
            nbr_pos = pos[li][group]                  # [M, k, 3]
            rel = nbr_pos - cpos[:, None, :]
            nbr_feat = x[group]                       # [M, k, C]
            g = jnp.concatenate([rel, nbr_feat], axis=-1)
            m, k, c = g.shape
            h = _PointMLP(self.sa_channels[li])(
                g.reshape(m * k, c),
                jnp.repeat(lvl["center_valid"], k),
                train=train,
            ).reshape(m, k, -1)
            # mask out-of-radius repeats beyond the hit count
            slot = jnp.arange(k)[None, :]
            ok = slot < jnp.maximum(lvl["group_count"][:, None], 1)
            h = jnp.where(ok[..., None], h, -1e30)
            x = jnp.max(h, axis=1)
            x = jnp.where(lvl["center_valid"][:, None], x, 0.0)
            valid = lvl["center_valid"]
            skips.append((x, valid))

        # FP path: coarse -> fine
        for li in reversed(range(len(levels))):
            fine_x, fine_valid = skips[li]
            w = 1.0 / jnp.maximum(levels[li]["up_d2"], 1e-10)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            up = jnp.sum(x[levels[li]["up_idx"]] * w[..., None], axis=1)
            x = jnp.concatenate([up, fine_x], axis=-1)
            x = _PointMLP(self.fp_channels[li])(x, fine_valid, train=train)
            valid = fine_valid

        return {"logits": nn.Dense(self.num_classes, name="head")(x)}
