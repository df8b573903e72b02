"""View pooling: the learned multi-view aggregation of DeepViewAgg.

TPU re-design of modules/multimodal/pooling.py — the CSR object machinery
becomes sorted segment-id reductions (:mod:`deepviewagg_tpu.ops.segment`)
over the flat mapping arrays; each reference pool class maps to a flax
module here:

  ``BimodalCSRPool``            -> :class:`SegmentPool` (max/mean/min/sum)
  ``HeuristicBimodalCSRPool``   -> :class:`HeuristicPool` (argmax/argmin on a
                                   named viewing-condition feature)
  ``GroupBimodalCSRPool``       -> :class:`GroupViewPool` (the paper's
                                   attention: set-encoded map features ->
                                   per-group compatibilities ->
                                   segment-softmax -> weighted sum -> gating)
  ``QKVBimodalCSRPool``         -> :class:`QKVViewPool`
  ``DeepSetFeat``/``MLPSetFeat``/``MinMaxDiffSetFeat`` -> set encoders
  ``Gating`` (tanh o relu)      -> :class:`Gating`

All modules take ``(x [E, C], segment_ids [E] sorted, valid [E],
num_segments)`` and return per-segment outputs ``[num_segments, C']`` — used
both for pixels->view (atomic) and views->point pooling.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import segment as seg
from .mlp import MLP

__all__ = [
    "SegmentPool",
    "HeuristicPool",
    "Gating",
    "DeepSetFeat",
    "MinMaxDiffSetFeat",
    "GroupViewPool",
    "QKVViewPool",
    "expand_group_feat",
    "VIEW_FEATURE_INDEX",
]

# fixed viewing-condition feature order (SURVEY.md §A.3; reference
# HeuristicBimodalCSRPool._FEATURES pooling.py:98-106)
VIEW_FEATURE_INDEX = {
    "normalized_depth": 0,
    "linearity": 1,
    "planarity": 2,
    "scattering": 3,
    "orientation_to_the_surface": 4,
    "normalized_pixel_height": 5,
    "density": 6,
    "occlusion": 7,
}


def expand_group_feat(x, num_groups: int, num_channels: int):
    """Broadcast per-group scalars ``[E, G]`` to channels ``[E, C]``
    (pooling.py:748: channels are split into G contiguous groups)."""
    if num_groups == 1:
        return x if x.ndim == 1 else x[:, 0:1]
    reps = -(-num_channels // num_groups)
    return jnp.repeat(x, reps, axis=-1)[:, :num_channels]


class SegmentPool(nn.Module):
    """Parameter-free segment reduction (``BimodalCSRPool``, pooling.py:14)."""

    reduce: str = "max"

    @nn.compact
    def __call__(self, x, segment_ids, valid, num_segments: int, train=True,
                 ptr=None):
        return seg.segment_reduce(
            x, segment_ids, num_segments, self.reduce, valid, ptr
        )


class HeuristicPool(nn.Module):
    """Pick one view per point by arg-extremum of a named mapping feature
    (``HeuristicBimodalCSRPool``, pooling.py:74)."""

    feature: str = "normalized_depth"
    mode: str = "argmin"  # closest view by default

    @nn.compact
    def __call__(self, x, x_map, segment_ids, valid, num_segments: int, train=True,
                 ptr=None):
        key = x_map[:, VIEW_FEATURE_INDEX[self.feature]]
        fn = seg.segment_argmin if self.mode == "argmin" else seg.segment_argmax
        arg, nonempty = fn(key, segment_ids, num_segments, valid)
        out = x[arg]
        return jnp.where(nonempty[:, None], out, 0.0)


class Gating(nn.Module):
    """``tanh(relu(w * x + b))`` per group (pooling.py:690-716)."""

    num_groups: int = 1
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.num_groups,))
        out = x * w
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.num_groups,))
            out = out + b
        return jnp.tanh(nn.relu(out))


class DeepSetFeat(nn.Module):
    """Set-aware per-element embedding (pooling.py:604-674).

    phi-MLP on each element, segment-pooled set features (one or more of
    max/mean/min/sum), optional ``1/sqrt(n)`` set-size feature, residual or
    concat fusion back to elements, rho-MLP.
    """

    out_channels: int
    pool_modes: Sequence[str] = ("max", "mean")
    fusion: str = "concat"  # 'residual' | 'concat'
    use_num: bool = True

    @nn.compact
    def __call__(self, x, segment_ids, valid, num_segments: int, train=True,
                 ptr=None):
        d = self.out_channels
        phi = MLP([d, d], name="phi")(x, valid=valid, train=train)
        pooled = [
            seg.segment_reduce(phi, segment_ids, num_segments, m, valid, ptr)
            for m in self.pool_modes
        ]
        set_feat = jnp.concatenate(pooled, axis=-1)[segment_ids]
        set_feat = MLP([d], name="set_proj")(set_feat, valid=valid, train=train)
        if self.use_num:
            n = seg.segment_count(segment_ids, num_segments, valid, ptr)
            inv_sqrt = 1.0 / jnp.sqrt(jnp.maximum(n, 1.0))
            set_feat = jnp.concatenate(
                [set_feat, inv_sqrt[segment_ids][:, None]], axis=-1
            )
        if self.fusion == "residual":
            fused = phi + MLP([d], name="resize")(set_feat, valid=valid, train=train)
        else:
            fused = jnp.concatenate([phi, set_feat], axis=-1)
        return MLP([d, d], name="rho")(fused, valid=valid, train=train)


class MinMaxDiffSetFeat(nn.Module):
    """Element-wise set features from difference-to-min / difference-to-max
    / set size (ref ``MinMaxDiffSetFeat``, pooling.py:554-601): each element
    is concatenated with ``x - min(set)`` and ``x - max(set)`` plus an
    optional ``1/sqrt(n)`` size feature, then embedded by a bias-free MLP."""

    out_channels: int
    use_min: bool = True
    use_max: bool = True
    use_num: bool = False

    @nn.compact
    def __call__(self, x, segment_ids, valid, num_segments: int, train=True,
                 ptr=None):
        parts = [x]
        if self.use_min:
            mn = seg.segment_reduce(x, segment_ids, num_segments, "min", valid,
                                    ptr)
            parts.append(x - mn[segment_ids])
        if self.use_max:
            mx = seg.segment_reduce(x, segment_ids, num_segments, "max", valid,
                                    ptr)
            parts.append(x - mx[segment_ids])
        if self.use_num:
            n = seg.segment_count(segment_ids, num_segments, valid, ptr)
            parts.append(
                (1.0 / jnp.sqrt(jnp.maximum(n, 1e-3)))[segment_ids][:, None]
            )
        h = jnp.concatenate(parts, axis=-1)
        d = self.out_channels
        # MLP's norm=True path is already bias-free Dense + masked BN,
        # matching the reference's MLP(..., bias=False)
        return MLP([d, d], name="mlp")(h, valid=valid, train=train)


class GroupViewPool(nn.Module):
    """The paper's attention pooling (``GroupBimodalCSRPool``,
    pooling.py:159-319).

    map features -> set encoder -> linear to ``num_groups`` compatibilities
    (optionally mixing the value features in, ``use_mod``) -> segment softmax
    (optional ``1/sqrt(n)`` scaling) -> attention-weighted segment sum of the
    value projection -> optional gating on per-segment max compatibilities.

    Returns ``(pooled [S, C], attention [E, G])``.
    """

    out_channels: int
    num_groups: int = 1
    set_channels: int = 32
    use_mod: bool = False
    gated: bool = True
    scaling: bool = True
    set_encoder: str = "deepset"

    @nn.compact
    def __call__(
        self, x_mod, x_map, segment_ids, valid, num_segments: int, train=True,
        ptr=None,
    ):
        g = self.num_groups
        c = self.out_channels
        if self.set_encoder == "deepset":
            enc = DeepSetFeat(self.set_channels, name="set_enc")(
                x_map, segment_ids, valid, num_segments, train=train, ptr=ptr
            )
        elif self.set_encoder == "minmaxdiff":
            enc = MinMaxDiffSetFeat(self.set_channels, name="set_enc")(
                x_map, segment_ids, valid, num_segments, train=train, ptr=ptr
            )
        else:  # plain per-element MLP (MLPSetFeat, pooling.py:676)
            enc = MLP([self.set_channels, self.set_channels], name="set_enc")(
                x_map, valid=valid, train=train
            )
        score_in = enc
        if self.use_mod:
            mixed = MLP([self.set_channels], name="e_mix")(
                x_mod, valid=valid, train=train
            )
            score_in = jnp.concatenate([enc, mixed], axis=-1)
        compat = nn.Dense(g, name="e_score")(score_in)           # [E, G]
        attn = seg.segment_softmax(
            compat, segment_ids, num_segments, valid=valid,
            scaling=self.scaling, ptr=ptr
        )
        values = MLP([c], name="e_mod")(x_mod, valid=valid, train=train)
        w = expand_group_feat(attn, g, c)
        pooled = seg.segment_weighted_sum(
            values, w, segment_ids, num_segments, valid, ptr
        )
        if self.gated:
            cmax = seg.segment_max(compat, segment_ids, num_segments, valid, ptr)
            gate = Gating(num_groups=g, name="gating")(cmax)     # [S, G]
            pooled = pooled * expand_group_feat(gate, g, c)
        return pooled, attn


class QKVViewPool(nn.Module):
    """Query(3D)-Key(map) attention pooling (``QKVBimodalCSRPool``,
    pooling.py:322-553).  Queries come from the 3D point features, keys from
    the set-encoded map features; per-group dot-product scores with optional
    ``1/sqrt(d)`` scaling, then the same softmax / weighted-sum / gating tail.

    ``x_main`` is ``[num_segments - 1, C3d]`` (no drop row); a zero query row
    is appended internally for the drop slot.
    """

    out_channels: int
    num_groups: int = 1
    qk_channels: int = 8
    gated: bool = True
    scaling: bool = True
    dim_scaling: bool = True

    @nn.compact
    def __call__(
        self, x_main, x_mod, x_map, segment_ids, valid, num_segments: int,
        train=True, ptr=None,
    ):
        g = self.num_groups
        c = self.out_channels
        d = self.qk_channels
        queries = MLP([g * d], name="e_main")(x_main, train=train)
        queries = jnp.concatenate(
            [queries, jnp.zeros((num_segments - queries.shape[0], g * d))]
        )                                                            # [S, G*d]
        keys = DeepSetFeat(g * d, name="key_enc")(
            x_map, segment_ids, valid, num_segments, train=train, ptr=ptr
        )                                                            # [E, G*d]
        q = queries.reshape(num_segments, g, d)[segment_ids]
        k = keys.reshape(-1, g, d)
        compat = jnp.sum(q * k, axis=-1)                             # [E, G]
        if self.dim_scaling:
            compat = compat / jnp.sqrt(jnp.float32(d))
        attn = seg.segment_softmax(
            compat, segment_ids, num_segments, valid=valid,
            scaling=self.scaling, ptr=ptr
        )
        values = MLP([c], name="e_mod")(x_mod, valid=valid, train=train)
        pooled = seg.segment_weighted_sum(
            values, expand_group_feat(attn, g, c), segment_ids, num_segments,
            valid, ptr
        )
        if self.gated:
            cmax = seg.segment_max(compat, segment_ids, num_segments, valid, ptr)
            pooled = pooled * expand_group_feat(
                Gating(num_groups=g, name="gating")(cmax), g, c
            )
        return pooled, attn
