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
import numpy as np
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
    "group_sizes",
    "nearest_power_of_2",
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


def nearest_power_of_2(x, min_power: int = 16) -> int:
    """Reference helper (pooling.py:718-735): nearest power of two with a
    floor — sizes the hidden layer of the ``E_mix`` MLPs."""
    x = int(x)
    if x < min_power:
        return min_power
    prev_p = 2 ** ((x - 1).bit_length() - 1)
    next_p = 2 ** (x - 1).bit_length()
    return prev_p if x - prev_p < next_p - x else next_p


def group_sizes(num_channels: int, num_groups: int):
    """Distribute ``num_channels`` across ``num_groups`` as evenly as
    possible, first groups taking the remainder (pooling.py:738-745)."""
    base = num_channels // num_groups
    rem = num_channels - base * num_groups
    return [base + (1 if i < rem else 0) for i in range(num_groups)]


def expand_group_feat(x, num_groups: int, num_channels: int):
    """Broadcast per-group scalars ``[E, G]`` to channels ``[E, C]``
    (pooling.py:748-756): channels split into G near-equal contiguous
    groups, the first ``C mod G`` groups one channel wider."""
    if num_groups == 1:
        return x if x.ndim == 1 else x[:, 0:1]
    sizes = np.asarray(group_sizes(num_channels, num_groups))
    return jnp.repeat(x, sizes, axis=-1, total_repeat_length=num_channels)


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
    """Set-aware per-element embedding — structurally faithful to the
    reference ``DeepSetFeat`` (pooling.py:604-674):

      ``x = mlp_elt_1(x)``                    2-layer MLP on elements
      ``x_set = cat(segment_csr(x, p) for p in pool)``  per-SEGMENT
      ``use_num``: append ``sqrt(1/(n + 1e-3))``        (ref :663-666)
      ``x_set = mlp_set(x_set)``              2-layer MLP on SEGMENTS
      gather to elements, fuse (concat / residual / both), ``mlp_elt_2``.

    Defaults mirror the reference signature (``pool='max'``,
    ``fusion='concatenation'``) except ``use_num=True``, which the flagship
    configs set explicitly (sparseconv3d.yaml:6667).  ``seg_valid`` masks
    padded segment rows (e.g. the drop row) out of ``mlp_set``'s BN stats.
    """

    out_channels: int
    pool_modes: Sequence[str] = ("max",)
    fusion: str = "concatenation"  # 'residual' | 'concatenation' | 'both'
    use_num: bool = True

    @nn.compact
    def __call__(self, x, segment_ids, valid, num_segments: int, train=True,
                 ptr=None, seg_valid=None):
        d = self.out_channels
        x = MLP([d, d], name="mlp_elt_1")(x, valid=valid, train=train)
        pooled = [
            seg.segment_reduce(x, segment_ids, num_segments, m, valid, ptr)
            for m in self.pool_modes
        ]
        x_set = jnp.concatenate(pooled, axis=-1)
        if self.use_num:
            n = seg.segment_count(segment_ids, num_segments, valid, ptr)
            x_set = jnp.concatenate(
                [x_set, jnp.sqrt(1.0 / (n + 1e-3))[:, None]], axis=-1
            )
        x_set = MLP([d, d], name="mlp_set")(x_set, valid=seg_valid, train=train)
        x_set = x_set[segment_ids]
        if self.fusion == "residual":
            fused = x + x_set
        elif self.fusion == "both":
            fused = jnp.concatenate([x, x + x_set], axis=-1)
        else:
            fused = jnp.concatenate([x, x_set], axis=-1)
        return MLP([d, d], name="mlp_elt_2")(fused, valid=valid, train=train)


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
                 ptr=None, seg_valid=None):
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
            # ref heuristic sqrt(1/(n+1e-3)) (pooling.py:589-592)
            n = seg.segment_count(segment_ids, num_segments, valid, ptr)
            parts.append(jnp.sqrt(1.0 / (n + 1e-3))[segment_ids][:, None])
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
    # forwarded to DeepSetFeat (ref use_num/pool/fusion kwargs; the flagship
    # sets use_num=True, the reference class default is False; one published
    # entry uses pool='min_max', sparseconv3d.yaml:4265)
    use_num: bool = True
    enc_pool: Tuple[str, ...] = ("max",)
    enc_fusion: str = "concatenation"

    @nn.compact
    def __call__(
        self, x_mod, x_map, segment_ids, valid, num_segments: int, train=True,
        ptr=None, seg_valid=None,
    ):
        g = self.num_groups
        c = self.out_channels
        if self.set_encoder == "deepset":
            enc = DeepSetFeat(self.set_channels, use_num=self.use_num,
                              pool_modes=self.enc_pool,
                              fusion=self.enc_fusion,
                              name="set_enc")(
                x_map, segment_ids, valid, num_segments, train=train, ptr=ptr,
                seg_valid=seg_valid,
            )
        elif self.set_encoder == "minmaxdiff":
            enc = MinMaxDiffSetFeat(self.set_channels, name="set_enc")(
                x_map, segment_ids, valid, num_segments, train=train, ptr=ptr
            )
        else:  # plain per-element MLP (MLPSetFeat, pooling.py:676)
            enc = MLP([self.set_channels, self.set_channels], name="set_enc")(
                x_map, valid=valid, train=train
            )
        # values: 2-layer bias-free MLP as the reference E_mod
        # (pooling.py:245: MLP([in_mod, out_mod, out_mod]))
        values = MLP([c, c], name="e_mod")(x_mod, valid=valid, train=train)
        if self.use_mod:
            # ref E_mix (pooling.py:250-254): cat(map_enc, values) ->
            # MLP([in, nearest_pow2((in+out)/2, out*2), out])
            mid = nearest_power_of_2(
                (self.set_channels + c + self.set_channels) / 2,
                self.set_channels * 2,
            )
            x_mix = MLP([mid, self.set_channels], name="e_mix")(
                jnp.concatenate([enc, values], axis=-1), valid=valid,
                train=train,
            )
            compat = nn.Dense(g, name="e_score")(x_mix)          # [E, G]
        else:
            compat = nn.Dense(g, name="e_score")(enc)            # [E, G]
        attn = seg.segment_softmax(
            compat, segment_ids, num_segments, valid=valid,
            scaling=self.scaling, ptr=ptr
        )
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

    ``use_mod_q`` / ``use_mod_k`` (ref pooling.py:436-442/449-453) mix the
    E_mod value embedding into the query / key paths through an ``E_mix``
    MLP whose hidden width follows the reference's
    ``nearest_power_of_2((in+out)/2, out*2)`` rule.  With ``use_mod_q`` the
    queries become per-VIEW (computed after expanding the point embedding to
    views) instead of per-point.

    The published QKV entries' ``use_map_min/max/num`` keys are
    intentionally NOT surfaced: upstream forwards them into set encoders
    that only accept ``use_min/max/num``, so they are silently swallowed by
    ``**kwargs`` and the class defaults win (pooling.py:382/565/618) —
    faithful ingestion ignores them too.

    ``x_main`` is ``[num_segments - 1, C3d]`` (no drop row); a zero query row
    is appended internally for the drop slot.
    """

    out_channels: int
    num_groups: int = 1
    qk_channels: int = 8      # ref nc_qk=8 (pooling.py:372)
    set_channels: int = 32    # ref nc_inner=32
    gated: bool = True
    scaling: bool = False     # ref group_scaling=False for QKV (pooling.py:373)
    dim_scaling: bool = True
    use_mod_q: bool = False
    use_mod_k: bool = False
    # map/key encoder family + its kwargs (ref map_encoder + **kwargs,
    # pooling.py:420-421); use_num reaches DeepSetFeat only
    set_encoder: str = "deepset"
    use_num: bool = True
    enc_pool: Tuple[str, ...] = ("max",)
    enc_fusion: str = "concatenation"

    @nn.compact
    def __call__(
        self, x_main, x_mod, x_map, segment_ids, valid, num_segments: int,
        train=True, ptr=None, seg_valid=None,
    ):
        g = self.num_groups
        c = self.out_channels
        d = self.qk_channels
        nc = self.set_channels
        # ref structure (pooling.py:416-451): E_main 2-layer MLP -> Q linear;
        # map encoder -> K linear; E_mod 2-layer MLP values
        x_main_emb = MLP([nc, nc], name="e_main")(x_main, train=train)
        if self.set_encoder == "deepset":
            enc = DeepSetFeat(nc, use_num=self.use_num,
                              pool_modes=self.enc_pool,
                              fusion=self.enc_fusion, name="key_enc")(
                x_map, segment_ids, valid, num_segments, train=train, ptr=ptr,
                seg_valid=seg_valid,
            )
        elif self.set_encoder == "minmaxdiff":
            enc = MinMaxDiffSetFeat(nc, name="key_enc")(
                x_map, segment_ids, valid, num_segments, train=train, ptr=ptr
            )
        else:  # plain per-element MLP (MLPSetFeat, pooling.py:676)
            enc = MLP([nc, nc], name="key_enc")(x_map, valid=valid,
                                                train=train)
        # values are computed before Q/K so E_mix paths can consume them
        # (ref forward order, pooling.py:478-484)
        values = MLP([c, c], name="e_mod")(x_mod, valid=valid, train=train)
        if self.use_mod_k:
            # keys from cat(map_enc, values) -> E_mix_K -> K (ref :486-490)
            in_mix = nc + values.shape[-1]
            mid = nearest_power_of_2((in_mix + nc) / 2, nc * 2)
            x_mix_k = MLP([mid, nc], name="e_mix_k")(
                jnp.concatenate([enc, values], axis=-1), valid=valid,
                train=train,
            )
            keys = nn.Dense(g * d, name="k")(x_mix_k)            # [E, G*d]
        else:
            keys = nn.Dense(g * d, name="k")(enc)                # [E, G*d]
        if self.use_mod_q:
            # per-VIEW queries: expand the point embedding to views, mix
            # with the values (ref :493-500)
            x_main_pad = jnp.concatenate([
                x_main_emb,
                jnp.zeros((num_segments - x_main_emb.shape[0], nc),
                          x_main_emb.dtype),
            ])
            x_main_v = x_main_pad[segment_ids]                   # [E, nc]
            in_mix = nc + values.shape[-1]
            mid = nearest_power_of_2((in_mix + nc) / 2, nc * 2)
            x_mix_q = MLP([mid, nc], name="e_mix_q")(
                jnp.concatenate([x_main_v, values], axis=-1), valid=valid,
                train=train,
            )
            q = nn.Dense(g * d, name="q")(x_mix_q).reshape(-1, g, d)
        else:
            queries = nn.Dense(g * d, name="q")(x_main_emb)      # [N, G*d]
            queries = jnp.concatenate(
                [queries, jnp.zeros((num_segments - queries.shape[0], g * d))]
            )                                                        # [S, G*d]
            q = queries.reshape(num_segments, g, d)[segment_ids]
        k = keys.reshape(-1, g, d)
        compat = jnp.sum(q * k, axis=-1)                             # [E, G]
        if self.dim_scaling:
            compat = compat / jnp.sqrt(jnp.float32(d))
        attn = seg.segment_softmax(
            compat, segment_ids, num_segments, valid=valid,
            scaling=self.scaling, ptr=ptr
        )
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
