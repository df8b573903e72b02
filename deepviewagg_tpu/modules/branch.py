"""The unimodal (image) branch: 2D tower -> gather -> pool -> fuse.

Re-design of ``UnimodalBranch`` (modules/multimodal/modules.py:249-568): one
modality's full pipeline per fusion point —

    2D CNN on the image batch
    -> per-mapped-pixel feature gather (nearest or bilinear-interpolate)
    -> atomic pooling   (pixels -> view,  plain segment reduce)
    -> view pooling     (views  -> point, the DeepViewAgg attention)
    -> modality dropout (all-or-nothing, modules/multimodal/dropout.py)
    -> fusion into the 3D stream

plus the ``x_seen`` mask (which points any valid view reaches —
modules.py:410) and optional view-level extras for view losses
(``keep_last_view``, modules.py:527-534).

Per-stage gradient checkpointing flags 'cavf' (modules.py:283-292) map to
``remat_tower`` (the dominant memory term) via ``nn.remat``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import segment as seg
from .fusion import BimodalFusion
from .gather import gather_pixel_features
from .pooling import GroupViewPool, HeuristicPool, QKVViewPool, SegmentPool

__all__ = ["UnimodalBranch", "ModalityDropout"]


class ModalityDropout(nn.Module):
    """All-or-nothing branch dropout (dropout.py:5-15): with probability
    ``p`` the whole modality contribution is zeroed for the entire forward.
    We use the standard inverted convention (train-time rescale) rather than
    replicating the reference's flipped eval-time rescale (SURVEY.md §A.10.4).
    """

    p: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.p <= 0.0:
            return x
        # active when training, or at eval when a dropout rng is supplied —
        # the MC-dropout voting mode (enable_dropout_in_eval,
        # base_model.py:480-487)
        if not self.has_rng("dropout"):
            return x
        keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - self.p)
        return jnp.where(keep, x / (1.0 - self.p), 0.0)


class UnimodalBranch(nn.Module):
    """One image branch at one fusion point.

    ``tower`` is a zero-arg factory returning a flax module mapping
    ``[I, W, H, 3] -> [I, Wf, Hf, C]`` (or None to consume precomputed
    feature maps).  A factory — not an instance — so the tower binds inside
    the branch's own scope.  ``view_pool`` picks the aggregation family;
    'group' is the paper's attention.
    """

    tower: Optional[Any]
    out_channels: int
    atomic_reduce: str = "max"
    view_pool: str = "group"          # group | qkv | max | mean | heuristic
    num_groups: int = 1
    use_mod: bool = False
    # map-feature set encoder inside the group pool: 'deepset' (DeepSetFeat,
    # the flagship default) | 'minmaxdiff' | 'mlp' (ref map_encoder option,
    # pooling.py:372)
    set_encoder: str = "deepset"
    pool_use_num: bool = True       # DeepSetFeat use_num (flagship True)
    pool_scaling: bool = True       # group_scaling (ref Group default True)
    # DeepSetFeat pool/fusion kwargs (ref pool='min_max' entry,
    # sparseconv3d.yaml:4265)
    pool_modes: Tuple[str, ...] = ("max",)
    pool_fusion: str = "concatenation"
    # QKV-only knobs (ref QKVBimodalCSRPool, pooling.py:372-453):
    # nc_qk per-group head width; use_mod_q/use_mod_k mix the value
    # embedding into the query/key paths
    qk_channels: int = 8
    use_mod_q: bool = False
    use_mod_k: bool = False
    dim_scaling: bool = True   # 1/sqrt(nc_qk) on QKV scores (ref :374)
    gated: bool = True
    interpolate: bool = True
    drop_modality: float = 0.0
    # dropout on the 3D features before fusion (ref drop_3d,
    # modules.py:264-274; applied in forward_dropout before forward_fusion,
    # modules.py:555-561)
    drop_3d: float = 0.0
    # hard: all-or-nothing ModalityDropout; soft: per-element Dropout on the
    # pooled features (ref modules.py:272 ModalityDropout if hard_drop else
    # nn.Dropout).  NOTE the reference BUILDER never threads hard_drop from
    # the YAML (unet.py:543-546), so every published entry executes the
    # soft nn.Dropout — ingestion emits drop_hard=False accordingly.
    drop_hard: bool = True
    fusion_mode: str = "residual"
    remat_tower: Any = False   # False | True | 'convs' (run_tower)
    keep_last_view: bool = False
    # frozen pretrained tower (ref modalities/image.py:737 'frozen' option):
    # run with frozen BN stats and stop_gradient so no grads flow to it
    frozen: bool = False
    # bf16 tower activations (params/accumulation stay f32); the pooling
    # and fusion math downstream is always f32
    tower_bf16: bool = True
    # keep the pixel gather + atomic pool in bf16 too (HBM-bound at recipe
    # pixel counts); per-view features upcast to f32 before the view pool
    pool_bf16: bool = False

    @nn.compact
    def __call__(
        self,
        x_3d,                 # [P_cap, C3] current 3D stream (None for no3d)
        images,               # [I, W, H, 3]
        mapping: dict,        # device mapping pytree
        ref_size: Tuple[int, int],
        train: bool = True,
        num_points: Optional[int] = None,
    ):
        vc = mapping["view_valid"].shape[0]
        if x_3d is not None:
            num_points = x_3d.shape[0]
        assert num_points is not None, "pass num_points when x_3d is None"

        # --- 2D tower ---------------------------------------------------
        if self.tower is not None:
            from .image_encoders import run_tower

            feats_2d = run_tower(
                self.tower(), images, train, remat=self.remat_tower,
                frozen=self.frozen, bf16=self.tower_bf16,
                out_f32=not (self.pool_bf16 and self.tower_bf16),
            )
        else:
            feats_2d = images

        # --- pixels -> views (atomic pool) -------------------------------
        pix_feats = gather_pixel_features(
            feats_2d, mapping, ref_size, interpolate=self.interpolate
        )
        x_view = seg.segment_reduce(
            pix_feats, mapping["pix_view"], vc + 1, self.atomic_reduce,
            valid=mapping["pix_valid"], ptr=mapping.get("pix_ptr"),
        )[:vc].astype(jnp.float32)

        # --- views -> points (view pool) ---------------------------------
        pid = mapping["point_id"]
        p_ptr = mapping.get("point_ptr")
        v_valid = mapping["view_valid"]
        x_map = mapping["view_feats"]
        attn = None
        # segment-level BN statistics (DeepSetFeat mlp_set) exclude the
        # padding drop row — the reference computes them over all N points
        seg_ok = jnp.arange(num_points + 1) < num_points
        if self.view_pool == "group":
            pooled, attn = GroupViewPool(
                self.out_channels, num_groups=self.num_groups,
                use_mod=self.use_mod, gated=self.gated,
                set_encoder=self.set_encoder, use_num=self.pool_use_num,
                enc_pool=self.pool_modes, enc_fusion=self.pool_fusion,
                scaling=self.pool_scaling, name="view_pool",
            )(x_view, x_map, pid, v_valid, num_points + 1, train=train,
              ptr=p_ptr, seg_valid=seg_ok)
        elif self.view_pool == "qkv":
            pooled, attn = QKVViewPool(
                self.out_channels, num_groups=self.num_groups,
                qk_channels=self.qk_channels, gated=self.gated,
                scaling=self.pool_scaling, use_mod_q=self.use_mod_q,
                use_mod_k=self.use_mod_k, dim_scaling=self.dim_scaling,
                set_encoder=self.set_encoder,
                use_num=self.pool_use_num, enc_pool=self.pool_modes,
                enc_fusion=self.pool_fusion, name="view_pool",
            )(x_3d, x_view, x_map, pid, v_valid, num_points + 1, train=train,
              ptr=p_ptr, seg_valid=seg_ok)
        elif self.view_pool == "heuristic":
            pooled = HeuristicPool(name="view_pool")(
                x_view, x_map, pid, v_valid, num_points + 1, train=train
            )
        else:
            pooled = SegmentPool(self.view_pool, name="view_pool")(
                x_view, pid, v_valid, num_points + 1, train=train, ptr=p_ptr
            )
        pooled = pooled[:num_points]

        # --- x_seen (modules.py:410) -------------------------------------
        n_views = seg.segment_count(pid, num_points + 1, v_valid)[:num_points]
        x_seen = n_views > 0

        # --- modality dropout + fusion -----------------------------------
        if self.drop_hard:
            pooled = ModalityDropout(self.drop_modality, name="mod_drop")(
                pooled, train=train
            )
        elif self.drop_modality > 0:
            pooled = nn.Dropout(
                self.drop_modality,
                deterministic=not (train and self.has_rng("dropout")),
                name="mod_drop",
            )(pooled)
        if self.drop_3d > 0 and x_3d is not None:
            if self.drop_hard:
                x_3d = ModalityDropout(self.drop_3d, name="drop_3d")(
                    x_3d, train=train)
            else:
                x_3d = nn.Dropout(
                    self.drop_3d,
                    deterministic=not (train and self.has_rng("dropout")),
                    name="drop_3d",
                )(x_3d)
        if x_3d is None:
            out = pooled
        else:
            out = BimodalFusion(self.fusion_mode, name="fusion")(x_3d, pooled)

        extras = {}
        if self.keep_last_view:
            extras = {"x_view": x_view, "attention": attn, "view_point_id": pid,
                      "view_valid": v_valid}
        return out, x_seen, extras
