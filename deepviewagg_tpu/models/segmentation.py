"""Segmentation models: 3D-only, multimodal UNet (DeepViewAgg), and No3D.

The model layer of the reference (models/segmentation/sparseconv3d.py:15,
models/segmentation/multimodal/{sparseconv3d,no3d}.py) rebuilt as three flax
modules over the stage-decomposed Res16UNet:

  :class:`SparseConv3dSeg`   backbone + linear head (``APIModel``)
  :class:`MultimodalSeg`     encoder stages interleaved with image branches
                             at configured levels (``UnwrappedUnetBasedModel``
                             + ``MultimodalBlockDown``) — early fusion is a
                             branch at level 0; intermediate at deeper levels
                             consumes stride-merged mappings
  :class:`No3DSeg`           pure-2D towers pooled straight to points
                             (models/segmentation/multimodal/no3d.py:18)

The batch contract is one pytree (built host-side by
:mod:`deepviewagg_tpu.data.collate`):
  ``feats [P0, Cin]``, ``labels int32 [P0]`` (-1 = ignore), ``graph`` (per
  level: valid/batch_idx/sub_nbr/down_nbr/up_nbr/parent),
  ``images [I, W, H, 3]``, ``mappings {level: mapping pytree}``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..modules.branch import UnimodalBranch
from ..modules import image_encoders as towers
from ..nn.res16unet import RES16_PRESETS, DownStage, Stem, UpStage

__all__ = ["BranchSpec", "ModelSpec", "SparseConv3dSeg", "MultimodalSeg",
           "No3DSeg", "build_model"]


@dataclasses.dataclass(frozen=True)
class BranchSpec:
    """One image branch (mirrors the config subtree
    ``down_conv.image.{down_conv,atomic_pooling,view_pooling,fusion,...}`` of
    conf/models/segmentation/multimodal/sparseconv3d.yaml)."""

    tower: str = "resnet18_l4"         # registry key below
    out_channels: int = 64             # channels delivered to fusion
    atomic_reduce: str = "max"
    view_pool: str = "group"
    num_groups: int = 1
    use_mod: bool = False
    gated: bool = True
    interpolate: bool = True
    drop_modality: float = 0.0
    # dropout on the 3D features just before fusion (ref UnimodalBranch
    # drop_3d, modules.py:264-274 — 48 published sparseconv3d entries use it)
    drop_3d: float = 0.0
    fusion_mode: str = "residual"
    # False | True (full remat) | 'convs' (policy remat: conv outputs saved,
    # only the norm/relu tail recomputed — see image_encoders.run_tower).
    # 'convs' is the default: at recipe shapes it cuts the PPM tower's
    # fwd+bwd 94.5 -> 56.2 ms vs full remat at near-identical memory shape
    # (scripts/profile_recipe2d.py, PERF.md round 5)
    remat_tower: Any = "convs"
    tower_norm: str = "group"
    # MIT-semseg deep stem (three 3x3 convs) — required to load ADE20K
    # resnet18dilated encoder checkpoints (ref image.py:798-840 layer0)
    tower_deep_stem: bool = False
    # hard (all-or-nothing ModalityDropout) vs soft (per-element Dropout)
    # modality dropout — ref modules.py:272 ``ModalityDropout if hard_drop
    # else nn.Dropout``
    drop_hard: bool = True
    # frozen pretrained tower (ref modalities/image.py:737): stop_gradient +
    # frozen BN stats in forward; the optimizer also masks the tower subtree
    frozen: bool = False
    # bf16 tower activations (f32 params/accumulation) — halves the tower's
    # HBM traffic on TPU; set False for strict f32 parity runs
    tower_bf16: bool = True
    # bf16 pixel gather + atomic pool too (per-view features upcast to f32
    # before the view pool) — the HBM-bound stage at recipe pixel counts
    pool_bf16: bool = False
    # map-feature set encoder inside the group attention pool
    # (ref map_encoder: DeepSetFeat | MinMaxDiffSetFeat, pooling.py:372)
    set_encoder: str = "deepset"
    pool_use_num: bool = True       # DeepSetFeat use_num (flagship True)
    pool_scaling: bool = True       # group_scaling (ref Group default True)
    # QKV-only knobs (ref QKVBimodalCSRPool nc_qk/use_mod_q/use_mod_k,
    # pooling.py:372-453); the published use_map_min/max/num + in_score keys
    # are silently swallowed upstream and so deliberately have no surface
    qk_channels: int = 8
    use_mod_q: bool = False
    use_mod_k: bool = False
    dim_scaling: bool = True   # 1/sqrt(nc_qk) on QKV scores (ref :374)
    # DeepSetFeat pool/fusion kwargs — correctly-named YAML keys that DO
    # reach the encoder upstream (one entry uses pool: min_max)
    pool_modes: Tuple[str, ...] = ("max",)
    pool_fusion: str = "concatenation"
    # reference-exact scratch tower (tower='scratch_unet'): the compact
    # (down, up, last) TowerCfg from deepviewagg_tpu.modules.scratch2d —
    # pins the reference's own WS/GN/reflect-pad formulas instead of the
    # TPU-first image_encoders towers
    tower_cfg: Optional[Tuple] = None
    # weight standardization inside scratch_unet towers (the YAML's
    # weight_standardization flag; the published scratch entries use True)
    tower_ws: bool = True


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Named-model description (one entry of the reference's 109-model zoo)."""

    num_classes: int
    in_channels: int = 4
    backbone: str = "Res16UNet34"
    branches: Tuple[Tuple[int, BranchSpec], ...] = ()  # (level, spec)
    head_dropout: float = 0.0
    family: str = "unet"   # unet | no3d | late_feature | late_logit
    # stem (conv0) kernel size: 5 matches the Res16UNet presets; 3 trades a
    # little accuracy for ~5x fewer stem gather rows (PERF.md) — must match
    # the collate-time graph's conv0_kernel; the reference multimodal zoo
    # always uses 3 (multimodal/sparseconv3d.yaml:6622) -- kernel 5 is only
    # the MinkowskiEngine class default, never a DeepViewAgg MM config
    stem_kernel: int = 3
    # custom backbone plan overriding the named preset — the reference's
    # down_conv/up_conv DSL carries inline per-stage block counts and
    # channel widths (e.g. the Res16UNet21-15 family); when set, the UNet
    # builds from these instead of RES16_PRESETS[backbone]
    backbone_layers: Optional[Tuple[int, ...]] = None
    backbone_planes: Optional[Tuple[int, ...]] = None
    backbone_block: str = "basic"
    # shared progressive image trunk (ref Res16Image families: ONE ResNetDown
    # encoder advanced stage-by-stage, its stage-i tap fused at 3D level i —
    # image.down_conv + branching_index [1..n]); (widths, blocks, strides)
    # per stage; branches reference taps as tower="shared:<stage>"
    shared_tower: Optional[Tuple[Tuple[int, ...], Tuple[int, ...],
                                 Tuple[int, ...]]] = None
    # no3d family only: False for the No3DLogitFusion classes (_HAS_HEAD
    # = False, no3d.py:164-180) — the tower's last_conv already emits
    # per-pixel CLASS logits and the model applies NO linear head; True
    # for the FeatureFusion classes (Linear head on pooled features)
    no3d_head: bool = True

    def branch_levels(self):
        """level -> [BranchSpec, ...]; several branches may share a level
        (the published KITTI-360 PointPyramid fuses FIVE truncation towers
        at level 0, sparseconv3d.yaml:7275-7352 branching_index [0..4] with
        n_early_conv=5)."""
        out: Dict[int, list] = {}
        for lvl, b in self.branches:
            out.setdefault(lvl, []).append(b)
        return out


def make_tower(name: str, norm: str = "group", deep_stem: bool = False,
               tower_cfg=None, ws: bool = True):
    """Tower registry -> (factory, out_channels).  Names follow the
    reference's encoder naming (truncation level / PPM variants,
    modalities/image.py).  The factory is passed to ``UnimodalBranch`` so the
    tower binds inside the branch's parameter scope."""
    if name == "scratch_unet":
        # reference-exact compact-format tower (modalities/image.py:510-627)
        from ..modules.scratch2d import tower_cfg_out_channels, unetws_from_cfg

        assert tower_cfg is not None, "scratch_unet needs BranchSpec.tower_cfg"
        fac = functools.partial(unetws_from_cfg, tower_cfg, norm=norm, ws=ws,
                                name="tower")
        return fac, tower_cfg_out_channels(tower_cfg)
    if name is None:
        # tower-less branch: gather/pool raw image channels (the reference's
        # no-encoder debug path); channel count comes from the images at
        # call time, 3 for RGB
        return None, 3
    if name == "resnet18_ppm":
        fac = functools.partial(towers.ResNet18PPM, out_channels=128,
                                norm=norm, deep_stem=deep_stem, name="tower")
        return fac, 128
    if name == "resnet18_pyramid":
        fac = functools.partial(towers.ResNet18Pyramid, out_channels=128,
                                norm=norm, deep_stem=deep_stem, name="tower")
        return fac, 128
    if name == "resnet18_pyramid_raw":
        # reference-exact pyramid: raw resized tap concat, no head conv
        fac = functools.partial(towers.ResNet18Pyramid, project=False,
                                norm=norm, deep_stem=deep_stem, name="tower")
        return fac, (1088 if deep_stem else 1024)
    if name.startswith("resnet18_l"):
        lvl = int(name[-1])
        fac = functools.partial(towers.ResNet18, out_level=lvl, norm=norm,
                                deep_stem=deep_stem, name="tower")
        out = towers.OUT_CHANNELS[lvl]
        # the deep stem widens layer0 to 128 (MIT resnet.py)
        return fac, (128 if deep_stem and lvl == 0 else out)
    if name == "unet2d_light":
        # the published no3d light tower (no3d.yaml:5-50): 5 ResNetDown
        # stages 32/32/64/128/256, ResNetUp back to 32
        fac = functools.partial(
            towers.UNet2D, down_widths=(32, 32, 64, 128, 256),
            up_widths=(128, 96, 64, 32), out_channels=32, norm=norm,
            name="tower")
        return fac, 32
    if name.startswith("unet2d"):
        # light configurable 2D UNet (ref image.py:510; the no3d 'light'
        # tower family); "unet2d" or "unet2d_<out_channels>"
        out = int(name.split("_")[1]) if "_" in name else 32
        fac = functools.partial(towers.UNet2D, out_channels=out, norm=norm,
                                name="tower")
        return fac, out
    raise KeyError(name)


class SparseConv3dSeg(nn.Module):
    """3D-only sparse UNet + linear classification head (the reference's
    ``sparseconv3d.APIModel``, models/segmentation/sparseconv3d.py:15-59)."""

    spec: ModelSpec

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = True):
        from ..nn.res16unet import Res16UNet

        if self.spec.backbone_layers is not None:
            bb = Res16UNet(layers=tuple(self.spec.backbone_layers),
                           planes=tuple(self.spec.backbone_planes),
                           block=self.spec.backbone_block, name="backbone")
        else:
            bb = Res16UNet.preset(self.spec.backbone, name="backbone")
        x = bb(batch["feats"], batch["graph"], train=train)
        if self.spec.head_dropout > 0:
            # rng presence (not the train flag) gates dropout so MC-dropout
            # eval voting works (base_model.py:480-487)
            x = nn.Dropout(
                self.spec.head_dropout,
                deterministic=not self.has_rng("dropout"),
            )(x)
        logits = nn.Dense(self.spec.num_classes, name="head")(x)
        return {"logits": logits}


class MultimodalSeg(nn.Module):
    """DeepViewAgg: Res16UNet with image branches interleaved at encoder
    levels.  A branch at level L consumes ``batch['mappings'][L]`` — level-0
    mappings merged through the stride reindex chain host-side
    (data/collate.py), the role of ``forward_3d_block_down`` +
    ``select_points('merge')`` in the reference (modules.py:101-236)."""

    spec: ModelSpec

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = True):
        if self.spec.backbone_layers is not None:
            layers = tuple(self.spec.backbone_layers)
            planes = tuple(self.spec.backbone_planes)
            block = self.spec.backbone_block
        else:
            layers, planes, block = RES16_PRESETS[self.spec.backbone]
        n_down = len(layers) // 2
        branch_at = self.spec.branch_levels()
        images = batch.get("images")   # absent on crop-ladder batches
        ref_size = (images.shape[1], images.shape[2]) if images is not None \
            else None

        # shared progressive trunk (Res16Image families): ONE encoder runs
        # once; its stage-i tap is gathered/pooled at the level whose branch
        # says tower="shared:i" (ref image.down_conv + branching_index)
        taps = None
        if self.spec.shared_tower is not None and images is None:
            raise ValueError(
                "shared_tower needs a flat image batch; crop-ladder "
                "(bucketed) collate is not supported with shared trunks")
        if self.spec.shared_tower is not None and images is not None:
            from ..modules.image_encoders import ConvDown2D, run_tower

            widths, blocks_, strides = self.spec.shared_tower
            sb = next(b for _, b in self.spec.branches
                      if str(b.tower).startswith("shared:"))
            taps = run_tower(
                ConvDown2D(widths=tuple(widths), blocks=tuple(blocks_),
                           strides=tuple(strides), name="shared_tower"),
                images, train, remat=sb.remat_tower, frozen=sb.frozen,
                bf16=sb.tower_bf16,
            )

        # single-tower reuse (XYZ-RGB-L4-all family): ONE named tower runs
        # once and every branch — including the one that declares it —
        # gathers/pools the same feature maps at its own 3D level (the
        # reference threads x_mod through [Tower, ModalityIdentity, ...],
        # modules.py:318-335)
        reuse_map = None
        if any(str(b.tower) == "reuse" for _, b in self.spec.branches):
            if images is None:
                raise ValueError(
                    "tower-reuse branches need a flat image batch; "
                    "crop-ladder (bucketed) collate is not supported")
            ob = next(b for _, b in self.spec.branches
                      if b.tower not in (None, "reuse"))
            from ..modules.image_encoders import run_tower as _run_tower
            fac, _ = make_tower(ob.tower, ob.tower_norm, ob.tower_deep_stem,
                                tower_cfg=ob.tower_cfg, ws=ob.tower_ws)
            reuse_map = _run_tower(
                fac(name="reuse_tower"), images, train,
                remat=ob.remat_tower, frozen=ob.frozen, bf16=ob.tower_bf16)

        x_seen_all = None

        def run_branch(level, x):
            seen_all = None
            for k, spec in enumerate(branch_at[level]):
                # first branch keeps the legacy scope name so single-branch
                # checkpoints stay loadable
                name = f"branch_l{level}" if k == 0 else f"branch_l{level}_{k}"
                images_in = images
                if str(spec.tower).startswith("shared:"):
                    # tap consumed as a raw feature image (tower=None);
                    # UnimodalBranch rescales pixel coords from ref_size to
                    # the tap's stride automatically
                    tower, c2 = None, taps[int(spec.tower[7:])].shape[-1]
                    images_in = taps[int(spec.tower[7:])]
                elif reuse_map is not None and spec.tower is not None:
                    # owner AND reuse branches gather the same maps
                    tower, c2 = None, reuse_map.shape[-1]
                    images_in = reuse_map
                else:
                    tower, c2 = make_tower(spec.tower, spec.tower_norm,
                                           spec.tower_deep_stem,
                                           tower_cfg=spec.tower_cfg,
                                           ws=spec.tower_ws)
                mm = batch["mappings"][level]
                if "buckets" in mm:
                    # crop-group families (Bucket.image_ladder collate path)
                    from ..modules.multibucket import MultiBucketBranch

                    branch = MultiBucketBranch(
                        tower=tower,
                        out_channels=spec.out_channels,
                        atomic_reduce=spec.atomic_reduce,
                        view_pool=spec.view_pool,
                        num_groups=spec.num_groups,
                        gated=spec.gated,
                        interpolate=spec.interpolate,
                        fusion_mode=spec.fusion_mode,
                        remat_tower=spec.remat_tower,
                        frozen=spec.frozen,
                        tower_bf16=spec.tower_bf16,
                        pool_bf16=spec.pool_bf16,
                        name=name,
                    )
                    x, seen = branch(x, mm, train=train,
                                     bucket_images=batch.get("bucket_images"))
                else:
                    branch = UnimodalBranch(
                        tower=tower,
                        out_channels=spec.out_channels,
                        atomic_reduce=spec.atomic_reduce,
                        view_pool=spec.view_pool,
                        num_groups=spec.num_groups,
                        use_mod=spec.use_mod,
                        set_encoder=spec.set_encoder,
                        pool_use_num=spec.pool_use_num,
                        pool_scaling=spec.pool_scaling,
                        qk_channels=spec.qk_channels,
                        use_mod_q=spec.use_mod_q,
                        use_mod_k=spec.use_mod_k,
                        dim_scaling=spec.dim_scaling,
                        pool_modes=spec.pool_modes,
                        pool_fusion=spec.pool_fusion,
                        gated=spec.gated,
                        interpolate=spec.interpolate,
                        drop_modality=spec.drop_modality,
                        drop_3d=spec.drop_3d,
                        drop_hard=spec.drop_hard,
                        fusion_mode=spec.fusion_mode,
                        remat_tower=spec.remat_tower,
                        frozen=spec.frozen,
                        tower_bf16=spec.tower_bf16,
                        pool_bf16=spec.pool_bf16,
                        name=name,
                    )
                    # a shared-trunk tap is already a feature map — the
                    # branch must not re-cast it through the bf16 policy
                    x, seen, _ = branch(
                        x, images_in, mm, ref_size, train=train
                    )
                if seen is not None:
                    seen_all = seen if seen_all is None else (seen_all | seen)
            return x, seen_all

        # branching_index 0 runs on the RAW point features and the stem
        # consumes the fused result — the reference's early placement (its
        # down_conv_nn[0] is [FEAT + out_feat_img, ...], yaml:6646; the
        # builder injects an Identity 3D conv before the branch,
        # base_architectures/unet.py:448-473)
        x = batch["feats"]
        if 0 in branch_at:
            x, x_seen_all = run_branch(0, x)
        x = Stem(name="stem")(x, batch["graph"], train=train)
        skips = [x]
        for i in range(n_down):
            x = DownStage(planes[i], layers[i], block, name=f"down{i}")(
                x, batch["graph"], i, train=train
            )
            lvl = i + 1
            # branches may sit at any encoder level incl. the bottleneck
            # (lvl == n_down), fusing before the decoder
            if lvl in branch_at:
                x, _ = run_branch(lvl, x)
            if i < n_down - 1:
                skips.append(x)
        for j in range(n_down):
            lvl_out = n_down - 1 - j
            x = UpStage(planes[n_down + j], layers[n_down + j], block,
                        name=f"up{j}")(
                x, skips[lvl_out], batch["graph"], lvl_out, train=train
            )
        if self.spec.head_dropout > 0:
            x = nn.Dropout(
                self.spec.head_dropout,
                deterministic=not self.has_rng("dropout"),
            )(x)
        logits = nn.Dense(self.spec.num_classes, name="head")(x)
        out = {"logits": logits}
        if x_seen_all is not None:
            out["x_seen"] = x_seen_all
        return out


class No3DSeg(nn.Module):
    """2D towers pooled straight onto points: the No3D*Fusion family
    (models/segmentation/multimodal/no3d.py:18).  A small point-wise MLP head
    replaces the 3D network; unseen points yield zero logits and are masked
    to IGNORE in the loss (no3d.py:130-134)."""

    spec: ModelSpec

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = True):
        images = batch["images"]
        ref_size = (images.shape[1], images.shape[2])
        num_points = batch["feats"].shape[0]
        pooled_all, x_seen, extras = [], None, None
        # several towers pooled side by side (the RGB_PointPyramid no3d
        # entries: five truncations, pooled features CONCAT before the head)
        for k, (level, bspec) in enumerate(self.spec.branches):
            tower, c2 = make_tower(bspec.tower, bspec.tower_norm,
                                   bspec.tower_deep_stem,
                                   tower_cfg=bspec.tower_cfg,
                                   ws=bspec.tower_ws)
            branch = UnimodalBranch(
                tower=tower, out_channels=bspec.out_channels,
                atomic_reduce=bspec.atomic_reduce, view_pool=bspec.view_pool,
                num_groups=bspec.num_groups, gated=bspec.gated,
                set_encoder=bspec.set_encoder,
                pool_use_num=bspec.pool_use_num,
                pool_scaling=bspec.pool_scaling,
                pool_modes=bspec.pool_modes,
                pool_fusion=bspec.pool_fusion,
                use_mod=bspec.use_mod,
                interpolate=bspec.interpolate, fusion_mode="modality",
                drop_modality=bspec.drop_modality,
                drop_hard=bspec.drop_hard,
                remat_tower=bspec.remat_tower,
                keep_last_view=(k == 0), frozen=bspec.frozen,
                tower_bf16=bspec.tower_bf16,
                pool_bf16=bspec.pool_bf16,
                name="branch" if k == 0 else f"branch_{k}",
            )
            pooled_k, seen_k, ex_k = branch(
                None, images, batch["mappings"][level], ref_size, train=train,
                num_points=num_points,
            )
            pooled_all.append(pooled_k)
            x_seen = seen_k if x_seen is None else (x_seen | seen_k)
            if k == 0:
                extras = ex_k
        pooled = (pooled_all[0] if len(pooled_all) == 1
                  else jnp.concatenate(pooled_all, axis=-1))
        # bare linear head on the fused features — the reference's
        # No3DFeatureFusion head is Sequential(Linear(output_nc, classes))
        # with NO hidden MLP (no3d.py:36-38); multi-branch entries reach it
        # through the modality+concatenation fusion chain (= this concat).
        # The LogitFusion classes have NO head at all (_HAS_HEAD=False,
        # no3d.py:164-180): their towers' last_conv already emits N_CLS
        # per-pixel logits and the pooled values go straight to log_softmax.
        if self.spec.no3d_head:
            head = nn.Dense(self.spec.num_classes, name="head")
        else:
            head = lambda t: t  # noqa: E731 — logit fusion: identity
        logits = head(pooled)
        out = {"logits": logits, "x_seen": x_seen, "view_extras": extras}
        # per-view logits through the SAME head — the reference's view-level
        # loss scores each view against its point's label before pooling
        # (no3d.py:139-155, keep_last_view tensors).  Only when the saved
        # per-view features share the pooled width (plain mean/max pools,
        # incl. the published light model); attention pools save the
        # PRE-projection tower features, which the shared head cannot score.
        if extras and extras["x_view"].shape[-1] == pooled.shape[-1]:
            out["view_logits"] = head(extras["x_view"])
        return out


class LateFusionSeg(nn.Module):
    """Two full towers fused at the end: a 3D UNet over the points and a
    2D branch pooled to points, merged by feature concat + MLP head
    ('feature') or by adding per-tower logits ('logit') — the reference's
    ``LateFeatureFusion`` / ``LateLogitFusion``
    (models/segmentation/multimodal/sparseconv3d.py:12,184)."""

    spec: ModelSpec
    mode: str = "feature"   # 'feature' | 'logit'

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = True):
        from ..nn.res16unet import Res16UNet

        assert all(lvl == 0 for lvl, _ in self.spec.branches), \
            "late fusion consumes level-0 mappings"
        if self.spec.backbone_layers is not None:
            bb = Res16UNet(layers=tuple(self.spec.backbone_layers),
                           planes=tuple(self.spec.backbone_planes),
                           block=self.spec.backbone_block, name="backbone")
        else:
            bb = Res16UNet.preset(self.spec.backbone, name="backbone")
        x3d = bb(batch["feats"], batch["graph"], train=train)
        images = batch["images"]
        x2d_all, x_seen = [], None
        # multi-tower late entries (PointPyramid-late): each truncation
        # pools independently; 'feature' mode concats, 'logit' mode sums
        for k, (_, bspec) in enumerate(self.spec.branches):
            tower, _ = make_tower(bspec.tower, bspec.tower_norm,
                                  bspec.tower_deep_stem,
                                  tower_cfg=bspec.tower_cfg,
                                  ws=bspec.tower_ws)
            branch = UnimodalBranch(
                tower=tower, out_channels=bspec.out_channels,
                atomic_reduce=bspec.atomic_reduce, view_pool=bspec.view_pool,
                num_groups=bspec.num_groups, gated=bspec.gated,
                set_encoder=bspec.set_encoder,
                pool_use_num=bspec.pool_use_num,
                pool_scaling=bspec.pool_scaling,
                qk_channels=bspec.qk_channels,
                use_mod=bspec.use_mod,
                use_mod_q=bspec.use_mod_q,
                use_mod_k=bspec.use_mod_k,
                dim_scaling=bspec.dim_scaling,
                pool_modes=bspec.pool_modes,
                pool_fusion=bspec.pool_fusion,
                interpolate=bspec.interpolate, fusion_mode="modality",
                drop_modality=bspec.drop_modality,
                drop_hard=bspec.drop_hard,
                remat_tower=bspec.remat_tower, frozen=bspec.frozen,
                tower_bf16=bspec.tower_bf16,
                pool_bf16=bspec.pool_bf16,
                name="branch" if k == 0 else f"branch_{k}",
            )
            # the reference threads the 3D backbone's OUTPUT features into
            # the no3d backbone (multimodal/sparseconv3d.py:110-121), so
            # QKV view pools in late models draw queries from them; with
            # fusion_mode='modality' the branch output is pooled-only either
            # way
            x2d_k, seen_k, _ = branch(
                x3d, images, batch["mappings"][0],
                (images.shape[1], images.shape[2]), train=train,
            )
            x2d_all.append(x2d_k)
            x_seen = seen_k if x_seen is None else (x_seen | seen_k)
        if self.mode == "logit":
            l3 = nn.Dense(self.spec.num_classes, name="head3d")(x3d)
            l2 = sum(
                nn.Dense(self.spec.num_classes,
                         name="head2d" if k == 0 else f"head2d_{k}")(x2d)
                for k, x2d in enumerate(x2d_all))
            logits = l3 + jnp.where(x_seen[:, None], l2, 0.0)
        else:
            h = jnp.concatenate([x3d] + x2d_all, axis=-1)
            h = nn.Dense(x3d.shape[-1], name="mix")(h)
            h = nn.relu(h)
            logits = nn.Dense(self.spec.num_classes, name="head")(h)
        return {"logits": logits, "x_seen": x_seen}


def build_model(spec: ModelSpec) -> nn.Module:
    if not spec.branches:
        return SparseConv3dSeg(spec)
    if spec.family == "no3d":
        return No3DSeg(spec)
    if spec.family == "late_feature":
        return LateFusionSeg(spec, mode="feature")
    if spec.family == "late_logit":
        return LateFusionSeg(spec, mode="logit")
    return MultimodalSeg(spec)
