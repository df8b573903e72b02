"""2D image towers: ResNet-18 family with GroupNorm + weight standardization.

Re-design of modules/multimodal/modalities/image.py — the reference's 2D
stack: ``Conv2dWS`` (weight-standardized conv, image.py:39-126), ResNet
blocks, and the pretrained towers (ADE20K ResNet18-PPM from MIT semseg,
torchvision/Cityscapes ResNet18) exposed as truncations (feature map after
layer N) or pyramids (multiple taps).

Here the architecture is one configurable flax ResNet18 in NHWC (TPU conv
layout), with:
  * ``norm='group'`` + weight standardization for from-scratch training (the
    reference's choice for small multimodal batches), ``norm='batch'`` to
    host converted pretrained weights;
  * ``out_level`` truncation (0=stem .. 4=layer4) or ``pyramid`` taps;
  * optional dilated layer3/4 (stride-8 'dilated8' variant the MIT-semseg
    ADE20K checkpoints use) and a PPM head.

Pretrained torch checkpoints are converted offline by
:mod:`deepviewagg_tpu.utils.torch_convert` (no torch dependency at runtime).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Conv2dWS", "ResNet18", "PPM", "ResNet18PPM", "ResNet18Pyramid",
           "PersistentDropout2d", "UNet2D", "OUT_CHANNELS", "run_tower",
           "view_shard_axis"]

# channels of each tap level for ResNet18: stem, layer1..layer4
OUT_CHANNELS = (64, 64, 128, 256, 512)


class Conv2dWS(nn.Module):
    """Conv with weight standardization (zero-mean unit-var kernel per output
    channel, image.py:39-51) — pairs with GroupNorm."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    standardize: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        w = self.param(
            "kernel", nn.initializers.he_normal(), (kh, kw, cin, self.features)
        )
        if self.standardize:
            mean = w.mean(axis=(0, 1, 2), keepdims=True)
            var = w.var(axis=(0, 1, 2), keepdims=True)
            w = (w - mean) * jax.lax.rsqrt(var * (kh * kw * cin) + 1e-10)
        # explicit torch-convention padding (k//2 * dilation per side): XLA
        # 'SAME' pads asymmetrically at stride 2, which breaks numerical
        # parity with converted torch checkpoints.
        pad = (
            (kh // 2 * self.dilation[0], kh // 2 * self.dilation[0]),
            (kw // 2 * self.dilation[1], kw // 2 * self.dilation[1]),
        )
        # both operands bf16 on the MXU (XLA accumulates in f32 on TPU); the
        # OUTPUT dtype follows the input's, so a caller that feeds bf16
        # activations keeps the whole tower's materialized buffers at half
        # the HBM traffic, while f32 callers (weight-conversion parity
        # tests) see unchanged numerics
        op_dt = jnp.float32 if _CONV_F32[-1] else jnp.bfloat16
        y = jax.lax.conv_general_dilated(
            x.astype(op_dt),
            w.astype(op_dt),
            window_strides=self.strides,
            padding=pad,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        # named for the remat='convs' policy (run_tower): under
        # save_only_these_names the backward keeps every conv output and
        # recomputes only the cheap norm/relu tail — remat-level memory at
        # ~zero MXU recompute.  A no-op outside policy-remat.
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(y, "conv2d_ws_out")


# Test-scoped escape hatch: run convs at f32 operand precision so
# bit-for-bit equivalence proofs (e.g. sharded-vs-unsharded towers) are not
# clouded by bf16 tiling-order noise.  Production always uses bf16 operands
# (MXU native, f32 accumulation).
_CONV_F32 = [False]


@contextlib.contextmanager
def f32_convs():
    """While tracing, make every Conv2dWS use f32 operands (exact math)."""
    _CONV_F32.append(True)
    try:
        yield
    finally:
        _CONV_F32.pop()


# Trainer-scoped mesh axis for VIEW PARALLELISM: while tracing inside
# ``shard_map`` with this axis active, every tower runs only on its device's
# block of the image axis and the feature maps are ``all_gather``ed back —
# the 2D towers (the FLOPs-dominant term at recipe image sizes) parallelize
# over the model axis while the segment-structured 3D path stays replicated.
# Same context-manager pattern as ``nn.norm.bn_axis_name``.
_VIEW_SHARD_AXIS = [None]


@contextlib.contextmanager
def view_shard_axis(name: Optional[str]):
    """While tracing inside ``shard_map(axis_names=(..., name))``, shard every
    tower's image batch over ``name`` (view parallelism)."""
    _VIEW_SHARD_AXIS.append(name)
    try:
        yield
    finally:
        _VIEW_SHARD_AXIS.pop()


def run_tower(tower, images, train: bool, *, remat=False,
              frozen: bool = False, bf16: bool = True,
              out_f32: bool = True):
    """Shared tower driver for the branch modules: optional bf16 activation
    policy (params stay f32, conv accumulation stays f32 on the MXU; the
    inter-layer buffers — the HBM-bound term at recipe image sizes — halve),
    optional ``nn.remat`` (the reference's 'c' checkpoint flag,
    modules.py:283-292) and frozen-tower stop_gradient
    (modalities/image.py:737).  Output is always f32 for the gather/pooling
    math.

    ``remat`` is ``False`` (store everything), ``True`` (full remat: the
    backward re-runs the whole tower forward, +1 tower-forward of MXU work),
    or ``'convs'`` (policy remat: conv outputs — the expensive ops — are
    SAVED via their ``conv2d_ws_out`` checkpoint name and only the cheap
    norm/relu/WS tail is recomputed; ~full-remat memory shape at near-zero
    recompute FLOPs).  'convs' is the BranchSpec default — measured at
    recipe shapes: PPM tower fwd+bwd 94.5 ms (full remat) -> 56.2 ms
    (scripts/profile_recipe2d.py, PERF.md round 5).

    Under an active :func:`view_shard_axis`, the image batch is block-sharded
    over that mesh axis: each device runs the tower on ``ceil(I/m)`` images
    and the full feature maps come back via a tiled ``all_gather`` (its AD
    transpose is a reduce-scatter, so tower gradients arrive pre-summed —
    a uniform ``pmean`` over (data, model) then yields exact global grads)."""
    if remat not in (False, True, "convs"):
        # a typo like 'conv' would otherwise silently select FULL remat
        raise ValueError(f"remat must be False, True or 'convs'; got {remat!r}")
    t_train = train and not frozen
    if bf16:
        images = images.astype(jnp.bfloat16)

    def apply(im):
        if remat and not frozen:
            kw = {}
            if remat == "convs":
                kw["policy"] = jax.checkpoint_policies.save_only_these_names(
                    "conv2d_ws_out")
            if isinstance(tower, nn.Module):
                return nn.remat(lambda mdl, x: mdl(x, t_train), **kw)(
                    tower, im)
            # plain callable (bound params, e.g. microbenches): no flax
            # lifting needed
            return jax.checkpoint(lambda x: tower(x, t_train), **kw)(im)
        return tower(im, t_train)

    axis = _VIEW_SHARD_AXIS[-1]
    tmap = jax.tree_util.tree_map      # towers may return a tap TUPLE
    if axis is None:
        y = apply(images)
    else:
        m = jax.lax.axis_size(axis)
        n_img = images.shape[0]
        blk = -(-n_img // m)
        if blk * m != n_img:   # zero-pad to an even block split
            pad = jnp.zeros((blk * m - n_img,) + images.shape[1:],
                            images.dtype)
            images = jnp.concatenate([images, pad], axis=0)
        k = jax.lax.axis_index(axis)
        local = jax.lax.dynamic_slice_in_dim(images, k * blk, blk, axis=0)
        y = tmap(
            lambda t: jax.lax.all_gather(t, axis, axis=0, tiled=True)[:n_img],
            apply(local))
    # out_f32=False keeps the tower's bf16 maps for the downstream pixel
    # gather + atomic pool (HBM-bound at recipe pixel counts: halving the
    # materialized [Q, C] taps and their backward scatter-adds is the
    # cheapest bandwidth win; the view pool upcasts to f32 after)
    if out_f32:
        y = tmap(lambda t: t.astype(jnp.float32), y)
    if frozen:
        y = tmap(jax.lax.stop_gradient, y)
    return y


class _Norm(nn.Module):
    kind: str = "group"
    num_groups: int = 16

    @nn.compact
    def __call__(self, x, train: bool = True):
        # statistics always in f32 (bf16 mean/var over large maps drifts);
        # output returns to the caller's activation dtype
        dt = x.dtype
        x = x.astype(jnp.float32)
        if self.kind == "group":
            g = self.num_groups
            c = x.shape[-1]
            while c % g:
                g -= 1
            return nn.GroupNorm(num_groups=g)(x).astype(dt)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9)(x).astype(dt)


class _BasicBlock2d(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    norm: str = "group"
    # MIT-semseg ``_nostride_dilate``: when a stage's stride-2 conv is
    # converted to stride 1, THAT conv keeps dilation d/2 while every other
    # 3x3 conv in the stage runs at d (mit resnet18dilated, the topology the
    # ADE20K checkpoints store).  None -> same as ``dilation``.
    first_dilation: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ws = self.norm == "group"
        y = Conv2dWS(self.features, (3, 3), self.strides,
                     self.first_dilation or self.dilation,
                     standardize=ws)(x)
        y = _Norm(self.norm)(y, train)
        y = nn.relu(y)
        y = Conv2dWS(self.features, (3, 3), (1, 1), self.dilation,
                     standardize=ws)(y)
        y = _Norm(self.norm)(y, train)
        if x.shape[-1] != self.features or self.strides != (1, 1):
            x = Conv2dWS(self.features, (1, 1), self.strides, standardize=ws)(x)
            x = _Norm(self.norm)(x, train)
        return nn.relu(y + x)


class ResNet18(nn.Module):
    """Torchvision-topology ResNet18 trunk with taps.

    ``out_level``: return the single feature map after that stage
    (0 stem/4x, 1..4 layers; strides 4, 4, 8, 16, 32 — or 8, 8 dilated).
    ``pyramid``: also return all taps up to ``out_level``.
    """

    out_level: int = 4
    norm: str = "group"
    dilated8: bool = False       # MIT-semseg 'resnet18dilated8' trunk
    pyramid: bool = False
    width: int = 64
    # MIT-semseg deep stem (their resnet.py / the reference's ADE20K layer0,
    # image.py:798-840): three 3x3 conv-bn-relu (64, 64, 128) + maxpool
    # instead of torchvision's single 7x7 — required to load ADE20K
    # resnet18dilated encoder checkpoints
    deep_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        ws = self.norm == "group"
        taps = []
        if self.deep_stem:
            for f, st in ((self.width, (2, 2)), (self.width, (1, 1)),
                          (self.width * 2, (1, 1))):
                x = Conv2dWS(f, (3, 3), st, standardize=ws)(x)
                x = _Norm(self.norm)(x, train)
                x = nn.relu(x)
        else:
            x = Conv2dWS(self.width, (7, 7), (2, 2), standardize=ws)(x)
            x = _Norm(self.norm)(x, train)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))  # torch pad=1 convention
        taps.append(x)
        plan = [  # (features, first-stride, dilation) per layer
            (self.width, (1, 1), (1, 1)),
            (self.width * 2, (2, 2), (1, 1)),
            (self.width * 4, (1, 1) if self.dilated8 else (2, 2),
             (2, 2) if self.dilated8 else (1, 1)),
            (self.width * 8, (1, 1) if self.dilated8 else (2, 2),
             (4, 4) if self.dilated8 else (1, 1)),
        ]
        for li, (f, s, d) in enumerate(plan[: self.out_level]):
            # MIT _nostride_dilate: the de-strided conv (block0.conv1 of a
            # dilated stage) runs at d/2 — dilation 1 in layer3, 2 in layer4
            fd = (max(d[0] // 2, 1),) * 2 if d != (1, 1) else None
            x = _BasicBlock2d(f, s, d, self.norm, first_dilation=fd)(x, train)
            x = _BasicBlock2d(f, (1, 1), d, self.norm)(x, train)
            taps.append(x)
        if self.pyramid:
            return taps
        return taps[self.out_level]


class PPM(nn.Module):
    """Pyramid pooling feature head (``PPMFeatMap``, image.py:659-720):
    adaptive average pools at several bin counts -> 1x1 conv -> bilinear
    upsample -> concat with the trunk -> 3x3 conv."""

    out_channels: int = 128
    bins: Sequence[int] = (1, 2, 3, 6)
    norm: str = "group"

    @nn.compact
    def __call__(self, x, train: bool = True):
        n, h, w, c = x.shape
        ws = self.norm == "group"
        feats = [x]
        for b in self.bins:
            # adaptive avg pool to (b, b) — f32 accumulation (bf16 sums over
            # up-to-full-image windows lose precision)
            ph, pw = -(-h // b), -(-w // b)
            pooled = nn.avg_pool(
                x.astype(jnp.float32), (ph, pw), strides=(ph, pw),
                padding="SAME").astype(x.dtype)
            y = Conv2dWS(self.out_channels, (1, 1), standardize=ws)(pooled)
            y = _Norm(self.norm)(y, train)
            y = nn.relu(y)
            y = jax.image.resize(y, (n, h, w, self.out_channels), "bilinear")
            feats.append(y)
        y = jnp.concatenate(feats, axis=-1)
        y = Conv2dWS(self.out_channels, (3, 3), standardize=ws)(y)
        y = _Norm(self.norm)(y, train)
        return nn.relu(y)


class ResNet18Pyramid(nn.Module):
    """All trunk taps resized to the finest tap and concatenated — the
    single-map equivalent of the reference's pyramid towers
    (``ADE20KResNet18Pyramid`` image.py:793-957): one gather serves features
    from every scale, and the branch's 'interpolate' path samples it at
    mapping resolution.  Used by the PointPyramid configs."""

    out_level: int = 4
    norm: str = "group"
    out_channels: int = 128
    deep_stem: bool = False
    # project=False returns the RAW resized tap concat — the reference
    # class's exact output (ADE20KResNet18Pyramid.forward: interpolate each
    # tap to the finest scale and torch.cat, no head conv)
    project: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        taps = ResNet18(out_level=self.out_level, norm=self.norm,
                        pyramid=True, deep_stem=self.deep_stem)(x, train)
        n, w, h, _ = taps[0].shape
        resized = [taps[0]] + [
            jax.image.resize(t, (n, w, h, t.shape[-1]), "bilinear")
            for t in taps[1:]
        ]
        y = jnp.concatenate(resized, axis=-1)
        if not self.project:
            return y
        ws = self.norm == "group"
        y = Conv2dWS(self.out_channels, (1, 1), standardize=ws)(y)
        y = _Norm(self.norm)(y, train)
        return nn.relu(y)


class ResNet18PPM(nn.Module):
    """Dilated-8 ResNet18 trunk + PPM — the shape of the reference's ADE20K
    pretrained tower (``ADE20KResNet18PPM``, image.py:721-792)."""

    out_channels: int = 128
    norm: str = "group"
    deep_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ResNet18(out_level=4, norm=self.norm, dilated8=True,
                     deep_stem=self.deep_stem)(x, train)
        return PPM(self.out_channels, norm=self.norm)(x, train)


class PersistentDropout2d(nn.Module):
    """Channel dropout with ONE mask shared by every image in the batch
    (ref ``PersistentDropout2d``, image.py:465-508: the torch version keeps
    its mask across forward calls so all image sub-batches of a step drop
    the same channels; here the whole image batch flows through one call,
    so a single per-step mask over ``[1, 1, 1, C]`` gives the identical
    semantics — inverted scaling like torch's Dropout2d)."""

    p: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        if not train or self.p <= 0.0 or not self.has_rng("dropout"):
            return x
        import jax

        keep = jax.random.bernoulli(
            self.make_rng("dropout"), 1.0 - self.p, (1, 1, 1, x.shape[-1])
        )
        return jnp.where(keep, x / (1.0 - self.p), 0.0)


class UNet2D(nn.Module):
    """Configurable 2D UNet tower (the reference's generic image ``UNet``,
    image.py:510-657: ResNetDown stages, optional bottleneck innermost,
    ResNetUp stages with skip concat — compact-format widths).  Returns a
    feature map at input resolution; used by the no3d/light tower configs.
    """

    down_widths: tuple = (32, 64, 128)
    up_widths: tuple = (64, 32)
    out_channels: int = 32
    norm: str = "group"
    dropout: float = 0.0          # PersistentDropout2d before the head

    @nn.compact
    def __call__(self, x, train: bool = True):
        ws = self.norm == "group"
        skips = []
        for i, w in enumerate(self.down_widths):
            stride = (1, 1) if i == 0 else (2, 2)
            x = Conv2dWS(w, (3, 3), stride, standardize=ws)(x)
            x = _Norm(self.norm)(x, train)
            x = nn.relu(x)
            x = _BasicBlock2d(w, norm=self.norm)(x, train)
            if i < len(self.down_widths) - 1:
                skips.append(x)
        for w in self.up_widths:
            skip = skips.pop()
            n, hh, wwid, _ = skip.shape
            x = jax.image.resize(x, (x.shape[0], hh, wwid, x.shape[-1]),
                                 "bilinear")
            x = jnp.concatenate([x, skip], axis=-1)
            x = Conv2dWS(w, (3, 3), standardize=ws)(x)
            x = _Norm(self.norm)(x, train)
            x = nn.relu(x)
            x = _BasicBlock2d(w, norm=self.norm)(x, train)
        if self.dropout > 0:
            x = PersistentDropout2d(self.dropout, name="drop")(x, train)
        x = Conv2dWS(self.out_channels, (3, 3), standardize=ws)(x)
        x = _Norm(self.norm)(x, train)
        return nn.relu(x)


class ConvDown2D(nn.Module):
    """Configurable GN+WS conv-ResBlock trunk with per-stage taps — the
    reference's generic ``ResNetDown`` image encoder as configured by the
    Res16Image families (sparseconv3d.yaml ``image.down_conv``: per-stage
    out widths / residual-block counts / strides, GroupNorm + weight
    standardization).  Returns the TUPLE of per-stage feature maps so a
    shared trunk can feed gather/pool taps at successive 3D levels
    (branching_index 1..n in the reference DSL)."""

    widths: Sequence[int] = (32, 32, 64, 128, 256)
    blocks: Sequence[int] = (0, 2, 2, 2, 2)
    strides: Sequence[int] = (1, 2, 2, 2, 2)
    norm: str = "group"

    @nn.compact
    def __call__(self, x, train: bool = True):
        ws = self.norm == "group"
        taps = []
        for i, (w, n, s) in enumerate(zip(self.widths, self.blocks,
                                          self.strides)):
            x = Conv2dWS(w, (3, 3), (s, s), standardize=ws,
                         name=f"stage{i}_conv")(x)
            x = _Norm(self.norm, name=f"stage{i}_norm")(x, train)
            x = nn.relu(x)
            for b in range(n):
                x = _BasicBlock2d(w, norm=self.norm,
                                  name=f"stage{i}_block{b}")(x, train)
            taps.append(x)
        return tuple(taps)
