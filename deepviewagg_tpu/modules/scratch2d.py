"""Reference-exact scratch 2D stack: WS convs, ResBlocks, ResNet down/up
stages and the compact-format UNet tower the published No3D / from-scratch
configs build (conf/models/segmentation/multimodal/no3d.yaml).

The repo's :mod:`image_encoders` towers are an independent TPU-first design
(torchvision topology, fused-fan-in weight standardization).  The modules
here instead pin the *reference's own scratch formulas* so transplanted
weights reproduce its feature maps bit-for-bit (≤1e-5):

  * ``standardize_weights`` (modalities/image.py:39-50): per-out-channel
    mean over (in, kh, kw); UNBIASED std; ``w / ((std + 1e-5) * sqrt(cin))``
    in the 'scaled' variant (sqrt of ``weight.shape[1]``, NOT k*k*cin);
  * ``ReLUWS`` (image.py:110-125): ``relu(x) * sqrt(2 / (1 - 1/pi))``;
  * reflect padding on every 3x3 conv (ResBlock/conv_in,
    image.py:144-159/302-312), zeros for transpose convs;
  * GroupNorm with ``groups = max(c // 16, 1)`` and torch eps 1e-5
    (image.py:296-297);
  * ResBlock activation BEFORE the residual add (image.py:152-189), plain
    (non-WS) 1x1 conv + norm shortcut;
  * ``ResNetDown``'s width rule ``nc_stride_out = nc_in if stride > 1 and
    N > 0 else nc_out`` (image.py:324-333) and ``ResNetUp``'s
    conv_in -> concat-skip -> blocks order (image.py:384-397).

All modules are NHWC; convs run on the MXU in the caller's activation dtype
(parity tests feed f32; production feeds bf16 via ``run_tower``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["WSConv2d", "WSConvTranspose2d", "relu_ws", "RefResBlock",
           "ResNetDown2D", "ResNetUp2D", "UnaryConv2D", "UNetWS",
           "TowerCfg", "unetws_from_cfg"]

# ReLUWS gain (image.py:119): keeps activation variance ~1 under WS convs
_RELU_WS_SCALE = math.sqrt(2.0 / (1.0 - 1.0 / math.pi))


def relu_ws(x, ws: bool):
    y = nn.relu(x)
    return y * _RELU_WS_SCALE if ws else y


def _standardize(w, fan_in: int, axes: Tuple[int, ...]):
    """The reference's ``standardize_weights`` on an HWIO kernel: zero-mean,
    unbiased-std-normalized per output slice, scaled by 1/sqrt(fan_in)."""
    n = 1
    for a in axes:
        n *= w.shape[a]
    mean = w.mean(axis=axes, keepdims=True)
    centered = w - mean
    # torch .std() is UNBIASED (ddof=1) — the var-based flax convention
    # differs by n/(n-1); this is one of the silent-drift spots
    var = (centered * centered).sum(axis=axes, keepdims=True) / (n - 1)
    std = jnp.sqrt(var)
    return centered / ((std + 1e-5) * math.sqrt(fan_in))


class WSConv2d(nn.Module):
    """``Conv2dWS`` (image.py:53-73): torch-layout-equivalent weight
    standardization + optional reflect padding.  ``standardize=False`` gives
    the plain ``nn.Conv2d`` used when ``weight_standardization: False``."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 0
    pad_mode: str = "reflect"      # 'reflect' | 'zeros'
    standardize: bool = True
    scaled: bool = True
    use_bias: bool = True          # torch nn.Conv2d default

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.strides, self.padding
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=(0, 1, 2)),
            (k, k, cin, self.features), jnp.float32)
        if self.standardize:
            # per-OUT-channel over (kh, kw, cin); fan_in = cin (image.py:44)
            w = _standardize(w, cin, (0, 1, 2))
        if p > 0:
            mode = "reflect" if self.pad_mode == "reflect" else "constant"
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=mode)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (s, s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class WSConvTranspose2d(nn.Module):
    """``ConvTranspose2dWS`` (image.py:76-107): torch transpose conv as a
    dilated-LHS conv with the flipped kernel; standardization runs per
    INPUT channel with ``fan_in = out_channels`` (the torch weight layout is
    ``[in, out, kh, kw]`` and ``standardize_weights`` normalizes dim 0,
    scaling by sqrt(shape[1]))."""

    features: int
    kernel_size: int = 2
    strides: int = 2
    padding: int = 0
    standardize: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.strides, self.padding
        cin = x.shape[-1]
        # stored as the torch-forward view [kh, kw, in, out]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=(0, 1, 3)),
            (k, k, cin, self.features), jnp.float32)
        if self.standardize:
            # per-IN-channel (torch dim 0) over (kh, kw, out);
            # fan_in = out_channels (torch weight.shape[1])
            w = _standardize(w, self.features, (0, 1, 3))
        # transpose conv == conv with lhs_dilation=s, kernel spatially
        # flipped, padding (k - 1 - p) per side
        w = jnp.flip(w, axis=(0, 1))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1),
            [(k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)],
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class _RefNorm(nn.Module):
    """GroupNorm with the reference's group rule + torch eps, or BatchNorm
    (image.py:293-299)."""

    kind: str = "group"            # 'group' | 'batch'

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = x.dtype
        x = x.astype(jnp.float32)
        if self.kind == "group":
            g = max(x.shape[-1] // 16, 1)
            y = nn.GroupNorm(num_groups=g, epsilon=1e-5)(x)
        else:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
        return y.astype(dt)


class RefResBlock(nn.Module):
    """``ResBlock`` (image.py:128-189): two 3x3 reflect-pad convs, each
    followed by norm + activation, residual ADDED AFTER the final activation;
    1x1 plain-conv + norm shortcut when widths differ."""

    features: int
    norm: str = "group"
    ws: bool = True
    transpose: bool = False        # ConvTranspose blocks pad with zeros

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.transpose:
            # up-path blocks inherit ConvTranspose2dWS as their conv class
            # (image.py:146-149,318): k=3 s=1 p=1 TRANSPOSE convs — flipped
            # kernels, per-in-channel WS, zeros padding
            conv = lambda nm: WSConvTranspose2d(
                self.features, 3, 1, 1, standardize=self.ws, name=nm)
        else:
            conv = lambda nm: WSConv2d(
                self.features, 3, 1, 1, "reflect", standardize=self.ws,
                name=nm)
        y = conv("conv1")(x)
        y = _RefNorm(self.norm, name="norm1")(y, train)
        y = relu_ws(y, self.ws)
        y = conv("conv2")(y)
        y = _RefNorm(self.norm, name="norm2")(y, train)
        y = relu_ws(y, self.ws)
        if x.shape[-1] != self.features:
            # the shortcut conv is a PLAIN nn.Conv2d even under WS
            # (image.py:173-179)
            x = WSConv2d(self.features, 1, 1, 0, standardize=False,
                         name="down_conv")(x)
            x = _RefNorm(self.norm, name="down_norm")(x, train)
        return y + x


class ResNetDown2D(nn.Module):
    """``ResNetDown`` (image.py:251-340): strided conv_in + N ResBlocks,
    with the reference's width rule."""

    nc_in: int
    nc_out: int
    kernel_size: int = 2
    strides: int = 2
    padding: int = 0
    blocks: int = 1
    norm: str = "group"
    ws: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        nc_stride_out = self.nc_in if self.strides > 1 and self.blocks > 0 \
            else self.nc_out
        x = WSConv2d(nc_stride_out, self.kernel_size, self.strides,
                     self.padding, "reflect", standardize=self.ws,
                     name="conv_in")(x)
        x = _RefNorm(self.norm, name="norm_in")(x, train)
        x = relu_ws(x, self.ws)
        for i in range(self.blocks):
            x = RefResBlock(self.nc_out, self.norm, self.ws,
                            name=f"block{i}")(x, train)
        return x


class ResNetUp2D(nn.Module):
    """``ResNetUp`` (image.py:343-400): transpose conv_in, THEN skip concat,
    then blocks (``skip_first=False``); ``nc_skip`` widens the block input."""

    nc_in: int
    nc_out: int
    nc_skip: int = 0
    kernel_size: int = 2
    strides: int = 2
    padding: int = 0
    blocks: int = 1
    norm: str = "group"
    ws: bool = True

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        nc_stride_out = self.nc_in if self.strides > 1 and self.blocks > 0 \
            else self.nc_out
        # ConvTranspose even at stride 1 (the final up stage is a k=3 s=1
        # p=1 ConvTranspose2dWS — flipped kernel, per-IN-channel WS)
        x = WSConvTranspose2d(nc_stride_out, self.kernel_size, self.strides,
                              self.padding, standardize=self.ws,
                              name="conv_in")(x)
        x = _RefNorm(self.norm, name="norm_in")(x, train)
        x = relu_ws(x, self.ws)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        for i in range(self.blocks):
            x = RefResBlock(self.nc_out, self.norm, self.ws, transpose=True,
                            name=f"block{i}")(x, train)
        return x


class UnaryConv2D(nn.Module):
    """``UnaryConv`` (image.py:403-456): 1x1 conv with optional INPUT channel
    dropout — ``in_drop`` builds a ``Dropout2d`` (or ``PersistentDropout2d``
    when ``persistent_drop``: one mask shared by the whole image batch,
    image.py:465-508) applied before the conv.  The published No3D last_conv
    configs use either the bare conv or ``in_drop: 0.5``."""

    features: int
    ws: bool = False
    in_drop: float = 0.0
    persistent_drop: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.in_drop > 0 and train and self.has_rng("dropout"):
            if self.persistent_drop:
                # one [1,1,1,C] mask for the whole batch (the torch module
                # keeps its mask across sub-batch calls within a step)
                shape = (1, 1, 1, x.shape[-1])
            else:
                # torch Dropout2d: an independent channel mask PER image
                shape = (x.shape[0], 1, 1, x.shape[-1])
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1.0 - self.in_drop, shape)
            x = jnp.where(keep, x / (1.0 - self.in_drop), 0.0)
        return WSConv2d(self.features, 1, 1, 0, standardize=self.ws,
                        name="conv")(x)


# ------------------------------------------------------------- compact -----
# TowerCfg: hashable compact spec mirroring the YAML DSL —
#   down: ((nc_in, nc_out, k, s, p, N), ...)
#   up:   ((nc_in, nc_skip, nc_out, k, s, p, N), ...)   or None
#   last: output_nc | (output_nc, in_drop, persistent_drop) | None
TowerCfg = Tuple[Tuple[Tuple[int, ...], ...],
                 Optional[Tuple[Tuple[int, ...], ...]], Optional[int]]


def tower_cfg_out_channels(cfg: TowerCfg) -> int:
    """Output width of a compact tower: last conv if present, else the final
    up stage's nc_out, else the final down stage's nc_out."""
    down, up, last = cfg
    if last is not None:
        return int(last[0] if isinstance(last, (tuple, list)) else last)
    if up:
        return int(up[-1][2])
    return int(down[-1][1])


class UNetWS(nn.Module):
    """The reference's compact-format image ``UNet`` (image.py:510-627):
    ResNetDown stages (all but the last push a skip), ResNetUp stages popping
    skips (the deepest up gets the bottleneck input, the last may get None),
    then an optional 1x1 last_conv."""

    down: Tuple[Tuple[int, ...], ...]
    up: Optional[Tuple[Tuple[int, ...], ...]] = None
    last: Optional[int] = None
    norm: str = "group"
    ws: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        skips = []
        for i, (nc_in, nc_out, k, s, p, n_blk) in enumerate(self.down):
            x = ResNetDown2D(nc_in, nc_out, k, s, p, n_blk, self.norm,
                             self.ws, name=f"down{i}")(x, train)
            if i < len(self.down) - 1:
                skips.append(x)
        if self.up:
            for i, (nc_in, nc_skip, nc_out, k, s, p, n_blk) in \
                    enumerate(self.up):
                skip = skips.pop() if skips else None
                x = ResNetUp2D(nc_in, nc_out, nc_skip, k, s, p, n_blk,
                               self.norm, self.ws, name=f"up{i}")(x, skip,
                                                                  train)
        if self.last is not None:
            if isinstance(self.last, (tuple, list)):
                nc, in_drop, persist = self.last
                x = UnaryConv2D(int(nc), in_drop=float(in_drop),
                                persistent_drop=bool(persist),
                                name="last")(x, train)
            else:
                x = UnaryConv2D(int(self.last), name="last")(x, train)
        return x


def unetws_from_cfg(cfg: TowerCfg, norm: str = "group", ws: bool = True,
                    name: str = "tower") -> UNetWS:
    down, up, last = cfg
    return UNetWS(down=tuple(map(tuple, down)),
                  up=tuple(map(tuple, up)) if up else None,
                  last=last, norm=norm, ws=ws, name=name)
