"""2D scratch-tower parity: the reference's ``Conv2dWS``/``ConvTranspose2dWS``
/``ResBlock``/``ResNetDown``/``ResNetUp``/``UnaryConv`` and the full published
No3D-light UNet (modules/multimodal/modalities/image.py:39-627,
conf/models/segmentation/multimodal/no3d.yaml:5-63) executed verbatim vs this
repo's :mod:`deepviewagg_tpu.modules.scratch2d` with transplanted weights
(VERDICT r3 missing #4 / next-round #7).

GN eps, the unbiased-std WS formula, reflect padding, the ReLUWS gain and the
transpose-conv kernel orientation are exactly the silent-drift spots these
tests pin.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax.core import unfreeze

from reference_shims import (
    conv_t2j,
    copy_scratch_resblock,
    copy_scratch_stage,
    copy_scratch_unet,
    load_reference_image_modality,
    randomize_torch_module,
    t2j,
    tconv_t2j,
)

from deepviewagg_tpu.modules import scratch2d as s2d

TOL = dict(rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def ri():
    return load_reference_image_modality()


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(x_nhwc, (0, 3, 1, 2))))


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _gn(ri):
    return lambda nc: torch.nn.GroupNorm(max(nc // 16, 1), nc)


def _run_repo(mod, x_nhwc, transplant, train_kw=True):
    kw = {"train": False} if train_kw else {}
    variables = unfreeze(mod.init(jax.random.PRNGKey(0),
                                  jnp.asarray(x_nhwc), **kw))
    transplant(variables["params"])
    return np.asarray(mod.apply(variables, jnp.asarray(x_nhwc), **kw))


def test_conv2dws(ri):
    """3x3 reflect-pad WS conv — the workhorse of every scratch block."""
    rng = np.random.default_rng(0)
    ref = ri.Conv2dWS(5, 7, kernel_size=3, stride=1, padding=1,
                      padding_mode="reflect")
    randomize_torch_module(ref, seed=1)
    x = rng.normal(size=(2, 9, 11, 5)).astype(np.float32)
    want = _to_nhwc(ref(_nchw(x)))

    mod = s2d.WSConv2d(7, 3, 1, 1, "reflect")

    def tp(p):
        p["kernel"] = conv_t2j(ref.weight)
        p["bias"] = t2j(ref.bias)

    got = _run_repo(mod, x, tp, train_kw=False)
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("k,s,p", [(2, 2, 0), (3, 1, 1)])
def test_convtranspose2dws(ri, k, s, p):
    """Strided upsampling transpose conv AND the k3 s1 p1 stride-1 variant
    the final up stage and all up-blocks use."""
    rng = np.random.default_rng(2)
    ref = ri.ConvTranspose2dWS(6, 4, kernel_size=k, stride=s, padding=p)
    randomize_torch_module(ref, seed=3)
    x = rng.normal(size=(2, 7, 8, 6)).astype(np.float32)
    want = _to_nhwc(ref(_nchw(x)))

    mod = s2d.WSConvTranspose2d(4, k, s, p)

    def tp(pp):
        pp["kernel"] = tconv_t2j(ref.weight)
        pp["bias"] = t2j(ref.bias)

    got = _run_repo(mod, x, tp, train_kw=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("cin,cout", [(8, 8), (8, 20)])
def test_resblock(ri, cin, cout):
    """Down-path ResBlock: act-before-add ordering + plain-conv shortcut."""
    rng = np.random.default_rng(4)
    ref = ri.ResBlock(cin, cout, ri.Conv2dWS, _gn(ri), ri.ReLUWS)
    randomize_torch_module(ref, seed=5)
    x = rng.normal(size=(2, 8, 10, cin)).astype(np.float32)
    want = _to_nhwc(ref(_nchw(x)))

    mod = s2d.RefResBlock(cout)
    got = _run_repo(mod, x, lambda p: copy_scratch_resblock(
        ref.state_dict(), "", {"conv1": p["conv1"], "conv2": p["conv2"],
                               "norm1": p["norm1"], "norm2": p["norm2"],
                               **({"down_conv": p.get("down_conv"),
                                   "down_norm": p.get("down_norm")}
                                  if cin != cout else {})}))
    np.testing.assert_allclose(got, want, **TOL)


def test_resblock_transpose(ri):
    """Up-path ResBlock built on ConvTranspose2dWS (flipped kernels,
    per-in-channel WS, zeros padding)."""
    rng = np.random.default_rng(6)
    ref = ri.ResBlock(10, 6, ri.ConvTranspose2dWS, _gn(ri), ri.ReLUWS)
    randomize_torch_module(ref, seed=7)
    x = rng.normal(size=(2, 6, 7, 10)).astype(np.float32)
    want = _to_nhwc(ref(_nchw(x)))

    mod = s2d.RefResBlock(6, transpose=True)
    got = _run_repo(mod, x, lambda p: copy_scratch_resblock(
        ref.state_dict(), "", p, transpose=True))
    np.testing.assert_allclose(got, want, **TOL)


def test_resnetdown_strided(ri):
    """A strided encoder stage exactly as the published config builds it:
    k=2 s=2 p=0, N=2 blocks, GN + WS (no3d.yaml:17-32)."""
    rng = np.random.default_rng(8)
    ref = ri.ResNetDown(down_conv_nn=[16, 32], kernel_size=2, stride=2,
                        padding=0, N=2, normalization="GroupNorm",
                        weight_standardization=True)
    randomize_torch_module(ref, seed=9)
    x = rng.normal(size=(2, 12, 16, 16)).astype(np.float32)
    want = _to_nhwc(ref(_nchw(x)))

    mod = s2d.ResNetDown2D(16, 32, 2, 2, 0, blocks=2)
    got = _run_repo(mod, x, lambda p: copy_scratch_stage(
        ref.state_dict(), "", p, n_blocks=2))
    np.testing.assert_allclose(got, want, **TOL)


def test_resnetup_with_skip(ri):
    """A decoder stage: transpose conv_in -> concat skip -> blocks
    (up_conv_nn [nc_in, nc_skip, nc_out], skip_first=False)."""
    rng = np.random.default_rng(10)
    ref = ri.ResNetUp(up_conv_nn=[24, 8, 16], kernel_size=2, stride=2,
                      padding=0, N=2, normalization="GroupNorm",
                      weight_standardization=True)
    randomize_torch_module(ref, seed=11)
    x = rng.normal(size=(2, 5, 6, 24)).astype(np.float32)
    skip = rng.normal(size=(2, 10, 12, 8)).astype(np.float32)
    want = _to_nhwc(ref(_nchw(x), _nchw(skip)))

    mod = s2d.ResNetUp2D(24, 16, nc_skip=8, kernel_size=2, strides=2,
                         padding=0, blocks=2)
    variables = unfreeze(mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                                  jnp.asarray(skip), train=False))
    copy_scratch_stage(ref.state_dict(), "", variables["params"],
                       transpose=True, n_blocks=2)
    got = np.asarray(mod.apply(variables, jnp.asarray(x), jnp.asarray(skip),
                               train=False))
    np.testing.assert_allclose(got, want, **TOL)


# ------------------------------------------------- full published tower ----
# the no3d light tower (no3d.yaml:5-63), shrunk 4x in width (in_feat 8 not
# 32) to keep the test fast; topology, strides, block counts identical
IN_FEAT = 8
DOWN_NN = [[3, IN_FEAT], [IN_FEAT, IN_FEAT], [IN_FEAT, 2 * IN_FEAT],
           [2 * IN_FEAT, 4 * IN_FEAT], [4 * IN_FEAT, 8 * IN_FEAT]]
UP_NN = [[8 * IN_FEAT, 4 * IN_FEAT, 4 * IN_FEAT],
         [4 * IN_FEAT, 2 * IN_FEAT, 3 * IN_FEAT],
         [3 * IN_FEAT, IN_FEAT, 2 * IN_FEAT],
         [2 * IN_FEAT, IN_FEAT, IN_FEAT],
         [IN_FEAT, 0, IN_FEAT]]
DOWN_N = [0, 2, 2, 2, 2]
UP_N = [1, 1, 1, 1, 1]
N_CLS = 5


def build_ref_light_tower(ri, n_cls=N_CLS, in_feat=IN_FEAT, seed=13):
    """The published light tower as chained reference modules, mirroring the
    compact-format UNet build + forward (image.py:546-572,597-627)."""
    down_nn = [[3, in_feat], [in_feat, in_feat], [in_feat, 2 * in_feat],
               [2 * in_feat, 4 * in_feat], [4 * in_feat, 8 * in_feat]]
    up_nn = [[8 * in_feat, 4 * in_feat, 4 * in_feat],
             [4 * in_feat, 2 * in_feat, 3 * in_feat],
             [3 * in_feat, in_feat, 2 * in_feat],
             [2 * in_feat, in_feat, in_feat],
             [in_feat, 0, in_feat]]
    downs = torch.nn.ModuleList([
        ri.ResNetDown(down_conv_nn=down_nn[i],
                      kernel_size=3 if i == 0 else 2,
                      stride=1 if i == 0 else 2,
                      padding=1 if i == 0 else 0,
                      N=DOWN_N[i], normalization="GroupNorm",
                      weight_standardization=True)
        for i in range(5)])
    ups = torch.nn.ModuleList([
        ri.ResNetUp(up_conv_nn=up_nn[i],
                    kernel_size=2 if i < 4 else 3,
                    stride=2 if i < 4 else 1,
                    padding=0 if i < 4 else 1,
                    N=UP_N[i], normalization="GroupNorm",
                    weight_standardization=True)
        for i in range(5)])
    last = ri.UnaryConv(in_feat, n_cls)

    class Tower(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.down_modules = downs
            self.up_modules = ups
            self.last = last

        def forward(self, x, *args):
            stack = []
            for i in range(len(self.down_modules) - 1):
                x = self.down_modules[i](x)
                stack.append(x)
            x = self.down_modules[-1](x)
            for up in self.up_modules:
                skip = stack.pop(-1) if stack else None
                x = up(x, skip)
            return self.last(x)

    tower = Tower()
    randomize_torch_module(tower, seed=seed)
    return tower


def repo_light_cfg(n_cls=N_CLS, in_feat=IN_FEAT):
    down = tuple(
        (down_nn[0], down_nn[1],
         3 if i == 0 else 2, 1 if i == 0 else 2, 1 if i == 0 else 0,
         DOWN_N[i])
        for i, down_nn in enumerate(
            [[3, in_feat], [in_feat, in_feat], [in_feat, 2 * in_feat],
             [2 * in_feat, 4 * in_feat], [4 * in_feat, 8 * in_feat]]))
    up = tuple(
        (up_nn[0], up_nn[1], up_nn[2],
         2 if i < 4 else 3, 2 if i < 4 else 1, 0 if i < 4 else 1, UP_N[i])
        for i, up_nn in enumerate(
            [[8 * in_feat, 4 * in_feat, 4 * in_feat],
             [4 * in_feat, 2 * in_feat, 3 * in_feat],
             [3 * in_feat, in_feat, 2 * in_feat],
             [2 * in_feat, in_feat, in_feat],
             [in_feat, 0, in_feat]]))
    return (down, up, n_cls)


def test_unet_light_full(ri):
    """The COMPLETE published No3D light tower: 5 ResNetDown + 5 ResNetUp +
    last_conv, weights transplanted, feature maps ≤1e-5."""
    rng = np.random.default_rng(12)
    ref = build_ref_light_tower(ri)
    x = rng.normal(size=(2, 32, 48, 3)).astype(np.float32)
    want = _to_nhwc(ref(_nchw(x)))
    assert want.shape == (2, 32, 48, N_CLS)

    mod = s2d.unetws_from_cfg(repo_light_cfg(), name=None)
    got = _run_repo(mod, x, lambda p: copy_scratch_unet(
        ref.state_dict(), p, DOWN_N, UP_N))
    np.testing.assert_allclose(got, want, **TOL)
