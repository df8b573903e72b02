"""Pretrained-tower architecture parity (VERDICT r4 missing #4 / next #6).

The reference's actual flagship towers — torchvision ResNet18 truncations and
the ADE20K MIT-semseg ResNet18dilated (+PPM feature head) wrappers
(modules/multimodal/modalities/image.py:721-1131) — executed VERBATIM on top
of the faithful functional ``torchvision`` / ``mit_semseg`` shims
(tests/reference_shims.py), against this repo's flax ``ResNet18``/``PPM``
with weights converted by :mod:`deepviewagg_tpu.utils.torch_convert`.

The ADE20K tests exercise the reference's full pretrained-build path: a
randomly-initialized encoder/decoder state dict is SAVED under the expected
``PRETRAINED_DIR`` layout (yaml + ``encoder_epoch_20.pth`` /
``decoder_epoch_20.pth``) and the reference class loads it itself.  Real
published ``.pth`` parity stays environmental (zero egress) — these pin the
architecture math (deep stem, ``_nostride_dilate`` dilation pattern, PPM
pool/upsample/concat/conv_last) and the converter's name mapping.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_shims import (
    load_reference_image_modality,
    randomize_torch_module,
)

from deepviewagg_tpu.modules.image_encoders import PPM, ResNet18, f32_convs
from deepviewagg_tpu.utils.torch_convert import (
    convert_ppm_head,
    convert_resnet18,
)

TOL = dict(rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def ri():
    return load_reference_image_modality()


def _tame_convs(module):
    """Rescale randomized conv weights to fan-in magnitude so activations
    stay O(1) through 20 layers — ``randomize_torch_module``'s flat 0.3 std
    explodes a deep trunk to ~1e7, which drowns f32 parity in accumulation
    noise (the architectures still agreed to ~0.8% there)."""
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight *= 0.5 / float(np.sqrt(m.weight[0].numel()))


def _to_flax(x_nchw):
    """torch NCHW -> this repo's image layout [N, W, H, C]."""
    return np.ascontiguousarray(np.transpose(x_nchw, (0, 3, 2, 1)))


def _run_flax(mod, x_nchw, converted):
    params, stats = converted
    variables = {"params": params, "batch_stats": stats}
    with f32_convs():
        y = mod.apply(variables, jnp.asarray(_to_flax(x_nchw)), False)
    return np.transpose(np.asarray(y), (0, 3, 2, 1))  # back to NCHW


def _bn_into(sd, prefix, bn):
    sd[f"{prefix}.weight"] = bn.weight
    sd[f"{prefix}.bias"] = bn.bias
    sd[f"{prefix}.running_mean"] = bn.running_mean
    sd[f"{prefix}.running_var"] = bn.running_var


def _tv_sd(conv_seq):
    """The reference truncation classes re-group torchvision modules into
    ``self.conv = Sequential(layer0, layer1, ...)`` (image.py:1006-1013);
    rebuild torchvision-style state-dict keys from that Sequential so the
    converter sees its native naming.  ``layer0`` = (conv1, bn1, relu,
    maxpool)."""
    sd = {}
    stem = conv_seq[0]
    sd["conv1.weight"] = stem[0].weight
    _bn_into(sd, "bn1", stem[1])
    for li in range(1, len(conv_seq)):
        for j, blk in enumerate(conv_seq[li]):
            p = f"layer{li}.{j}"
            sd[f"{p}.conv1.weight"] = blk.conv1.weight
            _bn_into(sd, f"{p}.bn1", blk.bn1)
            sd[f"{p}.conv2.weight"] = blk.conv2.weight
            _bn_into(sd, f"{p}.bn2", blk.bn2)
            if blk.downsample is not None:
                sd[f"{p}.downsample.0.weight"] = blk.downsample[0].weight
                _bn_into(sd, f"{p}.downsample.1", blk.downsample[1])
    return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.parametrize("level", [2, 4])
def test_torchvision_truncation_parity(ri, level):
    """``ResNet18TruncatedLayer{2,4}`` (single-7x7-stem torchvision trunk,
    image.py:991-1085) vs flax ``ResNet18(out_level=level, norm='batch')``."""
    cls = getattr(ri, f"ResNet18TruncatedLayer{level}")
    ref = cls(pretrained=False, frozen=False, scale_factor=None)
    randomize_torch_module(ref, seed=3 + level)
    _tame_convs(ref)
    ref.eval()

    rng = np.random.default_rng(7)
    x = (rng.normal(size=(2, 3, 64, 96)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    mod = ResNet18(out_level=level, norm="batch")
    got = _run_flax(mod, x, convert_resnet18(_tv_sd(ref.conv),
                                             out_level=level))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, **TOL)


def _write_ade_dir(tmp_path, with_decoder):
    """A PRETRAINED_DIR with the resnet18dilated-ppm_deepsup yaml + randomly
    initialized encoder/decoder checkpoints (the reference asserts these
    exist and loads them, image.py:736-761)."""
    import mit_semseg.models as mm

    arch = "resnet18dilated-ppm_deepsup"
    d = tmp_path / "ade20k" / arch
    d.mkdir(parents=True, exist_ok=True)
    (d / f"{arch}.yaml").write_text(
        "MODEL:\n"
        "  arch_encoder: resnet18dilated\n"
        "  arch_decoder: ppm_deepsup\n"
        "  fc_dim: 512\n"
        "TEST:\n"
        "  checkpoint: epoch_20.pth\n"
        "DATASET:\n"
        "  num_class: 150\n")
    enc = mm.ModelBuilder.build_encoder("resnet18dilated", 512, "")
    randomize_torch_module(enc, seed=11)
    _tame_convs(enc)
    torch.save(enc.state_dict(), d / "encoder_epoch_20.pth")
    enc_sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    dec_sd = None
    if with_decoder:
        dec = mm.ModelBuilder.build_decoder("ppm_deepsup", 512, 150, "")
        randomize_torch_module(dec, seed=12)
        _tame_convs(dec)
        torch.save(dec.state_dict(), d / "decoder_epoch_20.pth")
        dec_sd = {k: v.numpy() for k, v in dec.state_dict().items()}
    return enc_sd, dec_sd


def test_ade20k_truncated_layer4_parity(ri, tmp_path):
    """``ADE20KResNet18TruncatedLayer4`` — MIT deep stem (3x 3x3 conv) +
    ``_nostride_dilate`` layer3(d2)/layer4(d4) trunk built from an on-disk
    checkpoint (image.py:793-876) — vs flax ``ResNet18(deep_stem=True,
    dilated8=True)``."""
    enc_sd, _ = _write_ade_dir(tmp_path, with_decoder=False)
    old = ri.PRETRAINED_DIR
    ri.PRETRAINED_DIR = str(tmp_path)
    try:
        ref = ri.ADE20KResNet18TruncatedLayer4(frozen=False,
                                               scale_factor=None)
    finally:
        ri.PRETRAINED_DIR = old
    ref.eval()

    rng = np.random.default_rng(9)
    x = (rng.normal(size=(2, 3, 48, 96)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    mod = ResNet18(out_level=4, norm="batch", deep_stem=True, dilated8=True)
    got = _run_flax(mod, x, convert_resnet18(enc_sd, out_level=4))
    assert got.shape == want.shape  # stride 8: 48x96 -> 6x12, 512 ch
    np.testing.assert_allclose(got, want, **TOL)


def test_ade20k_resnet18_ppm_parity(ri, tmp_path):
    """``ADE20KResNet18PPM`` — the flagship's tower: dilated encoder +
    ``PPMFeatMap.from_pretrained`` feature head (pool scales 1/2/3/6, 1x1
    convs, bilinear upsample, concat, 3x3 conv_last; image.py:659-792) —
    vs flax trunk + ``PPM(512)`` with converter-mapped weights."""
    enc_sd, dec_sd = _write_ade_dir(tmp_path, with_decoder=True)
    old = ri.PRETRAINED_DIR
    ri.PRETRAINED_DIR = str(tmp_path)
    try:
        ref = ri.ADE20KResNet18PPM(frozen=False, pretrained=True)
    finally:
        ri.PRETRAINED_DIR = old
    ref.eval()

    rng = np.random.default_rng(13)
    # conv5 is 6x12 — divisible by every PPM bin (1, 2, 3, 6), where torch
    # AdaptiveAvgPool2d and the fixed-window TPU pool agree exactly
    x = (rng.normal(size=(2, 3, 48, 96)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), out_size=None).numpy()

    trunk = ResNet18(out_level=4, norm="batch", deep_stem=True,
                     dilated8=True)
    head = PPM(out_channels=512, norm="batch")
    t_conv = convert_resnet18(enc_sd, out_level=4)
    h_conv = convert_ppm_head(dec_sd)

    xf = jnp.asarray(_to_flax(x))
    with f32_convs():
        conv5 = trunk.apply({"params": t_conv[0], "batch_stats": t_conv[1]},
                            xf, False)
        y = head.apply({"params": h_conv[0], "batch_stats": h_conv[1]},
                       conv5, False)
    got = np.transpose(np.asarray(y), (0, 3, 2, 1))
    assert got.shape == want.shape  # [2, 512, 6, 12]
    np.testing.assert_allclose(got, want, **TOL)
