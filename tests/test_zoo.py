"""Config-zoo contract: every published name + a grammar sweep must build
and shape-check (eval_shape only — no compute), covering the reference's
109-entry model space axes (SURVEY.md §A.11)."""

import jax
import numpy as np
import pytest

from deepviewagg_tpu.config.zoo import MODEL_ZOO, get_model_spec, parse_model_name
from deepviewagg_tpu.data.collate import device_view
from deepviewagg_tpu.data.toy import toy_batch
from deepviewagg_tpu.models.segmentation import build_model

GRAMMAR_SWEEP = [
    # fusion depth x pooling x tower x interpolate axes
    "Res16UNet14-L1-early-group4-interpolate",
    "Res16UNet14-L2-intermediate1-max",
    "Res16UNet14-L1-intermediate4-max",   # bottleneck-level branch
    "Res16UNet14-L1-intermediate2-mean-interpolate",
    "Res16UNet14-L1-early-qkv",
    "Res16UNet14-L1-early-heuristic-scratch",
    "Res16UNet18-L3-early-group1-imagenet",
]


@pytest.fixture(scope="module")
def batch():
    b, _, _ = toy_batch(n_samples=1, density=25.0, image_size=(64, 32),
                        n_cameras=1, branch_levels=(0, 1, 2, 4))
    return device_view(b)


def test_published_names_resolve():
    for name in MODEL_ZOO:
        spec = get_model_spec(name, num_classes=13)
        assert spec.num_classes == 13


def test_grammar_parses():
    d = parse_model_name("Res16UNet34-L4-early-group8-ade20k-interpolate")
    b = d["branches"][0]
    # ade20k selects WEIGHTS; the architecture stays the L4 truncation
    assert b["tower"] == "resnet18_l4" and b["num_groups"] == 8
    assert b["interpolate"] and b["level"] == 0
    d2 = parse_model_name("Res16UNet18-L2-intermediate2-qkv")
    assert d2["branches"][0]["level"] == 2
    assert d2["branches"][0]["view_pool"] == "qkv"
    assert parse_model_name("TotallyUnknown") is None


@pytest.mark.parametrize("name", GRAMMAR_SWEEP)
def test_zoo_models_shape_check(name, batch):
    spec = get_model_spec(name, num_classes=4, in_channels=4)
    model = build_model(spec)
    shapes = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False), batch
    )
    out = jax.eval_shape(
        lambda v, b: model.apply(v, b, train=False),
        shapes, batch,
    )
    cap0 = batch["feats"].shape[0]
    assert out["logits"].shape == (cap0, 4)


@pytest.mark.parametrize("name", [
    "No3D-ADE20K-group8", "Res16UNet34-LateFeatureFusion",
    "Res16UNet34-LateLogitFusion",
])
def test_model_families_shape_check(name, batch):
    spec = get_model_spec(name, num_classes=4, in_channels=4,
                          overrides={"backbone": "Res16UNetTest"}
                          if "Late" in name else None)
    model = build_model(spec)
    shapes = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False), batch
    )
    out = jax.eval_shape(
        lambda v, b: model.apply(v, b, train=False), shapes, batch
    )
    cap0 = batch["feats"].shape[0]
    assert out["logits"].shape == (cap0, 4)
    assert "x_seen" in out


def test_grammar_nogating_drop_tokens():
    d = parse_model_name("Res16UNet34-L4-early-nogating-interpolate")
    assert d["branches"][0]["gated"] is False
    d = parse_model_name("Res16UNet34-L4-early-ade20k-harddrop50-interpolate")
    assert d["branches"][0]["drop_modality"] == 0.5
    d = parse_model_name("Res16UNet18-L2-intermediate1-drop30")
    assert d["branches"][0]["drop_modality"] == 0.3
    d = parse_model_name("Res16UNet34-L4-early")
    assert d["branches"][0]["gated"] is True
    assert d["branches"][0]["drop_modality"] == 0.0


def test_grammar_soft_vs_hard_drop():
    soft = parse_model_name("Res16UNet34-L4-early-drop50")["branches"][0]
    hard = parse_model_name("Res16UNet34-L4-early-harddrop50")["branches"][0]
    assert soft["drop_modality"] == hard["drop_modality"] == 0.5
    assert soft["drop_hard"] is False and hard["drop_hard"] is True
    import pytest

    with pytest.raises(ValueError):
        parse_model_name("Res16UNet34-L4-early-drop100")
