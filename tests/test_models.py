"""End-to-end model tests on the synthetic room: collate -> forward -> grads.

This is the CPU-runnable integration layer the reference only had as
notebooks (SURVEY.md §4): full mapping construction + multimodal forward +
backward on a generated scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepviewagg_tpu.data import synthetic
from deepviewagg_tpu.data.collate import Bucket, Sample, collate
from deepviewagg_tpu.data.mapping_factory import VisibilityParams, build_mappings
from deepviewagg_tpu.models.losses import cross_entropy, lovasz_softmax
from deepviewagg_tpu.models.segmentation import (
    BranchSpec, ModelSpec, MultimodalSeg, No3DSeg, SparseConv3dSeg,
)
from deepviewagg_tpu.ops import voxel

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def _make_sample(seed):
    scene = synthetic.make_scene(seed=seed, density=40.0, n_cameras=2,
                                 image_size=(64, 32), n_boxes=2)
    g = voxel.grid_sample(scene.pos, 0.18, feats=scene.rgb, labels=scene.labels)
    coords = g["coords"][:, 1:]
    mapping = build_mappings(
        g["pos"], scene.cameras, VisibilityParams(voxel=0.15, max_splat=5)
    )
    imgs = synthetic.render_views(scene, mapping)  # stand-in RGB images
    feats = np.concatenate([g["feats"], np.ones((len(coords), 1), np.float32)], 1)
    return Sample(coords=coords, feats=feats, labels=g["labels"],
                  images=imgs, mapping=mapping)


@pytest.fixture(scope="module")
def batch():
    samples = [_make_sample(0), _make_sample(1)]
    n0 = sum(len(s.coords) for s in samples)
    views = sum(s.mapping.num_views for s in samples)
    pix = sum(s.mapping.num_pixels for s in samples)
    bucket = Bucket(
        level_caps=[n0 + 64, n0 // 2 + 64, n0 // 4 + 64, n0 // 8 + 64, n0 // 8 + 64],
        num_batches=2, view_cap=views + 32, pix_cap=pix + 32,
        image_cap=4, image_size=(96, 48),
    )
    return collate(samples, bucket, branch_levels=[0, 2], conv0_kernel=3)


def test_sparseconv3d_seg(batch):
    spec = ModelSpec(num_classes=4, in_channels=4, backbone="Res16UNetTest")
    model = SparseConv3dSeg(spec)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    n = batch["meta"]["num_valid"]
    assert out["logits"].shape[-1] == 4
    assert np.isfinite(np.asarray(out["logits"][:n])).all()


def test_multimodal_early_fusion_forward_backward(batch):
    spec = ModelSpec(
        num_classes=4, in_channels=4, backbone="Res16UNetTest",
        branches=(
            (0, BranchSpec(tower="resnet18_l1", out_channels=16,
                           num_groups=2, remat_tower=False)),
        ),
    )
    model = MultimodalSeg(spec)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    n = batch["meta"]["num_valid"]
    logits = out["logits"]
    assert np.isfinite(np.asarray(logits[:n])).all()
    assert "x_seen" in out and out["x_seen"].shape[0] == logits.shape[0]
    assert np.asarray(out["x_seen"][:n]).mean() > 0.1

    valid = jnp.asarray(batch["graph"]["levels"][0]["valid"])

    def loss_fn(params):
        o = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=False,
        )
        return cross_entropy(o["logits"], jnp.asarray(batch["labels"]), valid)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss0, grads = grad_fn(variables["params"])
    assert np.isfinite(float(loss0))
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gmax) and gmax > 0
    # 2D tower must receive gradient through gather+pool+fusion
    tower_g = grads["branch_l0"]["tower"]
    assert max(
        float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(tower_g)
    ) > 0

    # a few SGD steps reduce the loss
    tx = optax.sgd(0.1)
    st = tx.init(variables["params"])
    params = variables["params"]
    for _ in range(3):
        l, g = grad_fn(params)
        upd, st = tx.update(g, st)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < float(loss0)


def test_intermediate_fusion(batch):
    """Branch at encoder level 2 consumes stride-merged mappings."""
    spec = ModelSpec(
        num_classes=4, in_channels=4, backbone="Res16UNetTest",
        branches=(
            (2, BranchSpec(tower="resnet18_l1", out_channels=16,
                           remat_tower=False)),
        ),
    )
    model = MultimodalSeg(spec)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    n = batch["meta"]["num_valid"]
    assert np.isfinite(np.asarray(out["logits"][:n])).all()


def test_no3d(batch):
    spec = ModelSpec(
        num_classes=4, in_channels=4,
        branches=(
            (0, BranchSpec(tower="resnet18_l1", out_channels=16,
                           remat_tower=False)),
        ),
    )
    model = No3DSeg(spec)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    n = batch["meta"]["num_valid"]
    logits = np.asarray(out["logits"][:n])
    seen = np.asarray(out["x_seen"][:n])
    assert np.isfinite(logits).all()
    assert seen.any()


def test_tower_reuse_branches(batch):
    """XYZ-RGB-L4-all semantics (sparseconv3d.yaml:3583): ONE tower runs
    once and every branch — including the owner — re-gathers/pools the
    same feature maps at its own 3D level (the reference threads x_mod
    through [Tower, ModalityIdentity, ...], modules.py:318-335)."""
    spec = ModelSpec(
        num_classes=4, in_channels=4, backbone="Res16UNetTest",
        branches=(
            (0, BranchSpec(tower="resnet18_l1", out_channels=16,
                           num_groups=2, remat_tower=False)),
            (2, BranchSpec(tower="reuse", out_channels=16,
                           num_groups=2, remat_tower=False)),
        ),
    )
    model = MultimodalSeg(spec)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    n = batch["meta"]["num_valid"]
    assert np.isfinite(np.asarray(out["logits"][:n])).all()
    # exactly one tower parameter tree exists (the shared one)
    assert "reuse_tower" in variables["params"]
    assert not any(k.startswith("branch_") and "tower" in variables["params"][k]
                   for k in variables["params"])

    valid = jnp.asarray(batch["graph"]["levels"][0]["valid"])

    def loss_fn(params):
        o = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=False,
        )
        return cross_entropy(o["logits"], jnp.asarray(batch["labels"]), valid)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    tower_g = grads["reuse_tower"]
    # the shared tower receives gradient through BOTH fusion levels
    assert max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(tower_g)) > 0


def test_lovasz_perfect_prediction():
    labels = jnp.array([0, 1, 2, 1, 0, -1])
    logits = jax.nn.one_hot(jnp.maximum(labels, 0), 3) * 50.0
    assert float(lovasz_softmax(logits, labels)) < 1e-3
    bad = -logits
    assert float(lovasz_softmax(bad, labels)) > 0.5


def test_unet2d_tower_forward():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepviewagg_tpu.modules.image_encoders import UNet2D

    m = UNet2D(down_widths=(8, 16, 32), up_widths=(16, 8), out_channels=8)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 16, 3)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 32, 16, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_unet2d_registered_as_tower():
    from deepviewagg_tpu.models.segmentation import make_tower

    fac, out = make_tower("unet2d_16")
    assert out == 16
    assert fac().out_channels == 16


def test_early_branch_runs_pre_stem():
    """branching_index 0 must see the RAW point features (the reference's
    early placement: down_conv_nn[0] = [FEAT + out_feat_img, ...])."""
    import jax
    import numpy as np

    from deepviewagg_tpu.data.collate import device_view
    from deepviewagg_tpu.data.toy import flagship_spec, toy_batch
    from deepviewagg_tpu.models.segmentation import MultimodalSeg

    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)
    batch, _, _ = toy_batch(n_samples=1, density=25.0, image_size=(64, 32),
                            n_cameras=1)
    dv = device_view(batch); dv.pop("meta", None)
    model = MultimodalSeg(spec)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), dv, train=False)
    params = variables["params"]
    # concat fusion pre-stem: the stem conv consumes raw feats + pooled 2D
    stem_kernel = params["stem"]["SparseConvNormRelu_0"]["SparseConv_0"]["kernel"]
    in_feats = dv["feats"].shape[-1]
    branch_out = dict(spec.branches)[0].out_channels
    assert stem_kernel.shape[1] == in_feats + branch_out, (
        f"stem input {stem_kernel.shape[1]} != raw {in_feats} + branch "
        f"{branch_out}: early branch is not pre-stem")


def test_tower_bf16_matches_f32(batch):
    """The bf16 tower activation policy (BranchSpec.tower_bf16, default on)
    halves tower HBM traffic; numerics must stay within bf16 rounding of
    the strict-f32 path since conv accumulation and all norm statistics
    remain f32 (image_encoders.run_tower)."""
    def build(bf16):
        spec = ModelSpec(
            num_classes=4, in_channels=4, backbone="Res16UNetTest",
            branches=((0, BranchSpec(tower="resnet18_l1", out_channels=16,
                                     num_groups=2, remat_tower=False,
                                     tower_bf16=bf16)),),
        )
        return MultimodalSeg(spec)

    m16, m32 = build(True), build(False)
    v = m16.init(jax.random.PRNGKey(0), batch, train=False)
    o16 = m16.apply(v, batch, train=False)
    o32 = m32.apply(v, batch, train=False)
    n = batch["meta"]["num_valid"]
    a, b = np.asarray(o16["logits"][:n]), np.asarray(o32["logits"][:n])
    assert np.isfinite(a).all()
    # bf16 has ~3 decimal digits; logits are O(1)
    np.testing.assert_allclose(a, b, atol=0.15, rtol=0.1)
    # and the branch output is not degenerate
    assert np.abs(a).max() > 1e-3
