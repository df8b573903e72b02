"""Res16UNet forward/backward on a synthetic voxel batch.

Validates the gather-GEMM sparse UNet end to end: shapes, padding invariance
(growing the static capacity must not change valid-row outputs — the masked
BN + dump-row contract), and gradient flow.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.nn.res16unet import Res16UNet
from deepviewagg_tpu.ops import sparse_graph, voxel
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def _toy_batch(rng, n=600, batches=2):
    pos = rng.uniform(0, 4.0, (n, 3)).astype(np.float32)
    batch = rng.integers(0, batches, n).astype(np.int32)
    g = voxel.grid_sample(pos, 0.25, batch=batch)
    return g["coords"]


def _build(coords, caps=None):
    g = sparse_graph.build_unet_graph(
        coords, num_levels=5, num_batches=2, conv0_kernel=3,
        capacities=caps, cap_multiple=64,
    )
    return g, sparse_graph.graph_to_device(g)


def test_unet_forward_backward(rng):
    coords = _toy_batch(rng)
    g, dev = _build(coords)
    n0 = g.levels[0].num_valid
    model = Res16UNet(layers=(1,) * 8, planes=(8, 8, 16, 16, 16, 8, 8, 8))
    feats = jnp.asarray(rng.normal(size=(len(dev["levels"][0]["valid"]), 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats, dev, train=False)
    out, updates = model.apply(
        variables, feats, dev, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (feats.shape[0], 8)
    assert np.isfinite(np.asarray(out[:n0])).all()
    assert "batch_stats" in updates

    def loss_fn(params):
        y = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, dev, train=False,
        )
        return jnp.sum(y[:n0] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_unet_padding_invariance(rng):
    """Same valid voxels, bigger static capacities => identical outputs."""
    coords = _toy_batch(rng, n=300)
    g1, dev1 = _build(coords)
    caps = [len(l.valid) + 128 for l in g1.levels]
    g2, dev2 = _build(coords, caps=caps)
    for l1, l2 in zip(g1.levels, g2.levels):
        assert l1.num_valid == l2.num_valid

    model = Res16UNet(layers=(1,) * 8, planes=(8, 8, 8, 8, 8, 8, 8, 8))
    f1 = jnp.asarray(rng.normal(size=(len(dev1["levels"][0]["valid"]), 3)), jnp.float32)
    f2 = jnp.zeros((len(dev2["levels"][0]["valid"]), 3), jnp.float32)
    f2 = f2.at[: f1.shape[0]].set(f1)
    variables = model.init(jax.random.PRNGKey(0), f1, dev1, train=False)
    o1 = model.apply(variables, f1, dev1, train=True, mutable=["batch_stats"])[0]
    o2 = model.apply(variables, f2, dev2, train=True, mutable=["batch_stats"])[0]
    n0 = g1.levels[0].num_valid
    np.testing.assert_allclose(
        np.asarray(o1[:n0]), np.asarray(o2[:n0]), rtol=2e-2, atol=2e-2
    )


def test_preset_param_count():
    """Res16UNet34 should land in the reference's ~28M-param ballpark
    (conf/models/segmentation/multimodal/sparseconv3d.yaml cost comment:
    28.1M with the 2D tower; 3D-only is ~21M).  eval_shape only — no
    compute."""
    model = Res16UNet.preset("Res16UNet34")
    coords = np.array([[0, x, y, 0] for x in range(6) for y in range(6)], np.int32)
    g = sparse_graph.build_unet_graph(
        coords, num_levels=5, num_batches=1, conv0_kernel=5, cap_multiple=64
    )
    dev = sparse_graph.graph_to_device(g)
    feats = jnp.ones((len(dev["levels"][0]["valid"]), 4), jnp.float32)
    shapes = jax.eval_shape(
        lambda f: model.init(jax.random.PRNGKey(0), f, dev, train=False), feats
    )
    n_params = sum(
        np.prod(x.shape) for x in jax.tree_util.tree_leaves(shapes["params"])
    )
    assert 15e6 < n_params < 45e6, n_params


def test_se_blocks_forward_backward(rng):
    # SE family (SEBasicBlock/SELayer, MinkowskiEngine modules.py:276-321):
    # per-sample squeeze-excitation must run and carry gradients
    from tests.test_res16unet import _toy_batch, _build  # self-import safe

    coords = _toy_batch(rng, n=400)
    g, dev = _build(coords)
    n0 = g.levels[0].num_valid
    model = Res16UNet(layers=(1,) * 8, planes=(8, 8, 16, 16, 16, 8, 8, 8),
                      block="se_basic", init_dim=8)
    feats = jnp.asarray(rng.normal(size=(len(dev["levels"][0]["valid"]), 3)),
                        jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats, dev, train=False)
    # SE layers present in params
    names = str(jax.tree_util.tree_structure(variables["params"]))
    assert "SqueezeExcite" in names

    def loss_fn(params):
        y = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, dev, train=False,
        )
        return jnp.sum(y[:n0] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_new_presets_resolve():
    from deepviewagg_tpu.nn.res16unet import RES16_PRESETS

    for name in ["Res16UNet50", "Res16UNet101", "Res16UNet14A", "Res16UNet18B",
                 "Res16UNet32B", "SERes16UNet34", "Res16UNet34Full"]:
        layers, planes, block = RES16_PRESETS[name]
        assert len(layers) == 8 and len(planes) == 8
        m = Res16UNet.preset(name)
        assert m.block == block
