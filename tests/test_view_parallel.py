"""View parallelism: shard the image axis over a model mesh axis.

Equivalence argument (parallel/mesh.py hybrid_parallel_step): after the
tower all_gather everything downstream is replicated across the model axis,
and the all_gather's AD transpose hands each model shard m× its image
block's tower-grad contribution, so a uniform pmean over (data, model)
yields exactly the DP-only gradients.  The test runs the same two distinct
multimodal batches through (a) the 2-device data-parallel step and (b) the
2×2 hybrid step, and asserts losses, updated params, and BN stats agree to
float32 reduction tolerance.
"""

import dataclasses

import numpy as np
import pytest

import jax

from deepviewagg_tpu.data.collate import collate
from deepviewagg_tpu.data.toy import flagship_spec, toy_batch, toy_samples
from deepviewagg_tpu.models.segmentation import MultimodalSeg
from deepviewagg_tpu.parallel.mesh import (
    data_parallel_step, hybrid_parallel_step, make_hybrid_mesh, make_mesh,
    replicate,
)
from deepviewagg_tpu.train.optimizers import make_optimizer, make_schedule
from deepviewagg_tpu.train.step import TrainState, make_train_step

N_DATA = 2
N_MODEL = 2


@pytest.fixture(scope="module")
def setup():
    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)
    # strict-f32 tower buffers: the equivalence proof is exact math; bf16
    # inter-layer rounding noise is covered by test_tower_bf16_matches_f32
    spec = dataclasses.replace(spec, branches=tuple(
        (lvl, dataclasses.replace(b, tower_bf16=False))
        for lvl, b in spec.branches))
    # 3 cameras: odd image count exercises the ceil-block zero-padding in
    # run_tower's sharded path
    kw = dict(n_samples=1, density=25.0, image_size=(64, 32), n_cameras=3)
    batch, bucket, _ = toy_batch(**kw, headroom=1.6)
    batches = [batch]
    for i in range(1, N_DATA):
        samples = toy_samples(kw["n_samples"], kw["density"],
                              kw["image_size"], kw["n_cameras"], seed=100 + i)
        batches.append(collate(samples, bucket, branch_levels=(0,)))
    batches = [{k: v for k, v in b.items() if k != "meta"} for b in batches]
    model = MultimodalSeg(spec)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batches[0], train=False
    )
    return model, batches, variables


def _fresh_state(variables):
    tx = make_optimizer(make_schedule("constant", 0.05))
    return TrainState.create(variables, tx)


def _tree_allclose(a, b, rtol, atol):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_b[path]), np.asarray(leaf), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_view_sharded_grads_match_unsharded(setup):
    """The semantic core: train-mode loss gradients with the tower sharded
    over a 2-device model axis (all_gather + its reduce-scatter transpose +
    pmean) match the single-device gradients leaf-for-leaf.  Per-leaf
    tolerance 1e-6 + 1e-4·|g|∞ — a broken collective (double-counted or
    dropped tower grads) errs at the 1e-1 relative scale."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from deepviewagg_tpu.models.losses import segmentation_loss
    from deepviewagg_tpu.modules.image_encoders import (f32_convs,
                                                        view_shard_axis)

    model, batches, variables = setup
    batch = batches[0]
    valid = jnp.asarray(batch["graph"]["levels"][0]["valid"])
    rng = jax.random.PRNGKey(3)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return segmentation_loss(out["logits"], jnp.asarray(batch["labels"]),
                                 valid, 0.0, None)

    with f32_convs():
        g_ref = jax.jit(jax.grad(loss_fn))(variables["params"])

    mesh = make_mesh(jax.devices()[:N_MODEL], axis="model")

    def sharded_grad(params):
        with view_shard_axis("model"):
            g = jax.grad(loss_fn)(params)
        return jax.lax.pmean(g, "model")

    with f32_convs():
        g_sh = jax.jit(jax.shard_map(
            sharded_grad, mesh=mesh, in_specs=(P(),), out_specs=P(),
            check_vma=False,
        ))(variables["params"])

    sh_flat = dict(jax.tree_util.tree_leaves_with_path(g_sh))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_ref):
        ref, got = np.asarray(leaf), np.asarray(sh_flat[path])
        tol = 1e-6 + 1e-4 * max(float(np.abs(ref).max()), 1e-12)
        assert float(np.abs(got - ref).max()) <= tol, \
            f"{jax.tree_util.keystr(path)}: {np.abs(got - ref).max()} > {tol}"


@pytest.mark.slow
def test_hybrid_step_equals_data_parallel(setup):
    """Integration: the full hybrid (data × model) train step agrees with
    the plain DP wrapper.  These are DIFFERENT XLA programs (the hybrid adds
    model-axis psums everywhere), whose fusion reorders f32 reductions;
    measured on a size-1 model axis — where the math is identical — that
    reordering alone already moves one-step params by ~1e-3, so the bound
    here is the fusion-noise scale; a broken collective errs at 1e-1+.
    The exact-semantics proof is test_view_sharded_grads_match_unsharded."""
    model, batches, variables = setup
    devices = jax.devices()
    assert len(devices) >= N_DATA * N_MODEL

    from deepviewagg_tpu.modules.image_encoders import f32_convs

    dp_mesh = make_mesh(devices[:N_DATA])
    dp_run = data_parallel_step(
        make_train_step(model, axis="data"), dp_mesh, donate_state=False
    )
    hy_mesh = make_hybrid_mesh(devices[:N_DATA * N_MODEL], n_model=N_MODEL)
    hy_run = hybrid_parallel_step(
        make_train_step(model, axis=("data", "model")), hy_mesh,
        donate_state=False,
    )
    with f32_convs():   # consulted at trace time (first call)
        s_dp, m_dp = dp_run(replicate(_fresh_state(variables), dp_mesh),
                            batches, jax.random.PRNGKey(3))
        s_hy, m_hy = hy_run(replicate(_fresh_state(variables), hy_mesh),
                            batches, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(np.asarray(m_hy["loss"]).mean()),
                               float(np.asarray(m_dp["loss"]).mean()),
                               rtol=1e-3, atol=1e-3)
    assert np.asarray(m_hy["preds"]).shape == np.asarray(m_dp["preds"]).shape
    _tree_allclose(s_dp.params, s_hy.params, rtol=5e-2, atol=2e-3)
    _tree_allclose(s_dp.batch_stats, s_hy.batch_stats, rtol=5e-2, atol=2e-3)


def test_view_shard_axis_forward_identical(setup):
    """Pure forward: the sharded tower + all_gather reproduces the unsharded
    logits (per-image conv/GroupNorm math is independent of the batch
    split)."""
    from jax.sharding import PartitionSpec as P

    from deepviewagg_tpu.modules.image_encoders import (f32_convs,
                                                        view_shard_axis)

    model, batches, variables = setup
    batch = batches[0]
    with f32_convs():   # jitted, so fusion decisions match the sharded run
        ref = np.asarray(jax.jit(
            lambda v, b: model.apply(v, b, train=False)["logits"]
        )(variables, batch))

    mesh = make_mesh(jax.devices()[:N_MODEL], axis="model")

    def fwd(variables, batch):
        with view_shard_axis("model"):
            return model.apply(variables, batch, train=False)["logits"]

    with f32_convs():
        got = jax.jit(jax.shard_map(
            fwd, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
            check_vma=False,
        ))(variables, batch)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_shared_trunk_taps_shard_identically():
    """ConvDown2D trunks return a TUPLE of taps; run_tower's sharded path
    all_gathers each leaf — sharded == unsharded per tap (f32)."""
    from jax.sharding import PartitionSpec as P

    import jax.numpy as jnp
    from flax import linen as nn

    from deepviewagg_tpu.modules.image_encoders import (ConvDown2D, f32_convs,
                                                        run_tower,
                                                        view_shard_axis)

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, images, train=False):
            trunk = ConvDown2D(widths=(8, 16), blocks=(1, 1), strides=(1, 2),
                               name="trunk")
            return run_tower(trunk, images, train, bf16=False)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((3, 32, 16, 3)).astype(np.float32))
    m = Wrap()
    v = m.init(jax.random.PRNGKey(0), images)
    with f32_convs():
        ref = jax.jit(lambda v: m.apply(v, images))(v)

    mesh = make_mesh(jax.devices()[:2], axis="model")

    def fwd(v):
        with view_shard_axis("model"):
            return m.apply(v, images)

    with f32_convs():
        got = jax.jit(jax.shard_map(
            fwd, mesh=mesh, in_specs=(P(),), out_specs=P(), check_vma=False,
        ))(v)
    assert len(got) == len(ref) == 2
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)
