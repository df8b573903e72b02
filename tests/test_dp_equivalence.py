"""Prove the data-parallel step, don't just run it (VERDICT r2 #4).

Exactness argument: with masked sync-BN, per-device statistics are psum'd
raw sums, so N devices on N distinct batches normalize exactly like ONE
device on the concatenated batch; with equal per-sample valid counts, the
pmean of per-device mean losses equals the union-batch mean loss, and the
pmean'd grads equal the union grads.  The test builds N distinct real-model
batches with equal voxel counts, runs the shard_map DP step, and asserts the
updated parameters and loss match the single-device step on the union batch
to float32 reduction tolerance.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepviewagg_tpu.config.zoo import get_model_spec
from deepviewagg_tpu.data.collate import Bucket, Sample, collate, device_view
from deepviewagg_tpu.models.segmentation import build_model
from deepviewagg_tpu.parallel.mesh import (data_parallel_step, make_mesh,
                                           replicate)
from deepviewagg_tpu.train.optimizers import make_optimizer, make_schedule
from deepviewagg_tpu.train.step import TrainState, make_train_step

N_DEV = 4
N_PTS = 180
NUM_CLASSES = 4


def _sample(seed: int) -> Sample:
    rng = np.random.default_rng(seed)
    # exactly N_PTS unique integer coords -> every sample has the same
    # level-0 valid count (required for pmean-of-means == union-mean)
    grid = rng.permutation(12 ** 3)[:N_PTS]
    coords = np.stack([grid // 144, (grid // 12) % 12, grid % 12],
                      1).astype(np.int32)
    return Sample(
        coords=coords,
        feats=rng.random((N_PTS, 4)).astype(np.float32),
        labels=rng.integers(0, NUM_CLASSES, N_PTS).astype(np.int32),
    )


@pytest.fixture(scope="module")
def setup():
    spec = get_model_spec("Res16UNetTest", NUM_CLASSES, in_channels=4)
    model = build_model(spec)
    samples = [_sample(7 + i) for i in range(N_DEV)]
    caps = [256, 256, 256, 256, 256]
    dev_bucket = Bucket(level_caps=caps, num_batches=1)
    union_bucket = Bucket(level_caps=[c * N_DEV for c in caps],
                          num_batches=N_DEV)
    dev_batches = [
        device_view(collate([s], dev_bucket, conv0_kernel=spec.stem_kernel))
        for s in samples
    ]
    union_batch = device_view(
        collate(samples, union_bucket, conv0_kernel=spec.stem_kernel)
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), dev_batches[0], train=False
    )
    return model, dev_batches, union_batch, variables


def _fresh_state(variables):
    tx = make_optimizer(make_schedule("constant", 0.05))
    return TrainState.create(variables, tx)


def test_dp_step_equals_union_single_device(setup):
    model, dev_batches, union_batch, variables = setup

    # single device on the union batch (no mesh, local BN == global BN)
    single = jax.jit(make_train_step(model, axis=None))
    s1, m1 = single(_fresh_state(variables), union_batch,
                    jax.random.PRNGKey(3))

    # N-device shard_map step on the distinct per-device batches
    mesh = make_mesh(jax.devices()[:N_DEV])
    run = data_parallel_step(
        make_train_step(model, axis="data"), mesh, donate_state=False
    )
    state0 = replicate(_fresh_state(variables), mesh)
    s2, m2 = run(state0, dev_batches, jax.random.PRNGKey(3))

    np.testing.assert_allclose(
        float(np.asarray(m2["loss"]).mean()), float(m1["loss"]),
        rtol=2e-5, atol=2e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(s1.params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(s2.params))
    assert len(flat1) == len(flat2)
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(flat2[path]), np.asarray(leaf), rtol=2e-5, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
    # BN running stats sync'd identically
    for path, leaf in jax.tree_util.tree_leaves_with_path(s1.batch_stats):
        got = dict(jax.tree_util.tree_leaves_with_path(s2.batch_stats))[path]
        np.testing.assert_allclose(np.asarray(got), np.asarray(leaf),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_dp_step_device_permutation_invariant(setup):
    """A broken all-reduce is order-sensitive; a working one is not."""
    model, dev_batches, _, variables = setup
    mesh = make_mesh(jax.devices()[:N_DEV])
    run = data_parallel_step(
        make_train_step(model, axis="data"), mesh, donate_state=False
    )
    state0 = replicate(_fresh_state(variables), mesh)
    _, m_a = run(state0, dev_batches, jax.random.PRNGKey(3))
    state0 = replicate(_fresh_state(variables), mesh)
    _, m_b = run(state0, dev_batches[1:] + dev_batches[:1],
                 jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(np.asarray(m_a["loss"]).mean()),
                               float(np.asarray(m_b["loss"]).mean()),
                               rtol=1e-6)
    # and the data actually matters: replicating one batch changes the loss
    state0 = replicate(_fresh_state(variables), mesh)
    _, m_c = run(state0, [dev_batches[0]] * N_DEV, jax.random.PRNGKey(3))
    assert abs(float(np.asarray(m_c["loss"]).mean())
               - float(np.asarray(m_a["loss"]).mean())) > 1e-6
