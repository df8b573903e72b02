"""Determinism by construction: identical results across repeated runs.

The reference papers over a GPU nondeterminism hazard at runtime
(torchsparse sphashquery -1 fallback, SURVEY.md §A.10.2); the TPU design
must be deterministic end to end — z-buffer tie-breaks, kernel maps, train
steps.
"""

import jax
import numpy as np

from deepviewagg_tpu.core.visibility import splat_zbuffer
from deepviewagg_tpu.data import synthetic
from deepviewagg_tpu.data.toy import flagship_spec, toy_batch
from deepviewagg_tpu.models.segmentation import MultimodalSeg
from deepviewagg_tpu.train.optimizers import make_optimizer, make_schedule
from deepviewagg_tpu.train.step import TrainState, make_train_step
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def test_zbuffer_deterministic():
    scene = synthetic.make_scene(seed=5, density=60.0, n_cameras=1,
                                 image_size=(64, 32))
    cam = scene.cameras[0]
    a = np.asarray(splat_zbuffer(cam, scene.pos, voxel=0.1)[0])
    b = np.asarray(splat_zbuffer(cam, scene.pos, voxel=0.1)[0])
    np.testing.assert_array_equal(a, b)


def test_kernel_maps_deterministic(rng):
    from deepviewagg_tpu.ops import sparse_graph, voxel

    c = np.zeros((3000, 4), np.int32)
    c[:, 0] = rng.integers(0, 2, 3000)
    c[:, 1:] = rng.integers(0, 40, (3000, 3))
    u, _ = voxel.unique_coords(c)
    g1 = sparse_graph.build_unet_graph(u, 3, 2, conv0_kernel=3)
    g2 = sparse_graph.build_unet_graph(u, 3, 2, conv0_kernel=3)
    for l1, l2 in zip(g1.levels, g2.levels):
        np.testing.assert_array_equal(l1.sub_map.nbr, l2.sub_map.nbr)


def test_train_step_deterministic():
    batch, _, _ = toy_batch(n_samples=1, density=25.0, image_size=(64, 32),
                            n_cameras=1)
    batch = {k: v for k, v in batch.items() if k != "meta"}
    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)
    model = MultimodalSeg(spec)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )
    tx = make_optimizer(make_schedule("constant", 0.01))
    step = jax.jit(make_train_step(model))

    losses = []
    for _ in range(2):
        state = TrainState.create(variables, tx)
        state, m1 = step(state, batch, jax.random.PRNGKey(7))
        state, m2 = step(state, batch, jax.random.PRNGKey(8))
        losses.append((float(m1["loss"]), float(m2["loss"])))
    assert losses[0] == losses[1]
