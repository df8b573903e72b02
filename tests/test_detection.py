"""VoteNet detection: forward, loss, and votes moving toward box centers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepviewagg_tpu.data import synthetic
from deepviewagg_tpu.models.detection import VoteNetDet, votenet_loss
from deepviewagg_tpu.nn.pointnet2 import build_pointnet_graph
from deepviewagg_tpu.ops import spatial as sp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def _detection_batch(rng):
    scene = synthetic.make_scene(seed=13, density=60.0, n_cameras=1,
                                 n_boxes=3, image_size=(32, 16))
    pos = scene.pos
    n = len(pos)
    batch_idx = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    feats = np.concatenate([scene.rgb, np.ones((n, 1), np.float32)], 1)
    graph = build_pointnet_graph(pos, batch_idx, valid,
                                 n_points=(512, 128), radii=(0.4, 0.8), k=16)
    # seed-anchored proposal clusters (host-side, like every index table)
    seed_pos = graph["pos"][-1]
    centers = np.asarray(sp.farthest_point_sample(seed_pos, 32))
    group, counts = sp.ball_query(seed_pos[centers], seed_pos, 1.2, 16)
    clusters = {
        "centers": centers.astype(np.int32), "group": group,
        "group_count": counts, "center_valid": np.ones(32, bool),
    }
    return {
        "pn_graph": graph, "feats": jnp.asarray(feats),
        "valid": jnp.asarray(valid), "det_clusters": clusters,
    }, scene


def test_votenet_forward_and_loss(rng):
    batch, scene = _detection_batch(rng)
    model = VoteNetDet(num_classes=2, sa_channels=((16, 32), (32, 64)))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out["center"].shape == (32, 3)
    assert out["size"].shape == (32, 3) and (np.asarray(out["size"]) > 0).all()
    total, parts = votenet_loss(out, scene.boxes)
    assert np.isfinite(float(total))

    # a few steps of SGD shrink the vote loss (votes move toward centers)
    tx = optax.adam(3e-3)
    st = tx.init(variables["params"])
    params = variables["params"]

    @jax.jit
    def step(params, st):
        def loss_fn(p):
            o = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                batch, train=False,
            )
            return votenet_loss(o, scene.boxes)[0]
        l, g = jax.value_and_grad(loss_fn)(params)
        upd, st2 = tx.update(g, st)
        return optax.apply_updates(params, upd), st2, l

    losses = []
    for _ in range(12):
        params, st, l = step(params, st)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
