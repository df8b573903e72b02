"""RSConv family: forward/backward on the pointnet graph."""

import jax
import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.nn.pointnet2 import build_pointnet_graph
from deepviewagg_tpu.nn.rsconv import RSConvSeg
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def test_rsconv_forward_backward(rng):
    n = 800
    pos = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    batch_idx = (np.arange(n) >= n // 2).astype(np.int32)
    valid = np.ones(n, bool)
    feats = rng.normal(size=(n, 4)).astype(np.float32)
    graph = build_pointnet_graph(
        pos, batch_idx, valid, n_points=(200, 50), radii=(0.25, 0.5), k=16
    )
    batch = {"pn_graph": graph, "feats": jnp.asarray(feats),
             "valid": jnp.asarray(valid)}
    model = RSConvSeg(num_classes=5, channels=(16, 32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out["logits"].shape == (n, 5)
    assert np.isfinite(np.asarray(out["logits"])).all()

    labels = jnp.asarray(rng.integers(0, 5, n))

    def loss(params):
        o = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=False,
        )
        lp = jax.nn.log_softmax(o["logits"])
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], 1))

    g = jax.grad(loss)(variables["params"])
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gmax) and gmax > 0
