"""PVCNN family: voxelize/devoxelize + dense 3D conv forward/backward."""

import jax
import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.nn.pvcnn import PVCNNSeg, normalize_to_grid
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def test_pvcnn_forward_backward(rng):
    n, b = 900, 2
    pos = rng.uniform(0, 3, (n, 3)).astype(np.float32)
    batch_idx = (np.arange(n) >= n // 2).astype(np.int32)
    valid = np.ones(n, bool)
    valid[-40:] = False
    feats = rng.normal(size=(n, 4)).astype(np.float32)

    res = (16, 12)
    base_r = 16
    gc, _ = normalize_to_grid(pos, batch_idx, valid, base_r, b)
    batch = {
        "feats": jnp.asarray(feats), "valid": jnp.asarray(valid),
        "pv_grid_coords": jnp.asarray(gc),
        "pv_batch_idx": jnp.asarray(batch_idx),
        "pv_resolution": base_r,
    }
    for r in res:
        _, key = normalize_to_grid(pos, batch_idx, valid, r, b)
        batch[f"pv_key_r{r}"] = jnp.asarray(key)

    model = PVCNNSeg(num_classes=5, channels=(8, 16), resolutions=res,
                     num_batches=b)
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
