"""Registration: Kabsch recovery, mutual NN, contrastive descriptors."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from deepviewagg_tpu.models.registration import (
    RegistrationNet, hardest_contrastive, kabsch, mutual_nearest,
)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def _random_rt(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.normal(size=3)
    return q.astype(np.float32), t.astype(np.float32)


def test_kabsch_recovers_rigid_transform(rng):
    src = rng.normal(size=(200, 3)).astype(np.float32)
    r_gt, t_gt = _random_rt(rng)
    dst = src @ r_gt.T + t_gt
    r, t = kabsch(src, dst)
    np.testing.assert_allclose(np.asarray(r), r_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-4)
    # weighted: outliers with zero weight don't perturb the solve
    dst2 = dst.copy()
    dst2[:20] += 5.0
    w = np.ones(200, np.float32)
    w[:20] = 0.0
    r2, t2 = kabsch(src, dst2, w)
    np.testing.assert_allclose(np.asarray(r2), r_gt, atol=1e-4)


def test_mutual_nearest(rng):
    d = rng.normal(size=(50, 16)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    perm = rng.permutation(50)
    idx_a, ab, mutual = mutual_nearest(jnp.asarray(d), jnp.asarray(d[perm]))
    assert bool(mutual.all())
    np.testing.assert_array_equal(perm[np.asarray(ab)], np.arange(50))


def test_contrastive_descriptor_training(rng):
    """Descriptors of corresponding points converge under the loss."""
    import optax

    from deepviewagg_tpu.data.collate import Bucket, Sample, collate, device_view

    coords = np.unique(rng.integers(0, 16, (500, 3)).astype(np.int32), axis=0)
    n = len(coords)
    feats = rng.normal(size=(n, 4)).astype(np.float32)
    s = Sample(coords=coords, feats=feats, labels=np.zeros(n, np.int32))
    batch = device_view(collate(
        [s], Bucket(level_caps=[768, 512, 256, 128, 128], num_batches=1),
        conv0_kernel=3,
    ))
    model = RegistrationNet(descriptor_dim=16, backbone="Res16UNetTest")
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    pairs = jnp.stack([jnp.arange(64), jnp.arange(64)], axis=1)

    @jax.jit
    def loss_fn(params):
        d = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            batch, train=False,
        )
        return hardest_contrastive(d, d + 0.0, pairs)

    l0 = float(loss_fn(v["params"]))
    assert np.isfinite(l0)
    grad_fn = jax.jit(jax.grad(loss_fn))
    tx = optax.adam(3e-4)
    st = tx.init(v["params"])
    p = v["params"]
    losses = [l0]
    for _ in range(10):
        g = grad_fn(p)
        upd, st = tx.update(g, st)
        p = optax.apply_updates(p, upd)
        losses.append(float(loss_fn(p)))
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gmax) and gmax > 0
    assert min(losses) < l0 + 1e-6   # optimization makes progress
