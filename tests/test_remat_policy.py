"""remat='convs' policy: save conv outputs, recompute only the norm/relu
tail (image_encoders.run_tower).  The policy must be a pure memory/compute
trade — at f32 operand precision the forward value AND gradients are
bit-identical to remat=False and remat=True (bf16 differs only by
reassociation noise, the `f32_convs` class of noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from deepviewagg_tpu.modules.image_encoders import (ResNet18, f32_convs,
                                                    run_tower)


@pytest.fixture(scope="module")
def tower_grads():
    im = jnp.asarray(
        np.random.default_rng(0).random((2, 32, 16, 3)), jnp.float32)
    outs = {}
    for remat in (False, True, "convs"):
        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                return run_tower(
                    ResNet18(out_level=2, width=8, name="t"), x, True,
                    remat=remat, bf16=False).sum()

        m = M()
        with f32_convs():
            params = m.init(jax.random.PRNGKey(0), im)
            v, (gp, gx) = jax.jit(jax.value_and_grad(
                lambda p, x: m.apply(p, x), argnums=(0, 1)))(params, im)
        outs[remat] = (np.asarray(v),
                       jax.tree_util.tree_map(np.asarray, gp),
                       np.asarray(gx))
    return outs


@pytest.mark.parametrize("mode", [True, "convs"])
def test_remat_mode_is_exact_at_f32(tower_grads, mode):
    v0, gp0, gx0 = tower_grads[False]
    v1, gp1, gx1 = tower_grads[mode]
    assert v1 == v0
    np.testing.assert_array_equal(gx1, gx0)
    for a, b in zip(jax.tree_util.tree_leaves(gp0),
                    jax.tree_util.tree_leaves(gp1)):
        np.testing.assert_array_equal(a, b)


def test_convs_policy_with_plain_callable():
    """The microbench path: run_tower over a bound-params callable uses
    jax.checkpoint directly (no flax lifting)."""
    im = jnp.asarray(
        np.random.default_rng(1).random((1, 16, 8, 3)), jnp.float32)
    tower = ResNet18(out_level=1, width=8)
    with f32_convs():
        p = tower.init(jax.random.PRNGKey(0), im, True)

        def loss(x, remat):
            return run_tower(lambda y, t: tower.apply(p, y, t), x, True,
                             remat=remat, bf16=False).sum()

        g0 = jax.grad(lambda x: loss(x, False))(im)
        g1 = jax.grad(lambda x: loss(x, "convs"))(im)
    # un-jitted: the two paths compile separately, so f32 fusion-order noise
    # (~1e-6) is expected; the jitted module path above is bit-exact
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)
