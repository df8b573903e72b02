"""Gather-only backward for submanifold sparse conv: exact VJP equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.ops.kernel_map import build_kernel_map
from deepviewagg_tpu.ops.sparse_conv import sparse_conv, sparse_conv_submanifold
from deepviewagg_tpu.ops import voxel


def _subm_map(rng, n=500, ks=3):
    c = np.zeros((n, 4), np.int32)
    c[:, 1:] = rng.integers(0, 14, (n, 3))
    u, _ = voxel.unique_coords(c)
    m = build_kernel_map(u, u, kernel_size=ks, stride=1)
    # pad-free: nbr pad value already == len(u)
    return u, jnp.asarray(m.nbr)


def test_submanifold_vjp_matches_default(rng):
    for ks in (3, 5):
        u, nbr = _subm_map(rng, ks=ks)
        n = len(u)
        feats = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(nbr.shape[0], 8, 16)) * 0.1,
                        jnp.float32)
        cot = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)

        def f_ref(f, w):
            return jnp.vdot(sparse_conv(f, w, nbr,
                                        compute_dtype=jnp.float32), cot)

        def f_new(f, w):
            return jnp.vdot(
                sparse_conv_submanifold(f, w, nbr, jnp.float32), cot
            )

        o_ref = float(f_ref(feats, w))
        o_new = float(f_new(feats, w))
        assert abs(o_ref - o_new) < 1e-2 * max(abs(o_ref), 1)

        g_ref = jax.grad(f_ref, argnums=(0, 1))(feats, w)
        g_new = jax.grad(f_new, argnums=(0, 1))(feats, w)
        for a, b in zip(g_ref, g_new):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
