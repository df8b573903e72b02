"""Gather-only backward for strided convs via the precomputed transpose."""

import jax
import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.ops.kernel_map import build_kernel_map
from deepviewagg_tpu.ops.sparse_conv import sparse_conv, sparse_conv_pair
from deepviewagg_tpu.ops import voxel


def test_pair_vjp_matches_default(rng):
    c = np.zeros((600, 4), np.int32)
    c[:, 1:] = rng.integers(0, 16, (600, 3))
    u, _ = voxel.unique_coords(c)
    down, _ = voxel.downsample_coords(u, 2)
    m = build_kernel_map(u, down, kernel_size=2, stride=1)
    m_t = m.transpose()
    nbr = jnp.asarray(m.nbr)
    nbr_t = jnp.asarray(m_t.nbr)
    n_in, n_out = len(u), len(down)
    feats = jnp.asarray(rng.normal(size=(n_in, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(nbr.shape[0], 8, 16)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(n_out, 16)), jnp.float32)

    def f_ref(f, w):
        return jnp.vdot(sparse_conv(f, w, nbr, compute_dtype=jnp.float32), cot)

    def f_new(f, w):
        return jnp.vdot(sparse_conv_pair(f, w, nbr, nbr_t, jnp.float32), cot)

    assert abs(float(f_ref(feats, w)) - float(f_new(feats, w))) < 1e-2
    g_ref = jax.grad(f_ref, argnums=(0, 1))(feats, w)
    g_new = jax.grad(f_new, argnums=(0, 1))(feats, w)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
