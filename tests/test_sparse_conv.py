"""Sparse conv correctness vs a dense 3D convolution oracle."""

import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.ops import kernel_map as km
from deepviewagg_tpu.ops import sparse_conv as sc
from deepviewagg_tpu.ops import sparse_graph as sg
from deepviewagg_tpu.ops import voxel


def _dense_conv_oracle(grid_feats, weights, offsets, out_coords, stride=1):
    """out[o] = sum_k W[k] @ in[o + offsets[k]*stride] over occupied cells."""
    out = []
    for oc in out_coords:
        acc = np.zeros(weights.shape[2])
        for k, off in enumerate(offsets):
            key = (oc[0], oc[1] + off[0] * stride, oc[2] + off[1] * stride,
                   oc[3] + off[2] * stride)
            if key in grid_feats:
                acc = acc + grid_feats[key] @ weights[k]
        out.append(acc)
    return np.array(out)


def test_submanifold_conv_matches_dense(rng):
    n, cin, cout, ks = 40, 8, 16, 3
    coords = np.unique(
        np.c_[np.zeros(n, np.int32), rng.integers(0, 4, (n, 3))], axis=0
    ).astype(np.int32)
    n = len(coords)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    w = rng.normal(size=(ks**3, cin, cout)).astype(np.float32) * 0.1

    m = km.build_kernel_map(coords, coords, kernel_size=ks)
    out = sc.sparse_conv(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(m.nbr),
        compute_dtype=jnp.float32,
    )
    grid = {tuple(c): f for c, f in zip(coords, feats)}
    want = _dense_conv_oracle(grid, w, km.kernel_offsets(ks), coords)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)


def test_strided_conv_matches_dense(rng):
    n, cin, cout = 30, 4, 8
    coords = np.unique(
        np.c_[np.zeros(n, np.int32), rng.integers(0, 6, (n, 3))], axis=0
    ).astype(np.int32)
    n = len(coords)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.1

    out_coords, parent = voxel.downsample_coords(coords, 2)
    m = km.build_kernel_map(coords, out_coords, kernel_size=2, stride=1)
    out = sc.sparse_conv(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(m.nbr),
        compute_dtype=jnp.float32,
    )
    grid = {tuple(c): f for c, f in zip(coords, feats)}
    want = _dense_conv_oracle(grid, w, km.kernel_offsets(2), out_coords)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)
    assert parent.max() < len(out_coords)


def test_transpose_conv_matches_dense(rng):
    """Up conv: transpose map applied to coarse feats reproduces
    sum over coarse voxels j of W[k] @ coarse[j] for fine voxels reached
    through offset k."""
    n, cc, cf = 30, 6, 5
    coords = np.unique(
        np.c_[np.zeros(n, np.int32), rng.integers(0, 6, (n, 3))], axis=0
    ).astype(np.int32)
    out_coords, _ = voxel.downsample_coords(coords, 2)
    down = km.build_kernel_map(coords, out_coords, kernel_size=2, stride=1)
    up = down.transpose()
    assert up.n_in == down.n_out and up.n_out == down.n_in

    coarse = rng.normal(size=(len(out_coords), cc)).astype(np.float32)
    w = rng.normal(size=(8, cc, cf)).astype(np.float32) * 0.1
    out = np.asarray(
        sc.sparse_conv(
            jnp.asarray(coarse), jnp.asarray(w), jnp.asarray(up.nbr),
            compute_dtype=jnp.float32,
        )
    )
    # oracle: fine voxel i receives W[k] @ coarse[j] iff down.nbr[k, j] == i
    want = np.zeros((len(coords), cf), np.float32)
    for k in range(8):
        for j in range(len(out_coords)):
            i = down.nbr[k, j]
            if i < len(coords):
                want[i] += coarse[j] @ w[k]
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4)


def test_unet_graph_builder(rng):
    n = 200
    coords = np.unique(
        np.c_[rng.integers(0, 2, n), rng.integers(0, 16, (n, 3))], axis=0
    ).astype(np.int32)
    g = sg.build_unet_graph(coords, num_levels=3, num_batches=2,
                            conv0_kernel=5, cap_multiple=64)
    assert g.num_levels == 3
    assert g.conv0_map.kernel_size == 5
    l0 = g.levels[0]
    assert l0.valid.sum() == len(coords)
    cap0 = len(l0.coords)
    cap1 = len(g.levels[1].coords)
    # parent indices point into the next level's capacity (pad allowed)
    assert l0.parent.max() <= cap1
    real_parents = l0.parent[l0.valid]
    assert (real_parents < g.levels[1].num_valid).all()
    # kernel maps never reference pad input rows other than the dump row
    sub = l0.sub_map
    hits = sub.nbr[sub.nbr != cap0]
    assert (hits < l0.num_valid).all()
    # pad output columns only reference the dump row
    assert (sub.nbr[:, l0.num_valid:] == cap0).all()


def test_strided_conv_via_graph_matches_dense(rng):
    n, cin, cout = 25, 4, 4
    coords = np.unique(
        np.c_[np.zeros(n, np.int32), rng.integers(0, 6, (n, 3))], axis=0
    ).astype(np.int32)
    g = sg.build_unet_graph(coords, num_levels=2, num_batches=1,
                            conv0_kernel=3, cap_multiple=32)
    l0 = g.levels[0]
    n0, cap0 = l0.num_valid, len(l0.coords)
    feats = np.zeros((cap0, cin), np.float32)
    feats[:n0] = rng.normal(size=(n0, cin)).astype(np.float32)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.1
    out = sc.sparse_conv(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(l0.down_map.nbr),
        compute_dtype=jnp.float32,
    )
    out_coords, _ = voxel.downsample_coords(coords, 2)
    grid = {tuple(c): f for c, f in zip(coords, feats[:n0])}
    want = _dense_conv_oracle(grid, w, km.kernel_offsets(2), out_coords)
    np.testing.assert_allclose(
        np.asarray(out)[: len(out_coords)], want, rtol=2e-4, atol=2e-4
    )
    # padded output rows are exactly zero
    assert np.abs(np.asarray(out)[len(out_coords):]).max() == 0
