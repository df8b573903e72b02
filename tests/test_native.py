"""Native C++ voxel hashing vs the numpy reference implementation."""

import numpy as np
import pytest

from deepviewagg_tpu import native
from deepviewagg_tpu.ops import kernel_map, voxel


pytestmark = pytest.mark.skipif(
    native.lib is None, reason="native extension unavailable"
)


def _coords(rng, n=5000, batches=3, span=60):
    c = np.zeros((n, 4), np.int32)
    c[:, 0] = rng.integers(0, batches, n)
    c[:, 1:] = rng.integers(-span, span, (n, 3))
    return c


def test_unique_inverse_matches_numpy(rng):
    c = _coords(rng)
    u_n, inv_n = native.lib.unique_inverse(c)
    key = voxel.ravel_coords(c)
    uniq_key, inv_ref = np.unique(key, return_inverse=True)
    assert np.array_equal(inv_n, inv_ref.astype(np.int32))
    assert np.array_equal(voxel.ravel_coords(u_n), uniq_key)
    assert np.array_equal(u_n[inv_n], c)


def test_query_matches_numpy(rng):
    c = _coords(rng)
    u, _ = voxel.unique_coords(c)
    q = _coords(rng, n=2000)
    got = native.lib.query_coords(u, q)
    # numpy fallback path
    table_key = voxel.ravel_coords(u)
    order = np.argsort(table_key)
    sk = table_key[order]
    qk = voxel.ravel_coords(q)
    pos = np.clip(np.searchsorted(sk, qk), 0, len(sk) - 1)
    ref = np.where(sk[pos] == qk, order[pos], -1).astype(np.int32)
    assert np.array_equal(got, ref)


def test_kernel_map_native_vs_numpy(rng):
    c = _coords(rng, n=3000)
    u, _ = voxel.unique_coords(c)
    down, _ = voxel.downsample_coords(u, 2)
    offsets = kernel_map.kernel_offsets(3)
    nbr_native = native.lib.build_kernel_map(u, down, offsets, 1)
    # numpy path
    n_in = len(u)
    nbr_np = np.full((len(offsets), len(down)), n_in, np.int32)
    for k, off in enumerate(offsets):
        q = down.copy()
        q[:, 1:] += off
        table_key = voxel.ravel_coords(u)
        order = np.argsort(table_key)
        sk = table_key[order]
        qk = voxel.ravel_coords(q)
        pos = np.clip(np.searchsorted(sk, qk), 0, len(sk) - 1)
        hit = np.where(sk[pos] == qk, order[pos], -1)
        nbr_np[k] = np.where(hit >= 0, hit, n_in)
    assert np.array_equal(nbr_native, nbr_np)
