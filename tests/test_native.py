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


def test_knn_grid_exact_vs_brute_force():
    """Native grid-cell kNN (kernelmap.cpp knn_grid) returns the same
    neighbor sets as the blocked brute force — the preprocessing KDTree/FAISS
    role (ref features.py:360) at O(N * candidates)."""
    import numpy as np

    from deepviewagg_tpu.native import lib
    from deepviewagg_tpu.ops.knn import knn, knn_grid

    if lib is None or not hasattr(lib, "knn_grid"):
        import pytest

        pytest.skip("native extension unavailable")
    rng = np.random.default_rng(0)
    pos = rng.random((20000, 3)).astype(np.float32) * 10
    d2g, ig = knn_grid(pos, pos, 30)
    q = pos[:400]
    d2b, ib = knn(q, pos, 30)
    # expanded-form brute distances differ from direct-form by f32 rounding
    np.testing.assert_allclose(np.sort(d2g[:400], axis=1),
                               np.sort(np.asarray(d2b), axis=1),
                               rtol=1e-3, atol=2e-4)
    agree = (np.sort(ig[:400], axis=1) == np.sort(np.asarray(ib), axis=1))
    assert agree.mean() > 0.999   # ties at equal distance may swap ids
    # self is always the first neighbor at distance 0
    np.testing.assert_array_equal(ig[:, 0], np.arange(len(pos)))

    # clustered + duplicate points: exact duplicates and near-coincident
    # clusters must not break ring termination or padding
    pts = np.concatenate([
        np.zeros((5, 3), np.float32),
        rng.normal(0, 0.01, (100, 3)).astype(np.float32),
        pos[:200],
    ])
    d2, i = knn_grid(pts, pts, 8)
    assert np.isfinite(d2).all() and (i >= 0).all() and (i < len(pts)).all()
    assert (np.diff(d2, axis=1) >= -1e-6).all()   # ascending

    # tiny cloud smaller than k: pads by repeating the nearest hit
    few = pos[:4]
    d2s, isx = knn_grid(few, few, 8)
    assert isx.shape == (4, 8)
    assert (isx < 4).all()
