"""Pointwise PCA geometric features: linearity / planarity / scattering / normals.

The TPU-side counterpart of the reference's ``PCAComputePointwise`` +
``EigenFeatures`` 3D pre-transforms (core/data_transform/features.py:360,488),
which it runs through CPU-KDTree / FAISS / pykeops KNN.  Here: one blockwise
exact kNN (:mod:`deepviewagg_tpu.ops.knn`, MXU matmuls) and a batched 3x3
eigendecomposition — fully vectorized, no per-point loops.

Feature definitions (features.py:488-603, Demantke et al. convention with
eigenvalues l1 >= l2 >= l3, sqrt-scaled):
    linearity  = (sl1 - sl2) / sl1
    planarity  = (sl2 - sl3) / sl1
    scattering = sl3 / sl1              with  sl_i = sqrt(l_i)
    normal     = eigenvector of the smallest eigenvalue (sign-normalized +z)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import knn as _knn

__all__ = ["eigen_features", "pca_features"]


def sym3x3_eigvals(cov):
    """Closed-form (Cardano) eigenvalues of symmetric 3x3 batches [N,3,3].

    Returns descending ``[N, 3]``.  Trigonometric form — pure VPU math, no
    LAPACK-style iteration: ``jnp.linalg.eigh`` costs minutes for 10k
    batched 3x3 problems on TPU, this costs microseconds.
    """
    a00, a11, a22 = cov[:, 0, 0], cov[:, 1, 1], cov[:, 2, 2]
    a01, a02, a12 = cov[:, 0, 1], cov[:, 0, 2], cov[:, 1, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01**2 + a02**2 + a12**2
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, 1e-20)
    b00, b11, b22 = (a00 - q) / safe_p, (a11 - q) / safe_p, (a22 - q) / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    isotropic = p2 <= 1e-24
    e1 = jnp.where(isotropic, q, e1)
    e2 = jnp.where(isotropic, q, e2)
    e3 = jnp.where(isotropic, q, e3)
    return jnp.maximum(jnp.stack([e1, e2, e3], axis=1), 0.0)


def sym3x3_eigvec(cov, lam):
    """Eigenvector of symmetric 3x3 batches for eigenvalue ``lam [N]``:
    the largest cross product of rows of (A - lam I) — robust for simple
    eigenvalues; degenerate neighborhoods fall back to +z."""
    a = cov - lam[:, None, None] * jnp.eye(3)[None]
    c01 = jnp.cross(a[:, 0], a[:, 1])
    c02 = jnp.cross(a[:, 0], a[:, 2])
    c12 = jnp.cross(a[:, 1], a[:, 2])
    n01 = jnp.sum(c01**2, axis=1)
    n02 = jnp.sum(c02**2, axis=1)
    n12 = jnp.sum(c12**2, axis=1)
    best = jnp.where(
        (n01 >= n02)[:, None] & (n01 >= n12)[:, None], c01,
        jnp.where((n02 >= n12)[:, None], c02, c12),
    )
    norm = jnp.linalg.norm(best, axis=1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), best.shape)
    return jnp.where(norm > 1e-12, best / jnp.maximum(norm, 1e-20), fallback)


@jax.jit
def _eigen_from_neighborhoods(pts, nbr_idx):
    """pts [N,3], nbr_idx int32 [N,k] -> (eigvals [N,3] desc, normal [N,3])."""
    nbrs = pts[nbr_idx]                          # [N, k, 3]
    mean = nbrs.mean(axis=1, keepdims=True)
    c = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", c, c) / nbrs.shape[1]
    eigvals = sym3x3_eigvals(cov)
    normal = sym3x3_eigvec(cov, eigvals[:, 2])   # smallest-eigenvalue vector
    # orient +z like the reference (features.py:568: normals with positive z)
    flip = jnp.where(normal[:, 2:3] < 0, -1.0, 1.0)
    return eigvals, normal * flip


def eigen_features(eigvals):
    """(linearity, planarity, scattering) from descending eigenvalues [N,3]."""
    s = jnp.sqrt(jnp.asarray(eigvals, jnp.float32))
    s1 = jnp.maximum(s[:, 0], 1e-8)
    linearity = (s[:, 0] - s[:, 1]) / s1
    planarity = (s[:, 1] - s[:, 2]) / s1
    scattering = s[:, 2] / s1
    return jnp.stack([linearity, planarity, scattering], axis=1)


def pca_features(pos, k: int = 50, r_search=None, block: int = 1024,
                 pad_multiple: int = 2048):
    """Compute per-point geometric features on the host.

    Returns a dict ``{linearity, planarity, scattering [N], normal [N,3],
    nn_idx [N,k]}`` (numpy float32/int32).  ``r_search`` optionally caps the
    neighborhood radius the way the reference's ``PCAComputePointwise(r=...)``
    does: neighbors beyond it are replaced by the point itself (shrinking the
    covariance instead of introducing dynamic shapes).  Inputs are padded to
    ``pad_multiple`` so XLA programs are reused across similarly-sized
    clouds (one compile per size bucket).
    """
    pos = np.asarray(pos, np.float32)
    n = len(pos)
    from ..native import lib as _native

    host_path = (n > 100_000 and _native is not None
                 and hasattr(_native, "knn_grid"))
    if host_path:
        # grid-cell exact kNN: the blocked brute force is O(N^2) and
        # dominates preprocessing past ~500k points (PERF.md scale
        # rehearsal); cells give the reference's KDTree/FAISS role natively
        d2, idx = _knn.knn_grid(pos, pos, k=k)
    else:
        n_pad = max(-(-n // pad_multiple) * pad_multiple, pad_multiple)
        pos_p = np.zeros((n_pad, 3), np.float32)
        pos_p[:n] = pos
        pos_p[n:] = 1e6  # far away; masked out of neighbor candidates
        valid = np.zeros(n_pad, bool)
        valid[:n] = True
        d2, idx = _knn.knn(pos_p, pos_p, k=k, valid=valid, block=block)
        pos, d2, idx = pos_p[:n], d2[:n], idx[:n]
    if r_search is not None:
        own = np.arange(len(pos), dtype=idx.dtype)[:, None]
        idx = np.where(d2 <= r_search * r_search, idx, own)
    if host_path:
        # the neighbor table lives on the host; shipping ~100 MB of indices
        # through the tunneled accelerator costs minutes (measured 430 s at
        # 671k voxels) — the closed-form 3x3 eigensolver runs fine on the
        # host CPU backend instead
        import jax as _jax

        cpu = _jax.devices("cpu")[0]
        with _jax.default_device(cpu):
            eigvals, normal = _eigen_from_neighborhoods(
                _jax.device_put(pos, cpu), _jax.device_put(idx, cpu)
            )
            lin_plan_scat = np.asarray(eigen_features(eigvals))
    else:
        eigvals, normal = _eigen_from_neighborhoods(
            jnp.asarray(pos), jnp.asarray(idx)
        )
        lin_plan_scat = np.asarray(eigen_features(eigvals))
    return {
        "linearity": lin_plan_scat[:, 0],
        "planarity": lin_plan_scat[:, 1],
        "scattering": lin_plan_scat[:, 2],
        "normal": np.asarray(normal, np.float32),
        "nn_idx": idx,   # reusable by the mapping factory (density/occlusion)
    }
