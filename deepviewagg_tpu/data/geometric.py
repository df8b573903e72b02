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


@functools.partial(jax.jit, static_argnames=())
def _eigen_from_neighborhoods(pts, nbr_idx):
    """pts [N,3], nbr_idx int32 [N,k] -> (eigvals [N,3] desc, normal [N,3])."""
    nbrs = pts[nbr_idx]                          # [N, k, 3]
    mean = nbrs.mean(axis=1, keepdims=True)
    c = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", c, c) / nbrs.shape[1]
    # symmetric 3x3 eigendecomposition, batched
    w, v = jnp.linalg.eigh(cov)                  # ascending
    w = jnp.maximum(w, 0.0)
    eigvals = w[:, ::-1]                         # descending l1 >= l2 >= l3
    normal = v[:, :, 0]                          # smallest-eigenvalue vector
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


def pca_features(pos, k: int = 50, r_search=None, block: int = 1024):
    """Compute per-point geometric features on the host.

    Returns a dict ``{linearity, planarity, scattering [N], normal [N,3]}``
    (numpy float32).  ``r_search`` optionally caps the neighborhood radius the
    way the reference's ``PCAComputePointwise(r=...)`` does: neighbors beyond
    it are replaced by the point itself (shrinking the covariance instead of
    introducing dynamic shapes).
    """
    pos = np.asarray(pos, np.float32)
    d2, idx = _knn.knn(pos, pos, k=k, block=block)
    if r_search is not None:
        own = np.arange(len(pos), dtype=idx.dtype)[:, None]
        idx = np.where(d2 <= r_search * r_search, idx, own)
    eigvals, normal = _eigen_from_neighborhoods(
        jnp.asarray(pos), jnp.asarray(idx)
    )
    lin_plan_scat = np.asarray(eigen_features(eigvals))
    return {
        "linearity": lin_plan_scat[:, 0],
        "planarity": lin_plan_scat[:, 1],
        "scattering": lin_plan_scat[:, 2],
        "normal": np.asarray(normal, np.float32),
    }
