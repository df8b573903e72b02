"""Spatial ops: FPS, ball query, grouping, kNN interpolation.

The reference wraps torch-points-kernels CUDA ops
(core/spatial_ops/{sampling,neighbour_finder,interpolate}.py) — here each is
a static-shape JAX formulation:

  * :func:`farthest_point_sample` — iterative max-min selection under
    ``lax.fori_loop`` (the classic FPS; exact, deterministic);
  * :func:`ball_query` — blockwise distance tiles -> first ``k`` hits within
    radius (top_k over masked distances), torch-points-kernels semantics
    (missing neighbors repeat the first hit);
  * :func:`knn_interpolate` — inverse-distance weighted k-NN feature
    upsampling (``KNNInterpolate``, core/spatial_ops/interpolate.py:7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .knn import knn

__all__ = ["farthest_point_sample", "ball_query", "knn_interpolate"]


@functools.partial(jax.jit, static_argnames=("n_samples",))
def _fps(pos, valid, n_samples, start):
    n = pos.shape[0]
    big = jnp.float32(1e30)
    d2 = jnp.where(valid, big, -1.0)   # invalid points never get selected

    def body(i, state):
        d2, idx = state
        last = idx[i - 1]
        diff = pos - pos[last]
        nd = jnp.sum(diff * diff, axis=1)
        d2 = jnp.minimum(d2, jnp.where(valid, nd, -1.0))
        idx = idx.at[i].set(jnp.argmax(d2))
        return d2, idx

    idx0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(start)
    _, idx = jax.lax.fori_loop(1, n_samples, body, (d2, idx0))
    return idx


def farthest_point_sample(pos, n_samples: int, valid=None, start: int = 0):
    """Indices of ``n_samples`` FPS-selected points (int32 [n_samples])."""
    pos = jnp.asarray(pos, jnp.float32)
    if valid is None:
        valid = jnp.ones((pos.shape[0],), bool)
    return _fps(pos, jnp.asarray(valid, bool), int(n_samples),
                jnp.int32(start))


def ball_query(query, points, radius: float, k: int, valid=None,
               block: int = 1024):
    """``int32 [Nq, k]`` neighbor indices within ``radius``; rows with fewer
    than k hits repeat their first hit (torch-points-kernels convention);
    rows with zero hits return index 0 with ``count == 0``.

    Returns ``(idx [Nq, k], counts [Nq])``.
    """
    d2, idx = knn(query, points, k=k, valid=valid, block=block)
    within = d2 <= radius * radius
    counts = within.sum(axis=1).astype(np.int32)
    first = idx[:, :1]
    idx = np.where(within, idx, np.broadcast_to(first, idx.shape))
    return idx.astype(np.int32), counts


def knn_interpolate(feats, src_pos, dst_pos, k: int = 3, valid=None,
                    block: int = 1024):
    """Inverse-distance weighted k-NN upsampling ``[Nd, C]``.

    ``feats`` live at ``src_pos``; output at ``dst_pos``.  The reference's
    decoder upsampling and full-res voting remap (``KNNInterpolate``;
    trackers use k=1/k=3).
    """
    d2, idx = knn(dst_pos, src_pos, k=k, valid=valid, block=block)
    d2 = jnp.asarray(d2)
    w = 1.0 / jnp.maximum(d2, 1e-10)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    f = jnp.asarray(feats)[jnp.asarray(idx)]
    return jnp.sum(f * w[..., None], axis=1)


def multiscale_ball_query(query, points, radii, ks, valid=None,
                          block: int = 1024):
    """One neighbor table per scale (ref MultiscaleRadiusNeighbourFinder,
    neighbour_finder.py:170): ``radii`` and ``ks`` are matched lists;
    returns ``[(idx [Nq, k_s], counts [Nq]), ...]``."""
    if not hasattr(radii, "__len__"):
        radii = [radii]
    if not hasattr(ks, "__len__"):
        ks = [ks] * len(radii)
    assert len(radii) == len(ks), "radii/ks length mismatch"
    return [
        ball_query(query, points, r, k, valid=valid, block=block)
        for r, k in zip(radii, ks)
    ]
