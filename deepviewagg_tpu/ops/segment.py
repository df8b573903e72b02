"""Segment (CSR) reductions — the workhorse of all view/pixel pooling.

TPU-native replacement for the reference's ``torch_scatter.segment_csr`` /
``segment_softmax_csr`` / ``gather_csr`` stack
(torch_points3d/modules/multimodal/pooling.py:7,759-920).  All functions take
**sorted** per-element segment ids plus a static ``num_segments``; padding
elements must carry ``segment_id == num_segments - 1`` with ``valid=False``
(callers usually allocate one extra "drop" segment).

Implementation notes:
  * ``jax.ops.segment_*`` lowers to XLA scatter; with ``indices_are_sorted``
    XLA emits an efficient one-pass reduction on TPU.
  * The softmax is the numerically-stable segment formulation of the
    reference's ``segment_softmax_csr`` (pooling.py:759): per-segment max,
    subtract, exp, per-segment sum, divide — with optional ``1/sqrt(n)``
    scaling of logits (pooling.py:788-801).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_reduce",
    "segment_count",
    "gather_segments",
    "segment_softmax",
    "segment_weighted_sum",
    "segment_argmax",
    "segment_argmin",
]

_NEG = -1e30
_POS = 1e30


def _masked(x, valid, fill):
    if valid is None:
        return x
    v = valid
    if v.ndim < x.ndim:
        v = v.reshape(v.shape + (1,) * (x.ndim - v.ndim))
    return jnp.where(v, x, fill)


def segment_sum(x, segment_ids, num_segments: int, valid=None):
    x = _masked(x, valid, 0)
    return jax.ops.segment_sum(
        x, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def segment_count(segment_ids, num_segments: int, valid=None):
    ones = jnp.ones(segment_ids.shape, jnp.float32)
    return segment_sum(ones, segment_ids, num_segments, valid)


def segment_mean(x, segment_ids, num_segments: int, valid=None):
    s = segment_sum(x, segment_ids, num_segments, valid)
    n = segment_count(segment_ids, num_segments, valid)
    n = n.reshape(n.shape + (1,) * (s.ndim - n.ndim))
    return s / jnp.maximum(n, 1.0)


def segment_max(x, segment_ids, num_segments: int, valid=None):
    x = _masked(x, valid, _NEG)
    out = jax.ops.segment_max(
        x, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    # Empty segments come back as -inf; zero them like the reference's
    # segment_csr over an empty slice returns 0 after masking downstream.
    return jnp.where(out <= _NEG / 2, 0.0, out)


def segment_min(x, segment_ids, num_segments: int, valid=None):
    x = _masked(x, valid, _POS)
    out = jax.ops.segment_min(
        x, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    return jnp.where(out >= _POS / 2, 0.0, out)


def segment_reduce(x, segment_ids, num_segments: int, reduce: str, valid=None):
    """Dispatch on reduce name — mirrors ``BimodalCSRPool`` modes
    (pooling.py:14-71): max / mean / min / sum."""
    fn = {
        "sum": segment_sum,
        "add": segment_sum,
        "mean": segment_mean,
        "max": segment_max,
        "min": segment_min,
    }[reduce]
    return fn(x, segment_ids, num_segments, valid)


def gather_segments(y, segment_ids):
    """Broadcast per-segment values back to elements (``gather_csr``,
    pooling.py:814)."""
    return y[segment_ids]


def segment_softmax(
    logits,
    segment_ids,
    num_segments: int,
    valid=None,
    scaling: bool = False,
    eps: float = 1e-12,
):
    """Numerically-stable softmax within each segment.

    ``scaling=True`` divides the max-shifted logits by ``sqrt(n_items)`` per
    segment before exponentiation, as in the reference's ``segment_softmax_csr``
    (pooling.py:788-801).  Invalid elements get weight 0.
    """
    logits = _masked(logits, valid, _NEG)
    seg_max = jax.ops.segment_max(
        logits, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    seg_max = jnp.where(seg_max <= _NEG / 2, 0.0, seg_max)
    shifted = logits - seg_max[segment_ids]
    if scaling:
        n = segment_count(segment_ids, num_segments, valid)
        denom = jnp.sqrt(jnp.maximum(n, 1.0))[segment_ids]
        denom = denom.reshape(denom.shape + (1,) * (shifted.ndim - denom.ndim))
        shifted = shifted / denom
    e = jnp.exp(shifted)
    e = _masked(e, valid, 0.0)
    seg_sum = segment_sum(e, segment_ids, num_segments)
    return e / (seg_sum[segment_ids] + eps)


def segment_weighted_sum(x, weights, segment_ids, num_segments: int, valid=None):
    """``sum_i w_i * x_i`` per segment — the attention-pooled value of
    ``GroupBimodalCSRPool`` (pooling.py:297-308)."""
    if weights.ndim < x.ndim:
        weights = weights.reshape(weights.shape + (1,) * (x.ndim - weights.ndim))
    return segment_sum(x * weights, segment_ids, num_segments, valid)


def _segment_arg(x, segment_ids, num_segments, valid, best_fn, fill):
    x = _masked(x, valid, fill)
    best = best_fn(x, segment_ids, num_segments=num_segments, indices_are_sorted=True)
    is_best = x == best[segment_ids]
    if valid is not None:
        is_best = is_best & valid
    idx = jnp.arange(x.shape[0], dtype=jnp.int32)
    # First index attaining the extremum (reference Heuristic pool argmax/argmin,
    # pooling.py:74-158).
    cand = jnp.where(is_best, idx, x.shape[0])
    arg = jax.ops.segment_min(
        cand, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    return jnp.clip(arg, 0, x.shape[0] - 1), arg < x.shape[0]


def segment_argmax(x, segment_ids, num_segments: int, valid=None):
    return _segment_arg(x, segment_ids, num_segments, valid, jax.ops.segment_max, _NEG)


def segment_argmin(x, segment_ids, num_segments: int, valid=None):
    return _segment_arg(x, segment_ids, num_segments, valid, jax.ops.segment_min, _POS)
