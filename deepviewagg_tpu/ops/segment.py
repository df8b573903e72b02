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

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

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

# Pallas sorted-segment kernel dispatch (pallas_segment.py): XLA lowers
# segment_* to scatter (~11 ns/row measured, PERF.md); the pallas segmented
# scan runs ~2.2x faster and is exact.  "auto" uses it on TPU for 2-D inputs
# above a size floor when the caller supplies the host-computed CSR ``ptr``;
# "on" forces it (tests use interpret mode); "off" disables.
_PALLAS_MODE = os.environ.get("DVA_PALLAS_SEGMENT", "auto")
_PALLAS_MIN_ROWS = 65536
_PALLAS_MIN_COLS = 128


def _pallas_fn(x, name: str, ptr):
    if _PALLAS_MODE == "off" or x.ndim != 2:
        return None
    try:
        from . import pallas_segment as ps
    except Exception:  # pragma: no cover - pallas unavailable
        return None
    if _PALLAS_MODE != "on" and not (
        ps.pallas_available()
        # the scan wins only on big, wide inputs: narrow arrays (softmax
        # logits [E, groups], counts) waste VPU lanes in the (R, C) block
        # and XLA's 1-D scatter handles them fine; small E never amortizes
        # the pad + gather epilogue
        and x.shape[0] >= _PALLAS_MIN_ROWS
        and x.shape[1] >= _PALLAS_MIN_COLS
        # without a host-computed CSR ptr the kernel would need an on-device
        # searchsorted, which costs more than the scan saves
        and ptr is not None
    ):
        return None
    if os.environ.get("DVA_PALLAS_DEBUG"):  # trace-time dispatch log
        import sys

        print(f"[pallas-segment] {name} {x.shape} {x.dtype}", file=sys.stderr)
    return ps.segment_sum_pallas if name == "sum" else ps.segment_max_pallas


def _masked(x, valid, fill):
    if valid is None:
        return x
    v = valid
    if v.ndim < x.ndim:
        v = v.reshape(v.shape + (1,) * (x.ndim - v.ndim))
    return jnp.where(v, x, fill)


def segment_sum(x, segment_ids, num_segments: int, valid=None, ptr=None):
    fn = _pallas_fn(x, "sum", ptr)
    if fn is not None:
        return fn(x, segment_ids, num_segments, valid, ptr).astype(x.dtype)
    x = _masked(x, valid, 0)
    return jax.ops.segment_sum(
        x, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def segment_count(segment_ids, num_segments: int, valid=None, ptr=None):
    if ptr is not None and valid is None:
        # CSR pointer diff — no reduction at all
        return (ptr[1:] - ptr[:-1]).astype(jnp.float32)
    ones = jnp.ones(segment_ids.shape, jnp.float32)
    return segment_sum(ones, segment_ids, num_segments, valid)


def segment_mean(x, segment_ids, num_segments: int, valid=None, ptr=None):
    s = segment_sum(x, segment_ids, num_segments, valid, ptr)
    n = segment_count(segment_ids, num_segments, valid, ptr)
    n = n.reshape(n.shape + (1,) * (s.ndim - n.ndim))
    return s / jnp.maximum(n, 1.0)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _segment_max_core(xm, segment_ids, num_segments: int):
    """``jax.ops.segment_max`` with a ONE-gather backward.

    The stock VJP of ``segment_max`` (a scatter-max) emits ~6 row gathers
    plus 2 row scatter-adds of ``[E, C]`` to implement split-gradient-among-
    ties — 28 ms/step at the recipe shape's 931k-row atomic pool, the
    second-largest term in the round-5 trace (PERF.md).  TPU's gather engine
    is row-issue-bound, so the custom backward concatenates the per-segment
    max and the cotangent into one ``[S, 2C]`` table and does a SINGLE
    ``[E, 2C]`` gather: rows where ``x`` attains its segment max receive the
    cotangent, others 0.

    Tie convention: every element attaining the max receives the FULL
    cotangent (sum subgradient), vs jax's 1/count split and torch_scatter's
    first-winner.  Exact ties between distinct rows only arise at ReLU
    zeros of the tower features, where the upstream ReLU backward zeroes the
    gradient anyway; all conventions are valid subgradients of max.
    """
    return jax.ops.segment_max(
        xm, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def _segment_max_fwd(xm, segment_ids, num_segments):
    raw = _segment_max_core(xm, segment_ids, num_segments)
    return raw, (xm, segment_ids, raw)


def _segment_max_bwd(num_segments, res, g):
    xm, segment_ids, raw = res
    squeeze = xm.ndim == 1
    if squeeze:
        xm, raw, g = xm[:, None], raw[:, None], g[:, None]
    c = raw.shape[-1]
    comb = jnp.concatenate([raw, g.astype(raw.dtype)], axis=-1)[segment_ids]
    rmax, ge = comb[..., :c], comb[..., c:]
    # xm <= _NEG/2 rows are masked-invalid fills (or whole-empty segments,
    # where rmax == fill): they must not leak gradient into the pixel-gather
    # backward.
    grad = jnp.where((xm == rmax) & (xm > _NEG / 2), ge.astype(xm.dtype), 0)
    if squeeze:
        grad = grad[:, 0]
    return grad, None


_segment_max_core.defvjp(_segment_max_fwd, _segment_max_bwd)


def segment_max(x, segment_ids, num_segments: int, valid=None, ptr=None):
    fn = _pallas_fn(x, "max", ptr)
    if fn is not None:
        return fn(x, segment_ids, num_segments, valid, ptr).astype(x.dtype)
    x = _masked(x, valid, _NEG)
    out = _segment_max_core(x, segment_ids, num_segments)
    # Empty segments come back as -inf; zero them like the reference's
    # segment_csr over an empty slice returns 0 after masking downstream.
    return jnp.where(out <= _NEG / 2, 0.0, out)


def segment_min(x, segment_ids, num_segments: int, valid=None, ptr=None):
    fn = _pallas_fn(x, "max", ptr)
    if fn is not None:
        return -fn(-x, segment_ids, num_segments, valid, ptr).astype(x.dtype)
    x = _masked(x, valid, _POS)
    out = -_segment_max_core(-x, segment_ids, num_segments)
    return jnp.where(out >= _POS / 2, 0.0, out)


def segment_reduce(x, segment_ids, num_segments: int, reduce: str, valid=None,
                   ptr=None):
    """Dispatch on reduce name — mirrors ``BimodalCSRPool`` modes
    (pooling.py:14-71): max / mean / min / sum."""
    fn = {
        "sum": segment_sum,
        "add": segment_sum,
        "mean": segment_mean,
        "max": segment_max,
        "min": segment_min,
    }[reduce]
    return fn(x, segment_ids, num_segments, valid, ptr)


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
    ptr=None,
):
    """Numerically-stable softmax within each segment.

    ``scaling=True`` divides the max-shifted logits by ``sqrt(n_items)`` per
    segment before exponentiation, as in the reference's ``segment_softmax_csr``
    (pooling.py:788-801).  Invalid elements get weight 0.
    """
    # The max shift is value-invariant (softmax(l - m) == softmax(l) for any
    # per-segment constant m, including under the 1/sqrt(n) scaling), so its
    # gradient is identically zero — stop_gradient cuts the max's whole VJP
    # chain out of the backward at zero cost and full exactness.
    seg_max = lax.stop_gradient(
        segment_max(logits, segment_ids, num_segments, valid, ptr))
    logits = _masked(logits, valid, _NEG)
    shifted = logits - seg_max[segment_ids]
    if scaling:
        n = segment_count(segment_ids, num_segments, valid, ptr)
        denom = jnp.sqrt(jnp.maximum(n, 1.0))[segment_ids]
        denom = denom.reshape(denom.shape + (1,) * (shifted.ndim - denom.ndim))
        shifted = shifted / denom
    e = jnp.exp(shifted)
    e = _masked(e, valid, 0.0)
    seg_sum = segment_sum(e, segment_ids, num_segments, ptr=ptr)
    return e / (seg_sum[segment_ids] + eps)


def segment_weighted_sum(x, weights, segment_ids, num_segments: int, valid=None,
                         ptr=None):
    """``sum_i w_i * x_i`` per segment — the attention-pooled value of
    ``GroupBimodalCSRPool`` (pooling.py:297-308)."""
    if weights.ndim < x.ndim:
        weights = weights.reshape(weights.shape + (1,) * (x.ndim - weights.ndim))
    return segment_sum(x * weights, segment_ids, num_segments, valid, ptr)


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
