"""Device-side sparse 3D convolution: gather -> one MXU matmul. No scatter.

The TPU replacement for torchsparse / MinkowskiEngine sparse conv backends
(reference modules/SparseConv3d/nn/{torchsparse,minkowski}.py).  All indexing
is precomputed host-side (:mod:`deepviewagg_tpu.ops.kernel_map`) as a dense
neighbor table ``nbr int32 [K, cap_out]`` (pad = ``cap_in`` -> zero dump
row); the device computation is an im2col:

    gathered[k, o] = feats[nbr[k, o]]           # [K, cap_out, Cin] gather
    out = einsum('koc,kcd->od', gathered, W)    # one [cap_out, K*Cin] matmul

Because each (output, offset) has at most one input (voxel coords are
unique), there is no scatter-add in the hot path at all — the accumulation
over K is a dense contraction the MXU eats directly.  Matmuls run in bf16
with f32 accumulation (TPU equivalent of the reference's AMP autocast,
models/base_model.py:244).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["sparse_conv", "sparse_conv_submanifold", "sparse_gather",
           "sparse_global_pool", "add_dump_row"]


def add_dump_row(feats):
    """Append the zero dump row (index = capacity)."""
    return jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]), feats.dtype)])


def sparse_gather(feats, idx, fill=0.0):
    """Gather rows with out-of-range indices mapping to ``fill``."""
    fp = jnp.concatenate(
        [feats, jnp.full((1, feats.shape[1]), fill, feats.dtype)]
    )
    return fp[jnp.minimum(idx, feats.shape[0])]


def sparse_conv(
    feats: jnp.ndarray,          # [cap_in, Cin] (no dump row)
    weights: jnp.ndarray,        # [K, Cin, Cout]
    nbr: jnp.ndarray,            # int32 [K, cap_out], pad = cap_in
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
):
    """Apply one sparse convolution; returns [cap_out, Cout] float32."""
    k, cin, cout = weights.shape
    fp = add_dump_row(feats).astype(compute_dtype)
    gathered = fp[nbr]                                # [K, cap_out, Cin]
    out = jax.lax.dot_general(
        gathered,
        weights.astype(compute_dtype),
        dimension_numbers=(((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # [cap_out, Cout]
    if bias is not None:
        out = out + bias
    return out


def _conv_core(feats, weights, nbr, compute_dtype):
    fp = add_dump_row(feats).astype(compute_dtype)
    gathered = fp[nbr]                                # [K, cap_out, Cin]
    return jax.lax.dot_general(
        gathered,
        weights.astype(compute_dtype),
        dimension_numbers=(((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sparse_conv_submanifold(feats, weights, nbr, compute_dtype=jnp.bfloat16):
    """Submanifold sparse conv (in-coords == out-coords, centered odd
    kernel) with a gather-only backward.

    The default VJP of the gather is a scatter-add — slower than a gather on
    TPU.  For a symmetric kernel map the transpose IS the same table with
    offsets negated, i.e. the K axis reversed (``kernel_offsets`` enumerates
    a centered odd cube lexicographically, so reversal negates every
    offset).  So dL/dfeats is just another gather-GEMM:

        dfeats = conv(g, W^T reversed over K, nbr[::-1])[: cap_in]

    and dL/dW re-gathers activations (same cost as the forward gather).
    """
    return _conv_core(feats, weights, nbr, compute_dtype)


def _subm_fwd(feats, weights, nbr, compute_dtype):
    return _conv_core(feats, weights, nbr, compute_dtype), (feats, weights, nbr)


def _subm_bwd(compute_dtype, res, g):
    feats, weights, nbr = res
    # dfeats[i] = sum_k g[nbr[k, i]] @ W[K-1-k]^T: the neighbor at offset k
    # of i contributes through the NEGATED offset's weights (offset-negation
    # == reversing the lexicographic enumeration of a centered odd cube)
    w_t = jnp.flip(jnp.swapaxes(weights, 1, 2), axis=0)    # [K, Cout, Cin]
    gp = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])
    dfeats = jax.lax.dot_general(
        gp[nbr].astype(compute_dtype),
        w_t.astype(compute_dtype),
        dimension_numbers=(((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )[: feats.shape[0]].astype(feats.dtype)
    # dW[k] = gathered_k^T @ g
    fp = add_dump_row(feats).astype(compute_dtype)
    gathered = fp[nbr]                                     # [K, cap, Cin]
    dw = jax.lax.dot_general(
        gathered,
        g.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),        # [K, Cin, Cout]
        preferred_element_type=jnp.float32,
    ).astype(weights.dtype)
    return dfeats, dw, None


sparse_conv_submanifold.defvjp(_subm_fwd, _subm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def sparse_conv_pair(feats, weights, nbr, nbr_t, compute_dtype=jnp.bfloat16):
    """Sparse conv with an explicitly provided transpose map (strided down /
    up convs: each one's transpose is the other's table, both precomputed by
    the graph builder).  Backward gathers with ``nbr_t`` per the SAME offset
    index (``KernelMap.transpose`` inverts each offset's partial injection —
    no K reversal, unlike the submanifold case)."""
    return _conv_core(feats, weights, nbr, compute_dtype)


def _pair_fwd(feats, weights, nbr, nbr_t, compute_dtype):
    return (_conv_core(feats, weights, nbr, compute_dtype),
            (feats, weights, nbr, nbr_t))


def _pair_bwd(compute_dtype, res, g):
    feats, weights, nbr, nbr_t = res
    w_t = jnp.swapaxes(weights, 1, 2)                     # [K, Cout, Cin]
    gp = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])
    dfeats = jax.lax.dot_general(
        gp[nbr_t].astype(compute_dtype),
        w_t.astype(compute_dtype),
        dimension_numbers=(((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )[: feats.shape[0]].astype(feats.dtype)
    fp = add_dump_row(feats).astype(compute_dtype)
    dw = jax.lax.dot_general(
        fp[nbr],
        g.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(weights.dtype)
    return dfeats, dw, None, None


sparse_conv_pair.defvjp(_pair_fwd, _pair_bwd)


def sparse_global_pool(feats, batch_idx, num_batches: int, valid=None, reduce="mean"):
    """Per-sample global pooling over a sparse tensor (for encoder heads)."""
    from . import segment as _seg

    return _seg.segment_reduce(
        feats, batch_idx, num_batches, reduce=reduce, valid=valid
    )
