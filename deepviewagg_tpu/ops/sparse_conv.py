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

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["sparse_conv", "sparse_gather", "sparse_global_pool", "add_dump_row"]


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


def sparse_global_pool(feats, batch_idx, num_batches: int, valid=None, reduce="mean"):
    """Per-sample global pooling over a sparse tensor (for encoder heads)."""
    from . import segment as _seg

    return _seg.segment_reduce(
        feats, batch_idx, num_batches, reduce=reduce, valid=valid
    )
