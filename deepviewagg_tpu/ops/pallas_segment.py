"""Pallas TPU kernel for sorted-segment reductions (sum / max).

The hot op of every view/pixel pooling stage (PERF.md): XLA lowers
``jax.ops.segment_*`` to scatter, which runs at ~11 ns/row on this chip —
~10x off the bandwidth bound.  Replaces the reference's
``torch_scatter.segment_csr`` CUDA path (torch_points3d/modules/multimodal/
pooling.py:7) with the TPU-native formulation: a **segmented scan**.

Because segment ids are SORTED, a segment reduction is an inclusive
segmented scan (combine resets at run boundaries) followed by one gather of
each segment's last row:

  * grid over static ``R``-row chunks; ``x`` and ``ids`` stream through VMEM
    via BlockSpec auto-pipelining (double-buffered by the pallas runtime —
    no manual DMA, full HBM bandwidth);
  * per chunk a ``log2(R)``-step masked Hillis-Steele scan on the VPU:
    ``z[r] = combine(z[r], z[r-step])`` where rows ``r`` and ``r-step``
    belong to the same run;
  * a carry ``(value row, segment id)`` in scratch joins runs across chunk
    boundaries (grid steps execute sequentially on TPU, so scratch persists);
  * segment ``s``'s reduction then sits at row ``bounds[s+1]-1`` of the
    scanned array (``bounds`` = one ``searchsorted``); a plain XLA gather
    (~2 ns/row) pulls the outputs, and empty segments are zeroed to match
    ``ops/segment.py`` semantics.

Everything is computed with plain adds/maxes — both reductions are
bit-exact (no MXU bf16 truncation), which the max VJP relies on (argmax by
equality).  Custom VJPs keep the backward scatter-free: d(sum) is a gather;
d(max) recomputes the argmax mask by equality with ONE combined
(max, cotangent) gather — sum-subgradient tie convention, matching
``ops/segment._segment_max_core``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["segment_sum_pallas", "segment_max_pallas", "pallas_available"]

_NEG = -1e30
R = 512          # rows per chunk (multiple of 8; E is padded to a multiple)


def pallas_available() -> bool:
    """True on a directly-attached TPU.

    The axon-tunneled TPU (client.platform_version contains "axon") loses
    async dispatch for executables containing ``tpu_custom_call``: each step
    serializes host<->device (+~50 ms/step measured on the flagship bench,
    PERF.md) even though the kernel itself is faster than XLA's scatter both
    isolated and chained.  Auto-dispatch therefore stays off there;
    ``DVA_PALLAS_SEGMENT=on`` still forces the kernel everywhere.
    """
    try:
        if jax.default_backend() != "tpu":
            return False
        version = getattr(jax.devices()[0].client, "platform_version", "")
        return "axon" not in version
    except Exception:
        return False


INTERPRET = False  # set True (tests) to run the kernel in interpret mode


def _round_up(a: int, m: int) -> int:
    return -(-a // m) * m


def _scan_kernel(x_ref, ids_ref, z_ref, cval, cid, *, reduce: str):
    ident = 0.0 if reduce == "sum" else _NEG
    combine = (lambda a, b: a + b) if reduce == "sum" else jnp.maximum
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        cval[:] = jnp.full_like(cval, ident)
        cid[0] = -1                          # matches no real segment id

    z = x_ref[:]                             # [R, C]
    run = ids_ref[:]                         # [R, 1] int32
    step = 1
    while step < R:
        z_s = jnp.concatenate(
            [jnp.full((step, z.shape[1]), ident, z.dtype), z[:-step]]
        )
        r_s = jnp.concatenate(
            [jnp.full((step, 1), -2, run.dtype), run[:-step]]
        )
        z = combine(z, jnp.where(r_s == run, z_s, ident))
        step *= 2
    # join the run crossing the chunk boundary: exactly the rows whose id
    # equals the carried id belong to it
    z = jnp.where(run == cid[0], combine(z, cval[:]), z)
    z_ref[:] = z
    cval[:] = z[R - 1 :]
    cid[0] = run[R - 1, 0]


def _scan(x, ids_2d, reduce: str):
    """Inclusive segmented scan over padded [E_pad, C] rows."""
    e_pad, c = x.shape
    kernel = functools.partial(_scan_kernel, reduce=reduce)
    return pl.pallas_call(
        kernel,
        grid=(e_pad // R,),
        in_specs=[
            pl.BlockSpec((R, c), lambda k: (k, 0)),
            pl.BlockSpec((R, 1), lambda k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((R, c), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((e_pad, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),         # carry value row
            pltpu.SMEM((1,), jnp.int32),             # carry segment id
        ],
        interpret=INTERPRET,
    )(x, ids_2d)


def _run(x, segment_ids, num_segments: int, valid, reduce: str, ptr=None):
    e, c = x.shape
    ident = 0.0 if reduce == "sum" else _NEG
    if valid is not None:
        x = jnp.where(valid[:, None], x, ident)
    e_pad = _round_up(max(e, R), R)
    x = jnp.pad(x, ((0, e_pad - e), (0, 0)), constant_values=ident)
    ids = segment_ids.astype(jnp.int32)
    # padding rows get a fresh id so no run crosses into them
    ids_2d = jnp.pad(
        ids[:, None], ((0, e_pad - e), (0, 0)),
        constant_values=num_segments + 1,
    )
    z = _scan(x.astype(jnp.float32), ids_2d, reduce)
    # segment s's inclusive scan ends at row bounds[s+1]-1.  The CSR pointer
    # is collate-time host data (like the reference's segment_csr indptr);
    # recomputing it on device costs ~5x the scan itself (searchsorted is
    # a binary-search gather chain on TPU), so callers should pass it.
    if ptr is not None:
        bounds = ptr.astype(jnp.int32)
    else:
        bounds = jnp.searchsorted(
            ids, jnp.arange(num_segments + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
    ends = bounds[1:] - 1
    out = z[jnp.clip(ends, 0, e_pad - 1)]
    nonempty = (bounds[1:] > bounds[:-1])[:, None]
    out = jnp.where(nonempty, out, 0.0)
    if reduce == "max":
        # segments whose rows were all masked (ident fill) zero like
        # ops.segment.segment_max
        out = jnp.where(out <= _NEG / 2, 0.0, out)
    return out


# ---------------------------------------------------------------------------
# custom VJPs: backward stays scatter-free
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum_pallas(x, segment_ids, num_segments: int, valid=None,
                       ptr=None):
    """Sorted-segment sum via segmented scan (drop-in for ops.segment)."""
    return _run(x, segment_ids, num_segments, valid, "sum", ptr)


def _sum_fwd(x, segment_ids, num_segments, valid=None, ptr=None):
    out = _run(x, segment_ids, num_segments, valid, "sum", ptr)
    return out, (segment_ids, valid)


def _sum_bwd(num_segments, res, g):
    segment_ids, valid = res
    gx = g[jnp.minimum(segment_ids, num_segments - 1)]
    if valid is not None:
        gx = jnp.where(valid[:, None], gx, 0.0)
    return gx, None, None, None


segment_sum_pallas.defvjp(_sum_fwd, _sum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_max_pallas(x, segment_ids, num_segments: int, valid=None,
                       ptr=None):
    """Sorted-segment max; empty segments return 0 (ops.segment semantics)."""
    return _run(x, segment_ids, num_segments, valid, "max", ptr)


def _max_fwd(x, segment_ids, num_segments, valid=None, ptr=None):
    out = _run(x, segment_ids, num_segments, valid, "max", ptr)
    return out, (x, segment_ids, valid, ptr, out)


def _max_bwd(num_segments, res, g):
    x, segment_ids, valid, ptr, out = res
    sid = jnp.minimum(segment_ids, num_segments - 1)
    # ONE combined gather of (max, cotangent) — same sum-subgradient tie
    # convention as ops.segment._segment_max_core (every max-attaining row
    # receives the full cotangent); saves the tie-count kernel run + gather
    # the old split-among-ties backward paid.
    comb = jnp.concatenate([out, g.astype(out.dtype)], axis=-1)[sid]
    c = out.shape[-1]
    mask = x == comb[..., :c]                # exact: scan never rounds
    if valid is not None:
        mask = mask & valid[:, None]
    gx = jnp.where(mask, comb[..., c:].astype(x.dtype), 0.0)
    return gx, None, None, None


segment_max_pallas.defvjp(_max_fwd, _max_bwd)
