"""Pallas sorted-segment kernel vs the XLA scatter path.

Runs the TPU kernel in interpret mode on CPU (same Mosaic semantics, host
execution); real-TPU numbers come from ``bench.py`` / PERF.md.  Covers the
contract of ``ops/segment.py``: sorted ids, static num_segments, optional
valid mask with a trailing drop segment, empty segments -> 0, max-VJP
tie-splitting (jnp.max semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepviewagg_tpu.ops import pallas_segment as ps
from deepviewagg_tpu.ops import segment as seg


@pytest.fixture(autouse=True)
def _interpret():
    old = ps.INTERPRET
    ps.INTERPRET = True
    yield
    ps.INTERPRET = old


def _case(rng, e=900, s=140, c=64, ties=False):
    ids = np.sort(rng.integers(0, s, e)).astype(np.int32)
    x = rng.normal(size=(e, c)).astype(np.float32)
    if ties:
        # quantize so within-segment ties are common (ReLU-like data)
        x = np.maximum(np.round(x * 2) / 2, 0.0).astype(np.float32)
    valid = (rng.random(e) > 0.15) & (ids < s - 1)  # s-1 is the drop segment
    ids = np.where(valid, ids, s - 1)
    ids = np.sort(ids).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(ids), s, jnp.asarray(valid)


@pytest.mark.parametrize("reduce", ["sum", "max"])
@pytest.mark.parametrize("with_valid", [False, True])
def test_forward_matches_xla(rng, reduce, with_valid):
    x, ids, s, valid = _case(rng)
    v = valid if with_valid else None
    pfn = ps.segment_sum_pallas if reduce == "sum" else ps.segment_max_pallas
    rfn = seg.segment_sum if reduce == "sum" else seg.segment_max
    out_p = pfn(x, ids, s, v)
    out_r = rfn(x, ids, s, v)
    np.testing.assert_allclose(out_p, out_r, atol=2e-3, rtol=1e-4)


def test_max_forward_is_exact(rng):
    # byte-decomposed placement must reproduce the input bits exactly
    x, ids, s, valid = _case(rng)
    out_p = np.asarray(ps.segment_max_pallas(x, ids, s, valid))
    out_r = np.asarray(seg.segment_max(x, ids, s, valid))
    assert (out_p == out_r).all()


def test_empty_segments_zero(rng):
    e, s, c = 300, 64, 8
    ids = np.sort(rng.integers(0, s // 2, e)).astype(np.int32)  # upper half empty
    x = jnp.asarray(rng.normal(size=(e, c)).astype(np.float32))
    for fn in (ps.segment_sum_pallas, ps.segment_max_pallas):
        out = np.asarray(fn(x, jnp.asarray(ids), s))
        assert np.abs(out[s // 2 :]).max() == 0.0


@pytest.mark.parametrize("reduce", ["sum", "max"])
def test_grad_matches_xla(rng, reduce):
    x, ids, s, valid = _case(rng, ties=(reduce == "max"))
    pfn = ps.segment_sum_pallas if reduce == "sum" else ps.segment_max_pallas
    rfn = seg.segment_sum if reduce == "sum" else seg.segment_max

    def lp(x):
        return jnp.sum(jnp.sin(pfn(x, ids, s, valid)))

    def lr(x):
        return jnp.sum(jnp.sin(rfn(x, ids, s, valid)))

    gp = jax.grad(lp)(x)
    gr = jax.grad(lr)(x)
    np.testing.assert_allclose(gp, gr, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("reduce", ["sum", "max"])
def test_ptr_path_matches(rng, reduce):
    # host-computed CSR ptr must give identical results to searchsorted
    x, ids, s, valid = _case(rng)
    ptr = jnp.asarray(np.searchsorted(np.asarray(ids), np.arange(s + 1)),
                      jnp.int32)
    pfn = ps.segment_sum_pallas if reduce == "sum" else ps.segment_max_pallas
    out_noptr = pfn(x, ids, s, valid)
    out_ptr = pfn(x, ids, s, valid, ptr)
    np.testing.assert_array_equal(np.asarray(out_noptr), np.asarray(out_ptr))


def test_segment_count_ptr_diff(rng):
    x, ids, s, _ = _case(rng)
    ptr = jnp.asarray(np.searchsorted(np.asarray(ids), np.arange(s + 1)),
                      jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(seg.segment_count(ids, s, ptr=ptr)),
        np.asarray(seg.segment_count(ids, s)),
    )


def test_dispatch_via_segment_module(rng, monkeypatch):
    # force the dispatch path and check the wrapper casts back to input dtype
    monkeypatch.setattr(seg, "_PALLAS_MODE", "on")
    x, ids, s, valid = _case(rng, e=600, s=96, c=32)
    out = seg.segment_sum(x.astype(jnp.bfloat16), ids, s, valid)
    assert out.dtype == jnp.bfloat16
    monkeypatch.setattr(seg, "_PALLAS_MODE", "off")
    out_ref = seg.segment_sum(x.astype(jnp.bfloat16), ids, s, valid)
    np.testing.assert_allclose(
        out.astype(np.float32), out_ref.astype(np.float32), atol=5e-2, rtol=5e-2
    )
