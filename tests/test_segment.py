import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.ops import segment as seg


def _setup():
    # 3 real segments + 1 drop segment; capacity 8 with 2 padding elements
    ids = jnp.array([0, 0, 1, 2, 2, 2, 3, 3], jnp.int32)
    valid = jnp.array([1, 1, 1, 1, 1, 1, 0, 0], bool)
    x = jnp.array([[1.0], [3.0], [5.0], [2.0], [4.0], [6.0], [9.0], [9.0]])
    return x, ids, valid


def test_segment_reduce_basic():
    x, ids, valid = _setup()
    np.testing.assert_allclose(
        np.asarray(seg.segment_sum(x, ids, 4, valid))[:3, 0], [4, 5, 12]
    )
    np.testing.assert_allclose(
        np.asarray(seg.segment_mean(x, ids, 4, valid))[:3, 0], [2, 5, 4]
    )
    np.testing.assert_allclose(
        np.asarray(seg.segment_max(x, ids, 4, valid))[:3, 0], [3, 5, 6]
    )
    np.testing.assert_allclose(
        np.asarray(seg.segment_min(x, ids, 4, valid))[:3, 0], [1, 5, 2]
    )


def test_empty_segment_is_zero():
    ids = jnp.array([0, 0, 2], jnp.int32)
    x = jnp.array([[1.0], [2.0], [3.0]])
    out = seg.segment_max(x, ids, 3)
    np.testing.assert_allclose(np.asarray(out)[1], [0.0])


def test_segment_softmax_matches_dense():
    x, ids, valid = _setup()
    w = seg.segment_softmax(x, ids, 4, valid)
    w = np.asarray(w)[:, 0]
    # segment 0: softmax([1,3])
    e = np.exp(np.array([1.0, 3.0]) - 3.0)
    np.testing.assert_allclose(w[:2], e / e.sum(), rtol=1e-5)
    # singleton segment -> 1
    np.testing.assert_allclose(w[2], 1.0, rtol=1e-5)
    # padding -> 0
    np.testing.assert_allclose(w[6:], 0.0, atol=1e-12)
    # weights sum to 1 per real segment
    np.testing.assert_allclose(
        np.asarray(seg.segment_sum(jnp.asarray(w)[:, None], ids, 4, valid))[:3, 0],
        1.0,
        rtol=1e-5,
    )


def test_segment_softmax_scaling():
    ids = jnp.array([0, 0, 0, 0], jnp.int32)
    x = jnp.array([[2.0], [4.0], [6.0], [8.0]])
    w = np.asarray(seg.segment_softmax(x, ids, 1, scaling=True))[:, 0]
    shifted = (np.array([2.0, 4, 6, 8]) - 8.0) / 2.0  # /sqrt(4)
    e = np.exp(shifted)
    np.testing.assert_allclose(w, e / e.sum(), rtol=1e-5)


def test_segment_weighted_sum():
    x, ids, valid = _setup()
    w = seg.segment_softmax(x, ids, 4, valid)
    pooled = seg.segment_weighted_sum(x, w[:, 0], ids, 4, valid)
    assert pooled.shape == (4, 1)
    e = np.exp(np.array([1.0, 3.0]) - 3.0)
    want = (e / e.sum() * np.array([1.0, 3.0])).sum()
    np.testing.assert_allclose(np.asarray(pooled)[0, 0], want, rtol=1e-5)


def test_segment_argmax_argmin():
    x, ids, valid = _setup()
    arg, nonempty = seg.segment_argmax(x[:, 0], ids, 4, valid)
    np.testing.assert_array_equal(np.asarray(arg)[:3], [1, 2, 5])
    assert not bool(np.asarray(nonempty)[3])
    arg, _ = seg.segment_argmin(x[:, 0], ids, 4, valid)
    np.testing.assert_array_equal(np.asarray(arg)[:3], [0, 2, 3])
