import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.core import csr


def test_pointers_segment_ids_roundtrip():
    pointers = jnp.array([0, 2, 2, 5, 6], jnp.int32)  # 4 groups, 6 elements
    ids = csr.pointers_to_segment_ids(pointers, 8)  # capacity 8 (2 pad)
    np.testing.assert_array_equal(np.asarray(ids), [0, 0, 2, 2, 2, 3, 4, 4])
    back = csr.segment_ids_to_pointers(ids, 4)
    np.testing.assert_array_equal(np.asarray(back), [0, 2, 2, 5, 6])


def test_counts_pointers_roundtrip():
    counts = jnp.array([3, 0, 2], jnp.int32)
    ptr = csr.counts_to_pointers(counts)
    np.testing.assert_array_equal(np.asarray(ptr), [0, 3, 3, 5])
    np.testing.assert_array_equal(np.asarray(csr.pointers_to_counts(ptr)), [3, 0, 2])


def test_insert_empty_groups():
    # elements owned by groups [1,1,4] out of 6 total groups
    ptr = csr.insert_empty_groups(jnp.array([1, 1, 4]), 6, 3)
    np.testing.assert_array_equal(np.asarray(ptr), [0, 0, 2, 2, 2, 3, 3])


def test_lexargsort_matches_numpy():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 5, 50)
    b = rng.integers(0, 5, 50)
    got = np.asarray(csr.lexargsort(a, b))
    want = np.lexsort((b, a))  # numpy: last key primary
    # orders may differ among ties in (a, b) pairs only if keys equal; compare keys
    np.testing.assert_array_equal(a[got], a[want])
    np.testing.assert_array_equal(b[got], b[want])


def test_lexunique_mask():
    a = np.array([2, 0, 2, 0, 1])
    b = np.array([1, 3, 1, 3, 0])
    order, keep = csr.lexunique_mask(a, b)
    sa, sb = a[np.asarray(order)], b[np.asarray(order)]
    uniq = set(zip(sa[np.asarray(keep)].tolist(), sb[np.asarray(keep)].tolist()))
    assert uniq == {(0, 3), (1, 0), (2, 1)}


def test_pad_to():
    x = np.arange(5)
    assert csr.pad_to(x, 8).shape == (8,)
    assert csr.pad_to(x, 3).shape == (3,)
    y = jnp.ones((2, 3))
    assert csr.pad_to(y, 4, axis=1, fill=7).shape == (2, 4)
    assert float(csr.pad_to(y, 4, axis=1, fill=7)[0, 3]) == 7
