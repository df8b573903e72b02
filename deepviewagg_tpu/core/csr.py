"""Padded-CSR primitives: the static-shape backbone of all "list-of-lists" data.

The reference framework stores ragged point->view->pixel relations in a nested
CSR object graph (``CSRData`` in torch_points3d/core/multimodal/csr.py:44 and
``ImageMapping`` in image.py:1707).  On TPU, ragged structures are poison for
XLA, so this module replaces the object graph with three interchangeable array
encodings, all with *static* shapes:

  * **pointers**  ``int32[G+1]`` — classic CSR group boundaries;
  * **segment ids** ``int32[E]`` — per-element group index, sorted ascending;
  * **validity masks** — padding elements carry ``segment_id == G`` (one past
    the last real group) so that every array keeps a fixed capacity ``E`` and
    segment reductions can allocate ``G+1`` slots and drop the last row.

Everything here is pure ``jnp`` and jit-safe with static shapes.  Host-side
(dynamic-shape) variants for the preprocessing pipeline live in
:mod:`deepviewagg_tpu.data` and use numpy directly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "pointers_to_segment_ids",
    "segment_ids_to_pointers",
    "counts_to_pointers",
    "pointers_to_counts",
    "insert_empty_groups",
    "lexsort_keys",
    "lexargsort",
    "lexunique_mask",
    "pad_to",
]


def pointers_to_segment_ids(pointers, num_elements: int):
    """Expand CSR ``pointers[G+1]`` into per-element segment ids ``int32[E]``.

    Elements at positions >= ``pointers[-1]`` (padding) get id ``G`` so they
    fall into the drop row of a ``G+1``-slot segment reduction.

    Equivalent role: the implicit group structure walked by ``segment_csr`` in
    the reference (torch_points3d/modules/multimodal/pooling.py:7).
    """
    pointers = jnp.asarray(pointers, jnp.int32)
    positions = jnp.arange(num_elements, dtype=jnp.int32)
    # searchsorted(right) - 1 maps position -> owning group; positions past
    # pointers[-1] map to G (the pad group).
    ids = jnp.searchsorted(pointers, positions, side="right").astype(jnp.int32) - 1
    num_groups = pointers.shape[0] - 1
    return jnp.clip(ids, 0, num_groups)


def segment_ids_to_pointers(segment_ids, num_groups: int):
    """Compress sorted segment ids ``int32[E]`` into pointers ``int32[G+1]``.

    Padding ids (>= num_groups) land past the final pointer. Ids must be
    sorted ascending (padding last).
    """
    segment_ids = jnp.asarray(segment_ids, jnp.int32)
    groups = jnp.arange(num_groups + 1, dtype=jnp.int32)
    return jnp.searchsorted(segment_ids, groups, side="left").astype(jnp.int32)


def counts_to_pointers(counts):
    """``int32[G]`` per-group counts -> ``int32[G+1]`` pointers."""
    counts = jnp.asarray(counts, jnp.int32)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )


def pointers_to_counts(pointers):
    pointers = jnp.asarray(pointers, jnp.int32)
    return pointers[1:] - pointers[:-1]


def insert_empty_groups(group_ids, num_groups: int, num_elements: int):
    """Build full-width pointers from a sparse set of (sorted) group ids.

    The reference's ``CSRData.insert_empty_groups`` (csr.py:197) re-expands a
    compressed CSR whose groups only cover observed ids to the full id range;
    here the same is a single ``searchsorted`` producing ``int32[num_groups+1]``
    pointers over elements whose sorted owning ids are ``group_ids[E]``.
    """
    group_ids = jnp.asarray(group_ids, jnp.int32)
    groups = jnp.arange(num_groups + 1, dtype=jnp.int32)
    ptr = jnp.searchsorted(group_ids, groups, side="left").astype(jnp.int32)
    return jnp.minimum(ptr, num_elements)


def lexsort_keys(*keys):
    """Lexicographic argsort over int keys, last key is primary.

    Mirrors ``lexargsort`` (torch_points3d/utils/multimodal.py:36) but uses
    ``jnp.lexsort`` (an XLA sort) instead of the CompositeTensor int64 packing
    trick — XLA's variadic sort handles multiple keys natively, no packing
    needed.
    """
    return jnp.lexsort(tuple(jnp.asarray(k) for k in keys))


def lexargsort(*keys):
    """Alias matching the reference naming: primary key FIRST.

    ``lexargsort(a, b)`` sorts by ``a`` then ``b`` (reference
    utils/multimodal.py:55 semantics), whereas ``jnp.lexsort`` takes the
    primary key last.
    """
    return lexsort_keys(*reversed(keys))


def lexunique_mask(*keys):
    """Mask of first occurrences under lexicographic order, plus the argsort.

    Returns ``(order, keep)`` where ``order = lexargsort(*keys)`` and ``keep``
    is a bool mask over the *sorted* sequence marking rows that differ from
    their predecessor.  Static-shape stand-in for ``lexunique``
    (utils/multimodal.py:70): callers compact with a downstream masked scatter
    or keep the mask as validity.
    """
    order = lexargsort(*keys)
    sorted_keys = [jnp.asarray(k)[order] for k in keys]
    diff = jnp.zeros(order.shape, bool)
    for k in sorted_keys:
        diff = diff | jnp.concatenate([jnp.ones((1,), bool), k[1:] != k[:-1]])
    return order, diff


def pad_to(x, size: int, axis: int = 0, fill=0):
    """Pad (or truncate) ``x`` along ``axis`` to static ``size`` (host or device)."""
    if isinstance(x, np.ndarray):
        xp = np
    else:
        xp = jnp
    cur = x.shape[axis]
    if cur == size:
        return x
    if cur > size:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, size)
        return x[tuple(idx)]
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, size - cur)
    return xp.pad(x, pad_width, constant_values=fill)
