"""Reindex-semantics parity against the reference's actual ``ImageMapping``.

``core/multimodal/{csr,image}.py`` are executed verbatim from /root/reference
(torch-CPU + shims, see tests/reference_shims.py) and driven side-by-side
with this repo's flat-array :class:`MultiViewMapping` on identical random
point->image->pixel relations.  Flattening both to dense
(point, image, x, y[, view features]) rows must give identical sets after:

  * construction               (``from_dense``            image.py:1729)
  * point subset selection     (``select_points 'pick'``  image.py:2167)
  * strided point merging      (``select_points 'merge'`` image.py:2214-2277,
                                incl. view dedupe + feature scatter_mean +
                                pixel lexunique)
  * image subset selection     (``select_views``          image.py:2095)
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from reference_shims import load_reference_image

from deepviewagg_tpu.data.mapping import NUM_VIEW_FEATURES, MultiViewMapping


@pytest.fixture(scope="module")
def ri():
    return load_reference_image()


N_PTS, N_IMG = 60, 5


def _dense_relation(rng, n_rows=400):
    """Random UNIQUE (point, image, x, y) rows + per-(point,image) features
    (the reference's from_dense averages per-pixel features over the view's
    pixel mask, so constant-per-view inputs survive the round trip)."""
    pid = rng.integers(0, N_PTS, n_rows)
    iid = rng.integers(0, N_IMG, n_rows)
    px = rng.integers(0, 32, n_rows)
    py = rng.integers(0, 24, n_rows)
    key = ((pid * N_IMG + iid) * 32 + px) * 24 + py
    _, first = np.unique(key, return_index=True)
    pid, iid, px, py = pid[first], iid[first], px[first], py[first]
    vkey = pid * N_IMG + iid
    vfeat = rng.normal(size=(N_PTS * N_IMG, NUM_VIEW_FEATURES)).astype(
        np.float32)
    return pid, iid, px, py, vfeat[vkey]


def _ref_mapping(ri, pid, iid, px, py, feats):
    return ri.ImageMapping.from_dense(
        torch.from_numpy(pid.astype(np.int64)),
        torch.from_numpy(iid.astype(np.int64)),
        torch.from_numpy(np.stack([px, py], 1).astype(np.int64)),
        torch.from_numpy(feats),
        num_points=N_PTS)


def _our_mapping(pid, iid, px, py, feats):
    """Build the flat-array mapping from the same dense rows: one view row
    per unique (point, image), pixel rows sorted by view."""
    order = np.lexsort((py, px, iid, pid))
    pid, iid, px, py, feats = (a[order] for a in (pid, iid, px, py, feats))
    vkey = pid * N_IMG + iid
    uniq, vfirst, vinv = np.unique(vkey, return_index=True,
                                   return_inverse=True)
    m = MultiViewMapping(
        point_id=(uniq // N_IMG).astype(np.int32),
        image_id=(uniq % N_IMG).astype(np.int32),
        view_feats=feats[vfirst],
        view_valid=np.ones(len(uniq), bool),
        pix_view=vinv.astype(np.int32),
        pix_x=px.astype(np.int32),
        pix_y=py.astype(np.int32),
        pix_valid=np.ones(len(pid), bool),
        num_points=N_PTS,
        num_images=N_IMG,
    )
    m.check()
    return m


def _ref_flat(m):
    """Reference mapping -> {(point, image, x, y): view_feats} dict."""
    ptr = m.pointers
    pts = torch.arange(m.num_groups).repeat_interleave(ptr[1:] - ptr[:-1])
    sub = m.values[1]
    reps = sub.pointers[1:] - sub.pointers[:-1]
    pts_pix = pts.repeat_interleave(reps)
    img_pix = m.images.repeat_interleave(reps)
    feat_pix = m.features.repeat_interleave(reps, dim=0)
    pix = m.pixels
    out = {}
    for p, i, (x, y), f in zip(pts_pix.tolist(), img_pix.tolist(),
                               pix.tolist(), feat_pix.numpy()):
        out[(p, i, x, y)] = f
    return out


def _our_flat(m):
    out = {}
    for q in np.nonzero(m.pix_valid)[0]:
        v = int(m.pix_view[q])
        assert m.view_valid[v]
        out[(int(m.point_id[v]), int(m.image_id[v]),
             int(m.pix_x[q]), int(m.pix_y[q]))] = m.view_feats[v]
    return out


def _assert_same(ref_map, our_map, atol=1e-6):
    assert set(ref_map) == set(our_map)
    for k in ref_map:
        np.testing.assert_allclose(ref_map[k], our_map[k], atol=atol,
                                   err_msg=str(k))


def test_construction_parity(ri):
    rng = np.random.default_rng(0)
    rows = _dense_relation(rng)
    _assert_same(_ref_flat(_ref_mapping(ri, *rows)), _our_flat(_our_mapping(*rows)))


def test_select_points_pick_parity(ri):
    rng = np.random.default_rng(1)
    rows = _dense_relation(rng)
    ref = _ref_mapping(ri, *rows)
    ours = _our_mapping(*rows)
    idx = np.sort(rng.choice(N_PTS, size=25, replace=False))
    ref2 = ref.select_points(torch.from_numpy(idx), mode="pick")
    ours2 = ours.select_points(idx)
    ours2.check()
    _assert_same(_ref_flat(ref2), _our_flat(ours2))


def test_select_points_merge_parity(ri):
    """Strided-conv merge: view dedupe + unweighted feature mean + pixel
    dedupe must match the reference exactly."""
    rng = np.random.default_rng(2)
    rows = _dense_relation(rng)
    ref = _ref_mapping(ri, *rows)
    ours = _our_mapping(*rows)
    n_coarse = 17
    parent = rng.integers(0, n_coarse, N_PTS)
    parent[:n_coarse] = np.arange(n_coarse)   # surjective (ref requirement)
    ref2 = ref.select_points(torch.from_numpy(parent.astype(np.int64)),
                             mode="merge")
    ours2 = ours.merge_points(parent, n_coarse)
    ours2.check()
    _assert_same(_ref_flat(ref2), _our_flat(ours2), atol=1e-5)


def test_select_views_parity(ri):
    """Image subset: the reference renumbers kept images by ascending
    original id (unique()); select_images must agree given the same order."""
    rng = np.random.default_rng(3)
    rows = _dense_relation(rng)
    ref = _ref_mapping(ri, *rows)
    ours = _our_mapping(*rows)
    keep = np.asarray([0, 2, 4])
    view_mask = torch.isin(ref.images, torch.from_numpy(keep))
    ref2, img_idx = ref.select_views(view_mask)
    assert np.array_equal(np.asarray(img_idx), keep)
    ours2 = ours.select_images(keep)
    ours2.check()
    _assert_same(_ref_flat(ref2), _our_flat(ours2))
