"""Voxelization parity: our ``grid_sample(rounding='round')`` vs the
reference's ``GridSampling3D`` executed from /root/reference (torch CPU,
shimmed clustering primitives — see reference_shims).

Pins cell assignment (``torch.round(pos/size)``, grid_transform.py:131),
mean feature/pos aggregation, majority-vote labels (one-hot scatter_add +
argmax, grid_transform.py:77-81), and the quantized ``coords``.
"""

import numpy as np
import pytest
import torch

from deepviewagg_tpu.ops import voxel

from reference_shims import load_reference_grid_transform


@pytest.fixture(scope="module")
def refgt():
    return load_reference_grid_transform()


def _cloud(seed, n=4000, classes=5):
    rng = np.random.default_rng(seed)
    pos = (rng.random((n, 3)) * 4 - 2).astype(np.float32)
    feats = rng.standard_normal((n, 6)).astype(np.float32)
    labels = rng.integers(0, classes, n).astype(np.int64)
    return pos, feats, labels


@pytest.mark.parametrize("seed,size", [(0, 0.3), (1, 0.11)])
def test_grid_sample_round_matches_gridsampling3d(refgt, seed, size):
    pos, feats, labels = _cloud(seed)

    data = refgt.Data(pos=torch.from_numpy(pos.copy()),
                      x=torch.from_numpy(feats.copy()),
                      y=torch.from_numpy(labels.copy()))
    out_ref = refgt.GridSampling3D(size, quantize_coords=True,
                                   mode="mean")(data)

    ours = voxel.grid_sample(pos, size, feats=feats, labels=labels,
                             rounding="round")

    # same voxel set — compare as sorted coordinate rows (cluster ids may
    # be ordered differently between the two implementations)
    ref_coords = out_ref.coords.numpy()
    got_coords = ours["coords"][:, 1:]          # drop the batch column
    assert len(ref_coords) == len(got_coords)

    def order(c):
        return np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
    ro, go = order(ref_coords), order(got_coords)
    np.testing.assert_array_equal(got_coords[go], ref_coords[ro])
    np.testing.assert_allclose(np.asarray(ours["pos"])[go],
                               out_ref.pos.numpy()[ro], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["feats"])[go],
                               out_ref.x.numpy()[ro], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ours["labels"])[go],
                                  out_ref.y.numpy()[ro])


def test_majority_label_tie_matches_reference(refgt):
    """Ties: the reference's argmax over one-hot counts picks the smallest
    label; a voxel with labels {1, 1, 3, 3} must resolve to 1 in both."""
    pos = np.zeros((4, 3), np.float32)          # all in one voxel
    labels = np.array([3, 1, 3, 1], np.int64)
    data = refgt.Data(pos=torch.from_numpy(pos.copy()),
                      y=torch.from_numpy(labels.copy()))
    out_ref = refgt.GridSampling3D(0.5, mode="mean")(data)
    ours = voxel.grid_sample(pos, 0.5, labels=labels, rounding="round")
    assert int(out_ref.y[0]) == int(np.asarray(ours["labels"])[0]) == 1
