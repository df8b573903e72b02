"""PCA geometric features: golden checks on canonical shapes."""

import numpy as np

from deepviewagg_tpu.data.geometric import pca_features


def test_plane_is_planar(rng):
    pts = np.zeros((500, 3), np.float32)
    pts[:, :2] = rng.uniform(0, 2, (500, 2))
    pts[:, 2] = rng.normal(0, 1e-4, 500)
    f = pca_features(pts, k=20)
    # edge points have anisotropic in-plane neighborhoods (linearity grows at
    # the borders), so test planar+linear vs scattering, not planarity alone
    assert (f["planarity"] + f["linearity"]).mean() > 0.9
    assert f["scattering"].mean() < 0.05
    # normals near +z
    assert np.abs(f["normal"][:, 2]).mean() > 0.99


def test_line_is_linear(rng):
    t = rng.uniform(0, 3, 400)
    pts = np.stack([t, 0.5 * t, -t], 1).astype(np.float32)
    pts += rng.normal(0, 1e-4, pts.shape)
    f = pca_features(pts, k=16)
    assert f["linearity"].mean() > 0.95


def test_blob_is_scattered(rng):
    pts = rng.normal(0, 1.0, (600, 3)).astype(np.float32)
    f = pca_features(pts, k=30)
    assert f["scattering"].mean() > 0.5
