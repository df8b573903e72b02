"""Scale-capable image caching (VERDICT r1 item #4): uint8 sidecar storage
with lazy memory-mapped loads, per-getitem normalization, and preprocess-time
greedy max-coverage image selection replacing coverage-blind first-N."""

import os

import numpy as np

from deepviewagg_tpu.data.datasets.base import load_area, save_area
from deepviewagg_tpu.data.mapping import NUM_VIEW_FEATURES, MultiViewMapping
from deepviewagg_tpu.data.transforms2d import (
    normalize_images, select_images_by_coverage,
)


def _mapping(point_of_view, image_of_view, num_points, num_images):
    pid = np.asarray(point_of_view, np.int32)
    order = np.argsort(pid, kind="stable")
    pid = pid[order]
    img = np.asarray(image_of_view, np.int32)[order]
    v = len(pid)
    return MultiViewMapping(
        point_id=pid,
        image_id=img,
        view_feats=np.zeros((v, NUM_VIEW_FEATURES), np.float32),
        view_valid=np.ones(v, bool),
        pix_view=np.arange(v, dtype=np.int32),
        pix_x=np.zeros(v, np.int32),
        pix_y=np.zeros(v, np.int32),
        pix_valid=np.ones(v, bool),
        num_points=num_points,
        num_images=num_images,
    )


def test_coverage_selection_beats_first_n():
    # images 0 and 1 both see points {0,1,2}; image 2 alone sees {3,4,5}.
    # first-N with n=2 keeps {0,1} (coverage 3); greedy must keep one of
    # {0,1} plus image 2 (coverage 6).
    m = _mapping(
        point_of_view=[0, 1, 2, 0, 1, 2, 3, 4, 5],
        image_of_view=[0, 0, 0, 1, 1, 1, 2, 2, 2],
        num_points=6, num_images=3,
    )
    keep = select_images_by_coverage(m, 2)
    assert 2 in keep and len(keep) == 2
    assert set(keep) in ({0, 2}, {1, 2})
    # n >= num_images keeps everything
    assert list(select_images_by_coverage(m, 5)) == [0, 1, 2]


def test_uint8_sidecar_roundtrip_and_lazy_load(tmp_path):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (50, 64, 32, 3), np.uint8)
    cloud = {
        "pos": rng.normal(size=(100, 3)).astype(np.float32),
        "labels": np.zeros(100, np.int32),
        "images": images,
        "mapping": _mapping([0, 1], [0, 1], 100, 50),
    }
    path = str(tmp_path / "area.npz")
    save_area(path, cloud)

    # images live in an uncompressed sidecar, NOT the npz
    sidecar = str(tmp_path / "area_images.npy")
    assert os.path.exists(sidecar)
    with np.load(path) as z:
        assert "images" not in z.files

    # uint8 storage is 1/4 the float32 bake the r1 cache used
    assert os.path.getsize(sidecar) <= images.nbytes + 4096
    assert images.nbytes * 4 == images.astype(np.float32).nbytes

    loaded = load_area(path)
    assert isinstance(loaded["images"], np.memmap), "must be lazily mapped"
    assert loaded["images"].dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(loaded["images"][7]), images[7])
    # fancy-indexing a selection materializes only that subset
    sel = loaded["images"][[3, 9]]
    assert not isinstance(sel, np.memmap) and sel.shape[0] == 2
    assert loaded["mapping"].num_images == 50


def test_normalize_uint8_matches_float():
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (2, 8, 8, 3), np.uint8)
    f = u8.astype(np.float32) / 255.0
    np.testing.assert_allclose(normalize_images(u8), normalize_images(f),
                               rtol=1e-6)
    # empty stacks must not crash (windows can end with zero cameras)
    out = normalize_images(np.zeros((0, 8, 8, 3), np.uint8))
    assert out.shape == (0, 8, 8, 3) and out.dtype == np.float32
