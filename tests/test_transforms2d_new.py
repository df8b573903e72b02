"""MM 2D transform gaps closed in r2 (VERDICT item #7): ColorJitter,
GaussianBlur, NonStaticMask, DropImagesOutsideDataBoundingBox, PickKImages,
GridSampleImages (ref image.py:106,647,669,689,1249-1269)."""

import dataclasses

import numpy as np

from deepviewagg_tpu.data.mapping import NUM_VIEW_FEATURES, MultiViewMapping
from deepviewagg_tpu.data import transforms2d as t2


def _mapping_with_pixels(num_points=4, num_images=3, w=8, h=6):
    # one view per (point, image) pair, one pixel per view at (point, point)
    pid, img = [], []
    for p in range(num_points):
        for i in range(num_images):
            pid.append(p)
            img.append(i)
    v = len(pid)
    return MultiViewMapping(
        point_id=np.asarray(pid, np.int32),
        image_id=np.asarray(img, np.int32),
        view_feats=np.zeros((v, NUM_VIEW_FEATURES), np.float32),
        view_valid=np.ones(v, bool),
        pix_view=np.arange(v, dtype=np.int32),
        pix_x=np.asarray(pid, np.int32),        # pixel x == point id
        pix_y=np.asarray(pid, np.int32),
        pix_valid=np.ones(v, bool),
        num_points=num_points,
        num_images=num_images,
    )


def test_color_jitter_ranges_and_identity(rng):
    img = rng.uniform(0, 1, (3, 8, 6, 3)).astype(np.float32)
    out = t2.color_jitter(img, np.random.default_rng(0), 0.6, 0.6, 0.7)
    assert out.shape == img.shape and out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, img)
    # zero strengths = identity
    same = t2.color_jitter(img, np.random.default_rng(0), 0.0, 0.0, 0.0)
    np.testing.assert_allclose(same, img, atol=1e-7)
    # uint8 input converts to [0,1] float
    u8 = (img * 255).astype(np.uint8)
    out8 = t2.color_jitter(u8, np.random.default_rng(0), 0.5, 0, 0)
    assert out8.dtype == np.float32 and out8.max() <= 1.0


def test_gaussian_blur_smooths_and_preserves_mean(rng):
    img = rng.uniform(0, 1, (2, 16, 12, 3)).astype(np.float32)
    out = t2.gaussian_blur(img, np.random.default_rng(0), kernel_size=9,
                           sigma=(1.5, 1.5))
    assert out.shape == img.shape
    # blur reduces high-frequency variance, roughly preserves the mean
    assert out.var() < img.var()
    np.testing.assert_allclose(out.mean(), img.mean(), atol=0.02)


def test_non_static_mask_flags_changing_pixels():
    imgs = np.zeros((4, 8, 6, 3), np.uint8)
    imgs[:, 2, 3] = np.arange(4)[:, None] * 10   # varies -> non-static
    imgs[:, 5, 1] = 7                            # constant -> static
    mask = t2.non_static_mask(imgs, n_sample=4)
    assert mask[2, 3]
    assert not mask[5, 1]
    # single image -> everything usable
    assert t2.non_static_mask(imgs[:1]).all()


def test_mask_mapping_pixels_drops_static_and_keeps_contract():
    m = _mapping_with_pixels()
    mask = np.ones((8, 6), bool)
    mask[1, 1] = False   # point 1's pixel is static
    out = t2.mask_mapping_pixels({"mapping": m}, mask)["mapping"]
    # pixels at (1,1) invalidated; their (now pixel-less) views too
    assert out.num_pixels == m.num_pixels - 3
    assert out.num_views == m.num_views - 3
    assert 1 not in out.point_id[out.view_valid]
    out.check()      # full invariant suite (sorted prefixes, ownership)
    out.compact()    # must not assert


def test_drop_images_outside_bbox():
    m = _mapping_with_pixels(num_images=3)
    pos = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    cam_pos = np.array([[0.5, 0.5, 0.5],    # inside
                        [9.0, 0.5, 0.5],    # outside x
                        [0.5, 0.5, 5.0]],   # outside z only
                       np.float32)
    cloud = {"pos": pos, "mapping": m, "cam_pos": cam_pos,
             "images": np.zeros((3, 8, 6, 3), np.uint8)}
    out = t2.drop_images_outside_bbox(cloud)
    assert out["mapping"].num_images == 1 and len(out["images"]) == 1
    out2 = t2.drop_images_outside_bbox(cloud, ignore_z=True)
    assert out2["mapping"].num_images == 2
    out3 = t2.drop_images_outside_bbox(cloud, margin=100.0)
    assert out3["mapping"].num_images == 3


def test_pick_k_images_strided_and_random():
    m = _mapping_with_pixels(num_images=6)
    cloud = {"mapping": m, "images": np.arange(6)[:, None, None, None]
             * np.ones((6, 8, 6, 3), np.uint8)}
    strided = t2.pick_k_images(cloud, k=2)
    assert strided["mapping"].num_images == 3
    np.testing.assert_array_equal(strided["images"][:, 0, 0, 0], [0, 2, 4])
    rand = t2.pick_k_images(cloud, k=3, random=True,
                            rng=np.random.default_rng(0))
    assert rand["mapping"].num_images == 3
    assert len(set(rand["images"][:, 0, 0, 0].tolist())) == 3


def test_grid_sample_images_keeps_last_per_cell():
    m = _mapping_with_pixels(num_images=4)
    cam_pos = np.array([[0.1, 0.1, 0.1],
                        [0.2, 0.2, 0.2],    # same cell as image 0 -> kept (last)
                        [5.0, 0.1, 0.1],
                        [0.1, 5.0, 0.1]], np.float32)
    cloud = {"mapping": m, "cam_pos": cam_pos,
             "images": np.arange(4)[:, None, None, None]
             * np.ones((4, 8, 6, 3), np.uint8)}
    out = t2.grid_sample_images(cloud, size=1.0)
    assert out["mapping"].num_images == 3
    kept = out["images"][:, 0, 0, 0].tolist()
    assert kept == [1, 2, 3]   # image 1 is the LAST of the shared cell


def test_pixel_coordinate_features(rng):
    import numpy as np
    from deepviewagg_tpu.data.transforms2d import (
        add_pixel_height_feature, add_pixel_width_feature)

    imgs = rng.random((2, 8, 6, 3)).astype(np.float32)
    out = add_pixel_height_feature(imgs)
    assert out.shape == (2, 8, 6, 4)
    np.testing.assert_allclose(out[0, 0, :, 3], np.linspace(0, 1, 6), rtol=1e-6)
    np.testing.assert_array_equal(out[..., :3], imgs)
    out = add_pixel_width_feature(imgs)
    assert out.shape == (2, 8, 6, 4)
    np.testing.assert_allclose(out[1, :, 0, 3], np.linspace(0, 1, 8), rtol=1e-6)


def test_persistent_dropout2d_shares_mask_across_images(rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepviewagg_tpu.modules.image_encoders import PersistentDropout2d

    x = jnp.ones((3, 4, 4, 16))
    m = PersistentDropout2d(p=0.5)
    out = m.apply({}, x, train=True,
                  rngs={"dropout": jax.random.PRNGKey(0)})
    out = np.asarray(out)
    # one channel mask for every image and pixel
    per_channel = out[0, 0, 0]
    assert (out == per_channel[None, None, None, :]).all()
    dropped = per_channel == 0
    assert dropped.any() and not dropped.all()
    np.testing.assert_allclose(per_channel[~dropped], 2.0)  # inverted scale
    # eval mode = identity
    out_eval = np.asarray(m.apply({}, x, train=False))
    np.testing.assert_array_equal(out_eval, np.ones_like(out_eval))


def test_select_images_by_credit_budget_and_uniform_equivalence():
    """Uniform sizes degenerate to select_images_by_coverage; heterogeneous
    sizes respect the pixel budget (eval-time PickImagesFromMemoryCredit
    semantics, image.py:765-874)."""
    import numpy as np

    from deepviewagg_tpu.data.mapping import MultiViewMapping
    from deepviewagg_tpu.data.transforms2d import (
        select_images_by_coverage, select_images_by_credit)

    rng = np.random.default_rng(0)
    n_pts, n_img, n_views = 120, 7, 260
    pid = np.sort(rng.integers(0, n_pts, n_views)).astype(np.int32)
    img = rng.integers(0, n_img, n_views).astype(np.int32)
    m = MultiViewMapping(
        point_id=pid, image_id=img,
        view_feats=np.zeros((n_views, 8), np.float32),
        view_valid=np.ones(n_views, bool),
        pix_view=np.arange(n_views, dtype=np.int32),
        pix_x=np.zeros(n_views, np.int32), pix_y=np.zeros(n_views, np.int32),
        pix_valid=np.ones(n_views, bool),
        num_points=n_pts, num_images=n_img,
    )
    uniform = np.full(n_img, 100, np.int64)
    np.testing.assert_array_equal(
        select_images_by_credit(m, 300, uniform),
        select_images_by_coverage(m, 3),
    )
    # heterogeneous: one panorama costs the whole budget of 4 small frames
    sizes = np.array([400, 100, 100, 100, 100, 100, 100], np.int64)
    keep = select_images_by_credit(m, 400, sizes)
    assert sizes[keep].sum() <= 400
    assert len(keep) >= 1
