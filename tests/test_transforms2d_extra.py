"""CenterRoll / crop / flip transforms + spatial ops + new loss paths."""

import numpy as np
import pytest

from deepviewagg_tpu.data import synthetic, transforms2d
from deepviewagg_tpu.data.mapping_factory import VisibilityParams, build_mappings


@pytest.fixture(scope="module")
def cloud():
    scene = synthetic.make_scene(seed=11, density=80.0, n_cameras=2,
                                 image_size=(128, 64))
    mapping = build_mappings(
        scene.pos, scene.cameras, VisibilityParams(voxel=0.12, max_splat=5)
    )
    return {
        "pos": scene.pos, "labels": scene.labels, "mapping": mapping,
        "images": synthetic.render_views(scene, mapping),
    }


def test_center_roll_consistency(cloud):
    rolled = transforms2d.center_roll(cloud, angular_res=8)
    m0, m1 = cloud["mapping"], rolled["mapping"]
    assert m1.num_pixels == m0.num_pixels
    # rolled image must still carry the mapped point's color at the new pixel
    imgs0, imgs1 = cloud["images"], rolled["images"]
    q = m0.pix_valid
    vc = m0.view_capacity
    pv = np.minimum(m0.pix_view, vc - 1)
    img_ids = m0.image_id[pv]
    sel = np.nonzero(q)[0][:500]
    a = imgs0[img_ids[sel], m0.pix_x[sel], m0.pix_y[sel]]
    b = imgs1[img_ids[sel], m1.pix_x[sel], m1.pix_y[sel]]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_crop_images_keeps_views(cloud):
    out = transforms2d.crop_images(dict(cloud), (64, 32))
    m = out["mapping"]
    m.check()   # includes the >=1-pixel-per-view invariant
    assert out["images"].shape[1:3] == (64, 32)
    assert (m.pix_x[m.pix_valid] < 64).all()
    assert (m.pix_y[m.pix_valid] < 32).all()
    assert m.num_views == cloud["mapping"].num_views


def test_crop_images_odd_sizes(cloud):
    out = transforms2d.crop_images(dict(cloud), (63, 31))
    out["mapping"].check()
    assert out["images"].shape[1:3] == (63, 31)


def test_horizontal_flip_roundtrip(cloud, rng):
    out = transforms2d.random_horizontal_flip(dict(cloud), rng, p=1.0)
    out2 = transforms2d.random_horizontal_flip(out, rng, p=1.0)
    np.testing.assert_array_equal(out2["mapping"].pix_x, cloud["mapping"].pix_x)
    np.testing.assert_allclose(out2["images"], cloud["images"])


def test_spatial_ops(rng):
    from deepviewagg_tpu.ops.spatial import (
        ball_query, farthest_point_sample, knn_interpolate,
    )

    pos = rng.uniform(0, 4, (500, 3)).astype(np.float32)
    idx = np.asarray(farthest_point_sample(pos, 32))
    assert len(np.unique(idx)) == 32
    # FPS spreads: min pairwise distance among selected >> random selection
    sel = pos[idx]
    d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
    np.fill_diagonal(d, 1e9)
    rand = pos[rng.choice(500, 32, replace=False)]
    dr = np.linalg.norm(rand[:, None] - rand[None], axis=-1)
    np.fill_diagonal(dr, 1e9)
    assert d.min() > dr.min() * 1.2

    nbr, counts = ball_query(pos[:10], pos, radius=0.5, k=8)
    d = np.linalg.norm(pos[nbr] - pos[:10, None], axis=-1)
    assert (d[counts > 0][..., 0] <= 0.5 + 1e-5).all()

    feats = pos.sum(axis=1, keepdims=True)
    up = np.asarray(knn_interpolate(feats, pos, pos[:50], k=3))
    np.testing.assert_allclose(up[:, 0], feats[:50, 0], atol=0.3)


def test_view_loss_and_propagate(rng):
    import jax.numpy as jnp

    from deepviewagg_tpu.models.losses import propagate_unseen, view_level_loss

    labels = jnp.array([0, 1, 2, -1])
    point_id = jnp.array([0, 0, 1, 2, 4], jnp.int32)
    view_valid = jnp.array([1, 1, 1, 1, 0], bool)
    perfect = jnp.stack([
        jnp.eye(3)[jnp.array([0, 0, 1, 2, 0])] * 50.0
    ])[0]
    assert float(view_level_loss(perfect, labels, point_id, view_valid)) < 1e-3

    pos = np.array([[0, 0, 0], [1, 0, 0], [0.1, 0, 0]], np.float32)
    logits = np.array([[5.0, 0], [0, 5.0], [9.9, 9.9]], np.float32)
    seen = np.array([True, True, False])
    out = propagate_unseen(logits, pos, seen)
    np.testing.assert_allclose(out[2], logits[0])


def test_pick_mappings_by_features(cloud):
    """PickMappingsFromMappingFeatures semantics: strict-threshold view
    dropping on a mapping-feature column; invariants restored (valid views
    own >= 1 pixel, dropped views' pixels vanish, unseen points appear)."""
    from deepviewagg_tpu.data.transforms2d import pick_mappings_by_features

    m = cloud["mapping"]
    col = 0
    med = float(np.median(m.view_feats[m.view_valid, col]))
    out = pick_mappings_by_features(dict(cloud), feat=col, lower=med)
    m2 = out["mapping"]
    m2.check()
    assert 0 < m2.num_views < m.num_views
    assert (m2.view_feats[m2.view_valid, col] > med).all()
    # no-op bounds keep everything
    out2 = pick_mappings_by_features(dict(cloud), feat=col, lower=None,
                                     upper=None)
    assert out2["mapping"].num_views == m.num_views
