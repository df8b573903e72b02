"""Transform chains: 3D augmentation + sampling + image selection."""

import numpy as np
import pytest

from deepviewagg_tpu.data import synthetic, transforms2d, transforms3d
from deepviewagg_tpu.data.mapping_factory import VisibilityParams, build_mappings


@pytest.fixture(scope="module")
def cloud():
    scene = synthetic.make_scene(seed=3, density=100.0, n_cameras=3,
                                 image_size=(96, 48))
    mapping = build_mappings(
        scene.pos, scene.cameras, VisibilityParams(voxel=0.12, max_splat=5)
    )
    return {
        "pos": scene.pos, "rgb": scene.rgb, "labels": scene.labels,
        "normal": None, "mapping": mapping,
        "images": synthetic.render_views(scene, mapping),
    }


def test_rotation_preserves_norms(cloud, rng):
    t = transforms3d.RandomRotate()
    out = t(cloud, rng)
    np.testing.assert_allclose(
        np.linalg.norm(out["pos"], axis=1),
        np.linalg.norm(cloud["pos"], axis=1), rtol=1e-4,
    )


def test_sphere_select_tracks_mapping(cloud):
    center = cloud["pos"].mean(0)
    sub = transforms3d.sphere_select(cloud, center, 2.0)
    n = len(sub["pos"])
    assert 0 < n < len(cloud["pos"])
    m = sub["mapping"]
    m.check()
    assert m.num_points == n
    assert len(sub["labels"]) == n
    # views must reference only in-sphere points
    assert (m.point_id[m.view_valid] < n).all()


def test_quantize_cloud_merges_mapping(cloud):
    q = transforms3d.quantize_cloud(cloud, 0.3)
    assert "coords" in q and len(q["coords"]) == len(q["pos"])
    assert len(q["pos"]) < len(cloud["pos"])
    q["mapping"].check()
    assert q["mapping"].num_points == len(q["pos"])
    # views of the same coarse (point, image) pair merge into one
    # (ref image.py:2231-2246 scatter_mean over composite ids), so the
    # merged mapping has exactly the unique pairs, each appearing once
    m = q["mapping"]
    pairs = np.stack([m.point_id[m.view_valid], m.image_id[m.view_valid]], 1)
    assert len(np.unique(pairs, axis=0)) == m.num_views
    assert 0 < m.num_views <= cloud["mapping"].num_views


def test_pick_images_by_credit(cloud, rng):
    out = transforms2d.pick_images_by_credit(cloud, n_slots=2, rng=rng)
    assert out["mapping"].num_images == 2
    assert out["images"].shape[0] == 2
    out["mapping"].check()


def test_pick_images_by_area(cloud):
    out = transforms2d.pick_images_by_area(cloud, min_points=1)
    assert out["mapping"].num_images == cloud["mapping"].num_images
    out2 = transforms2d.pick_images_by_area(cloud, min_points=10**9)
    assert out2["mapping"].num_images == 0


def test_pick_images_by_area_bbox(cloud):
    """use_bbox (image.py:740-754): bbox-of-mapped-pixels area criterion,
    never returns an empty image set."""
    out = transforms2d.pick_images_by_area(cloud, use_bbox=True,
                                           area_ratio=0.001)
    assert out["mapping"].num_images >= 1
    out["mapping"].check()
    # an absurd ratio keeps exactly the largest-bbox image (n_min guard)
    out2 = transforms2d.pick_images_by_area(cloud, use_bbox=True,
                                            area_ratio=10.0)
    assert out2["mapping"].num_images == 1
    out2["mapping"].check()


def test_random_dropout_consistency(cloud, rng):
    t = transforms3d.RandomDropout(dropout_ratio=0.5, p=1.0)
    out = t(cloud, rng)
    n = len(out["pos"])
    assert abs(n - len(cloud["pos"]) // 2) < 5
    assert out["mapping"].num_points == n
    out["mapping"].check()
