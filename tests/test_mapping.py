"""Mapping factory + MultiViewMapping reindex ops on the synthetic room.

The integration strategy mirrors the reference's synthetic notebook
(SURVEY.md §4.2): build mappings on a generated scene, then check structural
invariants and that propagating point colors through the mappings paints a
consistent image (visibility sanity: a camera inside a closed room must see a
large fraction of wall/floor pixels).
"""

import numpy as np
import pytest

from deepviewagg_tpu.data import synthetic
from deepviewagg_tpu.data.mapping import concatenate_mappings
from deepviewagg_tpu.data.mapping_factory import VisibilityParams, build_mappings


@pytest.fixture(scope="module")
def scene_and_mapping():
    scene = synthetic.make_scene(seed=1, density=150.0, n_cameras=2,
                                 image_size=(160, 80))
    params = VisibilityParams(voxel=0.1, exact=False, max_splat=6)
    mapping = build_mappings(scene.pos, scene.cameras, params)
    return scene, mapping


def test_mapping_invariants(scene_and_mapping):
    scene, m = scene_and_mapping
    m.check()
    assert m.num_views > 0 and m.num_pixels >= m.num_views
    assert m.num_points == len(scene.pos)
    assert m.num_images == len(scene.cameras)
    # each camera inside the room must see a decent share of points
    seen = m.points_seen()
    assert seen.mean() > 0.3, f"only {seen.mean():.1%} points seen"
    # view features in sane ranges
    f = m.view_feats[m.view_valid]
    assert np.isfinite(f).all()
    assert (f[:, 0] >= -0.1).all() and (f[:, 0] <= 1.1).all()   # norm depth
    assert (f[:, 4] >= 0).all() and (f[:, 4] <= 1.0001).all()    # |cos| angle
    assert (f[:, 7] >= 0).all() and (f[:, 7] <= 1.0001).all()    # occlusion


def test_mapping_renders_room(scene_and_mapping):
    scene, m = scene_and_mapping
    imgs = synthetic.render_views(scene, m)
    covered = (imgs.sum(axis=-1) > 0).mean(axis=(1, 2))
    # panoramas inside a closed room: most pixels should be painted
    assert (covered > 0.8).all(), covered


def test_merge_points_preserves_views(scene_and_mapping):
    scene, m = scene_and_mapping
    n = m.num_points
    # merge pairs: parent = i // 2
    parent = np.arange(n, dtype=np.int64) // 2
    merged = m.merge_points(parent, (n + 1) // 2)
    merged.check()
    assert merged.num_views == m.num_views
    assert merged.num_pixels == m.num_pixels
    # a point seen before must map to a seen coarse point
    seen_f = m.points_seen()
    seen_c = merged.points_seen()
    assert np.all(seen_c[parent[np.nonzero(seen_f)[0]]])


def test_select_images(scene_and_mapping):
    scene, m = scene_and_mapping
    sub = m.select_images([1])
    sub.check()
    assert sub.num_images == 1
    assert sub.num_views == int((m.image_id[m.view_valid] == 1).sum())
    # capacities unchanged (static shapes preserved)
    assert sub.view_capacity == m.view_capacity
    assert sub.pixel_capacity == m.pixel_capacity


def test_concatenate_mappings(scene_and_mapping):
    scene, m = scene_and_mapping
    n = m.num_points
    batch = concatenate_mappings([m, m], [0, n], 2 * n)
    batch.check()
    assert batch.num_views == 2 * m.num_views
    assert batch.num_images == 2 * m.num_images
    # second copy's points live in [n, 2n)
    second = batch.point_id[batch.view_valid][m.num_views:]
    assert (second >= n).all()


def test_pad_roundtrip(scene_and_mapping):
    _, m = scene_and_mapping
    p = m.pad(m.view_capacity + 100, m.pixel_capacity + 500)
    p.check()
    assert p.num_views == m.num_views
    assert p.num_pixels == m.num_pixels
