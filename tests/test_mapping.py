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
    # reference merge semantics (image.py:2167-2277): views of the same
    # coarse (point, image) pair merge into one; duplicate pixels collapse
    v = m.view_valid
    key = parent[m.point_id[v]] * m.num_images + m.image_id[v]
    assert merged.num_views == len(np.unique(key))
    assert merged.num_pixels <= m.num_pixels
    assert merged.num_pixels >= merged.num_views
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


def test_shuffle_data_remaps_mapping(scene_and_mapping):
    # ShuffleData must shuffle point rows AND remap the mapping (it used to
    # silently no-op whenever a mapping was present)
    from deepviewagg_tpu.data.transforms3d import ShuffleData

    scene, mapping = scene_and_mapping
    n = len(scene.pos)
    cloud = {"pos": scene.pos.copy(),
             "labels": np.arange(n, dtype=np.int32),
             "mapping": mapping}
    rng = np.random.default_rng(3)
    out = ShuffleData()(cloud, rng)
    assert not np.array_equal(out["pos"], cloud["pos"])
    out["mapping"].check()
    # each point keeps its view count under the permutation
    def counts(m, labels):
        c = np.zeros(n, np.int64)
        v = m.view_valid
        np.add.at(c, labels[np.minimum(m.point_id, n - 1)[v]], 1)
        return c

    np.testing.assert_array_equal(
        counts(cloud["mapping"], cloud["labels"]),
        counts(out["mapping"], out["labels"]),
    )


def test_drop_pixels_restores_invariants(scene_and_mapping):
    _, mapping = scene_and_mapping
    rng = np.random.default_rng(5)
    keep = rng.random(mapping.pixel_capacity) > 0.5
    out = mapping.drop_pixels(keep)
    out.check()
    assert out.num_pixels <= int((keep & mapping.pix_valid).sum())


def test_coverage_selection_incremental_matches_naive(scene_and_mapping):
    # the incremental greedy must pick exactly what the O(n*V) version did
    from deepviewagg_tpu.data.transforms2d import select_images_by_coverage

    _, mapping = scene_and_mapping
    m = mapping
    v = m.view_valid
    img_of_view = m.image_id[v].astype(np.int64)
    pid_of_view = m.point_id[v].astype(np.int64)
    totals = np.bincount(img_of_view, minlength=m.num_images).astype(np.int64)
    unseen = np.ones(m.num_points, bool)
    remaining = np.ones(m.num_images, bool)
    naive = []
    for _ in range(max(m.num_images - 1, 1)):
        gain = np.zeros(m.num_images, np.int64)
        np.add.at(gain, img_of_view, unseen[pid_of_view])
        score = np.where(remaining, gain * (totals.max() + 1) + totals, -1)
        choice = int(np.argmax(score))
        if score[choice] < 0:
            break
        naive.append(choice)
        remaining[choice] = False
        unseen[pid_of_view[img_of_view == choice]] = False
    got = select_images_by_coverage(m, max(m.num_images - 1, 1))
    np.testing.assert_array_equal(np.sort(naive), got)


def test_duplicate_points_keep_features_finite():
    """Coincident points make the kNN d2_max exactly 0; the reference's
    isnan-only density guard (image.py:537-543) would let +inf through and
    poison the view pool.  build_mappings must emit finite features for ALL
    views (density -> 1.0 on such neighborhoods)."""
    scene = synthetic.make_scene(seed=3, density=120.0, n_cameras=2,
                                 image_size=(128, 64))
    pos = np.asarray(scene.pos, np.float32).copy()
    # clone a few points MORE times than knn_k (16), so the whole kNN
    # neighborhood is coincident and d2_max is exactly 0
    pos = np.concatenate([pos, np.repeat(pos[:8], 20, axis=0)], axis=0)
    params = VisibilityParams(voxel=0.1, exact=False, max_splat=6)
    m = build_mappings(pos, scene.cameras, params)
    feats = m.view_feats[m.view_valid]
    assert np.isfinite(feats).all(), "non-finite view features"
