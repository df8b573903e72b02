"""Crop-group families: bucket assignment, pixel split, device branch.

Equivalence check: with a single full-size bucket, the MultiBucketBranch
must reproduce the single-tensor UnimodalBranch output exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepviewagg_tpu.data import synthetic
from deepviewagg_tpu.data.crop_groups import (
    assign_crop_groups, crop_ladder, split_mapping_by_bucket,
)
from deepviewagg_tpu.data.mapping_factory import VisibilityParams, build_mappings
from deepviewagg_tpu.modules.branch import UnimodalBranch
from deepviewagg_tpu.modules.multibucket import MultiBucketBranch


@pytest.fixture(scope="module")
def cloud():
    scene = synthetic.make_scene(seed=21, density=60.0, n_cameras=3,
                                 image_size=(128, 64))
    m = build_mappings(scene.pos, scene.cameras,
                       VisibilityParams(voxel=0.15, max_splat=4))
    return {
        "pos": scene.pos, "mapping": m,
        "images": synthetic.render_views(scene, m).astype(np.float32),
    }


def test_ladder_and_assignment(cloud):
    ladder = crop_ladder((128, 64), min_size=16)
    assert ladder[-1] == (128, 64) and ladder[0][0] < 128
    out = assign_crop_groups(dict(cloud), ladder)
    assert out["image_bucket"].shape == (cloud["mapping"].num_images,)
    mm = split_mapping_by_bucket(out, ladder)
    total_pix = sum(len(b["pix_view"]) for b in mm["buckets"])
    assert total_pix == cloud["mapping"].num_pixels
    for b in mm["buckets"]:
        assert (np.diff(b["pix_view"]) >= 0).all()   # sorted for segment ops
        assert (b["pix_x"] < b["size"][0]).all()
        assert (b["pix_y"] < b["size"][1]).all()


def test_multibucket_matches_single_bucket(cloud):
    """One full-size bucket == the plain UnimodalBranch (no tower)."""
    m = cloud["mapping"]
    n = m.num_points
    ladder = [(128, 64)]
    out = assign_crop_groups(dict(cloud), ladder)
    mm = split_mapping_by_bucket(out, ladder)

    mb = MultiBucketBranch(tower=None, out_channels=8, view_pool="max",
                           fusion_mode="modality")
    v1 = mb.init(jax.random.PRNGKey(0), None, mm, train=False, num_points=n)
    got, seen1 = mb.apply(v1, None, mm, train=False, num_points=n)

    ub = UnimodalBranch(tower=None, out_channels=8, view_pool="max",
                        fusion_mode="modality")
    dev = m.to_device()
    v2 = ub.init(jax.random.PRNGKey(0), None, cloud["images"], dev,
                 (128, 64), train=False, num_points=n)
    ref, seen2, _ = ub.apply(v2, None, cloud["images"], dev, (128, 64),
                             train=False, num_points=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(seen1), np.asarray(seen2))


def test_multibucket_with_tower_and_crops(cloud):
    """Multiple buckets + shared tower: finite outputs, correct seen mask."""
    from deepviewagg_tpu.modules.image_encoders import ResNet18

    m = cloud["mapping"]
    n = m.num_points
    ladder = crop_ladder((128, 64), min_size=16)
    out = assign_crop_groups(dict(cloud), ladder)
    mm = split_mapping_by_bucket(out, ladder)
    tower = functools.partial(ResNet18, out_level=1, name="tower")
    mb = MultiBucketBranch(tower=tower, out_channels=16, view_pool="group",
                           num_groups=2, fusion_mode="modality")
    variables = mb.init(jax.random.PRNGKey(0), None, mm, train=False,
                        num_points=n)
    pooled, seen = mb.apply(variables, None, mm, train=False, num_points=n)
    assert pooled.shape == (n, 16)
    assert np.isfinite(np.asarray(pooled)).all()
    np.testing.assert_array_equal(np.asarray(seen), m.points_seen())


def test_multibucket_view_sharded_matches_unsharded(cloud):
    """Crop-ladder towers under view parallelism: each bucket's tower runs
    block-sharded over the model axis (image_encoders.view_shard_axis via
    run_tower) and must reproduce the unsharded pooled features exactly
    (f32 convs; per-image math is split-invariant)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from deepviewagg_tpu.modules.image_encoders import (ResNet18, f32_convs,
                                                        view_shard_axis)
    from deepviewagg_tpu.parallel.mesh import make_mesh

    m = cloud["mapping"]
    n = m.num_points
    ladder = crop_ladder((128, 64), min_size=16)
    out = assign_crop_groups(dict(cloud), ladder)
    mm = split_mapping_by_bucket(out, ladder)
    tower = functools.partial(ResNet18, out_level=1, name="tower")
    mb = MultiBucketBranch(tower=tower, out_channels=16, view_pool="group",
                           num_groups=2, fusion_mode="modality",
                           tower_bf16=False)
    variables = mb.init(jax.random.PRNGKey(0), None, mm, train=False,
                        num_points=n)

    with f32_convs():
        ref = np.asarray(jax.jit(
            lambda v: mb.apply(v, None, mm, train=False, num_points=n)[0]
        )(variables))

    mesh = make_mesh(jax.devices()[:2], axis="model")

    def fwd(v):
        with view_shard_axis("model"):
            return mb.apply(v, None, mm, train=False, num_points=n)[0]

    with f32_convs():
        got = np.asarray(jax.jit(jax.shard_map(
            fwd, mesh=mesh, in_specs=(P(),), out_specs=P(), check_vma=False,
        ))(variables))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
