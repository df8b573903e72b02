import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.core import cameras as cam
from deepviewagg_tpu.core import visibility as vis

K = np.array([[100.0, 0, 32, 0], [0, 100.0, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]])


def _camera(size=(64, 64)):
    return cam.Camera(
        model="scannet", size=size, extrinsic=np.eye(4), intrinsic=K,
        r_min=0.1, r_max=100.0,
    )


def test_zbuffer_occlusion():
    c = _camera()
    # near point occludes far point on the same ray
    pts = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 2.0]])
    idx_map, depth_map, *_ = vis.splat_zbuffer(c, pts, voxel=0.1, max_splat=6)
    idx_map = np.asarray(idx_map)
    # center pixel must belong to the NEAR point (index 1)
    assert idx_map[32, 32] == 1
    assert 0 not in np.unique(idx_map)  # far point fully occluded
    d = np.asarray(depth_map)
    np.testing.assert_allclose(d[32, 32], 2.0, rtol=1e-5)


def test_zbuffer_separate_points_both_seen():
    c = _camera()
    pts = jnp.array([[0.0, 0.0, 2.0], [0.4, 0.0, 2.0]])  # 20px apart
    idx_map, *_ = vis.splat_zbuffer(c, pts, voxel=0.1, max_splat=6)
    seen = set(np.unique(np.asarray(idx_map))) - {-1}
    assert seen == {0, 1}


def test_zbuffer_exact_mode_center_only():
    c = _camera()
    pts = jnp.array([[0.0, 0.0, 2.0]])
    idx_map, depth_map, *_ = vis.splat_zbuffer(
        c, pts, voxel=0.5, max_splat=8, exact=True
    )
    idx_map = np.asarray(idx_map)
    ys, xs = np.where(idx_map.T >= 0)
    # exactly one pixel mapped, at the center projection
    assert len(xs) == 1 and xs[0] == 32 and ys[0] == 32


def test_zbuffer_invalid_points_ignored():
    c = _camera()
    pts = jnp.array([[0.0, 0.0, -2.0], [0.0, 0.0, 0.05]])  # behind / too close
    idx_map, *_ = vis.splat_zbuffer(c, pts, voxel=0.1)
    assert np.all(np.asarray(idx_map) == -1)


def test_depth_map_visibility():
    depth = jnp.full((64, 64), 3.0)
    x = jnp.array([10.0, 20.0])
    y = jnp.array([10.0, 20.0])
    d = jnp.array([3.05, 5.0])
    ok = np.asarray(vis.depth_map_visibility(x, y, d, depth, depth_threshold=0.05))
    np.testing.assert_array_equal(ok, [True, False])


def test_postprocess_features_order_and_values():
    n = 4
    rng = np.random.default_rng(0)
    xyz_to_img = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    dist = jnp.linalg.norm(xyz_to_img, axis=1)
    y_proj = jnp.array([0.0, 128.0, 256.0, 511.0])
    lin = jnp.full((n,), 0.1)
    pla = jnp.full((n,), 0.2)
    sca = jnp.full((n,), 0.3)
    normals = xyz_to_img / dist[:, None]  # normal == view dir -> orientation 1
    f = np.asarray(
        vis.postprocess_features(
            xyz_to_img, y_proj, dist, lin, pla, sca, normals, 512, r_min=0.5, r_max=30.0
        )
    )
    assert f.shape == (n, 6)
    np.testing.assert_allclose(f[:, 0], (np.asarray(dist) - 0.5) / 30.0001, rtol=1e-4)
    np.testing.assert_allclose(f[:, 1], 0.1, rtol=1e-6)
    np.testing.assert_allclose(f[:, 4], 1.0, rtol=1e-3)
    np.testing.assert_allclose(f[:, 5], np.asarray(y_proj) / 512)
