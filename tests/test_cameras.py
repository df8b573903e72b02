import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.core import cameras as cam


def test_opk_rotation_orthonormal():
    r = np.asarray(cam.opk_to_rotation(jnp.array([0.3, -0.2, 1.1])))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, rtol=1e-6)


def test_opk_identity():
    r = np.asarray(cam.opk_to_rotation(jnp.zeros(3)))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-7)


def test_equirectangular_known_angles():
    size = (1024, 512)
    # identity pose: +x axis -> t=0 -> w=(W-1)/2... t=atan2(y,x); x-axis t=0
    pts = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    r = jnp.linalg.norm(pts, axis=1)
    x, y, _ = cam.equirectangular_projection(pts, r, jnp.zeros(3), size)
    x, y = np.asarray(x), np.asarray(y)
    # +x: t=0 -> x=(W-1)/2 ; p=acos(0)=pi/2 -> y=(H-1)/2
    np.testing.assert_allclose(x[0], (1024 - 1) / 2, atol=1e-3)
    np.testing.assert_allclose(y[0], (512 - 1) / 2, atol=1e-3)
    # up pole: p=0 -> y=0 ; down pole: p=pi -> y=H-1 (mod H)
    np.testing.assert_allclose(y[1], 0.0, atol=1e-3)
    np.testing.assert_allclose(y[2], 511.0, atol=1e-3)  # (H-1)*pi/pi mod H


def test_pinhole_scannet_center():
    K = np.array([[500.0, 0, 320, 0], [0, 500.0, 240, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    extr = np.eye(4)  # world->cam identity
    pts = jnp.array([[0.0, 0.0, 2.0], [0.5, 0.0, 2.0]])
    x, y, z = cam.pinhole_projection(pts, extr, K, model="scannet")
    np.testing.assert_allclose(np.asarray(x), [320.0, 320 + 0.5 * 500 / 2], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y), [240.0, 240.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z), [2.0, 2.0], rtol=1e-6)


def test_pinhole_kitti_inverse_convention():
    # cam->world extrinsic that translates camera to (1,2,3): a point at
    # camera-frame (0,0,4) sits at world (1,2,7)
    K = np.array([[400.0, 0, 100, 0], [0, 400.0, 80, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    extr = np.eye(4)
    extr[:3, 3] = [1, 2, 3]
    x, y, z = cam.pinhole_projection(
        jnp.array([[1.0, 2.0, 7.0]]), extr, K, model="kitti360_perspective"
    )
    np.testing.assert_allclose(np.asarray(x), [100.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y), [80.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z), [4.0], rtol=1e-6)


def test_fisheye_on_axis():
    fe = np.array([1.0, 0.1, 0.01, 400.0, 400.0, 250.0, 250.0], np.float32)
    extr = np.eye(4)
    x, y, z = cam.fisheye_projection(jnp.array([[0.0, 0.0, 5.0]]), extr, fe)
    # on-axis: x=y=0 -> pixel (u0, v0)
    np.testing.assert_allclose(np.asarray(x), [250.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(y), [250.0], atol=1e-3)
    assert float(z[0]) > 0


def test_project_masks_range_and_fov():
    c = cam.Camera(
        model="scannet",
        size=(640, 480),
        extrinsic=np.eye(4),
        intrinsic=np.array(
            [[500.0, 0, 320, 0], [0, 500.0, 240, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        ),
        r_min=0.5,
        r_max=10.0,
    )
    pts = jnp.array(
        [
            [0.0, 0.0, 2.0],    # visible
            [0.0, 0.0, -2.0],   # behind camera
            [0.0, 0.0, 50.0],   # beyond r_max
            [0.0, 0.0, 0.1],    # below r_min
            [5.0, 0.0, 2.0],    # out of image bounds
        ]
    )
    x, y, d, valid = cam.project(pts, c)
    np.testing.assert_array_equal(np.asarray(valid), [True, False, False, False, False])
    np.testing.assert_allclose(np.asarray(d)[0], 2.0, rtol=1e-6)
