"""Golden tests for camera and transform math (pure additions)."""

import jax.numpy as jnp
import numpy as np

from hands_tpu.core import camera as cam
from hands_tpu.core import transforms as tf


def test_wp_persp_roundtrip(rng):
    cam_t = jnp.asarray(
        np.abs(rng.randn(8, 3)) + np.asarray([0, 0, 0.3]), jnp.float32)
    f = jnp.full((8,), 1000.0)
    wp = cam.perspective_to_weak_perspective(cam_t, f, 224)
    back = cam.weak_perspective_to_perspective(wp, f, 224)
    np.testing.assert_allclose(np.asarray(back), np.asarray(cam_t), rtol=1e-4)


def test_estimate_translation_recovers_gt(rng):
    """DLT translation solve recovers a known camera translation exactly."""
    S = jnp.asarray(rng.randn(4, 21, 3) * 0.1, jnp.float32)
    t_gt = jnp.asarray(rng.randn(4, 3) * 0.2 + np.asarray([0, 0, 0.8]),
                       jnp.float32)
    f = 900.0
    res = 224
    pts = S + t_gt[:, None]
    proj = pts[..., :2] / pts[..., 2:] * f + res / 2
    conf = jnp.ones((4, 21))
    t_est = cam.estimate_translation(S, proj, conf, f, res)
    np.testing.assert_allclose(np.asarray(t_est), np.asarray(t_gt), atol=1e-3)


def test_project2d_matches_manual(rng):
    K = jnp.asarray([[[500.0, 0, 100], [0, 500.0, 120], [0, 0, 1]]])
    pts = jnp.asarray([[[0.1, -0.05, 0.5]]])
    out = np.asarray(cam.project2d(K, pts))[0, 0]
    np.testing.assert_allclose(out, [0.1 / 0.5 * 500 + 100,
                                     -0.05 / 0.5 * 500 + 120], rtol=1e-5)


def test_crop_adjusted_intrinsics_semantics():
    """fx' = k fx, cx' = k (cx - x1) (reference get_aug_intrix)."""
    K = jnp.asarray([[[1000.0, 0, 640], [0, 1000.0, 360], [0, 0, 1]]])
    out = np.asarray(cam.crop_adjusted_intrinsics(
        K, jnp.asarray([500.0]), jnp.asarray([300.0]), jnp.asarray([2.0]),
        224))[0]
    dim = 2.0 * 200
    k = 224 / dim
    np.testing.assert_allclose(out[0, 0], 1000 * k, rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], (640 - (500 - dim / 2)) * k,
                               rtol=1e-6)


def test_solve_rigid_exact(rng):
    from hands_tpu.core import rot as rotlib

    A = jnp.asarray(rng.randn(3, 50, 3), jnp.float32)
    R_gt = rotlib.axis_angle_to_matrix(jnp.asarray(rng.randn(3, 3), jnp.float32))
    t_gt = jnp.asarray(rng.randn(3, 3, 1), jnp.float32)
    B = jnp.einsum("bij,bnj->bni", R_gt, A) + t_gt[..., 0][:, None]
    R, t = tf.solve_rigid_tf(A, B)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-4)


def test_distortion_zero_coeffs_identity(rng):
    pts = jnp.asarray(rng.randn(2, 10, 3) + np.asarray([0, 0, 2.0]),
                      jnp.float32)
    out = tf.distort_pts3d(pts, jnp.zeros(8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_distortion_radial_direction():
    """Positive k1 pushes off-axis points outward (barrel model math)."""
    pts = jnp.asarray([[[0.5, 0.0, 1.0]]])
    coeffs = jnp.asarray([0.1, 0, 0, 0, 0, 0, 0, 0])
    out = np.asarray(tf.distort_pts3d(pts, coeffs))[0, 0]
    assert out[0] > 0.5
    np.testing.assert_allclose(out[2], 1.0)


def test_homogeneous_roundtrip(rng):
    pts = jnp.asarray(rng.randn(2, 7, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(tf.to_xyz(tf.to_homo(pts))), np.asarray(pts), atol=1e-6)


def test_transform_points_identity(rng):
    pts = jnp.asarray(rng.randn(2, 5, 3), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    np.testing.assert_allclose(
        np.asarray(tf.transform_points(eye, pts)), np.asarray(pts), atol=1e-6)


def test_look_at_points_to_target():
    # eye off the up-axis (up=[0,0,1] default; eye on the axis is degenerate,
    # exactly like the reference)
    eye = jnp.asarray([[2.0, 0.0, 0.0]])
    R = np.asarray(cam.look_at(eye))[0]
    # camera z axis points from target to eye: +x
    np.testing.assert_allclose(R[:, 2], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
