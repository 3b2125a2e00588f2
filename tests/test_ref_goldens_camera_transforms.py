"""Golden-parity tests: hands_tpu.core.{camera,transforms} vs the reference's
own torch/numpy code (common/camera.py, common/transforms.py), imported
directly from /root/reference.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ref_compat
from hands_tpu.core import camera as jcam
from hands_tpu.core import transforms as jtf

pytestmark = pytest.mark.heavy

ref_cam = ref_compat.load("common.camera")
ref_tf = ref_compat.load("common.transforms")


def _close(ref, mine, atol=1e-5):
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=atol, rtol=0)


# ------------------------------------------------------------------- camera
def test_perspective_to_weak_perspective(rng):
    cam_t = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    cam_t[:, 2] = rng.uniform(0.3, 3.0, 16)
    f, res = 1000.0, 224.0
    ref = ref_cam.perspective_to_weak_perspective_torch(
        torch.tensor(cam_t), torch.tensor(f), res).numpy()
    _close(ref, jcam.perspective_to_weak_perspective(jnp.asarray(cam_t), f, res))
    ref2 = ref_cam.convert_perspective_to_weak_perspective(
        torch.tensor(cam_t), torch.tensor(f), res).numpy()
    _close(ref2, jcam.perspective_to_weak_perspective(jnp.asarray(cam_t), f, res))


def test_weak_perspective_to_perspective(rng):
    wp = rng.uniform(0.5, 3.0, (16, 3)).astype(np.float32)
    f, res = 1000.0, 224.0
    ref = ref_cam.convert_weak_perspective_to_perspective(
        torch.tensor(wp), torch.tensor(f), res).numpy()
    # min_s=0 disables the head's clamp; scales here are all > 0.5 anyway
    _close(ref, jcam.weak_perspective_to_perspective(jnp.asarray(wp), f, res, min_s=0.0),
           atol=1e-3)


def test_get_default_cam_t():
    ref = ref_cam.get_default_cam_t(torch.tensor(1000.0), 224).numpy()
    _close(ref, jcam.get_default_cam_t(1000.0, 224), atol=1e-3)


def test_estimate_translation_np(rng):
    """Square image, fx == fy: the reference's exact use case in GT fitting."""
    for _ in range(4):
        S = rng.randn(21, 3).astype(np.float64) * 0.1
        S[:, 2] += 0.5
        j2d = rng.uniform(0, 224, (21, 2)).astype(np.float64)
        conf = rng.uniform(0.1, 1.0, 21).astype(np.float64)
        ref = ref_cam.estimate_translation_np(
            S, j2d, conf, focal_length=(1000.0, 1000.0), img_size=(224, 224))
        mine = jcam.estimate_translation(
            jnp.asarray(S, jnp.float32)[None], jnp.asarray(j2d, jnp.float32)[None],
            jnp.asarray(conf, jnp.float32)[None], 1000.0, 224.0)[0]
        _close(ref, mine, atol=1e-2)


def test_estimate_translation_k_np(rng):
    K = np.array([[600.0, 0, 310.0], [0, 620.0, 250.0], [0, 0, 1]])
    for _ in range(4):
        S = rng.randn(21, 3).astype(np.float64) * 0.1
        S[:, 2] += 0.5
        j2d = rng.uniform(0, 600, (21, 2)).astype(np.float64)
        conf = rng.uniform(0.1, 1.0, 21).astype(np.float64)
        ref = ref_cam.estimate_translation_k_np(S, j2d, conf, K)
        mine = jcam.estimate_translation_k(
            jnp.asarray(S, jnp.float32)[None], jnp.asarray(j2d, jnp.float32)[None],
            jnp.asarray(conf, jnp.float32)[None], jnp.asarray(K, jnp.float32)[None])[0]
        _close(ref, mine, atol=1e-2)


def test_get_coord_maps():
    ref = ref_cam.get_coord_maps(56).numpy()  # (1, 2, H, W), x then y
    mine = np.asarray(jcam.get_coord_maps(56))  # (1, H, W, 2)
    _close(ref[0, 0], mine[0, :, :, 0], atol=1e-6)
    _close(ref[0, 1], mine[0, :, :, 1], atol=1e-6)


def test_look_at_single():
    """B=1 (the reference's per-row normalisation is only exact at B=1 —
    it divides by the batch-max norm, camera.py:292-312)."""
    for eye in ([1.0, 2.0, 3.0], [0.5, -1.0, 0.2], [-2.0, 0.1, 1.0]):
        ref = ref_cam.look_at(np.asarray(eye))
        mine = jcam.look_at(jnp.asarray([eye]))
        _close(ref, mine, atol=1e-5)


def test_rectify_pose(rng):
    """The reference's own ``rectify_pose`` is broken upstream (camera.py:349
    calls ``batch_rodrigues`` without importing it -> NameError). Golden
    against the documented composition using the reference's rot module."""
    aa = rng.randn(8, 3).astype(np.float32)
    cam_r = ref_cam.look_at(np.asarray([1.0, 2.0, 3.0])).astype(np.float32)
    cam_r = np.repeat(cam_r, 8, axis=0)
    with pytest.raises(NameError):
        ref_cam.rectify_pose(torch.tensor(cam_r), torch.tensor(aa))
    ref_rot = ref_compat.load("common.rot")
    from hands_tpu.core import rot as jrot
    for rx in (False, True):
        body_r = ref_rot.batch_rodrigues(torch.tensor(aa)).reshape(-1, 3, 3)
        if rx:
            rotate_x = torch.tensor(
                [[[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]])
            body_r = body_r @ rotate_x
        ref_aa = ref_rot.batch_rot2aa(torch.tensor(cam_r) @ body_r)
        ref_mat = ref_rot.batch_rodrigues(ref_aa).numpy().reshape(-1, 3, 3)
        mine = jcam.rectify_pose(jnp.asarray(cam_r), jnp.asarray(aa), rotate_x=rx)
        mine_mat = jrot.axis_angle_to_matrix(mine.reshape(-1, 3))
        _close(ref_mat, mine_mat, atol=1e-4)  # same rotation (aa wrap may differ)


def test_sample_pose_on_sphere_shape_contract():
    """RNG streams differ by construction (np.random vs PRNGKey); assert the
    geometric contract instead: R columns orthonormal, |t| == radius."""
    import jax
    rt = np.asarray(jcam.sample_pose_on_sphere(jax.random.PRNGKey(3), radius=2.0))
    R, t = rt[:, :3], rt[:, 3]
    _close(np.eye(3), R.T @ R, atol=1e-5)
    assert abs(np.linalg.norm(t) - 2.0) < 1e-5


# --------------------------------------------------------------- transforms
def test_homogeneous_roundtrip(rng):
    pts = rng.randn(5, 3).astype(np.float32)
    ref = ref_tf.to_homo(torch.tensor(pts)).numpy()
    _close(ref, jtf.to_homo(jnp.asarray(pts)))
    back = ref_tf.to_xyz(torch.tensor(ref)).numpy()
    _close(back, jtf.to_xyz(jnp.asarray(ref)))
    ptsb = rng.randn(4, 5, 3).astype(np.float32)
    refb = ref_tf.to_homo_batch(torch.tensor(ptsb)).numpy()
    _close(refb, jtf.to_homo(jnp.asarray(ptsb)))
    _close(ref_tf.to_xyz_batch(torch.tensor(refb)).numpy(), jtf.to_xyz(jnp.asarray(refb)))


def test_distort_pts3d_all(rng):
    pts = rng.randn(4, 21, 3).astype(np.float32) * 0.2
    pts[..., 2] += 0.6
    dist = (rng.randn(8) * 0.05).astype(np.float32)
    ref = ref_tf.distort_pts3d_all(torch.tensor(pts), torch.tensor(dist)).numpy()
    _close(ref, jtf.distort_pts3d(jnp.asarray(pts), jnp.asarray(dist)), atol=1e-5)


def test_solve_rigid_tf_np(rng):
    from hands_tpu.core import rot as jrot
    R_true = np.asarray(jrot.axis_angle_to_matrix(jnp.asarray(rng.randn(3), jnp.float32)))
    t_true = rng.randn(3, 1)
    A = rng.randn(50, 3)
    B = (R_true @ A.T + t_true).T + rng.randn(50, 3) * 0.01
    R_ref, t_ref = ref_tf.solve_rigid_tf_np(A, B)
    R_mine, t_mine = jtf.solve_rigid_tf(
        jnp.asarray(A, jnp.float32)[None], jnp.asarray(B, jnp.float32)[None])
    _close(R_ref, R_mine[0], atol=1e-4)
    _close(t_ref, t_mine[0], atol=1e-4)


def test_batch_solve_rigid_tf(rng):
    from hands_tpu.core import rot as jrot
    aa = rng.randn(6, 3).astype(np.float32)
    R_true = np.asarray(jrot.axis_angle_to_matrix(jnp.asarray(aa)))
    t_true = rng.randn(6, 3, 1).astype(np.float32)
    A = rng.randn(6, 30, 3).astype(np.float32)
    B = np.einsum("bij,bnj->bni", R_true, A) + t_true.transpose(0, 2, 1)
    R_ref, t_ref = ref_tf.batch_solve_rigid_tf(torch.tensor(A), torch.tensor(B))
    R_mine, t_mine = jtf.solve_rigid_tf(jnp.asarray(A), jnp.asarray(B))
    _close(R_ref.numpy(), R_mine, atol=1e-4)
    _close(t_ref.numpy(), t_mine, atol=1e-4)


def test_rigid_tf_torch_batch(rng):
    pts = rng.randn(4, 20, 3).astype(np.float32)
    from hands_tpu.core import rot as jrot
    R = np.asarray(jrot.axis_angle_to_matrix(jnp.asarray(rng.randn(4, 3), jnp.float32)))
    T = rng.randn(4, 3, 1).astype(np.float32)
    ref = ref_tf.rigid_tf_torch_batch(
        torch.tensor(pts), torch.tensor(R), torch.tensor(T)).numpy()
    _close(ref, jtf.rigid_tf(jnp.asarray(pts), jnp.asarray(R),
                             jnp.asarray(T)), atol=1e-5)


def test_transform_points(rng):
    pts = rng.randn(20, 3).astype(np.float32)
    w2c = np.eye(4, dtype=np.float32)
    from hands_tpu.core import rot as jrot
    w2c[:3, :3] = np.asarray(jrot.axis_angle_to_matrix(jnp.asarray(rng.randn(3), jnp.float32)))
    w2c[:3, 3] = rng.randn(3)
    ref = ref_tf.transform_points(torch.tensor(w2c), torch.tensor(pts)).numpy()
    _close(ref, jtf.transform_points(jnp.asarray(w2c), jnp.asarray(pts)), atol=1e-5)
    ptsb = rng.randn(4, 20, 3).astype(np.float32)
    w2cb = np.repeat(w2c[None], 4, axis=0)
    refb = ref_tf.transform_points_batch(torch.tensor(w2cb), torch.tensor(ptsb)).numpy()
    _close(refb, jtf.transform_points(jnp.asarray(w2cb), jnp.asarray(ptsb)), atol=1e-5)


def test_project2d(rng):
    K = np.array([[600.0, 0, 310], [0, 620, 250], [0, 0, 1]], np.float32)
    pts = rng.randn(4, 21, 3).astype(np.float32) * 0.2
    pts[..., 2] += 0.7
    Kb = np.repeat(K[None], 4, axis=0)
    ref = ref_tf.project2d_batch(torch.tensor(Kb), torch.tensor(pts)).numpy()
    _close(ref, jtf.project2d(jnp.asarray(Kb), jnp.asarray(pts)), atol=1e-3)
    ref_s = ref_tf.project2d(torch.tensor(K), torch.tensor(pts[0])).numpy()
    _close(ref_s, jtf.project2d(jnp.asarray(Kb), jnp.asarray(pts))[0], atol=1e-3)
