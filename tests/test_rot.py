"""Rotation conversion correctness: round-trips, known values, orthogonality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hands_tpu.core import rot as rotlib


def random_rotmats(rng, n=32):
    """Uniformly-ish random rotations via QR of gaussian matrices."""
    A = rng.randn(n, 3, 3)
    Q, R = np.linalg.qr(A)
    # fix sign so det=+1
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return jnp.asarray(Q, jnp.float32)


def test_quat_matrix_roundtrip(rng):
    R = random_rotmats(rng)
    q = rotlib.matrix_to_quaternion(R)
    R2 = rotlib.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_aa_matrix_roundtrip(rng):
    aa = jnp.asarray(rng.randn(64, 3) * 1.5, jnp.float32)
    R = rotlib.axis_angle_to_matrix(aa)
    aa2 = rotlib.matrix_to_axis_angle(R)
    R2 = rotlib.axis_angle_to_matrix(aa2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_aa_small_angle_stable():
    aa = jnp.asarray([[1e-9, 0, 0], [0, 0, 0]], jnp.float32)
    R = rotlib.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-6)
    g = jax.grad(lambda a: rotlib.axis_angle_to_matrix(a).sum())(aa)
    assert np.isfinite(np.asarray(g)).all()


def test_aa_known_value():
    # 90 deg about z: x -> y
    aa = jnp.asarray([[0.0, 0.0, np.pi / 2]], jnp.float32)
    R = np.asarray(rotlib.axis_angle_to_matrix(aa))[0]
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_rot6d_roundtrip(rng):
    R = random_rotmats(rng)
    d6 = rotlib.matrix_to_rot6d(R)
    R2 = rotlib.rot6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_rot6d_identity():
    # 6D encoding of identity rotations decodes back to identity
    d6 = rotlib.matrix_to_rot6d(jnp.eye(3)[None])
    np.testing.assert_allclose(
        np.asarray(rotlib.rot6d_to_matrix(d6))[0], np.eye(3), atol=1e-6
    )


def test_rotmats_orthogonal(rng):
    aa = jnp.asarray(rng.randn(32, 3), jnp.float32)
    R = np.asarray(rotlib.axis_angle_to_matrix(aa))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_euler_xyz():
    e = jnp.asarray([[np.pi / 2, 0.0, 0.0]], jnp.float32)
    R = np.asarray(rotlib.euler_angles_to_matrix(e))[0]
    # X-rotation by 90deg: y -> z
    np.testing.assert_allclose(R @ np.array([0.0, 1.0, 0]), [0, 0, 1], atol=1e-6)


def test_flip_axis_angle_involution(rng):
    aa = jnp.asarray(rng.randn(4, 48), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(rotlib.flip_axis_angle(rotlib.flip_axis_angle(aa))),
        np.asarray(aa),
    )


def test_matches_torch_reference_semantics(rng):
    """Cross-check conversions against torch (CPU) implementations of the
    same math to guard convention drift (pytorch3d semantics)."""
    torch = pytest.importorskip("torch")

    aa_np = rng.randn(16, 3).astype(np.float32)
    R_ours = np.asarray(rotlib.axis_angle_to_matrix(jnp.asarray(aa_np)))

    # torch Rodrigues
    t = torch.from_numpy(aa_np)
    angle = torch.norm(t, dim=1, keepdim=True)
    axis = t / angle.clamp(min=1e-12)
    K = torch.zeros(16, 3, 3)
    K[:, 0, 1], K[:, 0, 2] = -axis[:, 2], axis[:, 1]
    K[:, 1, 0], K[:, 1, 2] = axis[:, 2], -axis[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -axis[:, 1], axis[:, 0]
    eye = torch.eye(3).expand(16, 3, 3)
    s = torch.sin(angle)[..., None]
    c = torch.cos(angle)[..., None]
    R_torch = eye + s * K + (1 - c) * (K @ K)
    np.testing.assert_allclose(R_ours, R_torch.numpy(), atol=1e-5)
