"""Golden-parity tests: hands_tpu.core.rot vs the reference's own torch code.

Every test imports ``/root/reference/common/rot.py`` (vendored pytorch3d +
SPIN/kornia helpers) and asserts the JAX implementations reproduce it on
random inputs — proving the <1e-3 parity contract rather than re-deriving
torch math inline.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ref_compat
from hands_tpu.core import rot as jrot

pytestmark = pytest.mark.heavy

ref_rot = ref_compat.load("common.rot")


@pytest.fixture
def aa(rng):
    return rng.randn(32, 3).astype(np.float32)


@pytest.fixture
def rotmats(aa):
    return ref_rot.batch_rodrigues(torch.tensor(aa)).numpy().reshape(-1, 3, 3)


def _close(ref, mine, atol=1e-5):
    np.testing.assert_allclose(np.asarray(mine), ref, atol=atol, rtol=0)


# ------------------------------------------------------------- quaternions
def test_axis_angle_to_quaternion(aa):
    ref = ref_rot.axis_angle_to_quaternion(torch.tensor(aa)).numpy()
    _close(ref, jrot.axis_angle_to_quaternion(jnp.asarray(aa)))


def test_quaternion_to_matrix(aa):
    q = ref_rot.axis_angle_to_quaternion(torch.tensor(aa))
    ref = ref_rot.quaternion_to_matrix(q).numpy()
    _close(ref, jrot.quaternion_to_matrix(jnp.asarray(q.numpy())))


def test_matrix_to_quaternion(rotmats):
    ref = ref_rot.matrix_to_quaternion(torch.tensor(rotmats)).numpy()
    _close(ref, jrot.matrix_to_quaternion(jnp.asarray(rotmats)))


def test_quaternion_to_axis_angle(aa):
    q = ref_rot.axis_angle_to_quaternion(torch.tensor(aa))
    ref = ref_rot.quaternion_to_axis_angle(q).numpy()
    _close(ref, jrot.quaternion_to_axis_angle(jnp.asarray(q.numpy())))


def test_standardize_quaternion(rng):
    q = rng.randn(16, 4).astype(np.float32)
    ref = ref_rot.standardize_quaternion(torch.tensor(q)).numpy()
    _close(ref, jrot.standardize_quaternion(jnp.asarray(q)))


def test_quaternion_multiply(aa, rng):
    qa = ref_rot.axis_angle_to_quaternion(torch.tensor(aa))
    qb = ref_rot.axis_angle_to_quaternion(torch.tensor(rng.randn(32, 3).astype(np.float32)))
    ref_raw = ref_rot.quaternion_raw_multiply(qa, qb).numpy()
    _close(ref_raw, jrot.quaternion_raw_multiply(jnp.asarray(qa.numpy()), jnp.asarray(qb.numpy())))
    ref = ref_rot.quaternion_multiply(qa, qb).numpy()
    _close(ref, jrot.quaternion_multiply(jnp.asarray(qa.numpy()), jnp.asarray(qb.numpy())))


def test_quaternion_invert_apply(aa, rng):
    q = ref_rot.axis_angle_to_quaternion(torch.tensor(aa))
    pts = rng.randn(32, 3).astype(np.float32)
    _close(ref_rot.quaternion_invert(q).numpy(), jrot.quaternion_invert(jnp.asarray(q.numpy())))
    ref = ref_rot.quaternion_apply(q, torch.tensor(pts)).numpy()
    _close(ref, jrot.quaternion_apply(jnp.asarray(q.numpy()), jnp.asarray(pts)))


# -------------------------------------------------------------- axis-angle
def test_batch_rodrigues(aa):
    ref = ref_rot.batch_rodrigues(torch.tensor(aa)).numpy().reshape(-1, 3, 3)
    _close(ref, jrot.axis_angle_to_matrix(jnp.asarray(aa)))


def test_batch_aa2rot(aa):
    ref = ref_rot.batch_aa2rot(torch.tensor(aa)).numpy().reshape(-1, 3, 3)
    _close(ref, jrot.axis_angle_to_matrix(jnp.asarray(aa)))


def test_matrix_to_axis_angle(rotmats):
    ref = ref_rot.matrix_to_axis_angle(torch.tensor(rotmats)).numpy()
    _close(ref, jrot.matrix_to_axis_angle(jnp.asarray(rotmats)), atol=2e-5)


def test_batch_rot2aa_same_rotation(rotmats):
    """batch_rot2aa wraps angles differently; equal as *rotations*."""
    ref_aa = ref_rot.batch_rot2aa(torch.tensor(rotmats)).numpy()
    ref_as_mat = ref_rot.batch_rodrigues(torch.tensor(ref_aa)).numpy().reshape(-1, 3, 3)
    _close(ref_as_mat, jnp.asarray(rotmats), atol=1e-4)
    mine = jrot.matrix_to_axis_angle(jnp.asarray(rotmats))
    mine_as_mat = jrot.axis_angle_to_matrix(mine)
    _close(ref_as_mat, mine_as_mat, atol=1e-4)


def test_rot_aa(aa):
    """cv2.Rodrigues-based augmentation rotation (common/rot.py:196)."""
    for rot_deg in (0.0, 13.0, -27.5, 180.0):
        ref = np.stack([ref_rot.rot_aa(a.astype(np.float64), rot_deg) for a in aa])
        mine = jrot.rot_aa(jnp.asarray(aa), jnp.full((len(aa),), rot_deg))
        _close(ref.astype(np.float32), mine, atol=1e-4)


# ------------------------------------------------------------------ 6D SPIN
def test_rot6d_to_rotmat_spin(rng):
    d6 = rng.randn(32, 6).astype(np.float32)
    ref = ref_rot.rot6d_to_rotmat(torch.tensor(d6)).numpy()
    _close(ref, jrot.rot6d_to_matrix_spin(jnp.asarray(d6)))


def test_rotmat_to_rot6d_spin(rotmats):
    ref = ref_rot.rotmat_to_rot6d(torch.tensor(rotmats)).numpy()
    _close(ref, jrot.matrix_to_rot6d_spin(jnp.asarray(rotmats)))


def test_spin_6d_roundtrip_through_reference(rotmats):
    """Encode with mine, decode with the reference -> original rotation."""
    d6 = np.asarray(jrot.matrix_to_rot6d_spin(jnp.asarray(rotmats)))
    back = ref_rot.rot6d_to_rotmat(torch.tensor(d6)).numpy()
    _close(back, jnp.asarray(rotmats), atol=1e-5)


# -------------------------------------------------------------------- euler
def test_batch_euler2matrix(rng):
    eul = rng.uniform(-1.5, 1.5, (32, 3)).astype(np.float32)
    ref = ref_rot.batch_euler2matrix(torch.tensor(eul)).numpy()
    _close(ref, jrot.euler_angles_to_matrix(jnp.asarray(eul), "XYZ"), atol=2e-5)


def test_euler_angles_from_rotmat_is_broken_upstream(rotmats):
    """Documented golden skip: the reference's ``euler_angles_from_rotmat``
    (common/rot.py:657) raises ``NameError: name 'math' is not defined`` on
    every input (missing import; the function is dead upstream code). There
    is nothing runnable to be golden against — assert the breakage so this
    skip is re-examined if the reference ever changes."""
    with pytest.raises(NameError):
        ref_rot.euler_angles_from_rotmat(torch.tensor(rotmats[:1]))


# --------------------------------------------------------- kornia-path fns
def test_rotation_matrix_to_angle_axis(rotmats):
    """kornia path (common/rot.py:390): takes (B, 3, 4) poses."""
    pose34 = np.concatenate([rotmats, np.zeros((len(rotmats), 3, 1), np.float32)], axis=2)
    ref = ref_rot.rotation_matrix_to_angle_axis(torch.tensor(pose34)).numpy()
    ref_mat = ref_rot.batch_rodrigues(torch.tensor(ref)).numpy().reshape(-1, 3, 3)
    mine = jrot.matrix_to_axis_angle(jnp.asarray(rotmats))
    mine_mat = jrot.axis_angle_to_matrix(mine)
    _close(ref_mat, mine_mat, atol=1e-4)


def test_quat2mat_normalised(aa):
    q = ref_rot.axis_angle_to_quaternion(torch.tensor(aa))
    ref = ref_rot.quat2mat(q).numpy()
    _close(ref, jrot.quaternion_to_matrix(jnp.asarray(q.numpy())), atol=1e-5)
