"""Rotation representation conversions in pure JAX.

Covers the conversion surface used throughout the reference
(``/root/reference/common/rot.py`` and pytorch3d ``rotation_conversions``):
axis-angle <-> rotation matrix <-> quaternion <-> continuous 6D. Semantics
(quaternion real-part-first, 6D = first two rows of R, Gram-Schmidt decode)
match the pytorch3d convention so that checkpoints/targets are interchangeable.

All functions are shape-polymorphic over leading batch dims and jit-safe
(no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# --------------------------------------------------------------------- helpers
def _f32_matmuls(fn):
    """Pin f32 matmul precision: geometry must not round through the TPU's
    bf16 MXU default (coordinates/rotations lose ~3 decimal digits)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a zero subgradient at x <= 0.

    The double-``where`` keeps the backward pass finite: a plain
    ``sqrt(max(x, 0))`` has d/dx = inf at 0, and ``0 * inf = NaN`` poisons
    gradients of the *unselected* quaternion branches in
    :func:`matrix_to_quaternion` (hit for every near-identity rotation).
    """
    safe = jnp.where(x > 1e-12, x, 1.0)
    return jnp.where(x > 1e-12, jnp.sqrt(safe), 0.0)


def _safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = True) -> jnp.ndarray:
    """L2 norm with finite gradient at 0 (sqrt of clamped square-sum)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, 1e-24))


# ----------------------------------------------------------------- quaternions
def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) [w, x, y, z] -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    two_s = 2.0 / jnp.sum(quat * quat, axis=-1)

    o = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return o.reshape(quat.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0 branch.

    Uses the numerically-stable four-branch construction (same scheme as
    pytorch3d): compute all four candidate quaternions and select the one
    whose denominator is largest.
    """
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    flr = 0.1
    quat_candidates = quat_by_rijk / (
        2.0 * jnp.maximum(q_abs[..., None], flr * jnp.ones_like(q_abs[..., None]))
    )

    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    return quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)


# ------------------------------------------------------------------ axis-angle
def axis_angle_to_quaternion(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> quaternion (..., 4) [w, x, y, z]."""
    angle = _safe_norm(aa)
    half = angle * 0.5
    # sin(half)/angle with a Taylor fallback near zero for stable gradients
    small = angle < 1e-6
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / jnp.maximum(angle, _EPS)
    )
    return jnp.concatenate([jnp.cos(half), aa * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) [w, x, y, z] -> axis-angle (..., 3)."""
    norms = _safe_norm(quat[..., 1:])
    half_angles = jnp.arctan2(norms, quat[..., :1])
    angles = 2.0 * half_angles
    small = jnp.abs(angles) < 1e-6
    # sin(half)/angle, Taylor-expanded near zero for stable values and grads
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles),
    )
    return quat[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(aa))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


# ------------------------------------------------------------------ 6D (Zhou)
def rot6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D (..., 6) -> rotation matrix (..., 3, 3).

    Gram-Schmidt on the two encoded rows; rows are stacked as the matrix rows
    (pytorch3d ``rotation_6d_to_matrix`` convention).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(_safe_norm(a1), _EPS)
    a2_proj = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2_proj / jnp.maximum(_safe_norm(a2_proj), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rot6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> continuous 6D (..., 6) (first two rows)."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rot6d_to_matrix_spin(d6: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D (..., 6) -> rotation matrix, SPIN/HMR layout.

    The reference's regression heads use the SPIN convention
    (``common/rot.py:367`` ``rot6d_to_rotmat``): the 6 values are read as a
    (3, 2) block whose *columns* are the two encoded vectors, and the decoded
    b1/b2/b3 become the matrix *columns*. Identity encodes as
    ``[1, 0, 0, 1, 0, 0]``. Pretrained reference/HaMeR head weights emit this
    layout, so every MANO regression head here decodes with it.
    """
    block = d6.reshape(d6.shape[:-1] + (3, 2))
    a1, a2 = block[..., 0], block[..., 1]
    b1 = a1 / jnp.maximum(_safe_norm(a1), _EPS)
    a2_proj = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2_proj / jnp.maximum(_safe_norm(a2_proj), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def matrix_to_rot6d_spin(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> SPIN 6D (..., 6): first two *columns*,
    flattened row-major (reference ``rotmat_to_rot6d``, common/rot.py:384)."""
    return matrix[..., :, :2].reshape(matrix.shape[:-2] + (6,))


def rot6d_to_matrix_hamer(d6: jnp.ndarray) -> jnp.ndarray:
    """HaMeR's 6D convention (hamer_light/geometry.py:47
    ``rot6d_to_rotmat``): the two 3-vectors are the contiguous halves of the
    6-vector and the Gram-Schmidt frame forms the matrix *columns* — i.e.
    the transpose of the pytorch3d row decode. Identity encodes as
    ``[1, 0, 0, 0, 1, 0]`` (same as pytorch3d, unlike SPIN's interleaved
    read). The released HaMeR head weights emit this layout."""
    return jnp.swapaxes(rot6d_to_matrix(d6), -1, -2)


def matrix_to_rot6d_hamer(matrix: jnp.ndarray) -> jnp.ndarray:
    """Inverse encode for :func:`rot6d_to_matrix_hamer`: first two columns,
    column-major halves."""
    return jnp.swapaxes(matrix, -1, -2)[..., :2, :].reshape(
        matrix.shape[:-2] + (6,))


# ------------------------------------------------------------- quaternion ops
def standardize_quaternion(quat: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real part is non-negative (pytorch3d semantics,
    reference common/rot.py:12)."""
    return jnp.where(quat[..., :1] < 0, -quat, quat)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of two [w, x, y, z] quaternions (common/rot.py:691)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, standardized to non-negative real part
    (common/rot.py:27)."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(quat: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion: conjugate (common/rot.py:713)."""
    return quat * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=quat.dtype)


def quaternion_apply(quat: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate points (..., 3) by unit quaternions (..., 4)
    (common/rot.py:730): q * (0, p) * q^-1."""
    zeros = jnp.zeros_like(point[..., :1])
    p_quat = jnp.concatenate([zeros, point], axis=-1)
    out = quaternion_raw_multiply(
        quaternion_raw_multiply(quat, p_quat), quaternion_invert(quat)
    )
    return out[..., 1:]


# -------------------------------------------------------------------- euler
@_f32_matmuls
def euler_angles_to_matrix(euler: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Euler angles (..., 3) -> rotation matrix, extrinsic composition R = Rx@Ry@Rz
    for convention 'XYZ' (matches pytorch3d ``euler_angles_to_matrix``)."""

    def _axis_rot(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
        c, s = jnp.cos(angle), jnp.sin(angle)
        one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
        if axis == "X":
            flat = [one, zero, zero, zero, c, -s, zero, s, c]
        elif axis == "Y":
            flat = [c, zero, s, zero, one, zero, -s, zero, c]
        elif axis == "Z":
            flat = [c, -s, zero, s, c, zero, zero, zero, one]
        else:
            raise ValueError(axis)
        return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))

    mats = [
        _axis_rot(ax, euler[..., i]) for i, ax in enumerate(convention.upper())
    ]
    return mats[0] @ mats[1] @ mats[2]


# ------------------------------------------------------------------- utilities
@_f32_matmuls
def rot_aa(aa: jnp.ndarray, rot_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate an axis-angle global orientation by `rot_deg` degrees about the
    camera z-axis (augmentation semantics of ``common/data_utils.py:rot_aa``)."""
    rad = -rot_deg * jnp.pi / 180.0
    c, s = jnp.cos(rad), jnp.sin(rad)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    R = jnp.stack([c, -s, zero, s, c, zero, zero, zero, one], axis=-1).reshape(
        rot_deg.shape + (3, 3)
    )
    per_sample = axis_angle_to_matrix(aa)
    # cv2.Rodrigues (the reference path) returns the representative with
    # angle in [0, pi]; standardize the quaternion to match it exactly.
    quat = standardize_quaternion(matrix_to_quaternion(R @ per_sample))
    return quaternion_to_axis_angle(quat)


def flip_axis_angle(aa_flat: jnp.ndarray) -> jnp.ndarray:
    """Mirror a flattened axis-angle pose (..., 3J): negate y and z components.

    Mirrors the L/R flip-swap used in the reference model
    (``src/models/hands_light/model.py:341-368``).
    """
    shape = aa_flat.shape
    aa = aa_flat.reshape(shape[:-1] + (-1, 3))
    aa = aa * jnp.asarray([1.0, -1.0, -1.0], dtype=aa.dtype)
    return aa.reshape(shape)
