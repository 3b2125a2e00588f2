"""Homogeneous / projective geometry in pure JAX.

Batched, jit-safe equivalents of ``/root/reference/common/transforms.py``:
homogeneous lifts, 4x4-transform application, perspective projection, the
Arun-SVD rigid solve (fully vectorised here — the reference rounds-trips
through per-sample numpy), and the 8-coefficient rational+tangential lens
distortion used for ARCTIC egocentric cameras.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


# -------------------------------------------------------------- homogeneous
def _f32_matmuls(fn):
    """Pin f32 matmul precision: geometry must not round through the TPU's
    bf16 MXU default (coordinates/rotations lose ~3 decimal digits)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def to_homo(pts: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) -> (..., N, 4) with a trailing 1."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def to_xyz(pts_homo: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 4) -> (..., N, 3) by perspective divide on w."""
    return pts_homo[..., :3] / jnp.maximum(pts_homo[..., 3:4], _EPS)


@_f32_matmuls
def transform_points(world2cam: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 transforms (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    homo = to_homo(pts)
    out = jnp.einsum("...ij,...nj->...ni", world2cam, homo)
    return to_xyz(out)


@_f32_matmuls
def rigid_tf(points: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Q = R @ p + T, batched. points (B, N, 3), R (B, 3, 3), T (B, 3, 1)."""
    return jnp.einsum("bij,bnj->bni", R, points) + T[..., 0][:, None, :]


@_f32_matmuls
def project2d(K: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """K (B, 3, 3), camera-space points (B, N, 3) -> pixels (B, N, 2)."""
    proj = jnp.einsum("bij,bnj->bni", K, pts_cam)
    return proj[..., :2] / jnp.maximum(proj[..., 2:3], _EPS)


# ---------------------------------------------------------------- rigid solve
@_f32_matmuls
def solve_rigid_tf(A: jnp.ndarray, B: jnp.ndarray):
    """Least-squares rigid transform (Arun 1987), batched on device.

    A, B: (B, N, 3) corresponding point sets. Returns (R, t) with
    R: (B, 3, 3), t: (B, 3, 1) such that ``R @ A + t ~= B``. Reflections are
    corrected by flipping the last singular vector (handled densely with
    ``where`` rather than the reference's exception path).
    """
    cA = A.mean(axis=1, keepdims=True)
    cB = B.mean(axis=1, keepdims=True)
    Am = A - cA
    Bm = B - cB
    H = jnp.einsum("bni,bnj->bij", Am, Bm)  # (B, 3, 3) = Am^T @ Bm
    U, _, Vt = jnp.linalg.svd(H)
    R = jnp.einsum("bji,bkj->bik", Vt, U)  # V @ U^T
    det = jnp.linalg.det(R)
    # flip the last row of Vt where det < 0, recompute
    flip = jnp.where(det < 0, -1.0, 1.0)[:, None]
    Vt_fixed = Vt.at[:, 2, :].multiply(flip)
    R = jnp.einsum("bji,bkj->bik", Vt_fixed, U)
    t = cB.transpose(0, 2, 1) - R @ cA.transpose(0, 2, 1)
    return R, t


# ----------------------------------------------------------------- distortion
@_f32_matmuls
def distort_pts3d(pts_cam: jnp.ndarray, dist_coeffs: jnp.ndarray) -> jnp.ndarray:
    """Map undistorted camera-space points to distorted camera space so a
    linear K-projection lands on observed pixels.

    8-coefficient rational + tangential model
    (reference ``distort_pts3d_all``, transforms.py:82):
    coeffs = [k1, k2, p1, p2, k3, k4, k5, k6].

    pts_cam: (B, N, 3); dist_coeffs: (8,) or (B, 8). Returns (B, N, 3).
    """
    d = jnp.broadcast_to(jnp.asarray(dist_coeffs), pts_cam.shape[:1] + (8,))
    z = pts_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    x1 = pts_cam[..., 0] / z_safe
    y1 = pts_cam[..., 1] / z_safe

    x1_2, y1_2, x1y1 = x1 * x1, y1 * y1, x1 * y1
    r2 = x1_2 + y1_2
    r4 = r2 * r2
    r6 = r4 * r2

    dB = d[:, None, :]  # broadcast over points
    r_dist = (1 + dB[..., 0] * r2 + dB[..., 1] * r4 + dB[..., 4] * r6) / (
        1 + dB[..., 5] * r2 + dB[..., 6] * r4 + dB[..., 7] * r6
    )
    x2 = x1 * r_dist + 2 * dB[..., 2] * x1y1 + dB[..., 3] * (r2 + 2 * x1_2)
    y2 = y1 * r_dist + 2 * dB[..., 3] * x1y1 + dB[..., 2] * (r2 + 2 * y1_2)
    return jnp.stack([x2 * z, y2 * z, z], axis=-1)
