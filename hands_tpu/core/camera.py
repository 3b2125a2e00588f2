"""Camera models: weak-perspective <-> perspective, projection, DLT translation.

Behavioural contract follows ``/root/reference/common/camera.py`` (wp triple is
``[s, tx, ty]`` with ``s = 2f / (res * tz)``) and
``/root/reference/common/data_utils.py:361-419`` (kp2d normalisation and
crop-adjusted intrinsics). Everything is batched and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


# ---------------------------------------------------------- wp <-> perspective
def _f32_matmuls(fn):
    """Pin f32 matmul precision: geometry must not round through the TPU's
    bf16 MXU default (coordinates/rotations lose ~3 decimal digits)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def perspective_to_weak_perspective(
    cam_t: jnp.ndarray, focal_length: jnp.ndarray, img_res: float
) -> jnp.ndarray:
    """Camera translation (B, 3) [tx, ty, tz] -> weak-persp (B, 3) [s, tx, ty]."""
    tx, ty, tz = cam_t[:, 0], cam_t[:, 1], cam_t[:, 2]
    s = 2.0 * focal_length / (img_res * tz + _EPS)
    return jnp.stack([s, tx, ty], axis=-1)


def weak_perspective_to_perspective(
    wp_cam: jnp.ndarray,
    focal_length: jnp.ndarray,
    img_res: float,
    min_s: float = 0.1,
) -> jnp.ndarray:
    """Weak-persp (B, 3) [s, tx, ty] -> camera translation (B, 3) [tx, ty, tz].

    ``min_s`` clamps the scale from below so tz stays finite/positive when the
    network predicts a degenerate scale (reference MANOHead uses min_s=0.1).
    """
    s = jnp.maximum(wp_cam[:, 0], min_s)
    tz = 2.0 * focal_length / (img_res * s + _EPS)
    return jnp.stack([wp_cam[:, 1], wp_cam[:, 2], tz], axis=-1)


# ------------------------------------------------------------------ projection
@_f32_matmuls
def project2d(K: jnp.ndarray, pts3d: jnp.ndarray) -> jnp.ndarray:
    """Perspective projection: K (B, 3, 3) x points (B, N, 3) -> pixels (B, N, 2)."""
    proj = jnp.einsum("bij,bnj->bni", K, pts3d)
    return proj[..., :2] / jnp.maximum(proj[..., 2:3], _EPS)


def normalize_kp2d(kp2d: jnp.ndarray, img_res: float) -> jnp.ndarray:
    """Pixel coords (..., 2+) -> [-1, 1] on the first two channels."""
    xy = 2.0 * kp2d[..., :2] / img_res - 1.0
    return jnp.concatenate([xy, kp2d[..., 2:]], axis=-1)


def unnormalize_kp2d(kp2d_norm: jnp.ndarray, img_res: float) -> jnp.ndarray:
    """[-1, 1] coords (..., 2) -> pixel coords."""
    return 0.5 * img_res * (kp2d_norm[..., :2] + 1.0)


# ------------------------------------------------------------------ intrinsics
def weak_perspective_intrinsics(focal_length: float, img_res: int) -> jnp.ndarray:
    """Fixed-focal intrinsics centred on the (img_res x img_res) patch."""
    c = img_res // 2
    return jnp.asarray(
        [[focal_length, 0.0, c], [0.0, focal_length, c], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )


def crop_adjusted_intrinsics(
    K: jnp.ndarray,
    bbox_cx: jnp.ndarray,
    bbox_cy: jnp.ndarray,
    scale: jnp.ndarray,
    img_res: int,
) -> jnp.ndarray:
    """Update full-image intrinsics (B, 3, 3) for a square crop of side
    ``scale * 200`` centred at (bbox_cx, bbox_cy), resized to img_res.

    fx' = k * fx ; cx' = k * (cx - x1) with k = img_res / (scale * 200)
    (reference ``get_aug_intrix``, data_utils.py:388-419).
    """
    dim = scale * 200.0
    k_scale = img_res / dim
    fx = K[:, 0, 0] * k_scale
    fy = K[:, 1, 1] * k_scale
    cx = (K[:, 0, 2] - (bbox_cx - dim / 2.0)) * k_scale
    cy = (K[:, 1, 2] - (bbox_cy - dim / 2.0)) * k_scale
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([fx, zeros, cx], axis=-1)
    row1 = jnp.stack([zeros, fy, cy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def get_default_cam_t(focal_length: float, img_res: int) -> jnp.ndarray:
    """Default camera translation for the canonical wp cam [5, 0, 0]
    (reference camera.py:74)."""
    wp = jnp.asarray([[5.0, 0.0, 0.0]])
    return weak_perspective_to_perspective(
        wp, jnp.asarray([focal_length]), img_res)


# -------------------------------------------------------------- misc utils
def get_coord_maps(size: int = 56) -> jnp.ndarray:
    """CoordConv-style [-1, 1] xy channel maps, NHWC (B=1, size, size, 2)
    (reference camera.py:259)."""
    r = jnp.linspace(-1.0, 1.0, size)
    yy, xx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([xx, yy], axis=-1)[None]


@_f32_matmuls
def look_at(eye: jnp.ndarray, at=None, up=None, eps: float = 1e-5) -> jnp.ndarray:
    """Camera rotation(s) looking from ``eye`` (B, 3) at ``at``; columns are
    the camera x/y/z axes (reference camera.py:291)."""
    eye = jnp.asarray(eye, jnp.float32).reshape(-1, 3)
    at = jnp.zeros(3) if at is None else jnp.asarray(at, jnp.float32)
    up = jnp.asarray([0.0, 0.0, 1.0]) if up is None else jnp.asarray(up, jnp.float32)

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)

    z = norm(eye - at[None])
    x = norm(jnp.cross(jnp.broadcast_to(up, z.shape), z))
    y = norm(jnp.cross(z, x))
    return jnp.stack([x, y, z], axis=-1)


def to_sphere(u, v):
    """(u, v) in [0,1]^2 -> unit-sphere point (uniform)."""
    theta = 2 * jnp.pi * u
    phi = jnp.arccos(1 - 2 * v)
    return jnp.stack(
        [jnp.sin(phi) * jnp.cos(theta), jnp.sin(phi) * jnp.sin(theta),
         jnp.cos(phi)], axis=-1)


def sample_pose_on_sphere(key, radius: float = 1.0, up=(0.0, 1.0, 0.0)):
    """Random camera pose on a sphere -> (3, 4) [R | t] (camera.py:322-349)."""
    import jax

    u, v = jax.random.uniform(key, (2,))
    loc = to_sphere(u, v) * radius
    R = look_at(loc[None], up=jnp.asarray(up))[0]
    return jnp.concatenate([R, loc.reshape(3, 1)], axis=1)


@_f32_matmuls
def rectify_pose(camera_r: jnp.ndarray, body_aa: jnp.ndarray,
                 rotate_x: bool = False) -> jnp.ndarray:
    """Compose a camera rotation into axis-angle global orientations
    (camera.py:352)."""
    from hands_tpu.core import rot as rotlib

    body_R = rotlib.axis_angle_to_matrix(body_aa.reshape(-1, 3))
    if rotate_x:
        Rx = jnp.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
        body_R = body_R @ Rx
    return rotlib.matrix_to_axis_angle(camera_r @ body_R)


# ------------------------------------------------------- DLT translation solve
@_f32_matmuls
def estimate_translation(
    S: jnp.ndarray,
    joints_2d: jnp.ndarray,
    joints_conf: jnp.ndarray,
    focal_length: jnp.ndarray,
    img_size: jnp.ndarray,
) -> jnp.ndarray:
    """Least-squares camera translation aligning 3D joints to 2D detections.

    Batched closed-form DLT (reference ``estimate_translation_np``,
    camera.py:79): solve ``A t = b`` with per-joint confidence weights.

    S: (B, N, 3), joints_2d: (B, N, 2), joints_conf: (B, N),
    focal_length: (B,) or scalar, img_size: (B,) or scalar.
    Returns (B, 3).
    """
    B, N, _ = S.shape
    f = jnp.broadcast_to(jnp.asarray(focal_length, jnp.float32), (B,))
    res = jnp.broadcast_to(jnp.asarray(img_size, jnp.float32), (B,))
    center = res / 2.0

    XY = S[..., :2]  # (B, N, 2)
    Z = S[..., 2]  # (B, N)
    uv = joints_2d - center[:, None, None]

    w = jnp.sqrt(jnp.maximum(joints_conf, 0.0))  # (B, N)

    # rows: [f, 0, -u] and [0, f, -v]; b rows: u*Z - f*X , v*Z - f*Y
    fB = f[:, None]
    zeros = jnp.zeros((B, N))
    A_u = jnp.stack([jnp.broadcast_to(fB, (B, N)), zeros, -uv[..., 0]], axis=-1)
    A_v = jnp.stack([zeros, jnp.broadcast_to(fB, (B, N)), -uv[..., 1]], axis=-1)
    b_u = uv[..., 0] * Z - fB * XY[..., 0]
    b_v = uv[..., 1] * Z - fB * XY[..., 1]

    A = jnp.concatenate([A_u * w[..., None], A_v * w[..., None]], axis=1)  # (B,2N,3)
    b = jnp.concatenate([b_u * w, b_v * w], axis=1)  # (B, 2N)

    AtA = jnp.einsum("bni,bnj->bij", A, A)
    Atb = jnp.einsum("bni,bn->bi", A, b)
    return jnp.linalg.solve(
        AtA + 1e-8 * jnp.eye(3), Atb[..., None]
    )[..., 0]


@_f32_matmuls
def estimate_translation_k(
    S: jnp.ndarray,
    joints_2d: jnp.ndarray,
    joints_conf: jnp.ndarray,
    K: jnp.ndarray,
) -> jnp.ndarray:
    """Batched DLT translation solve against full intrinsics.

    Reference ``estimate_translation_k_np`` (camera.py:361): per-axis focal
    (fx, fy) and principal point from K instead of the square fixed-focal
    assumption of :func:`estimate_translation`. One batched normal-equations
    solve instead of the reference's per-sample python loop.

    S: (B, N, 3), joints_2d: (B, N, 2), joints_conf: (B, N), K: (B, 3, 3).
    Returns (B, 3).
    """
    B, N, _ = S.shape
    f = jnp.stack([K[:, 0, 0], K[:, 1, 1]], axis=-1)  # (B, 2)
    center = jnp.stack([K[:, 0, 2], K[:, 1, 2]], axis=-1)  # (B, 2)

    XY = S[..., :2]
    Z = S[..., 2]
    uv = joints_2d - center[:, None, :]
    w = jnp.sqrt(jnp.maximum(joints_conf, 0.0))

    fx = jnp.broadcast_to(f[:, None, 0], (B, N))
    fy = jnp.broadcast_to(f[:, None, 1], (B, N))
    zeros = jnp.zeros((B, N))
    A_u = jnp.stack([fx, zeros, -uv[..., 0]], axis=-1)
    A_v = jnp.stack([zeros, fy, -uv[..., 1]], axis=-1)
    b_u = uv[..., 0] * Z - fx * XY[..., 0]
    b_v = uv[..., 1] * Z - fy * XY[..., 1]

    A = jnp.concatenate([A_u * w[..., None], A_v * w[..., None]], axis=1)
    b = jnp.concatenate([b_u * w, b_v * w], axis=1)
    AtA = jnp.einsum("bni,bnj->bij", A, A)
    Atb = jnp.einsum("bni,bn->bi", A, b)
    return jnp.linalg.solve(AtA + 1e-8 * jnp.eye(3), Atb[..., None])[..., 0]
