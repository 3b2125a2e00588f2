"""Differentiable silhouette rendering for the mask loss.

TPU-native replacement for the reference's pytorch3d SoftSilhouetteShader
pipeline (``/root/reference/src/models/hands_light/renderer.py:157``). Two
implementations, both pure XLA (no host callbacks, fully differentiable):

1. :func:`splat_silhouette` (default) — Gaussian vertex splatting. The MANO
   mesh is dense (778 verts on a hand crop ⇒ ~4 px vertex spacing at 224²),
   so splatting vertices with a ~3 px sigma yields a near-solid silhouette.
   Cost is one (P x 3)·(3 x V) matmul per image — MXU-shaped, ~100x cheaper
   than per-face rasterisation and with smooth gradients to every vertex.
   This is the training-loss default: the L1 mask loss only needs a
   silhouette estimate with good gradients, not exact coverage.

2. :func:`soft_raster_silhouette` — true per-face soft rasterisation
   (inside/outside via signed edge functions, sigmoid blending, product
   transmittance like SoftRas). Scan-chunked over faces to bound memory.
   Used for evaluation-quality masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _project(verts_cam: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    proj = jnp.einsum("bij,bvj->bvi", K, verts_cam)
    return proj[..., :2] / jnp.maximum(proj[..., 2:3], _EPS)


def _pixel_grid(res: int, dtype=jnp.float32):
    ys, xs = jnp.meshgrid(
        jnp.arange(res, dtype=dtype) + 0.5, jnp.arange(res, dtype=dtype) + 0.5,
        indexing="ij",
    )
    return jnp.stack([xs, ys], axis=-1).reshape(-1, 2)  # (P, 2) in pixel coords


def splat_silhouette(
    verts_cam: jnp.ndarray,  # (B, V, 3) camera-space vertices
    K: jnp.ndarray,  # (B, 3, 3)
    img_res: int,
    sigma_px: float = 3.0,
    render_res: int | None = None,
) -> jnp.ndarray:
    """Gaussian vertex-splat silhouette -> (B, img_res, img_res) in [0, 1].

    mask(p) = 1 - prod_v (1 - exp(-|p - proj(v)|^2 / 2 sigma^2)), computed in
    log space as exp(sum log(1 - g)) for numerical stability. The pairwise
    distance matrix comes from one batched matmul.
    """
    render_res = render_res or img_res
    scale = render_res / img_res
    B, V, _ = verts_cam.shape
    v2d = _project(verts_cam, K) * scale  # (B, V, 2)
    pix = _pixel_grid(render_res, verts_cam.dtype)  # (P, 2)
    sig = sigma_px * scale

    # |p - v|^2 = |p|^2 + |v|^2 - 2 p.v  (the cross term is an MXU matmul)
    p_sq = jnp.sum(pix * pix, axis=-1)  # (P,)
    v_sq = jnp.sum(v2d * v2d, axis=-1)  # (B, V)
    cross = jnp.einsum("pc,bvc->bpv", pix, v2d)  # (B, P, V)
    d2 = p_sq[None, :, None] + v_sq[:, None, :] - 2.0 * cross
    g = jnp.exp(-jnp.maximum(d2, 0.0) / (2.0 * sig * sig))
    # union of per-vertex gaussians (log-space product of misses)
    log_miss = jnp.sum(jnp.log1p(-jnp.clip(g, 0.0, 1.0 - 1e-6)), axis=-1)
    mask = 1.0 - jnp.exp(log_miss)  # (B, P)
    mask = mask.reshape(B, render_res, render_res)
    if render_res != img_res:
        mask = jax.image.resize(mask, (B, img_res, img_res), "bilinear")
    return mask


def soft_raster_silhouette(
    verts_cam: jnp.ndarray,  # (B, V, 3)
    faces: jnp.ndarray,  # (F, 3) int
    K: jnp.ndarray,  # (B, 3, 3)
    img_res: int,
    sigma_px: float = 1.0,
    render_res: int | None = None,
    face_chunk: int = 128,
) -> jnp.ndarray:
    """Per-face soft rasterised silhouette -> (B, img_res, img_res).

    For each face, a signed distance proxy d = min over the three edge
    functions (positive inside); per-face coverage = sigmoid(d / sigma);
    silhouette = 1 - prod_f (1 - cov_f), accumulated with a ``lax.scan`` over
    face chunks so peak memory is (B, P, face_chunk).
    """
    render_res = render_res or img_res
    scale = render_res / img_res
    B, V, _ = verts_cam.shape
    F = faces.shape[0]
    v2d = _project(verts_cam, K) * scale  # (B, V, 2)
    pix = _pixel_grid(render_res, verts_cam.dtype)  # (P, 2)
    P = pix.shape[0]
    sig = sigma_px * scale

    # pad faces to a chunk multiple with degenerate (zero-area) faces
    n_chunks = -(-F // face_chunk)
    pad = n_chunks * face_chunk - F
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0
    ).reshape(n_chunks, face_chunk, 3)
    valid = jnp.concatenate(
        [jnp.ones((F,), bool), jnp.zeros((pad,), bool)]
    ).reshape(n_chunks, face_chunk)

    def edge_dist(p, a, b):
        # signed distance of pixels p (P,2) to edge a->b, normalised;
        # positive on the left side (CCW interior). The sqrt is clamped so
        # degenerate (padded) faces keep finite gradients — they are masked
        # out downstream, but 0 * NaN would still poison the backward pass.
        e = b - a  # (B, C, 2)
        n = jnp.stack([-e[..., 1], e[..., 0]], axis=-1)  # left normal
        norm = jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True),
                                    _EPS * _EPS))
        n = n / norm
        # (B, C, P): dot(p - a, n)
        return jnp.einsum("pc,bfc->bfp", p, n) - jnp.sum(a * n, axis=-1)[..., None]

    def step(log_miss, idx):
        f = faces_p[idx]  # (C, 3)
        va = jnp.take_along_axis(v2d, f[:, 0][None, :, None].repeat(2, -1), axis=1)
        vb = jnp.take_along_axis(v2d, f[:, 1][None, :, None].repeat(2, -1), axis=1)
        vc = jnp.take_along_axis(v2d, f[:, 2][None, :, None].repeat(2, -1), axis=1)
        d0 = edge_dist(pix, va, vb)
        d1 = edge_dist(pix, vb, vc)
        d2_ = edge_dist(pix, vc, va)
        # interior when all three edge distances share a sign; use min of the
        # consistently-oriented distance (handle both windings via abs trick)
        d_ccw = jnp.minimum(jnp.minimum(d0, d1), d2_)
        d_cw = jnp.minimum(jnp.minimum(-d0, -d1), -d2_)
        d = jnp.maximum(d_ccw, d_cw)  # (B, C, P) positive inside
        cov = jax.nn.sigmoid(d / sig)
        cov = jnp.where(valid[idx][None, :, None], cov, 0.0)
        log_miss = log_miss + jnp.sum(
            jnp.log1p(-jnp.clip(cov, 0.0, 1.0 - 1e-6)), axis=1
        )
        return log_miss, None

    log_miss0 = jnp.zeros((B, P), verts_cam.dtype)
    log_miss, _ = jax.lax.scan(step, log_miss0, jnp.arange(n_chunks))
    mask = (1.0 - jnp.exp(log_miss)).reshape(B, render_res, render_res)
    if render_res != img_res:
        mask = jax.image.resize(mask, (B, img_res, img_res), "bilinear")
    return mask


@functools.partial(jax.jit, static_argnames=("img_res",))
def render_silhouette(verts_cam, faces, K, img_res: int):
    """Default training-loss silhouette (vertex splatting, half-res render).

    A VMEM-fused Pallas variant exists
    (:mod:`hands_tpu.ops.rasterizer_pallas`, custom VJP, grads matching to
    <2e-5). Measured standalone it is ~3% faster and removes the (B, P, V)
    HBM intermediates, but inside the full training step the custom-call
    boundary costs more than it saves (123 -> 133 ms/step at bs64): the
    splat is transcendental-bound, not HBM-bound, and XLA overlaps it with
    the rest of the backward pass. The XLA formulation therefore stays the
    production default; the kernel remains tested infrastructure for
    memory-constrained configurations (import ``splat_silhouette_fused``).
    """
    return splat_silhouette(verts_cam, K, img_res, sigma_px=3.0,
                            render_res=img_res // 2)
