"""Pallas TPU kernel: fused vertex-splat silhouette with custom VJP.

The XLA splat (:func:`hands_tpu.ops.rasterizer.splat_silhouette`) materialises
the (B, P, V) pairwise tensor in HBM three times over (distances, gaussians,
log-miss) — ~7.5 GB of traffic per render at bs64/112^2/896 verts, making the
mask loss HBM-bound. This kernel keeps the whole per-tile chain (distance ->
gaussian -> log1p accumulation) in VMEM: only the (B, P) log-miss map ever
touches HBM. The backward pass is a second kernel that recomputes the
gaussians per vertex tile and accumulates the two pixel moments needed for
d(loss)/d(v2d) — O(B*(P + V)) traffic instead of O(B*P*V).

Interface: operates on already-projected 2D vertices (projection stays in
XLA where it is cheap and differentiable); sigma is static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_TILE = 512  # pixels per forward program
V_PAD = 128  # vertex padding multiple

_CLIP = 1.0 - 1e-6


def _pixel_grid(res: int) -> np.ndarray:
    ys, xs = np.meshgrid(np.arange(res, dtype=np.float32) + 0.5,
                         np.arange(res, dtype=np.float32) + 0.5,
                         indexing="ij")
    return np.stack([xs, ys], -1).reshape(-1, 2)


def _fwd_kernel(pix_ref, v2d_ref, mask_ref, lm_ref, out_ref, *, sigma):
    # pix_ref: (P_TILE, 2); v2d_ref: (1, V, 2); mask_ref: (1, V) valid verts
    # lm_ref/out_ref: (1, P_TILE) log-miss and mask outputs
    pix = pix_ref[:]  # (P_TILE, 2)
    v2d = v2d_ref[0]  # (V, 2)
    p_sq = jnp.sum(pix * pix, axis=-1, keepdims=True)  # (P_TILE, 1)
    v_sq = jnp.sum(v2d * v2d, axis=-1)[None, :]  # (1, V)
    cross = jnp.dot(pix, v2d.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (P_TILE, V)
    d2 = jnp.maximum(p_sq + v_sq - 2.0 * cross, 0.0)
    g = jnp.exp(-d2 / (2.0 * sigma * sigma)) * mask_ref[0, 0][None, :]
    lm = jnp.sum(jnp.log1p(-jnp.minimum(g, _CLIP)), axis=-1)  # (P_TILE,)
    lm_ref[0, 0] = lm
    out_ref[0, 0] = 1.0 - jnp.exp(lm)


P_CHUNK = 512  # pixels per backward inner step (bounds VMEM for (P_CHUNK, V))


def _bwd_kernel(pix_ref, v2d_ref, mask_ref, lm_ref, gmask_ref, dv_ref,
                *, sigma, n_chunks):
    # grid over (B,): full vertex set per program, pixels chunked
    # pix_ref: (P_pad, 2); v2d_ref: (1, V, 2); lm/gmask: (1, P_pad);
    # dv: (1, V, 2)
    v2d = v2d_ref[0]
    v_sq = jnp.sum(v2d * v2d, axis=-1)[None, :]  # (1, V)
    hi = jax.lax.Precision.HIGHEST
    inv2s2 = 1.0 / (2.0 * sigma * sigma)
    V = v2d.shape[0]

    def step(c, carry):
        s0, s1 = carry
        sl = pl.ds(c * P_CHUNK, P_CHUNK)
        pix = pix_ref[sl, :]  # (P_CHUNK, 2)
        # A[p] = Gmask[p] * (-exp(lm[p]))
        A = -gmask_ref[0, 0, sl] * jnp.exp(lm_ref[0, 0, sl])  # (P_CHUNK,)
        p_sq = jnp.sum(pix * pix, axis=-1, keepdims=True)
        cross = jnp.dot(pix, v2d.T, preferred_element_type=jnp.float32,
                        precision=hi)
        d2 = jnp.maximum(p_sq + v_sq - 2.0 * cross, 0.0)
        g = jnp.exp(-d2 * inv2s2) * mask_ref[0, 0][None, :]
        g = jnp.minimum(g, _CLIP)
        # dL/dd2[p, v] = A[p] * g / ((1 - g) * 2 sigma^2)
        C = (A[:, None] * g / (1.0 - g)) * inv2s2  # (P_CHUNK, V)
        s0 = s0 + jnp.sum(C, axis=0)[None, :]  # (1, V)
        s1 = s1 + jnp.dot(C.T, pix, preferred_element_type=jnp.float32,
                          precision=hi)  # (V, 2)
        return s0, s1

    s0, s1 = jax.lax.fori_loop(
        0, n_chunks, step,
        (jnp.zeros((1, V), jnp.float32), jnp.zeros((V, 2), jnp.float32)))
    # dL/dv2d = sum_p C * 2 (v2d - pix) = 2 (s0 * v2d - s1)
    dv_ref[0] = 2.0 * (s0[0][:, None] * v2d - s1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def splat_silhouette_fused(v2d: jnp.ndarray, res: int, sigma: float):
    """Fused gaussian vertex-splat silhouette.

    v2d: (B, V, 2) projected vertices in pixel coords (already scaled to the
    render resolution). Returns (B, res, res) soft mask. Padded vertices can
    be disabled by placing them far outside the canvas.
    """
    mask, _ = _fwd(v2d, res, sigma)
    return mask


def _pad_verts(v2d):
    B, V, _ = v2d.shape
    vpad = -V % V_PAD
    if vpad:
        v2d = jnp.pad(v2d, ((0, 0), (0, vpad), (0, 0)))
    valid = jnp.concatenate(
        [jnp.ones((B, V), jnp.float32), jnp.zeros((B, vpad), jnp.float32)],
        axis=1)
    return v2d, valid[:, None, :]  # (B, 1, V): TPU block sublane rule


def _fwd(v2d, res, sigma):
    B = v2d.shape[0]
    v2d_p, valid = _pad_verts(v2d)
    V = v2d_p.shape[1]
    pix = jnp.asarray(_pixel_grid(res))
    P = res * res
    n_pt = -(-P // P_TILE)
    pix_pad = jnp.pad(pix, ((0, n_pt * P_TILE - P), (0, 0)))

    # outputs bind positionally to the kernel's trailing refs: (lm, mask)
    lm, mask = pl.pallas_call(
        functools.partial(_fwd_kernel, sigma=sigma),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, n_pt * P_TILE), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, n_pt * P_TILE), jnp.float32),
        ),
        grid=(B, n_pt),
        in_specs=[
            pl.BlockSpec((P_TILE, 2), lambda b, p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, 2), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, P_TILE), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P_TILE), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
        ),
    )(pix_pad, v2d_p, valid)
    return mask[:, 0, :P].reshape(B, res, res), lm[:, 0, :P]


def _fwd_rule(v2d, res, sigma):
    mask, lm = _fwd(v2d, res, sigma)
    return mask, (v2d, lm)


def _bwd_rule(res, sigma, residuals, gmask):
    v2d, lm = residuals
    B = v2d.shape[0]
    v2d_p, valid = _pad_verts(v2d)
    V = v2d_p.shape[1]
    pix = jnp.asarray(_pixel_grid(res))
    P = res * res
    n_chunks = -(-P // P_CHUNK)
    P_pad = n_chunks * P_CHUNK
    # pad pixels far outside the canvas so their gaussians are exactly 0
    pix_pad = jnp.pad(pix, ((0, P_pad - P), (0, 0)),
                      constant_values=-1e6)
    lm_pad = jnp.pad(lm, ((0, 0), (0, P_pad - P)))[:, None, :]
    gmask_pad = jnp.pad(gmask.reshape(B, P),
                        ((0, 0), (0, P_pad - P)))[:, None, :]

    dv = pl.pallas_call(
        functools.partial(_bwd_kernel, sigma=sigma, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((B, V, 2), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((P_pad, 2), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, V, 2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(pix_pad, v2d_p, valid, lm_pad, gmask_pad)
    return (dv[:, : v2d.shape[1], :],)


splat_silhouette_fused.defvjp(_fwd_rule, _bwd_rule)
