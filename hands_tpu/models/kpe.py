"""KPE: intrinsics-aware positional encodings (WildHands' key idea).

Pure-JAX sinusoidal encodings of ray angles computed from camera intrinsics
and crop geometry. Semantics follow the reference
(``src/models/hands_light/model.py:444-500`` and the angle construction in
``src/datasets/hands_light_dataset.py:256-352``): per-crop center / corner /
dense per-pixel angles ``arctan2(p - c, f)`` encoded with frequencies
``2^0 .. 2^(L-1)`` as interleaved (sin, cos).

Angle *computation* lives in ``hands_tpu/ops/preprocess.py`` (it is part of
the on-device data pipeline); this module holds the encoders used inside
models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sincos_pos_enc(angle: jnp.ndarray, n_freq: int) -> jnp.ndarray:
    """(B, C) angles -> (B, 2*n_freq*C) with layout [freq, chan, (sin, cos)]."""
    B, C = angle.shape
    freqs = 2.0 ** jnp.arange(n_freq, dtype=angle.dtype)  # (L,)
    prod = freqs[None, :, None] * angle[:, None, :]  # (B, L, C)
    enc = jnp.stack([jnp.sin(prod), jnp.cos(prod)], axis=-1)  # (B, L, C, 2)
    return enc.reshape(B, -1)


def center_pos_enc(angle: jnp.ndarray, n_freq: int) -> jnp.ndarray:
    """Center angles (B, 2) -> (B, 4*n_freq)."""
    return sincos_pos_enc(angle, n_freq)


def corner_pos_enc(angle: jnp.ndarray, n_freq: int) -> jnp.ndarray:
    """Corner angles (B, 8) -> (B, 16*n_freq)."""
    return sincos_pos_enc(angle, n_freq)


def resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with torch ``align_corners=True`` semantics (NHWC):
    sample positions ``in = out * (in_size-1)/(out_size-1)``. The reference
    resizes all dense KPE encodings this way (model.py:453, 481, 244-246,
    280-281), which differs from half-pixel-center bilinear near the edges."""
    B, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x

    def axis_coords(n_in, n_out):
        if n_out == 1:
            return (jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
                    jnp.zeros((1,), x.dtype))
        s = jnp.linspace(0.0, float(n_in - 1), n_out).astype(x.dtype)
        i0 = jnp.floor(s).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        return i0, i1, s - i0.astype(x.dtype)

    y0, y1, wy = axis_coords(H, out_h)
    x0, x1, wx = axis_coords(W, out_w)
    v = (x[:, y0] * (1.0 - wy)[None, :, None, None]
         + x[:, y1] * wy[None, :, None, None])  # (B, out_h, W, C)
    return (v[:, :, x0] * (1.0 - wx)[None, None, :, None]
            + v[:, :, x1] * wx[None, None, :, None])


def dense_pos_enc(
    angle: jnp.ndarray, mask: jnp.ndarray, n_freq: int, out_res: int
) -> jnp.ndarray:
    """Dense per-pixel angles (B, H, W, C=2) + validity mask (B, H, W) ->
    (B, out_res, out_res, 4*n_freq), NHWC. Channel layout matches the
    reference's dim-3 concat trick (model.py:444-453): [freq][chan][sin,cos]
    interleaved; resize is align_corners=True bilinear."""
    B, H, W, C = angle.shape
    freqs = 2.0 ** jnp.arange(n_freq, dtype=angle.dtype)
    prod = jnp.einsum("bhwc,l->bhwlc", angle, freqs)  # (B, H, W, L, C)
    enc = jnp.stack([jnp.sin(prod), jnp.cos(prod)], axis=-1)  # (B,H,W,L,C,2)
    enc = enc.reshape(B, H, W, n_freq * C * 2)
    enc = enc * mask[..., None]
    return resize_align_corners(enc, out_res, out_res)


def broadcast_to_map(enc: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, D) vector encoding -> (B, h, w, D) spatial broadcast (NHWC)."""
    return jnp.broadcast_to(enc[:, None, None, :], (enc.shape[0], h, w, enc.shape[-1]))
