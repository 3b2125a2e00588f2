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


def dense_pos_enc(
    angle: jnp.ndarray, mask: jnp.ndarray, n_freq: int, out_res: int
) -> jnp.ndarray:
    """Dense per-pixel angles (B, H, W, C=2) + validity mask (B, H, W) ->
    (B, out_res, out_res, 4*n_freq), NHWC, bilinear-resized."""
    B, H, W, C = angle.shape
    freqs = 2.0 ** jnp.arange(n_freq, dtype=angle.dtype)
    prod = jnp.einsum("bhwc,l->bhwlc", angle, freqs)  # (B, H, W, L, C)
    enc = jnp.concatenate([jnp.sin(prod), jnp.cos(prod)], axis=-1)  # (B,H,W,L,2C)
    enc = enc.reshape(B, H, W, n_freq * 2 * C)
    enc = enc * mask[..., None]
    return jax.image.resize(
        enc, (B, out_res, out_res, enc.shape[-1]), method="bilinear"
    )


def broadcast_to_map(enc: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, D) vector encoding -> (B, h, w, D) spatial broadcast (NHWC)."""
    return jnp.broadcast_to(enc[:, None, None, :], (enc.shape[0], h, w, enc.shape[-1]))
