"""Fused multi-head attention Pallas kernel for the ViT backbones.

The XLA composition of HaMeR's attention at (N=192, D=80) costs ~126 ms of
a 637 ms ViT-H bs256 forward while its two einsums only need ~12 ms — the
rest is the materialised (B, H, N, N) probability tensor and the layout
copies around it (BENCH_NOTES.md, round-2 MFU study). This kernel computes
QK^T -> f32 softmax -> AV entirely in VMEM, one grid step per batch row,
heads looped in-register; nothing but q/k/v in and o out touches HBM.

Layout contract: (B, N, H, D) in and out — exactly the reshape of the fused
qkv projection, so the caller adds **zero** transposes.

Inference-path kernel (`ViTBackbone(fused_attn=True)`); training keeps the
XLA composition (its backward is already fused+rematerialised by XLA).
Numerics match the XLA path to bf16 resolution (same f32 softmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, num_heads: int):
    # refs are (1, H, N, D) blocks: the dynamic head index walks the
    # untiled dim 1; (N, D) are the (sublane, lane) tiles
    def head(h, carry):
        q = q_ref[0, h]  # (N, D)
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (N, N) f32 in VMEM
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        attn = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            attn.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = out.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, num_heads, head, 0)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def mha_fused(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              scale: float, interpret: bool = False) -> jnp.ndarray:
    """Softmax(q k^T * scale) v; (B, N, H, D) in/out (qkv-reshape layout)."""
    B, N, H, D = q.shape
    qh, kh, vh = (jnp.transpose(t, (0, 2, 1, 3)) for t in (q, k, v))
    spec = pl.BlockSpec((1, H, N, D), lambda b: (b, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, num_heads=H),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        interpret=interpret,
    )(qh, kh, vh)
    return jnp.transpose(out, (0, 2, 1, 3))


def mha_reference(q, k, v, scale):
    """The XLA composition (ViTBackbone.Attention) for parity tests."""
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)
