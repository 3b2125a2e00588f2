"""Sequence parallelism (SP): token-sharded attention over a mesh axis.

The reference has no sequence parallelism (max sequence is 192 ViT tokens,
SURVEY §2.7) — these are the TPU-native scaling primitives for when context
grows past one chip:

- ``sp_attention``: shard the query tokens, all-gather K/V once over the
  axis (right for short-to-medium sequences; one collective, full K/V
  materialised per device).
- ``ring_attention``: never materialise full K/V. K/V blocks rotate around
  the ring via ``ppermute`` while each device accumulates its queries'
  attention with an online (flash-style) running max/denominator — O(N/s)
  memory per device, collectives ride the ICI ring.

Both are pure functions of (B, N, H, D) arrays wrapped in ``shard_map`` and
are exact (up to fp error) drop-ins for ``mha_reference``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _attn_block(q, k, v, scale):
    """Plain attention of a query block against a K/V block, returning the
    unnormalised accumulator pieces (for online-softmax combination):
    (acc, row_max, row_denom)."""
    s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    m = jnp.max(s, axis=-1)  # (B, H, N)
    p = jnp.exp(s - m[..., None])
    denom = jnp.sum(p, axis=-1)  # (B, H, N)
    acc = jnp.einsum("bhnm,bmhd->bnhd", p, v)
    return acc, m, denom


def mha_reference(q, k, v):
    """Unsharded attention (B, N, H, D) for parity checks."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v)


def sp_attention(q, k, v, mesh: Mesh, axis: str = "model"):
    """Token-sharded attention: q/k/v sharded on N over ``axis``; K/V are
    all-gathered inside the shard_map so each device attends its local
    query block against the full sequence."""
    spec = P(None, axis, None, None)

    def local(qc, kc, vc):
        kf = jax.lax.all_gather(kc, axis, axis=1, tiled=True)
        vf = jax.lax.all_gather(vc, axis, axis=1, tiled=True)
        return mha_reference(qc, kf, vf)

    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "model"):
    """Ring attention: q/k/v token-sharded on N over ``axis``. Each device
    keeps its query block; K/V blocks travel the ring (``ppermute`` by +1)
    for ``s`` steps while a flash-style online softmax folds each visiting
    block into the running (acc, max, denom). Full K/V is never resident.

    Causal masking is unnecessary for the ViT encoder (bidirectional); the
    combination is therefore permutation-invariant and exact.
    """
    spec = P(None, axis, None, None)
    n_shards = mesh.shape[axis]

    def local(qc, kc, vc):
        scale = qc.shape[-1] ** -0.5
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        acc0, m0, d0 = _attn_block(qc, kc, vc, scale)

        def step(carry, _):
            acc, m, d, kb, vb = carry
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            acc_n, m_n, d_n = _attn_block(qc, kb, vb, scale)
            m_new = jnp.maximum(m, m_n)
            a = jnp.exp(m - m_new)
            b = jnp.exp(m_n - m_new)
            # (B, H, N) weights -> (B, N, H, 1) to scale the accumulators
            acc = (acc * jnp.moveaxis(a, 2, 1)[..., None]
                   + acc_n * jnp.moveaxis(b, 2, 1)[..., None])
            d = d * a + d_n * b
            return (acc, m_new, d, kb, vb), None

        (acc, m, d, _, _), _ = jax.lax.scan(
            step, (acc0, m0, d0, kc, vc), None, length=n_shards - 1)
        return acc / jnp.moveaxis(d, 2, 1)[..., None]

    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)
