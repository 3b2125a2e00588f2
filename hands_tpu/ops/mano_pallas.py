"""Pallas TPU kernel: fused linear blend skinning.

The LBS hot path in :func:`hands_tpu.ops.mano.mano_forward` is
``T = lbs_weights @ A`` followed by ``verts = T @ v_homo`` — the XLA form
materialises the per-vertex transform tensor ``T`` (B, 778, 4, 4) in HBM
(~800 KB/sample) just to contract it away again. This kernel fuses both
contractions in VMEM: for each vertex tile, one (TILE, 16) x (16, 16) MXU
matmul produces the tile's skinning transforms, which are immediately
applied to the tile's vertices — the (B, V, 4, 4) intermediate never exists.

Layout: vertices are padded from 778 to 896 (7 x 128 lanes); the weight
matrix is (896, 16); A is passed flattened as (B, 16, 16) with row j holding
the 4x4 skinning matrix of joint j (row-major).

Measured (TPU v5e, B=512, fp32): XLA einsum 724 us/call, this kernel
3.6 ms/call, outputs bit-matching to 6e-8. At MANO's tiny contraction sizes
(16-lane inner dims) XLA's fused einsum already saturates the op, so
``mano_forward`` keeps the einsum path in production; the kernel stays as
tested infrastructure for larger skinned models (where the HBM intermediate
would dominate) and as the template for VMEM-fused gather-free skinning.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hands_tpu.ops.mano import NUM_JOINTS, NUM_VERTS

VPAD = 896  # 778 -> 7 * 128
TILE_V = 128


BTILE = 8  # batch elements per program (amortises grid-dispatch overhead)


def _lbs_kernel(vh_ref, w_ref, a_ref, gsum_ref, out_ref):
    # vh_ref: (BTILE, TILE_V, 4) posed verts (homogeneous)
    # w_ref:  (TILE_V, 16) skinning weights for this tile
    # a_ref:  (BTILE, 16, 16) flattened per-joint 4x4 transforms
    # gsum_ref: (16, 4) group-sum selector G[4r+c, r] = 1
    # out_ref: (BTILE, TILE_V, 4)
    #
    # out[t, r] = sum_c T[t, 4r+c] * vh[t, c]; Mosaic can't shape-cast the
    # lane dim (16 -> 4x4), so express the contraction as an elementwise
    # product with lane-tiled vh followed by a (16, 4) group-sum matmul.
    w = w_ref[:]  # (TILE_V, 16)
    gsum = gsum_ref[:]
    hi = jax.lax.Precision.HIGHEST
    for b in range(BTILE):
        t = jnp.dot(w, a_ref[b], preferred_element_type=jnp.float32,
                    precision=hi)  # (TILE_V, 16)
        vh = vh_ref[b]  # (TILE_V, 4)
        vh_tiled = jnp.concatenate([vh, vh, vh, vh], axis=-1)
        out_ref[b] = jnp.dot(t * vh_tiled, gsum,
                             preferred_element_type=jnp.float32, precision=hi)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lbs_apply(
    v_posed: jnp.ndarray,  # (B, 778, 3)
    lbs_weights: jnp.ndarray,  # (778, 16)
    A: jnp.ndarray,  # (B, 16, 4, 4)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused skinning: returns (B, 778, 3) posed vertices."""
    B = v_posed.shape[0]
    vh = jnp.concatenate(
        [v_posed, jnp.ones((B, NUM_VERTS, 1), v_posed.dtype)], axis=-1
    )
    vh = jnp.pad(vh, ((0, 0), (0, VPAD - NUM_VERTS), (0, 0)))
    w = jnp.pad(lbs_weights, ((0, VPAD - NUM_VERTS), (0, 0)))
    # t[v, r*4+c] = sum_j w[v, j] * A[b, j, r, c] -> rows = joints,
    # cols = row-major flattened 4x4
    a_mat = A.reshape(B, NUM_JOINTS, 16)
    gsum = jnp.zeros((16, 4), jnp.float32)
    gsum = gsum.at[jnp.arange(16), jnp.arange(16) // 4].set(1.0)

    bpad = -B % BTILE
    if bpad:
        vh = jnp.pad(vh, ((0, bpad), (0, 0), (0, 0)))
        a_mat = jnp.pad(a_mat, ((0, bpad), (0, 0), (0, 0)))
    BP = B + bpad

    grid = (BP // BTILE, VPAD // TILE_V)
    out = pl.pallas_call(
        _lbs_kernel,
        out_shape=jax.ShapeDtypeStruct((BP, VPAD, 4), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BTILE, TILE_V, 4), lambda b, v: (b, v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, NUM_JOINTS), lambda b, v: (v, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BTILE, NUM_JOINTS, 16), lambda b, v: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 4), lambda b, v: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BTILE, TILE_V, 4), lambda b, v: (b, v, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vh.astype(jnp.float32), w.astype(jnp.float32),
      a_mat.astype(jnp.float32), gsum)
    return out[:B, :NUM_VERTS, :3]
