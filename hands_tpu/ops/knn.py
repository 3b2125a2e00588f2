"""Brute-force batched kNN on device.

TPU-native replacement for pytorch3d's CUDA ``knn_points``
(``/root/reference/src/utils/interfield.py:5-27``): at hand<->object scale
(778 x ~4k points) the full pairwise distance matrix is one MXU matmul, so
brute force beats any tree. Supports per-batch valid lengths (ragged object
meshes padded to max length).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn(
    query: jnp.ndarray,  # (B, N, 3)
    points: jnp.ndarray,  # (B, M, 3)
    points_len: jnp.ndarray | None = None,  # (B,) valid lengths of `points`
    k: int = 1,
):
    """Returns (dists, idx): sqrt-L2 distances (B, N, k) and indices (B, N, k)
    of the k nearest `points` for each query."""
    with jax.default_matmul_precision("float32"):
        q2 = jnp.sum(query * query, axis=-1, keepdims=True)  # (B, N, 1)
        p2 = jnp.sum(points * points, axis=-1)  # (B, M)
        cross = jnp.einsum("bnc,bmc->bnm", query, points)
        d2 = q2 + p2[:, None, :] - 2.0 * cross  # (B, N, M)
        if points_len is not None:
            M = points.shape[1]
            mask = jnp.arange(M)[None, :] < points_len[:, None]  # (B, M)
            d2 = jnp.where(mask[:, None, :], d2, jnp.inf)
        neg_d2, idx = jax.lax.top_k(-d2, k)
        return jnp.sqrt(jnp.maximum(-neg_d2, 0.0)), idx


def compute_dist_mano_to_obj(mano_v, obj_v, obj_v_len, dist_min, dist_max):
    """Closest-object distance for each MANO vertex
    (interfield.py ``compute_dist_mano_to_obj``). Returns (B, 778), (B, 778)."""
    d, i = knn(mano_v, obj_v, obj_v_len, k=1)
    return jnp.clip(d[:, :, 0], dist_min, dist_max), i[:, :, 0]


def compute_dist_obj_to_mano(mano_v, obj_v, obj_v_len, dist_min, dist_max):
    """Closest-hand distance for each object vertex. Returns (B, M), (B, M)."""
    d, i = knn(obj_v, mano_v, None, k=1)
    return jnp.clip(d[:, :, 0], dist_min, dist_max), i[:, :, 0]


def dist2contact(dist: jnp.ndarray, contact_bnd: float) -> jnp.ndarray:
    return (dist < contact_bnd).astype(jnp.int32)
