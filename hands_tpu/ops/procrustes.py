"""Batched Procrustes / similarity alignment on device.

Replaces the reference's per-sample numpy SVD loop
(``/root/reference/src/utils/eval_modules.py:136-187``) with one batched
``jnp.linalg.svd`` over (B, 3, 3) correlation matrices — the whole eval set
aligns in a single fused dispatch. Convention matches the reference
(3dpw-eval): R maximises trace(R'K), det(R)=+1 via sign fix on the last
singular direction, scale = trace(RK)/var1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def similarity_align(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Align S1 to S2 with the optimal similarity transform (batched).

    S1, S2: (B, N, 3). Returns S1_hat = scale * R @ S1 + t, (B, N, 3).
    Degenerate inputs yield NaNs (propagated, matching the reference's
    non-convergence fallback).
    """
    with jax.default_matmul_precision("float32"):
        # work in (B, 3, N) like the reference
        X1 = S1.transpose(0, 2, 1)
        X2 = S2.transpose(0, 2, 1)
        mu1 = X1.mean(axis=2, keepdims=True)
        mu2 = X2.mean(axis=2, keepdims=True)
        X1c = X1 - mu1
        X2c = X2 - mu2

        var1 = jnp.sum(X1c * X1c, axis=(1, 2))  # (B,)
        K = jnp.einsum("bin,bjn->bij", X1c, X2c)  # (B, 3, 3)

        U, _, Vh = jnp.linalg.svd(K)
        V = Vh.transpose(0, 2, 1)
        det = jnp.linalg.det(jnp.einsum("bij,bkj->bik", U, V))  # det(U V^T)
        Z = jnp.broadcast_to(jnp.eye(3), K.shape).copy()
        Z = Z.at[:, 2, 2].set(jnp.sign(det))
        R = V @ Z @ U.transpose(0, 2, 1)

        scale = jnp.einsum("bii->b", R @ K) / jnp.maximum(var1, 1e-12)
        t = mu2 - scale[:, None, None] * (R @ mu1)
        S1_hat = scale[:, None, None] * (R @ X1) + t
        return S1_hat.transpose(0, 2, 1)


def similarity_align_masked(
    S1: jnp.ndarray, S2: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Weighted similarity alignment using only per-joint-valid entries.

    Batched form of the reference's EgoExo per-joint-validity Procrustes path
    (``eval_modules.py:231-317``): centroids, variance and the correlation
    matrix are weighted by ``valid`` (B, N); the transform is applied to all
    of S1 (invalid joints get aligned too — their errors are NaN-masked
    downstream).
    """
    with jax.default_matmul_precision("float32"):
        w = valid.astype(S1.dtype)
        wn = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-9)  # (B, N)
        mu1 = jnp.einsum("bn,bnc->bc", wn, S1)[:, None, :]
        mu2 = jnp.einsum("bn,bnc->bc", wn, S2)[:, None, :]
        X1 = (S1 - mu1) * w[..., None]
        X2 = (S2 - mu2) * w[..., None]

        var1 = jnp.sum(X1 * X1, axis=(1, 2))
        K = jnp.einsum("bni,bnj->bij", X1, X2)
        U, _, Vh = jnp.linalg.svd(K)
        V = Vh.transpose(0, 2, 1)
        det = jnp.linalg.det(jnp.einsum("bij,bkj->bik", U, V))
        Z = jnp.broadcast_to(jnp.eye(3), K.shape).copy()
        Z = Z.at[:, 2, 2].set(jnp.sign(det))
        R = V @ Z @ U.transpose(0, 2, 1)
        scale = jnp.einsum("bii->b", R @ K) / jnp.maximum(var1, 1e-12)
        t = mu2.transpose(0, 2, 1) - scale[:, None, None] * (
            R @ mu1.transpose(0, 2, 1))
        S1_hat = scale[:, None, None] * (R @ S1.transpose(0, 2, 1)) + t
        return S1_hat.transpose(0, 2, 1)
