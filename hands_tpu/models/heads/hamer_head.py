"""HaMeR MANO head: single-token cross-attention transformer decoder.

Re-design of ``/root/reference/src/models/hamer_light/mano_head.py:12`` and
its vendored ``pose_transformer.py``: one learned query token cross-attends
to the ViT token sequence through a 6-layer decoder (dim 1024, 8 heads,
head_dim 64, context 1280), then additive readouts for pose (96 = 16x6D),
shape (10) and weak-persp cam (3) on top of the mean-parameter
initialisation (``mano_mean_params.npz``; synthetic fallback = identity-6D
pose, zero betas, cam [0.9, 0, 0]). ief_iters=1 as in the reference config.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hands_tpu.core import rot as rotlib


def load_mean_params() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(pose(96, 6D), betas(10), cam(3)) from mano_mean_params.npz if
    available (DATA_DIR, same file the reference reads), else a neutral
    initialisation."""
    path = os.path.join(
        os.environ.get("DATA_DIR", ""), "hamer/_DATA/data/mano_mean_params.npz"
    )
    if os.environ.get("DATA_DIR") and os.path.exists(path):
        d = np.load(path)
        return (
            d["pose"].astype(np.float32).reshape(-1),
            d["shape"].astype(np.float32).reshape(-1),
            d["cam"].astype(np.float32).reshape(-1),
        )
    ident6d = np.tile(
        np.asarray([1, 0, 0, 0, 1, 0], np.float32), 16
    )  # identity rotations, HaMeR 6D layout (geometry.py:47)
    return ident6d, np.zeros(10, np.float32), np.asarray([0.9, 0, 0], np.float32)


class CrossAttention(nn.Module):
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, N, _ = x.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype, name="to_kv")(
            context
        )
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(B, -1, self.heads, self.dim_head)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * self.dim_head**-0.5, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class SelfAttention(nn.Module):
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return CrossAttention(self.heads, self.dim_head, self.dtype,
                              name="attn")(x, x)


class DecoderLayer(nn.Module):
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # epsilon=1e-5: the reference PreNorms are torch nn.LayerNorm
        # defaults (pose_transformer.py:30)
        x = x + SelfAttention(self.heads, self.dim_head, self.dtype,
                              name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x))
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="cross_attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x), context)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(x.shape[-1], dtype=self.dtype)(y)
        return x + y


class ManoTransformerDecoderHead(nn.Module):
    """ViT token map -> MANO params (pose 16x3x3 rotmats, betas, wp cam)."""

    dim: int = 1024
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 1024
    ief_iters: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_map: jnp.ndarray, train: bool = False):
        # feat_map: (B, h, w, C_ctx) NHWC token map from the ViT
        B = feat_map.shape[0]
        context = feat_map.reshape(B, -1, feat_map.shape[-1])

        mean_pose, mean_betas, mean_cam = load_mean_params()
        pred_pose = jnp.tile(jnp.asarray(mean_pose)[None], (B, 1))
        pred_betas = jnp.tile(jnp.asarray(mean_betas)[None], (B, 1))
        pred_cam = jnp.tile(jnp.asarray(mean_cam)[None], (B, 1))

        token_in = nn.Dense(self.dim, name="token_proj")
        # learned query position embedding (pose_transformer.py:329: the
        # zero input token becomes token_proj bias + pos_embedding)
        pos_emb = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (1, 1, self.dim), jnp.float32)
        layers = [
            DecoderLayer(self.heads, self.dim_head, self.mlp_dim,
                         dtype=self.dtype, name=f"layer{i}")
            for i in range(self.depth)
        ]
        # NOTE: the reference decoder has NO final LayerNorm — readouts come
        # straight off the last residual stream (pose_transformer.py:196-201)
        decpose = nn.Dense(96, name="decpose")
        decshape = nn.Dense(10, name="decshape")
        deccam = nn.Dense(3, name="deccam")

        for _ in range(self.ief_iters):
            # reference uses a zero token (input_is_mean_shape=False)
            token = token_in(jnp.zeros((B, 1, 1), jnp.float32))
            token = token + pos_emb.astype(token.dtype)
            for layer in layers:
                token = layer(token, context)
            token = token[:, 0]
            pred_pose = decpose(token) + pred_pose
            pred_betas = decshape(token) + pred_betas
            pred_cam = deccam(token) + pred_cam

        # HaMeR's own 6D convention (geometry.py:47) — NOT SPIN, NOT the
        # pytorch3d row layout; proven by tests/test_ref_goldens_hamer_head
        rotmats = rotlib.rot6d_to_matrix_hamer(pred_pose.reshape(B, 16, 6))
        return {
            "pose": rotmats,  # (B, 16, 3, 3) incl. global orient at 0
            "shape": pred_betas,
            "cam_t.wp": pred_cam,
        }
