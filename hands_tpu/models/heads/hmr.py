"""Iterative HMR regression heads (Flax).

Re-designs ``/root/reference/src/nets/hmr_layer.py`` and
``src/nets/hand_heads/hand_hmr.py`` for JAX: the n_iter refinement loop is a
statically-unrolled chain (n_iter=3) of fused MLP blocks — XLA sees one DAG,
no Python-side state. Parameter spec: ``pose_6d`` (96), ``cam_t_wp`` (3),
``shape`` (10); each decoder is a small linear initialised with
xavier-uniform gain 0.01 so early iterations stay near the identity-pose
initialisation.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hands_tpu.core import rot as rotlib

HAND_SPECS: Dict[str, int] = {"pose_6d": 6 * 16, "cam_t_wp": 3, "shape": 10}


def _small_xavier(gain: float = 0.01):
    base = nn.initializers.xavier_uniform()

    def init(key, shape, dtype):
        return base(key, shape, dtype) * gain

    return init


class HMRLayer(nn.Module):
    """Additive iterative refinement: concat(feat, params) -> MLP -> deltas."""

    feat_dim: int
    mid_dim: int = 1024
    specs: Tuple[Tuple[str, int], ...] = tuple(HAND_SPECS.items())
    n_iter: int = 3
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, init_vec: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        refine = [
            nn.Dense(self.mid_dim, dtype=self.dtype, name="refine0"),
            nn.Dense(self.mid_dim, dtype=self.dtype, name="refine1"),
        ]
        decoders = {
            key: nn.Dense(size, kernel_init=_small_xavier(), name=f"dec_{key}")
            for key, size in self.specs
        }
        dropout = nn.Dropout(self.dropout_rate, deterministic=not train)

        pred = dict(init_vec)
        for it in range(self.n_iter):
            # concat in the init-dict's insertion order (pose_6d, shape,
            # cam_t/wp — hand_hmr.py init_vector_dict), NOT the specs order;
            # the reference reads pred_vector_dict.items() (hmr_layer.py:70)
            vec = jnp.concatenate(list(pred.values()), axis=-1)
            xc = jnp.concatenate([feat, vec], axis=-1)
            xc = dropout(nn.relu(refine[0](xc)))
            xc = dropout(nn.relu(refine[1](xc)))
            for key, _ in self.specs:
                pred[key] = pred[key] + decoders[key](xc)
        return pred


class TorchMHA(nn.Module):
    """torch ``nn.MultiheadAttention``-compatible attention (fused in_proj +
    out_proj param layout; scale = head_dim^-0.5)."""

    dim: int
    num_heads: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim
        w = self.param("in_proj_kernel", nn.initializers.xavier_uniform(),
                       (d, 3 * d), jnp.float32)
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,),
                       jnp.float32)
        qp = q @ w[:, :d] + b[:d]
        kp = k @ w[:, d:2 * d] + b[d:2 * d]
        vp = v @ w[:, 2 * d:] + b[2 * d:]
        B, N, _ = qp.shape
        H = self.num_heads
        hd = d // H

        def heads(z):
            return z.reshape(B, -1, H, hd)

        attn = jnp.einsum("bnhd,bmhd->bhnm", heads(qp) * hd**-0.5, heads(kp))
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, heads(vp)).reshape(B, N, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class TfHMRLayer(nn.Module):
    """Transformer-decoder refinement variant (reference ``hmr_layer.py``
    tf_decoder path, proven by tests/test_ref_goldens_tf_decoder): each
    scalar of the 109-dim parameter vector becomes a token (Linear 1->mid,
    ReLU), the spatial features become memory tokens (Linear feat->mid,
    ReLU), then ONE norm-free torch TransformerDecoderLayer
    (self-attn -> cross-attn -> relu-FF, transformer.py:653-658) followed by
    ONE norm-free TransformerEncoderLayer (self-attn -> relu-FF, L:535-539),
    mean over tokens, additive decoders. n_iter static."""

    mid_dim: int = 1024
    specs: Tuple[Tuple[str, int], ...] = tuple(HAND_SPECS.items())
    n_iter: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_map: jnp.ndarray, init_vec, train: bool = False):
        B = feat_map.shape[0]
        mem = feat_map.reshape(B, -1, feat_map.shape[-1])
        feat_mlp = nn.Sequential(
            [nn.Dense(self.mid_dim, dtype=self.dtype, name="feat_mlp_dense"),
             nn.relu])
        vector_mlp = nn.Sequential(
            [nn.Dense(self.mid_dim, dtype=self.dtype, name="vector_mlp_dense"),
             nn.relu])
        memory = feat_mlp(mem)  # (B, S, mid)

        dec_sa = TorchMHA(self.mid_dim, dtype=self.dtype, name="dec_self_attn")
        dec_ca = TorchMHA(self.mid_dim, dtype=self.dtype, name="dec_cross_attn")
        dec_ff1 = nn.Dense(self.mid_dim, dtype=self.dtype, name="dec_linear1")
        dec_ff2 = nn.Dense(self.mid_dim, dtype=self.dtype, name="dec_linear2")
        enc_sa = TorchMHA(self.mid_dim, dtype=self.dtype, name="enc_self_attn")
        enc_ff1 = nn.Dense(self.mid_dim, dtype=self.dtype, name="enc_linear1")
        enc_ff2 = nn.Dense(self.mid_dim, dtype=self.dtype, name="enc_linear2")
        decoders = {
            key: nn.Dense(size, kernel_init=_small_xavier(), name=f"dec_{key}")
            for key, size in self.specs
        }

        pred = dict(init_vec)
        for _ in range(self.n_iter):
            # init-dict insertion order, as in HMRLayer (hmr_layer.py:70)
            vec = jnp.concatenate(list(pred.values()), axis=-1)
            tgt = vector_mlp(vec[..., None])  # (B, 109, mid)
            # no_norm TransformerDecoderLayer (transformer.py:653-658)
            x = tgt + dec_sa(tgt, tgt, tgt)
            x = x + dec_ca(x, memory, memory)
            x = x + dec_ff2(nn.relu(dec_ff1(x)))
            # no_norm TransformerEncoderLayer (transformer.py:535-539)
            x = x + enc_sa(x, x, x)
            x = x + enc_ff2(nn.relu(enc_ff1(x)))
            xc = x.mean(axis=1)
            for key, _ in self.specs:
                pred[key] = pred[key] + decoders[key](xc)
        return pred


class HandHMR(nn.Module):
    """Per-hand HMR head: weak-persp cam init MLP + HMRLayer refinement.

    Input is a pooled feature vector (the reference's ``use_pool=False``
    path — WildHands feeds the ``feature_conv`` output). Returns a dict with
    ``pose`` (B, 16, 3, 3) rotmats, ``shape`` (B, 10), ``cam_t.wp`` (B, 3)
    and ``cam_t.wp.init`` (B, 3).
    """

    feat_dim: int
    n_iter: int = 3
    tf_decoder: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool = False):
        B = feat.shape[0]

        cam_init = nn.Sequential([
            nn.Dense(512, dtype=self.dtype), nn.relu,
            nn.Dense(512, dtype=self.dtype), nn.relu,
            nn.Dense(3),
        ])
        if self.tf_decoder:
            # spatial-map input: precursor conv + avgpool for the cam init
            # (reference hand_hmr.py cam_init_precursor path)
            pre = nn.Sequential(
                [nn.Dense(self.feat_dim, dtype=self.dtype), nn.relu])
            pooled = pre(feat).mean(axis=(1, 2))
            init_transl = cam_init(pooled)
        else:
            init_transl = cam_init(feat)

        # pytorch3d row-major 6D (hand_hmr.py:50 uses
        # rot_conv.matrix_to_rotation_6d; the HaMeR/HandOccNet heads use the
        # halves->columns layout instead — rot.rot6d_to_matrix_hamer);
        # proven by tests/test_ref_goldens_hmr_head.py.
        ident6d = rotlib.matrix_to_rot6d(jnp.eye(3, dtype=jnp.float32)[None])
        init_pose = jnp.tile(ident6d.reshape(1, 6), (B, 16)).reshape(B, 96)
        init_vec = {
            "pose_6d": init_pose,
            "shape": jnp.zeros((B, 10), jnp.float32),
            "cam_t_wp": init_transl,
        }

        if self.tf_decoder:
            pred = TfHMRLayer(
                n_iter=self.n_iter, dtype=self.dtype, name="tf_hmr_layer",
            )(feat, init_vec, train=train)
        else:
            pred = HMRLayer(
                feat_dim=self.feat_dim, n_iter=self.n_iter, dtype=self.dtype,
                name="hmr_layer",
            )(feat, init_vec, train=train)

        rotmat = rotlib.rot6d_to_matrix(pred["pose_6d"].reshape(B, 16, 6))
        return {
            "pose": rotmat,
            "shape": pred["shape"],
            "cam_t.wp": pred["cam_t_wp"],
            "cam_t.wp.init": init_transl,
        }
