"""HandOccNet (``handoccnet_light``): occlusion-robust hand reconstruction.

Re-design of ``/root/reference/src/models/handoccnet_light/``:
FPN over a leaky-ReLU ResNet-50 -> CBAM SpatialGate split into primary
(hand) / secondary (occluder) features -> FIT (feature-injecting transformer:
sigmoid-gated cross-attention injecting secondary into primary, backbone.py
44-64 + transformer.py 71-149) -> SET (self-enhancing transformer) ->
hourglass heatmap regressor + encoder + 6D MANO regression head
(hand_head.py, mano_head.py:165). R/L crops are stacked along batch for one
pass; KPE embeddings are added inside FIT/SET blocks and after SET.

TPU-first notes: all maps NHWC; the 32x32=1024-token attentions are single
fused einsums; spatial-softmax keypoint decoding is one reshape+softmax; the
recursive hourglass unrolls to a static DAG.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hands_tpu.config import Config
from hands_tpu.core.xdict import XDict
from hands_tpu.models import kpe
from hands_tpu.models.heads.mano_head import mano_head
from hands_tpu.models.hands_light import GraspClassifier
from hands_tpu.ops import mano as manolib


# ---------------------------------------------------------------- backbone
class LeakyBottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.float32
    conv_cls: Any = nn.Conv  # Int8Conv under Config.quant_int8 (ops/quant.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        conv = self.conv_cls
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, name=name
        )
        y = conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.leaky_relu(norm("bn1")(y), 0.01)
        y = conv(self.filters, (3, 3), strides=(self.strides,) * 2,
                 padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype)(y)
        y = nn.leaky_relu(norm("bn2")(y), 0.01)
        y = conv(self.filters * 4, (1, 1), use_bias=False,
                 dtype=self.dtype)(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = conv(self.filters * 4, (1, 1),
                            strides=(self.strides,) * 2, use_bias=False,
                            dtype=self.dtype)(x)
            residual = norm("bn_skip")(residual)
        return nn.leaky_relu(y + residual, 0.01)


class SpatialGate(nn.Module):
    """CBAM spatial gate (cbam.py:72): channel-pool -> 7x7 conv -> sigmoid;
    returns (x*s, x*(1-s)) — hand vs. occluder feature split."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.concatenate(
            [x.max(axis=-1, keepdims=True), x.mean(axis=-1, keepdims=True)],
            axis=-1,
        )
        s = nn.Conv(1, (7, 7), padding=[(3, 3)] * 2, use_bias=False,
                    dtype=self.dtype, name="spatial_conv")(pooled)
        s = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="spatial_bn")(s)
        s = jax.nn.sigmoid(s)
        return x * s, x * (1.0 - s)


class FPN(nn.Module):
    """Leaky-ReLU ResNet-50 + top-down FPN to a 32x32x256 map, gate-split."""

    dtype: Any = jnp.float32
    # W8A8 serving convs in the ResNet trunk only (the FLOPs); stem,
    # laterals and smooth convs stay bf16/f32 (biased / accuracy-critical)
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, name=name
        )
        # stem
        c1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                     use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        c1 = nn.leaky_relu(norm("bn_stem")(c1), 0.01)
        c1 = nn.max_pool(c1, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        from hands_tpu.ops.quant import serving_conv_cls

        conv_cls = serving_conv_cls(self.quant_int8)

        def stage(z, filters, blocks, stride, name):
            for j in range(blocks):
                z = LeakyBottleneck(filters, stride if j == 0 else 1,
                                    dtype=self.dtype, conv_cls=conv_cls,
                                    name=f"{name}_b{j}")(z, train=train)
            return z

        c2 = stage(c1, 64, 3, 1, "layer1")
        c3 = stage(c2, 128, 4, 2, "layer2")
        c4 = stage(c3, 256, 6, 2, "layer3")
        c5 = stage(c4, 512, 3, 2, "layer4")

        def lat(z, name):
            return nn.Conv(256, (1, 1), dtype=self.dtype, name=name)(z)

        def up_add(top, lateral):
            B, H, W, C = lateral.shape
            return jax.image.resize(top, (B, H, W, C), "bilinear") + lateral

        p5 = lat(c5, "toplayer")
        p4 = up_add(p5, lat(c4, "latlayer1"))
        p3 = up_add(p4, lat(c3, "latlayer2"))
        p2 = up_add(p3, lat(c2, "latlayer3"))
        p3 = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                     name="smooth2")(p3)
        p2 = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                     name="smooth3")(p2)

        p2 = nn.avg_pool(p2, (2, 2), strides=(2, 2))  # 64 -> 32
        return SpatialGate(dtype=self.dtype, name="gate")(p2, train=train)


# ------------------------------------------------------------- FIT / SET
class GatedAttentionBlock(nn.Module):
    """One FIT/SET block (transformer.py:128-206): 1x1-conv projections with
    learned 32x32 q/k position maps (+KPE), optional sigmoid gate from a
    second q/k pair (injection), token MLP."""

    num_heads: int = 4
    mlp_ratio: float = 4.0
    injection: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, kpe_emb=None):
        B, H, W, C = query.shape
        N = H * W
        q_pos = self.param("q_embedding", nn.initializers.normal(1.0),
                           (1, H, W, C), jnp.float32)
        k_pos = self.param("k_embedding", nn.initializers.normal(1.0),
                           (1, H, W, C), jnp.float32)

        q_embed = query + q_pos.astype(query.dtype)
        k_embed = key + k_pos.astype(key.dtype)
        if kpe_emb is not None:
            kpe_map = kpe_emb.reshape(B, H, W, C).astype(query.dtype)
            q_embed = q_embed + kpe_map
            k_embed = k_embed + kpe_map

        def proj(z, name):
            return nn.Conv(C, (1, 1), dtype=self.dtype, name=name)(z).reshape(
                B, N, C)

        v = proj(key, "encode_value")
        q = proj(q_embed, "encode_query")
        k = proj(k_embed, "encode_key")

        hd = C // self.num_heads
        scale = hd**-0.5

        def heads(z):
            return z.reshape(B, N, self.num_heads, hd)

        attn = jnp.einsum("bnhd,bmhd->bhnm", heads(q) * scale, heads(k))
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(query.dtype)

        if self.injection:
            q2 = heads(proj(q_embed, "encode_query2"))
            k2 = heads(proj(k_embed, "encode_key2"))
            gate = jnp.einsum("bnhd,bmhd->bhnm", q2 * scale, k2).sum(-1)
            gate = jax.nn.sigmoid(gate.astype(jnp.float32)).astype(query.dtype)
            attn = attn * gate[..., None]
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, heads(v)).reshape(B, N, C)
            tokens = out
        else:
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, heads(v)).reshape(B, N, C)
            tokens = query.reshape(B, N, C) + out

        # epsilon=1e-5 (torch LayerNorm default): the gated attention rows
        # can be near zero-variance, where the eps dominates the normaliser
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(tokens)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype)(y)
        tokens = tokens + y
        return tokens.reshape(B, H, W, C)


class InjectionTransformer(nn.Module):
    """FIT / SET wrapper (transformer.py:6-34)."""

    depth: int = 2
    injection: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, kpe_emb=None):
        out = query
        for i in range(self.depth):
            out = GatedAttentionBlock(
                injection=self.injection, dtype=self.dtype, name=f"block{i}"
            )(out, key, kpe_emb=kpe_emb)
        if self.injection:
            z = jnp.concatenate([key, out], axis=-1)
            a = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                        name="conv1a")(z)
            a = nn.relu(a)
            a = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                        name="conv1b")(a)
            b = nn.Conv(256, (1, 1), dtype=self.dtype, name="conv2")(z)
            out = a + b
        return out


# -------------------------------------------------------------- regressor
class HGResidual(nn.Module):
    """Pre-activation residual (hand_head.py Residual)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, name=name
        )
        half = self.channels // 2
        y = nn.leaky_relu(norm("bn0")(x), 0.01)
        y = nn.Conv(half, (1, 1), dtype=self.dtype)(y)
        y = nn.leaky_relu(norm("bn1")(y), 0.01)
        y = nn.Conv(half, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype)(y)
        y = nn.leaky_relu(norm("bn2")(y), 0.01)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(y)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(x)
        return x + y


class Hourglass(nn.Module):
    """Recursive hourglass, statically unrolled (hand_head.py:185-235)."""

    depth: int = 4
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def hg(n, z, prefix):
            up1 = HGResidual(self.channels, self.dtype, name=f"{prefix}_up")(
                z, train=train)
            low1 = nn.max_pool(z, (2, 2), strides=(2, 2))
            low1 = HGResidual(self.channels, self.dtype, name=f"{prefix}_low1")(
                low1, train=train)
            if n > 1:
                low2 = hg(n - 1, low1, prefix + "_d")
            else:
                low2 = HGResidual(self.channels, self.dtype,
                                  name=f"{prefix}_mid")(low1, train=train)
            low3 = HGResidual(self.channels, self.dtype, name=f"{prefix}_low3")(
                low2, train=train)
            B, H, W, C = low3.shape
            up2 = jax.image.resize(low3, (B, H * 2, W * 2, C), "nearest")
            return up1 + up2

        return hg(self.depth, x, "hg")


class Regressor(nn.Module):
    """Hourglass heatmaps -> spatial-softmax 2D joints -> encoder -> MANO 6D
    regression (regressor.py + hand_head.py + mano_head.py:165)."""

    num_joints: int = 21
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape

        y = Hourglass(dtype=self.dtype, name="hourglass")(x, train=train)
        y = HGResidual(256, self.dtype, name="res")(y, train=train)
        y = nn.Conv(256, (1, 1), dtype=self.dtype, name="fc")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="fc_bn")(y)
        y = nn.leaky_relu(y, 0.01)
        latents = nn.Conv(self.num_joints, (1, 1), name="score")(y)  # (B,H,W,J)

        # spatial softmax with learned per-joint temperature
        betas = self.param("betas", nn.initializers.ones, (self.num_joints,),
                           jnp.float32)
        flat = latents.reshape(B, H * W, self.num_joints) * betas
        heat = jax.nn.softmax(flat.astype(jnp.float32), axis=1)
        grid = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
        uu = jnp.tile(grid[None, :], (H, 1)).reshape(-1)  # x along W
        vv = jnp.repeat(grid, W)
        joints2d = jnp.stack(
            [jnp.einsum("bnj,n->bj", heat, uu),
             jnp.einsum("bnj,n->bj", heat, vv)], axis=-1)  # (B, J, 2)
        heatmaps = heat.reshape(B, H, W, self.num_joints)

        # encoder: heatmap conv + encoding conv, 4 pooling reg blocks
        z = nn.Conv(256, (1, 1), name="heatmap_conv")(heatmaps) + nn.Conv(
            256, (1, 1), name="encoding_conv")(y)
        for i in range(4):
            for j in range(2):
                z = HGResidual(256, self.dtype, name=f"reg{i}_{j}")(
                    z, train=train)
            z = nn.max_pool(z, (2, 2), strides=(2, 2))
        feat = z.reshape(B, -1)  # (B, 256*2*2)

        # MANO regression MLP [1024 -> 1024 -> 512]
        m = nn.leaky_relu(nn.Dense(1024, dtype=self.dtype)(feat), 0.01)
        m = nn.leaky_relu(nn.Dense(512, dtype=self.dtype)(m), 0.01)
        pose6d = nn.Dense(96, name="pose_reg")(m)
        shape = nn.Dense(10, name="shape_reg")(m)
        cam = nn.Dense(3, name="cam_reg")(m)

        from hands_tpu.core import rot as rotlib

        # handoccnet's rot6d2mat (mano_head.py:132): contiguous halves,
        # Gram-Schmidt frame as matrix COLUMNS — same layout as HaMeR's
        rotmats = rotlib.rot6d_to_matrix_hamer(pose6d.reshape(B, 16, 6))
        return {
            "pose": rotmats,
            "shape": shape,
            "cam_t.wp": cam,
            "joints2d_hm": joints2d,
        }


class HandOccNetNet(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, inputs: dict, train: bool = False) -> dict:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        B = inputs["r_img"].shape[0]

        def to_input(img):
            B_, H, W, C = img.shape
            return jax.image.resize(img.astype(dtype), (B_, 256, 256, C),
                                    "bilinear")

        x = jnp.concatenate(
            [to_input(inputs["r_img"]), to_input(inputs["l_img"])], axis=0)

        kpe_emb = None
        if cfg.pos_enc is not None:
            L = cfg.n_freq_pos_enc
            if cfg.pos_enc == "dense_latent":
                enc_r = kpe.dense_pos_enc(
                    inputs["r_dense_angle"], inputs["r_dense_mask"], L, 32)
                enc_l = kpe.dense_pos_enc(
                    inputs["l_dense_angle"], inputs["l_dense_mask"], L, 32)
                enc = jnp.concatenate([enc_r, enc_l], axis=0)  # (2B,32,32,4L)
                e = nn.relu(nn.Dense(256, name="kpe_fc1")(enc))
                e = nn.relu(nn.Dense(256, name="kpe_fc2")(e))
                kpe_emb = e.reshape(2 * B, 32 * 32, 256)
            else:
                enc_r = jnp.concatenate([
                    kpe.center_pos_enc(inputs["r_center_angle"], L),
                    kpe.corner_pos_enc(inputs["r_corner_angle"], L)], axis=-1)
                enc_l = jnp.concatenate([
                    kpe.center_pos_enc(inputs["l_center_angle"], L),
                    kpe.corner_pos_enc(inputs["l_corner_angle"], L)], axis=-1)
                enc = jnp.concatenate([enc_r, enc_l], axis=0)
                e = nn.relu(nn.Dense(256, name="kpe_fc1")(enc))
                e = nn.relu(nn.Dense(256, name="kpe_fc2")(e))
                kpe_emb = jnp.broadcast_to(
                    e[:, None, :], (2 * B, 32 * 32, 256))

        p_feats, s_feats = FPN(dtype=dtype, name="fpn",
                               quant_int8=cfg.get("quant_int8", False))(
            x, train=train)
        feats = InjectionTransformer(injection=True, dtype=dtype, name="fit")(
            s_feats, p_feats, kpe_emb=kpe_emb)
        feats = InjectionTransformer(injection=False, dtype=dtype, name="set")(
            feats, feats, kpe_emb=kpe_emb)
        if kpe_emb is not None:
            feats = feats + kpe_emb.reshape(feats.shape).astype(feats.dtype)
        feats = feats.astype(jnp.float32)

        out = Regressor(dtype=jnp.float32, name="regressor")(feats, train=train)

        result = {
            "hmr_r": {k: v[:B] for k, v in out.items() if k != "joints2d_hm"},
            "hmr_l": {k: v[B:] for k, v in out.items() if k != "joints2d_hm"},
        }
        for side in ("r", "l"):
            h = result[f"hmr_{side}"]
            h["cam_t.wp.init"] = h["cam_t.wp"]

        if cfg.use_grasp_loss:
            grasp = GraspClassifier(name="grasp_classifier")
            for side in ("r", "l"):
                h = result[f"hmr_{side}"]
                result[f"grasp_{side}"] = grasp(jnp.concatenate(
                    [h["shape"], h["pose"].reshape(B, -1)], axis=-1))
        return result


class HandOccNetLightModel:
    """Bound HandOccNet with the standard forward surface."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.net = HandOccNetNet(cfg)
        self.mano_r = manolib.load_mano(is_rhand=True)
        self.mano_l = manolib.load_mano(is_rhand=False)

    def init(self, rng, inputs, meta_info):
        return self.net.init(rng, inputs, train=False)

    def __call__(self, variables, inputs, meta_info, train=False, rngs=None,
                 mutable=False):
        cfg = self.cfg
        net_out = self.net.apply(
            variables, inputs, train=train, rngs=rngs,
            mutable=["batch_stats"] if mutable else False,
        )
        new_model_state = None
        if mutable:
            net_out, new_model_state = net_out

        K = meta_info["intrinsics"]
        hmr_r, hmr_l = net_out["hmr_r"], net_out["hmr_l"]
        mano_out_r = mano_head(
            self.mano_r, hmr_r["pose"], hmr_r["shape"], hmr_r["cam_t.wp"], K,
            cfg.img_res, is_rhand=True,
        )
        mano_out_l = mano_head(
            self.mano_l, hmr_l["pose"], hmr_l["shape"], hmr_l["cam_t.wp"], K,
            cfg.img_res, is_rhand=False,
        )
        mano_out_r["cam_t.wp.init.r"] = hmr_r["cam_t.wp.init"]
        mano_out_l["cam_t.wp.init.l"] = hmr_l["cam_t.wp.init"]

        pred = XDict()
        pred.merge(mano_out_r.prefix("mano."))
        pred.merge(mano_out_l.prefix("mano."))

        if cfg.use_grasp_loss:
            pred["grasp.r"] = net_out["grasp_r"]
            pred["grasp.l"] = net_out["grasp_l"]
        if cfg.use_render_seg_loss:
            from hands_tpu.ops.rasterizer import render_silhouette

            pred["render.r"] = render_silhouette(
                pred["mano.v3d.cam.r"], self.mano_r.faces, K, cfg.img_res
            )
            pred["render.l"] = render_silhouette(
                pred["mano.v3d.cam.l"], self.mano_l.faces, K, cfg.img_res
            )

        if new_model_state is not None:
            return pred, new_model_state
        return pred
