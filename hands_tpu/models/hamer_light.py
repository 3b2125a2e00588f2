"""HaMeR (``hamer_light``): ViT-H backbone + transformer-decoder MANO head.

Re-design of ``/root/reference/src/models/hamer_light/model.py:19``: R and L
crops are stacked along batch and run through the ViT once (256x192 input —
the 256x256 crop resized then centre-cropped 32px each side, model.py:100);
KPE center+corner embeddings are MLP-encoded and added both to the patch
tokens and to the conditioning features; a single-query cross-attention
decoder reads out MANO parameters. Left-hand crops are mirrored inputs, so
the head predicts "right-hand" geometry for both and the left side is
decoded with the left MANO model directly (reference keeps the same
convention via its stacked pass).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hands_tpu.config import Config
from hands_tpu.core.xdict import XDict
from hands_tpu.models import kpe
from hands_tpu.models.backbones.vit import ViTBackbone
from hands_tpu.models.heads.hamer_head import ManoTransformerDecoderHead
from hands_tpu.models.heads.mano_head import mano_head
from hands_tpu.models.hands_light import GraspClassifier
from hands_tpu.ops import mano as manolib


class KpeTokenEmbed(nn.Module):
    """center+corner or dense angles -> per-token embedding
    (reference ``pos_emb.py:6``: 2-layer MLP; center+corner broadcasts one
    vector over tokens, dense interpolates per-pixel angles to the token
    grid and embeds each token separately — note the reference's dense
    branch has a latent signature bug, fixed here per SURVEY §7.3)."""

    feat_dim: int
    n_freq: int
    n_tokens: int
    token_hw: tuple = (16, 12)
    mode: str = "center+corner_latent"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, center_angle=None, corner_angle=None,
                 dense_angle=None, dense_mask=None):
        mlp = nn.Sequential([
            nn.Dense(self.feat_dim, dtype=self.dtype), nn.relu,
            nn.Dense(self.feat_dim, dtype=self.dtype), nn.relu,
        ])
        if self.mode == "dense_latent":
            th, tw = self.token_hw
            # (B, th, tw, 4L) angles resampled onto the token grid
            enc = kpe.dense_pos_enc(dense_angle, dense_mask, self.n_freq, th)
            if enc.shape[2] != tw:
                import jax

                enc = jax.image.resize(
                    enc, (enc.shape[0], th, tw, enc.shape[-1]), "bilinear")
            x = mlp(enc)  # per-token embedding
            return x.reshape(x.shape[0], th * tw, self.feat_dim)
        enc = jnp.concatenate(
            [
                kpe.center_pos_enc(center_angle, self.n_freq),
                kpe.corner_pos_enc(corner_angle, self.n_freq),
            ],
            axis=-1,
        )
        x = mlp(enc)
        return jnp.broadcast_to(
            x[:, None, :], (x.shape[0], self.n_tokens, self.feat_dim)
        )


class HamerNet(nn.Module):
    cfg: Config
    vit_variant: str = "h"

    @nn.compact
    def __call__(self, inputs: dict, train: bool = False) -> dict:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        r_img = inputs["r_img"].astype(dtype)
        l_img = inputs["l_img"].astype(dtype)
        B = r_img.shape[0]

        # resize to 256 then crop width to 192 (vit input 256x192)
        def to_vit_input(img):
            B_, H, W, C = img.shape
            img = jax.image.resize(img, (B_, 256, 256, C), "bilinear")
            return img[:, :, 32:-32, :]

        x = jnp.concatenate([to_vit_input(r_img), to_vit_input(l_img)], axis=0)

        kpe_emb = None
        if cfg.pos_enc is not None:
            embed_dim = {"h": 1280, "b16": 768, "tiny": 128}[self.vit_variant]
            kpe_mod = KpeTokenEmbed(
                feat_dim=embed_dim, n_freq=cfg.n_freq_pos_enc,
                n_tokens=(256 // 16) * (192 // 16), token_hw=(16, 12),
                mode=cfg.pos_enc, dtype=jnp.float32, name="kpe",
            )
            if cfg.pos_enc == "dense_latent":
                r_emb = kpe_mod(dense_angle=inputs["r_dense_angle"],
                                dense_mask=inputs["r_dense_mask"])
                l_emb = kpe_mod(dense_angle=inputs["l_dense_angle"],
                                dense_mask=inputs["l_dense_mask"])
            else:
                r_emb = kpe_mod(inputs["r_center_angle"],
                                inputs["r_corner_angle"])
                l_emb = kpe_mod(inputs["l_center_angle"],
                                inputs["l_corner_angle"])
            kpe_emb = jnp.concatenate([r_emb, l_emb], axis=0)

        # whole-block Pallas kernel (bf16 compute only). Training-safe via
        # its custom VJP, which recomputes through the XLA math in the
        # backward — block-granular remat by construction, so per-block
        # nn.remat is redundant (and would re-run the fused forward) when
        # the kernel is on.
        fused_block = (bool(cfg.get("fused_block", False))
                       and dtype == jnp.bfloat16)
        vit = ViTBackbone(
            variant=self.vit_variant, dtype=dtype,
            use_checkpoint=(train and self.vit_variant == "h"
                            and not fused_block),
            fast_gelu=bool(cfg.get("fast_gelu", False)),
            quant_int8=bool(cfg.get("quant_int8", False)) and not train,
            fused_block=fused_block,
            quant_static=bool(cfg.get("quant_int8_static", False)),
            quant_calibrate=(bool(cfg.get("quant_calibrate", False))
                             and not train),
            name="backbone",
        )
        feat = vit(x, kpe_emb=kpe_emb, train=train)  # (2B, 16, 12, C)
        feat = feat.astype(jnp.float32)
        if kpe_emb is not None:
            # add KPE again to conditioning features (model.py:102-104)
            h, w = feat.shape[1:3]
            feat = feat + kpe_emb.reshape(2 * B, h, w, -1)

        head = ManoTransformerDecoderHead(dtype=jnp.float32, name="mano_head")
        out = head(feat, train=train)

        result = {
            "hmr_r": {
                "pose": out["pose"][:B],
                "shape": out["shape"][:B],
                "cam_t.wp": out["cam_t.wp"][:B],
                "cam_t.wp.init": out["cam_t.wp"][:B],
            },
            "hmr_l": {
                "pose": out["pose"][B:],
                "shape": out["shape"][B:],
                "cam_t.wp": out["cam_t.wp"][B:],
                "cam_t.wp.init": out["cam_t.wp"][B:],
            },
        }

        if cfg.use_grasp_loss:
            grasp = GraspClassifier(name="grasp_classifier")
            for side in ("r", "l"):
                h = result[f"hmr_{side}"]
                result[f"grasp_{side}"] = grasp(
                    jnp.concatenate(
                        [h["shape"], h["pose"].reshape(B, -1)], axis=-1
                    )
                )
        return result


class HamerLightModel:
    """Bound HaMeR model with the same forward surface as HandsLightModel."""

    def __init__(self, cfg: Config, vit_variant: str = "h"):
        self.cfg = cfg
        self.net = HamerNet(cfg, vit_variant=vit_variant)
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
