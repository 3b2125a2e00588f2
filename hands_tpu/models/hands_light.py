"""WildHands (``hands_light``): the flagship model family.

TPU-first re-design of ``/root/reference/src/models/hands_light/model.py``:

- global-image backbone + **single shared per-hand crop backbone run once on
  the stacked [R; L] crop batch** (the reference runs it twice; stacking
  doubles MXU occupancy and halves dispatch overhead),
- KPE intrinsics encodings concatenated at input or into the latent feature
  map (all reference ``pos_enc`` modes),
- per-hand iterative HMR heads -> MANO decode -> weak-persp reprojection,
- grasp classifier / differentiable-render mask branch / depth branch,
- flip-swap handled densely with ``where`` (no data-dependent branching).

The Flax module (:class:`HandsLightNet`) owns only learnable parameters; the
MANO decode is a pure function so model data never enters the param pytree.
:class:`HandsLightModel` binds both into the ``forward(inputs, meta_info) ->
XDict`` surface the training runtime consumes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from hands_tpu.config import Config
from hands_tpu.core import rot as rotlib
from hands_tpu.core.xdict import XDict
from hands_tpu.models import kpe
from hands_tpu.models.backbones.resnet import BACKBONE_INFO, resnet18, resnet50
from hands_tpu.models.heads.hmr import HandHMR
from hands_tpu.models.heads.mano_head import mano_head
from hands_tpu.ops import mano as manolib


class FeatureConv(nn.Module):
    """7x7 latent map (+KPE channels) -> feature vector (reference
    ``feature_conv``, model.py:91-101): 1x1 conv -> two valid 3x3 convs ->
    flatten -> dense."""

    feat_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, 7, 7, C)
        x = nn.relu(nn.Conv(1024, (1, 1), use_bias=False, dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(512, (3, 3), padding="VALID", use_bias=False,
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding="VALID", use_bias=False,
                            dtype=self.dtype)(x))
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(self.feat_dim, dtype=self.dtype)(x))


class GraspClassifier(nn.Module):
    """9-way grasp-taxonomy classifier over (shape, pose[, glb feat])."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for width in (1024, 512, 128):
            x = nn.relu(nn.Dense(width, dtype=self.dtype)(x))
        return nn.Dense(9)(x)


class DepthHead(nn.Module):
    """Latent map + coord grid -> (B, img_res, img_res) depth (model.py:136-155)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, 7, 7, C)
        B, h, w, _ = x.shape
        # reference init_grid/broadcast (model.py:172-185): torch 'ij'
        # meshgrid — x_grid varies along ROWS and is concatenated first
        row_g, col_g = jnp.meshgrid(
            jnp.linspace(-1, 1, h), jnp.linspace(-1, 1, w), indexing="ij"
        )
        grid = jnp.broadcast_to(
            jnp.stack([row_g, col_g], axis=-1)[None], (B, h, w, 2)
        ).astype(x.dtype)
        x = jnp.concatenate([x, grid], axis=-1)

        def up(z, factor):
            # nn.Upsample(..., align_corners=True) (model.py:140-150)
            return kpe.resize_align_corners(
                z, z.shape[1] * factor, z.shape[2] * factor)

        x = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype)(x))
        x = up(x, 4)
        x = nn.relu(nn.Conv(128, (3, 3), dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(128, (3, 3), dtype=self.dtype)(x))
        x = up(x, 4)
        x = nn.relu(nn.Conv(64, (3, 3), dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(32, (3, 3), dtype=self.dtype)(x))
        x = up(x, 2)
        x = nn.relu(nn.Conv(16, (3, 3), dtype=self.dtype)(x))
        return nn.Conv(1, (3, 3))(x)[..., 0]


class RegressionHead(nn.Module):
    """Small MLP head (center/corner regression, model.py:157-172)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(512, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(128, dtype=self.dtype)(x))
        return nn.Dense(self.out_dim)(x)


def _build_backbone(name: str, dtype, scope: str = None,
                    quant_int8: bool = False):
    if name == "resnet50":
        return resnet50(dtype=dtype, name=scope, quant_int8=quant_int8)
    if name == "resnet18":
        return resnet18(dtype=dtype, name=scope, quant_int8=quant_int8)
    if name == "vit_b_16":
        from hands_tpu.models.backbones.vit import VitB16Spatial

        return VitB16Spatial(dtype=dtype, name=scope)
    raise ValueError(f"unsupported backbone '{name}'")


class HandsLightNet(nn.Module):
    """Learnable part of WildHands. Consumes an input dict, emits raw head
    outputs (pre-flip-swap, pre-MANO-decode)."""

    cfg: Config

    @nn.compact
    def __call__(self, inputs: dict, train: bool = False) -> dict:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        feat_dim = BACKBONE_INFO[cfg.backbone]["n_output_channels"]
        L = cfg.n_freq_pos_enc

        out: dict = {}

        # ---- global image branch
        glb_feat_map = None
        if cfg.use_glb_feat or cfg.no_crops:
            backbone = _build_backbone(cfg.backbone, dtype,
                                       scope="glb_backbone",
                                       quant_int8=cfg.quant_int8)
            glb_feat_map = backbone(inputs["img"].astype(dtype), train=train)
            glb_feat_map = glb_feat_map.astype(jnp.float32)
            out["feat_vec"] = glb_feat_map.reshape(
                glb_feat_map.shape[0], -1, glb_feat_map.shape[-1]
            ).sum(axis=1)

        if cfg.no_crops:
            head_r = HandHMR(feat_dim, name="head_r")
            head_l = HandHMR(feat_dim, name="head_l")
            pooled = glb_feat_map.mean(axis=(1, 2))
            out["hmr_r"] = head_r(pooled, train=train)
            out["hmr_l"] = head_l(pooled, train=train)
            if cfg.use_grasp_loss:
                self._grasp_heads(cfg, out, pooled.shape[0])
            return out

        # ---- crop branch: encode KPE, stack R/L into one batch
        r_img = inputs["r_img"].astype(dtype)
        l_img = inputs["l_img"].astype(dtype)
        B, H, W, _ = r_img.shape

        def input_concat(img, vec_enc=None, dense_enc=None):
            chans = [img]
            if vec_enc is not None:
                chans.append(
                    kpe.broadcast_to_map(vec_enc, H, W).astype(dtype)
                )
            if dense_enc is not None:
                chans.append(dense_enc.astype(dtype))
            return jnp.concatenate(chans, axis=-1)

        pe = cfg.pos_enc
        if pe == "center":
            r_inp = input_concat(r_img, kpe.center_pos_enc(inputs["r_center_angle"], L))
            l_inp = input_concat(l_img, kpe.center_pos_enc(inputs["l_center_angle"], L))
        elif pe == "corner":
            r_inp = input_concat(r_img, kpe.corner_pos_enc(inputs["r_corner_angle"], L))
            l_inp = input_concat(l_img, kpe.corner_pos_enc(inputs["l_corner_angle"], L))
        elif pe == "center+corner":
            r_inp = input_concat(r_img, jnp.concatenate([
                kpe.center_pos_enc(inputs["r_center_angle"], L),
                kpe.corner_pos_enc(inputs["r_corner_angle"], L)], axis=-1))
            l_inp = input_concat(l_img, jnp.concatenate([
                kpe.center_pos_enc(inputs["l_center_angle"], L),
                kpe.corner_pos_enc(inputs["l_corner_angle"], L)], axis=-1))
        elif pe == "dense":
            r_inp = input_concat(r_img, dense_enc=kpe.dense_pos_enc(
                inputs["r_dense_angle"], inputs["r_dense_mask"], L, cfg.img_res_ds))
            l_inp = input_concat(l_img, dense_enc=kpe.dense_pos_enc(
                inputs["l_dense_angle"], inputs["l_dense_mask"], L, cfg.img_res_ds))
        else:
            r_inp, l_inp = r_img, l_img

        # one pass over stacked crops (shared backbone — cfg.separate_hands
        # instantiates two)
        if self.cfg.separate_hands:
            bb_r = _build_backbone(cfg.backbone, dtype, scope="backbone_r",
                                   quant_int8=cfg.quant_int8)
            bb_l = _build_backbone(cfg.backbone, dtype, scope="backbone_l",
                                   quant_int8=cfg.quant_int8)
            r_feat = bb_r(r_inp, train=train).astype(jnp.float32)
            l_feat = bb_l(l_inp, train=train).astype(jnp.float32)
        else:
            hand_backbone = _build_backbone(cfg.backbone, dtype,
                                            scope="hand_backbone",
                                            quant_int8=cfg.quant_int8)
            rl = hand_backbone(jnp.concatenate([r_inp, l_inp], axis=0), train=train)
            rl = rl.astype(jnp.float32)
            r_feat, l_feat = rl[:B], rl[B:]

        hf, wf = r_feat.shape[1:3]

        # ---- latent KPE concat
        def latent_concat(feat, extra):
            if cfg.use_glb_feat:
                feat = feat + glb_feat_map
            return jnp.concatenate([feat] + extra, axis=-1)

        if pe in ("center+corner_latent", "sinusoidal_cc"):
            r_extra = [
                kpe.broadcast_to_map(kpe.center_pos_enc(inputs["r_center_angle"], L), hf, wf),
                kpe.broadcast_to_map(kpe.corner_pos_enc(inputs["r_corner_angle"], L), hf, wf),
            ]
            l_extra = [
                kpe.broadcast_to_map(kpe.center_pos_enc(inputs["l_center_angle"], L), hf, wf),
                kpe.broadcast_to_map(kpe.corner_pos_enc(inputs["l_corner_angle"], L), hf, wf),
            ]
            r_feat = latent_concat(r_feat, r_extra)
            l_feat = latent_concat(l_feat, l_extra)
        elif pe == "dense_latent":
            # reference resizes native->img_res_ds inside the encoder, then
            # img_res_ds->feature res (model.py:240-246) — replicate the
            # double align_corners resize
            r_dense = kpe.resize_align_corners(kpe.dense_pos_enc(
                inputs["r_dense_angle"], inputs["r_dense_mask"], L,
                cfg.img_res_ds), hf, wf)
            l_dense = kpe.resize_align_corners(kpe.dense_pos_enc(
                inputs["l_dense_angle"], inputs["l_dense_mask"], L,
                cfg.img_res_ds), hf, wf)
            r_feat = latent_concat(r_feat, [r_dense])
            l_feat = latent_concat(l_feat, [l_dense])
        elif pe == "cam_conv":
            def cam_conv_enc(angle, mask):
                enc = angle * mask[..., None]
                enc = kpe.resize_align_corners(
                    enc, cfg.img_res_ds, cfg.img_res_ds)
                return kpe.resize_align_corners(enc, hf, wf)
            r_feat = latent_concat(r_feat, [cam_conv_enc(
                inputs["r_dense_angle"], inputs["r_dense_mask"])])
            l_feat = latent_concat(l_feat, [cam_conv_enc(
                inputs["l_dense_angle"], inputs["l_dense_mask"])])
        # NOTE: outside the latent-concat branches the reference never adds
        # the global feature map to the crop features (model.py:240-307 —
        # the add lives inside each latent branch only; input-concat and
        # pos_enc=None trunks use the glb features solely for feat_vec)

        if cfg.use_depth_loss:
            depth_head = DepthHead(name="depth_head")
            out["depth_r"] = depth_head(r_feat)
            out["depth_l"] = depth_head(l_feat)

        # ---- compress latent maps to vectors; heads (stacked R/L pass).
        # tf_decoder mode keeps spatial maps: the transformer head cross-
        # attends to feature tokens directly (no feature_conv).
        if cfg.tf_decoder:
            r_vec, l_vec = r_feat, l_feat
        else:
            feature_conv = FeatureConv(feat_dim, dtype=dtype,
                                       name="feature_conv")
            rl_vec = feature_conv(jnp.concatenate([r_feat, l_feat], axis=0))
            r_vec, l_vec = rl_vec[:B], rl_vec[B:]

        head_r = HandHMR(feat_dim, tf_decoder=cfg.tf_decoder, name="head_r")
        head_l = HandHMR(feat_dim, tf_decoder=cfg.tf_decoder, name="head_l")
        out["hmr_r"] = head_r(r_vec, train=train)
        out["hmr_l"] = head_l(l_vec, train=train)

        if cfg.use_grasp_loss:
            self._grasp_heads(cfg, out, B)

        if cfg.regress_center_corner:
            center_head = RegressionHead(2, name="center_head")
            corner_head = RegressionHead(8, name="corner_head")
            out["center_r"] = center_head(r_vec)
            out["center_l"] = center_head(l_vec)
            out["corner_r"] = corner_head(r_vec)
            out["corner_l"] = corner_head(l_vec)
        return out

    def _grasp_heads(self, cfg, out, B):
        """Shared grasp classifier over both hands' hmr outputs
        (model.py:55-69; runs on the crop and the no_crops paths alike)."""
        grasp = GraspClassifier(name="grasp_classifier")

        def grasp_in(h):
            x = [h["shape"], h["pose"].reshape(B, -1)]
            # global features reach the grasp head only when the glb branch
            # exists (model.py:64-66 sizes the classifier input by both
            # flags together)
            if cfg.use_glb_feat_w_grasp and "feat_vec" in out:
                x.append(out["feat_vec"])
            return jnp.concatenate(x, axis=-1)

        out["grasp_r"] = grasp(grasp_in(out["hmr_r"]))
        out["grasp_l"] = grasp(grasp_in(out["hmr_l"]))


# --------------------------------------------------------------- flip swap
def _apply_flip_swap(hmr_r, hmr_l, is_flipped):
    """Horizontally-flipped samples predict the mirrored opposite hand; swap
    R/L head outputs and mirror poses/translations (model.py:341-368), as a
    dense ``where`` over the batch."""
    flip = is_flipped.astype(bool)

    def mirror_pose(rotmat):
        B = rotmat.shape[0]
        aa = rotlib.matrix_to_axis_angle(rotmat.reshape(-1, 3, 3)).reshape(B, -1)
        return rotlib.axis_angle_to_matrix(
            rotlib.flip_axis_angle(aa).reshape(B, -1, 3)
        )

    mirror_t = jnp.asarray([1.0, -1.0, 1.0])

    def swap(a, b, fn=lambda x: x):
        sel = flip.reshape((-1,) + (1,) * (a.ndim - 1))
        return (
            jnp.where(sel, fn(b), a),
            jnp.where(sel, fn(a), b),
        )

    out_r, out_l = dict(hmr_r), dict(hmr_l)
    out_r["cam_t.wp"], out_l["cam_t.wp"] = swap(
        hmr_r["cam_t.wp"], hmr_l["cam_t.wp"], lambda t: t * mirror_t
    )
    out_r["cam_t.wp.init"], out_l["cam_t.wp.init"] = swap(
        hmr_r["cam_t.wp.init"], hmr_l["cam_t.wp.init"], lambda t: t * mirror_t
    )
    out_r["pose"], out_l["pose"] = swap(hmr_r["pose"], hmr_l["pose"], mirror_pose)
    out_r["shape"], out_l["shape"] = swap(hmr_r["shape"], hmr_l["shape"])
    return out_r, out_l


def postprocess_hmr(cfg, inputs, meta_info, hmr_r, hmr_l):
    """Per-sample head-output fixes, in the reference's exact order
    (model.py:330-376): pcl virtual-camera rot fix, flip swap, then the
    perspective-correction global-orient rotation (which operates on the
    POST-flip poses)."""
    hmr_r, hmr_l = dict(hmr_r), dict(hmr_l)

    # PCL: the crops were resampled by a virtual camera; map the predicted
    # global orient back with R_virt2orig (reference model.py:330-334)
    if cfg.pos_enc == "pcl":
        for hmr, key in ((hmr_r, "r_rot"), (hmr_l, "l_rot")):
            R = inputs[key]
            hmr["pose"] = hmr["pose"].at[:, 0].set(R @ hmr["pose"][:, 0])

    is_flipped = meta_info.get("is_flipped")
    if is_flipped is not None:
        hmr_r, hmr_l = _apply_flip_swap(hmr_r, hmr_l, is_flipped)

    if cfg.pos_enc == "perspective_correction":
        from hands_tpu.core.rot import euler_angles_to_matrix

        for hmr, key in ((hmr_r, "r_center_angle"),
                         (hmr_l, "l_center_angle")):
            ang = inputs[key]
            euler = jnp.concatenate(
                [-ang, jnp.zeros_like(ang[:, :1])], axis=-1)
            R = euler_angles_to_matrix(euler, "XYZ")
            hmr["pose"] = hmr["pose"].at[:, 0].set(R @ hmr["pose"][:, 0])
    return hmr_r, hmr_l


class HandsLightModel:
    """Bound WildHands model: net params + MANO decode.

    ``forward(variables, inputs, meta_info, train, rngs) -> XDict`` with the
    reference's ``mano.*`` prediction keys.
    """

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.net = HandsLightNet(cfg)
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
        if mutable:
            net_out, new_model_state = net_out
        else:
            new_model_state = None

        hmr_r, hmr_l = postprocess_hmr(
            cfg, inputs, meta_info, net_out["hmr_r"], net_out["hmr_l"])
        K = meta_info["intrinsics"]
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
        if cfg.use_depth_loss:
            pred["depth.r"] = net_out["depth_r"]
            pred["depth.l"] = net_out["depth_l"]
        if cfg.regress_center_corner:
            pred["center.r"] = net_out["center_r"]
            pred["center.l"] = net_out["center_l"]
            pred["corner.r"] = net_out["corner_r"]
            pred["corner.l"] = net_out["corner_l"]
        if "feat_vec" in net_out:
            pred["feat_vec"] = net_out["feat_vec"]

        if new_model_state is not None:
            return pred, new_model_state
        return pred
