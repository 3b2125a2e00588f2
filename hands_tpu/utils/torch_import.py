"""Torch-checkpoint importers: seed Flax params from released weights.

Covers the reference's pretrained-weight entry points:
- torchvision ResNet-50/18 ``pretrained=True`` (``src/nets/backbone/
  resnet.py:294``) -> :func:`import_resnet`
- ViTPose / HaMeR ViT-H checkpoints (``src/models/hamer_light/model.py:
  34-44``) -> :func:`import_vit`

Torch (CPU) is only needed at import time; the converted pytrees are plain
numpy and can be saved with orbax. Layout notes: torch convs are OIHW,
flax are HWIO; torch Linear weights are (out, in), flax (in, out); our ViT
stacks blocks along a leading scan axis.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t2np(t):
    return np.asarray(t.detach().cpu().numpy())


def _conv(w):
    return _t2np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _linear(w):
    return _t2np(w).T  # (out, in) -> (in, out)


def import_resnet(state_dict: Dict, stage_sizes=(3, 4, 6, 3)) -> Dict:
    """torchvision ResNet state_dict -> params/batch_stats for
    hands_tpu.models.backbones.resnet.ResNet (bottleneck variant for
    stage_sizes=(3,4,6,3); basic-block for (2,2,2,2))."""
    params: Dict = {}
    stats: Dict = {}

    def bn(src_prefix):
        return (
            {"scale": _t2np(state_dict[src_prefix + ".weight"]),
             "bias": _t2np(state_dict[src_prefix + ".bias"])},
            {"mean": _t2np(state_dict[src_prefix + ".running_mean"]),
             "var": _t2np(state_dict[src_prefix + ".running_var"])},
        )

    params["conv_stem"] = {"kernel": _conv(state_dict["conv1.weight"])}
    p, s = bn("bn1")
    params["bn_stem"], stats["bn_stem"] = p, s

    bottleneck = stage_sizes == (3, 4, 6, 3) or "layer1.0.conv3.weight" in state_dict
    n_convs = 3 if bottleneck else 2
    for stage_i, blocks in enumerate(stage_sizes):
        for block_j in range(blocks):
            src = f"layer{stage_i + 1}.{block_j}"
            dst = f"stage{stage_i + 1}_block{block_j}"
            bp: Dict = {}
            bs: Dict = {}
            for ci in range(n_convs):
                bp[f"Conv_{ci}"] = {
                    "kernel": _conv(state_dict[f"{src}.conv{ci + 1}.weight"])}
                p, s = bn(f"{src}.bn{ci + 1}")
                bp[f"BatchNorm_{ci}"], bs[f"BatchNorm_{ci}"] = p, s
            if f"{src}.downsample.0.weight" in state_dict:
                bp[f"Conv_{n_convs}"] = {
                    "kernel": _conv(state_dict[f"{src}.downsample.0.weight"])}
                p, s = bn(f"{src}.downsample.1")
                bp[f"BatchNorm_{n_convs}"], bs[f"BatchNorm_{n_convs}"] = p, s
            params[dst] = bp
            stats[dst] = bs
    return {"params": params, "batch_stats": stats}


def import_vit(state_dict: Dict, depth: int = 32, scan: bool = True,
               target_grid=None, src_grid=None) -> Dict:
    """ViTPose/HaMeR-style ViT state_dict -> params for ViTBackbone.

    Handles: patch_embed.proj, pos_embed (cls token folded into the grid —
    the reference adds ``pos_embed[:, :1] + pos_embed[:, 1:]``,
    vit.py:326-328; bicubic grid resize when ``target_grid=(h, w)`` differs
    from the checkpoint's ``src_grid``, mirroring ``get_abs_pos``),
    per-block qkv/proj/mlp/norms, last_norm. With ``scan=True`` block params
    are stacked along a leading depth axis.
    """
    params: Dict = {}
    params["patch_embed"] = {
        "kernel": _conv(state_dict["patch_embed.proj.weight"]),
        "bias": _t2np(state_dict["patch_embed.proj.bias"]),
    }
    pos = _t2np(state_dict["pos_embed"])
    if pos.shape[1] % 2 == 1:  # leading cls token: fold it in
        pos = pos[:, 1:] + pos[:, :1]
    if target_grid is not None and src_grid is not None \
            and tuple(target_grid) != tuple(src_grid):
        import jax

        sh, sw = src_grid
        th, tw = target_grid
        grid = pos.reshape(1, sh, sw, -1)
        grid = np.asarray(jax.image.resize(
            grid, (1, th, tw, grid.shape[-1]), "bicubic"))
        pos = grid.reshape(1, th * tw, -1)
    params["pos_embed"] = pos

    def block_params(i):
        pre = f"blocks.{i}"
        return {
            "norm1": {"scale": _t2np(state_dict[f"{pre}.norm1.weight"]),
                      "bias": _t2np(state_dict[f"{pre}.norm1.bias"])},
            "norm2": {"scale": _t2np(state_dict[f"{pre}.norm2.weight"]),
                      "bias": _t2np(state_dict[f"{pre}.norm2.bias"])},
            "attn": {
                "qkv": {"kernel": _linear(state_dict[f"{pre}.attn.qkv.weight"]),
                        "bias": _t2np(state_dict[f"{pre}.attn.qkv.bias"])},
                "proj": {"kernel": _linear(state_dict[f"{pre}.attn.proj.weight"]),
                         "bias": _t2np(state_dict[f"{pre}.attn.proj.bias"])},
            },
            "mlp": {
                "Dense_0": {"kernel": _linear(state_dict[f"{pre}.mlp.fc1.weight"]),
                            "bias": _t2np(state_dict[f"{pre}.mlp.fc1.bias"])},
                "Dense_1": {"kernel": _linear(state_dict[f"{pre}.mlp.fc2.weight"]),
                            "bias": _t2np(state_dict[f"{pre}.mlp.fc2.bias"])},
            },
        }

    blocks = [block_params(i) for i in range(depth)]
    if scan:
        import jax

        stacked = jax.tree.map(lambda *xs: np.stack(xs), *blocks)
        params["blocks"] = {"block": stacked}
    else:
        for i, b in enumerate(blocks):
            params[f"block{i}"] = b
    params["last_norm"] = {
        "scale": _t2np(state_dict["last_norm.weight"]),
        "bias": _t2np(state_dict["last_norm.bias"]),
    }
    return {"params": params}


def load_torch_state_dict(path: str) -> Dict:
    """Load a torch checkpoint file to a flat state_dict (CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return ckpt


def import_hamer_checkpoint(path: str) -> Dict:
    """Split a released HaMeR .ckpt into backbone params (model.py:38-44)."""
    sd = load_torch_state_dict(path)
    backbone = {k.replace("backbone.", ""): v for k, v in sd.items()
                if k.startswith("backbone.")}
    return import_vit(backbone, depth=32, scan=True)


def import_hamer_head(state_dict: Dict) -> Dict:
    """HaMeR MANOTransformerDecoderHead state_dict -> params for
    heads.hamer_head.ManoTransformerDecoderHead (depth-6 cross-attention
    decoder, mano_head.py:10 + pose_transformer.py:300). Keys are expected
    without the "mano_head." prefix."""
    sd = state_dict
    p: Dict = {
        "token_proj": {"kernel": _linear(sd["transformer.to_token_embedding.weight"]),
                       "bias": _t2np(sd["transformer.to_token_embedding.bias"])},
        "pos_embedding": _t2np(sd["transformer.pos_embedding"]),
        "decpose": {"kernel": _linear(sd["decpose.weight"]),
                    "bias": _t2np(sd["decpose.bias"])},
        "decshape": {"kernel": _linear(sd["decshape.weight"]),
                     "bias": _t2np(sd["decshape.bias"])},
        "deccam": {"kernel": _linear(sd["deccam.weight"]),
                   "bias": _t2np(sd["deccam.bias"])},
    }
    i = 0
    while f"transformer.transformer.layers.{i}.0.norm.weight" in sd:
        pre = f"transformer.transformer.layers.{i}"

        def ln(idx):
            return {"scale": _t2np(sd[f"{pre}.{idx}.norm.weight"]),
                    "bias": _t2np(sd[f"{pre}.{idx}.norm.bias"])}

        qkv = _linear(sd[f"{pre}.0.fn.to_qkv.weight"])  # (dim, 3*inner)
        inner = qkv.shape[1] // 3
        layer = {
            "LayerNorm_0": ln(0),
            "self_attn": {"attn": {
                "to_q": {"kernel": qkv[:, :inner]},
                "to_kv": {"kernel": qkv[:, inner:]},
                "to_out": {"kernel": _linear(sd[f"{pre}.0.fn.to_out.0.weight"]),
                           "bias": _t2np(sd[f"{pre}.0.fn.to_out.0.bias"])},
            }},
            "LayerNorm_1": ln(1),
            "cross_attn": {
                "to_q": {"kernel": _linear(sd[f"{pre}.1.fn.to_q.weight"])},
                "to_kv": {"kernel": _linear(sd[f"{pre}.1.fn.to_kv.weight"])},
                "to_out": {"kernel": _linear(sd[f"{pre}.1.fn.to_out.0.weight"]),
                           "bias": _t2np(sd[f"{pre}.1.fn.to_out.0.bias"])},
            },
            "LayerNorm_2": ln(2),
            "Dense_0": {"kernel": _linear(sd[f"{pre}.2.fn.net.0.weight"]),
                        "bias": _t2np(sd[f"{pre}.2.fn.net.0.bias"])},
            "Dense_1": {"kernel": _linear(sd[f"{pre}.2.fn.net.3.weight"]),
                        "bias": _t2np(sd[f"{pre}.2.fn.net.3.bias"])},
        }
        p[f"layer{i}"] = layer
        i += 1
    return {"params": p}


def _flatten_perm_linear(w_t: "np.ndarray", c: int, h: int, w: int):
    """Reorder a torch Linear kernel that consumed a (C, H, W)-major
    ``nn.Flatten`` so it consumes our NHWC (H, W, C)-major reshape instead.
    ``w_t``: already-transposed kernel (C*H*W, out)."""
    return (w_t.reshape(c, h, w, -1).transpose(1, 2, 0, 3)
            .reshape(c * h * w, -1))


def import_hands_trunk(state_dict: Dict, backbone: str = "resnet18") -> Dict:
    """WildHands (hands_light) checkpoint -> Flax HandsLightNet variables:
    both ResNet backbones, feature_conv (incl. the CHW->HWC flatten
    permutation of its Linear), both HandHMR heads and the grasp classifier
    (model.py:15-125). Keys are expected without a wrapper prefix."""
    sd = state_dict
    stages = (2, 2, 2, 2) if backbone == "resnet18" else (3, 4, 6, 3)

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    def lin(k):
        return {"kernel": _linear(sd[f"{k}.weight"]),
                "bias": _t2np(sd[f"{k}.bias"])}

    def mha(s, pre):
        return {
            "in_proj_kernel": _linear(s[f"{pre}.in_proj_weight"]),
            "in_proj_bias": _t2np(s[f"{pre}.in_proj_bias"]),
            "out_proj": {"kernel": _linear(s[f"{pre}.out_proj.weight"]),
                         "bias": _t2np(s[f"{pre}.out_proj.bias"])},
        }

    def hand_hmr(prefix):
        s = sub(prefix)
        p: Dict = {}
        for i, src in enumerate(("cam_init.0", "cam_init.2", "cam_init.4")):
            p[f"Dense_{i}"] = {"kernel": _linear(s[f"{src}.weight"]),
                               "bias": _t2np(s[f"{src}.bias"])}
        hl: Dict = {}
        if f"{prefix}hmr_layer.feat_mlp.0.weight" in sd:
            # tf_decoder head (hand_hmr.py:19-31 precursor + hmr_layer.py
            # no_norm transformer): precursor Linear is the 4th Dense in
            # instantiation order
            p["Dense_3"] = {
                "kernel": _linear(s["cam_init_precursor.0.weight"]),
                "bias": _t2np(s["cam_init_precursor.0.bias"])}
            for dst, src in (
                    ("vector_mlp_dense", "hmr_layer.vector_mlp.0"),
                    ("feat_mlp_dense", "hmr_layer.feat_mlp.0"),
                    ("dec_linear1",
                     "hmr_layer.refine_decoder.layers.0.linear1"),
                    ("dec_linear2",
                     "hmr_layer.refine_decoder.layers.0.linear2"),
                    ("enc_linear1", "hmr_layer.self_attn.layers.0.linear1"),
                    ("enc_linear2", "hmr_layer.self_attn.layers.0.linear2")):
                hl[dst] = {"kernel": _linear(s[f"{src}.weight"]),
                           "bias": _t2np(s[f"{src}.bias"])}
            hl["dec_self_attn"] = mha(
                s, "hmr_layer.refine_decoder.layers.0.self_attn")
            hl["dec_cross_attn"] = mha(
                s, "hmr_layer.refine_decoder.layers.0.multihead_attn")
            hl["enc_self_attn"] = mha(s, "hmr_layer.self_attn.layers.0.self_attn")
            layer_name = "tf_hmr_layer"
        else:
            for dst, src in (("refine0", "hmr_layer.refine.0"),
                             ("refine1", "hmr_layer.refine.3")):
                hl[dst] = {"kernel": _linear(s[f"{src}.weight"]),
                           "bias": _t2np(s[f"{src}.bias"])}
            layer_name = "hmr_layer"
        for key, src in (("dec_pose_6d", "hmr_layer.decoders.pose_6d"),
                         ("dec_cam_t_wp", "hmr_layer.decoders.cam_t/wp"),
                         ("dec_shape", "hmr_layer.decoders.shape")):
            hl[key] = {"kernel": _linear(s[f"{src}.weight"]),
                       "bias": _t2np(s[f"{src}.bias"])}
        p[layer_name] = hl
        return p

    params: Dict = {
        "hand_backbone": None,  # filled below
        "head_r": hand_hmr("head_r."),
        "head_l": hand_hmr("head_l."),
    }
    if "head_r.hmr_layer.feat_mlp.0.weight" not in sd:
        # tf_decoder trunks construct feature_conv but never call it
        # (model.py:312-321); our tf model has no such module
        fc_lin = _linear(sd["feature_conv.7.weight"])
        params["feature_conv"] = {
            "Conv_0": {"kernel": _conv(sd["feature_conv.0.weight"])},
            "Conv_1": {"kernel": _conv(sd["feature_conv.2.weight"])},
            "Conv_2": {"kernel": _conv(sd["feature_conv.4.weight"])},
            "Dense_0": {
                "kernel": _flatten_perm_linear(fc_lin, 256, 3, 3),
                "bias": _t2np(sd["feature_conv.7.bias"]),
            },
        }
    batch_stats: Dict = {}
    if any(k.startswith("hand_backbone_r.") for k in sd):
        # separate_hands=True builds per-side backbones (model.py:69-73)
        del params["hand_backbone"]
        for side in ("r", "l"):
            bb = import_resnet(sub(f"hand_backbone_{side}."),
                               stage_sizes=stages)
            params[f"backbone_{side}"] = bb["params"]
            batch_stats[f"backbone_{side}"] = bb["batch_stats"]
    else:
        hand = import_resnet(sub("hand_backbone."), stage_sizes=stages)
        params["hand_backbone"] = hand["params"]
        batch_stats["hand_backbone"] = hand["batch_stats"]
    if any(k.startswith("backbone.") for k in sd):
        glb = import_resnet(sub("backbone."), stage_sizes=stages)
        params["glb_backbone"] = glb["params"]
        batch_stats["glb_backbone"] = glb["batch_stats"]
    if any(k.startswith("grasp_classifier.") for k in sd):
        params["grasp_classifier"] = {
            f"Dense_{i}": lin(f"grasp_classifier.{j}")
            for i, j in enumerate((0, 2, 4, 6))
        }
    if any(k.startswith("depth_mlp.") for k in sd):
        # shared depth decoder (model.py:132-154): conv indices skip the
        # ReLU/Upsample entries of the Sequential
        params["depth_head"] = {
            f"Conv_{i}": {"kernel": _conv(sd[f"depth_mlp.{j}.weight"]),
                          "bias": _t2np(sd[f"depth_mlp.{j}.bias"])}
            for i, j in enumerate((0, 2, 5, 7, 10, 12, 15, 17))
        }
    for head in ("center_head", "corner_head"):
        if any(k.startswith(f"{head}.") for k in sd):
            params[head] = {f"Dense_{i}": lin(f"{head}.{j}")
                            for i, j in enumerate((0, 2, 4))}
    return {"params": params, "batch_stats": batch_stats}


def import_handoccnet_regressor(state_dict: Dict) -> Dict:
    """HandOccNet regressor chain (reference
    ``src/models/handoccnet_light/regressor.py``: hand_regHead stacked
    hourglass + spatial-softmax, hand_Encoder, mano_regHead — hand_head.py:5,
    mano_head.py:165) -> Flax ``handoccnet_light.Regressor`` variables.

    Keys are expected with the ``hand_regHead./hand_Encoder./mano_regHead.``
    prefixes of the reference ``Regressor`` module. The hand_Encoder's
    flattened (B, 256, 2, 2) feature is (C, H, W)-major in torch, so the
    first MLP Linear gets the NHWC row permutation."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    def cv(k):
        out = {"kernel": _t2np(sd[k + ".weight"]).transpose(2, 3, 1, 0)}
        if k + ".bias" in sd:
            out["bias"] = _t2np(sd[k + ".bias"])
        return out

    def bn(k):
        return ({"scale": _t2np(sd[k + ".weight"]),
                 "bias": _t2np(sd[k + ".bias"])},
                {"mean": _t2np(sd[k + ".running_mean"]),
                 "var": _t2np(sd[k + ".running_var"])})

    def lin(k):
        return {"kernel": _t2np(sd[k + ".weight"]).T,
                "bias": _t2np(sd[k + ".bias"])}

    def residual(prefix, bns, convs):
        """Bottleneck (bn1/2/3, conv1/2/3) or Residual (bn/bn1/bn2,
        conv1/2/3) -> HGResidual (bn0/1/2, Conv_0/1/2)."""
        bp, bs = {}, {}
        for ci, (bk, ck) in enumerate(zip(bns, convs)):
            p, s = bn(f"{prefix}.{bk}")
            bp[f"bn{ci}"], bs[f"bn{ci}"] = p, s
            bp[f"Conv_{ci}"] = cv(f"{prefix}.{ck}")
        return bp, bs

    BOTTLENECK = (("bn1", "bn2", "bn3"), ("conv1", "conv2", "conv3"))
    RESIDUAL = (("bn", "bn1", "bn2"), ("conv1", "conv2", "conv3"))

    # hourglass: hg[i][j] (Sequential of one Bottleneck); recursion level
    # n uses hg[n-1], my static unroll names by "_d" nesting depth
    hg_p: Dict = {}
    hg_s: Dict = {}
    for i, pref in ((3, "hg"), (2, "hg_d"), (1, "hg_d_d"), (0, "hg_d_d_d")):
        for j, suf in ((0, "_up"), (1, "_low1"), (2, "_low3")):
            p, s = residual(f"hand_regHead.hg.0.hg.{i}.{j}.0", *BOTTLENECK)
            hg_p[pref + suf], hg_s[pref + suf] = p, s
    p, s = residual("hand_regHead.hg.0.hg.0.3.0", *BOTTLENECK)
    hg_p["hg_d_d_d_mid"], hg_s["hg_d_d_d_mid"] = p, s
    params["hourglass"], stats["hourglass"] = hg_p, hg_s

    p, s = residual("hand_regHead.res.0.0", *BOTTLENECK)
    params["res"], stats["res"] = p, s
    params["fc"] = cv("hand_regHead.fc.0.block.0")
    p, s = bn("hand_regHead.fc.0.block.1")
    params["fc_bn"], stats["fc_bn"] = p, s
    params["score"] = cv("hand_regHead.score.0")
    params["betas"] = _t2np(sd["hand_regHead.betas"]).reshape(-1)

    params["heatmap_conv"] = cv("hand_Encoder.heatmap_conv")
    params["encoding_conv"] = cv("hand_Encoder.encoding_conv")
    for k in range(8):
        p, s = residual(f"hand_Encoder.reg.{k}", *RESIDUAL)
        params[f"reg{k // 2}_{k % 2}"] = p
        stats[f"reg{k // 2}_{k % 2}"] = s

    d0 = lin("mano_regHead.mano_base_layer.0")
    d0["kernel"] = _flatten_perm_linear(d0["kernel"], 256, 2, 2)
    params["Dense_0"] = d0
    params["Dense_1"] = lin("mano_regHead.mano_base_layer.2")
    for name in ("pose_reg", "shape_reg", "cam_reg"):
        params[name] = lin(f"mano_regHead.{name}")
    return {"params": params, "batch_stats": stats}


def _hocc_cv(sd, k):
    out = {"kernel": _t2np(sd[k + ".weight"]).transpose(2, 3, 1, 0)}
    if k + ".bias" in sd:
        out["bias"] = _t2np(sd[k + ".bias"])
    return out


def _hocc_bn(sd, k):
    return ({"scale": _t2np(sd[k + ".weight"]), "bias": _t2np(sd[k + ".bias"])},
            {"mean": _t2np(sd[k + ".running_mean"]),
             "var": _t2np(sd[k + ".running_var"])})


def import_handoccnet_fpn(state_dict: Dict) -> Dict:
    """HandOccNet FPN backbone (``backbone.py:11``: leaky ResNet-50
    bottom-up, top-down laterals/smooths, SpatialGate split) -> Flax
    ``handoccnet_light.FPN`` variables."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}
    params["conv_stem"] = {
        "kernel": _t2np(sd["layer0.0.weight"]).transpose(2, 3, 1, 0)}
    params["bn_stem"], stats["bn_stem"] = _hocc_bn(sd, "layer0.1")
    for i, blocks in {1: 3, 2: 4, 3: 6, 4: 3}.items():
        for j in range(blocks):
            src = f"layer{i}.0.{j}"
            bp: Dict = {}
            bs: Dict = {}
            for ci in range(3):
                bp[f"Conv_{ci}"] = {"kernel": _t2np(
                    sd[f"{src}.conv{ci + 1}.weight"]).transpose(2, 3, 1, 0)}
                bp[f"bn{ci + 1}"], bs[f"bn{ci + 1}"] = _hocc_bn(
                    sd, f"{src}.bn{ci + 1}")
            if f"{src}.downsample.0.weight" in sd:
                bp["Conv_3"] = {"kernel": _t2np(
                    sd[f"{src}.downsample.0.weight"]).transpose(2, 3, 1, 0)}
                bp["bn_skip"], bs["bn_skip"] = _hocc_bn(
                    sd, f"{src}.downsample.1")
            params[f"layer{i}_b{j}"] = bp
            stats[f"layer{i}_b{j}"] = bs
    for name in ("toplayer", "latlayer1", "latlayer2", "latlayer3",
                 "smooth2", "smooth3"):
        params[name] = _hocc_cv(sd, name)
    params["gate"] = {
        "spatial_conv": {"kernel": _t2np(
            sd["attention_module.spatial.conv.weight"]).transpose(2, 3, 1, 0)},
        "spatial_bn": {
            "scale": _t2np(sd["attention_module.spatial.bn.weight"]),
            "bias": _t2np(sd["attention_module.spatial.bn.bias"])},
    }
    stats["gate"] = {"spatial_bn": {
        "mean": _t2np(sd["attention_module.spatial.bn.running_mean"]),
        "var": _t2np(sd["attention_module.spatial.bn.running_var"])}}
    return {"params": params, "batch_stats": stats}


def import_handoccnet_transformer(state_dict: Dict, depth: int = 2,
                                  injection: bool = True) -> Dict:
    """HandOccNet FIT/SET gated-attention transformer (``transformer.py:7``)
    -> Flax ``handoccnet_light.InjectionTransformer`` variables."""
    sd = state_dict
    p: Dict = {}
    for i in range(depth):
        pre = f"layers.{i}"
        blk = {
            "q_embedding": _t2np(sd[f"{pre}.q_embedding"]).transpose(0, 2, 3, 1),
            "k_embedding": _t2np(sd[f"{pre}.k_embedding"]).transpose(0, 2, 3, 1),
            "norm2": {"scale": _t2np(sd[f"{pre}.norm2.weight"]),
                      "bias": _t2np(sd[f"{pre}.norm2.bias"])},
            "Dense_0": {"kernel": _t2np(sd[f"{pre}.mlp.fc1.weight"]).T,
                        "bias": _t2np(sd[f"{pre}.mlp.fc1.bias"])},
            "Dense_1": {"kernel": _t2np(sd[f"{pre}.mlp.fc2.weight"]).T,
                        "bias": _t2np(sd[f"{pre}.mlp.fc2.bias"])},
        }
        names = ["encode_value", "encode_query", "encode_key"]
        if injection:
            names += ["encode_query2", "encode_key2"]
        for n in names:
            blk[n] = _hocc_cv(sd, f"{pre}.{n}")
        p[f"block{i}"] = blk
    if injection:
        p["conv1a"] = _hocc_cv(sd, "conv1.0")
        p["conv1b"] = _hocc_cv(sd, "conv1.2")
        p["conv2"] = _hocc_cv(sd, "conv2.0")
    return {"params": p}


def import_handoccnet(state_dict: Dict) -> Dict:
    """Full HandOccNet checkpoint (``model.py:17``: backbone + FIT + SET +
    regressor + optional KPE feat_mlp + optional grasp classifier) -> Flax
    ``HandOccNetNet`` variables. MANO heads / renderer carry no learned
    parameters on the conversion path and are skipped."""
    sd = state_dict

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    def lin(k):
        return {"kernel": _t2np(sd[k + ".weight"]).T,
                "bias": _t2np(sd[k + ".bias"])}

    fpn = import_handoccnet_fpn(sub("backbone."))
    reg = import_handoccnet_regressor(sub("regressor."))
    params: Dict = {
        "fpn": fpn["params"],
        "fit": import_handoccnet_transformer(
            sub("FIT."), injection=True)["params"],
        "set": import_handoccnet_transformer(
            sub("SET."), injection=False)["params"],
        "regressor": reg["params"],
    }
    stats: Dict = {"fpn": fpn["batch_stats"],
                   "regressor": reg["batch_stats"]}
    if "kpe.feat_mlp.0.weight" in sd:
        params["kpe_fc1"] = lin("kpe.feat_mlp.0")
        params["kpe_fc2"] = lin("kpe.feat_mlp.2")
    if "grasp_classifier.0.weight" in sd:
        params["grasp_classifier"] = {
            f"Dense_{i}": lin(f"grasp_classifier.{j}")
            for i, j in enumerate((0, 2, 4, 6))
        }
    return {"params": params, "batch_stats": stats}
