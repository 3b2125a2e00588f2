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

    def hand_hmr(prefix):
        s = sub(prefix)
        p: Dict = {}
        for i, src in enumerate(("cam_init.0", "cam_init.2", "cam_init.4")):
            p[f"Dense_{i}"] = {"kernel": _linear(s[f"{src}.weight"]),
                               "bias": _t2np(s[f"{src}.bias"])}
        hl: Dict = {}
        for dst, src in (("refine0", "hmr_layer.refine.0"),
                         ("refine1", "hmr_layer.refine.3")):
            hl[dst] = {"kernel": _linear(s[f"{src}.weight"]),
                       "bias": _t2np(s[f"{src}.bias"])}
        for key, src in (("dec_pose_6d", "hmr_layer.decoders.pose_6d"),
                         ("dec_cam_t_wp", "hmr_layer.decoders.cam_t/wp"),
                         ("dec_shape", "hmr_layer.decoders.shape")):
            hl[key] = {"kernel": _linear(s[f"{src}.weight"]),
                       "bias": _t2np(s[f"{src}.bias"])}
        p["hmr_layer"] = hl
        return p

    fc_lin = _linear(sd["feature_conv.7.weight"])
    params: Dict = {
        "hand_backbone": None,  # filled below
        "feature_conv": {
            "Conv_0": {"kernel": _conv(sd["feature_conv.0.weight"])},
            "Conv_1": {"kernel": _conv(sd["feature_conv.2.weight"])},
            "Conv_2": {"kernel": _conv(sd["feature_conv.4.weight"])},
            "Dense_0": {
                "kernel": _flatten_perm_linear(fc_lin, 256, 3, 3),
                "bias": _t2np(sd["feature_conv.7.bias"]),
            },
        },
        "head_r": hand_hmr("head_r."),
        "head_l": hand_hmr("head_l."),
    }
    batch_stats: Dict = {}
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
    return {"params": params, "batch_stats": batch_stats}
