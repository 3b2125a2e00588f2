"""Convert released torch checkpoints into orbax param trees.

The reference warm-starts its backbones from released torch weights
(``src/models/hamer_light/model.py:34-44``: ViTPose-B/H and full HaMeR
ckpts; ``src/nets/backbone/resnet.py:294``: torchvision ResNets with
``pretrained=True``). This CLI performs the layout conversion once,
offline, and writes an orbax checkpoint that ``--load_from`` /
``CheckpointManager.restore_params`` can consume:

    python -m hands_tpu.cli.convert_ckpt \
        --src vitpose_huge.pth --arch vit_h --out ./ckpts/vit_h_orbax \
        --target_grid 16 12

Arch map:
- resnet18 / resnet50  -> params + batch_stats for backbones.resnet.ResNet
- vit_b16 / vit_h      -> params for backbones.vit.ViTBackbone (scan-stacked;
  cls pos token folded, pos grid bicubic-resized to --target_grid)
- hamer                -> a released HaMeR .ckpt: backbone.* split out as
  vit_h (model.py:38-44)
- wildhands            -> full WildHands (hands_light) trunk
- handoccnet           -> full HandOccNet (FPN + FIT/SET + regressor + KPE
  + grasp classifier, handoccnet_light/model.py:17)
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from hands_tpu.utils import torch_import as ti

# checkpoint pos-embed grids of the released ViTPose weights (256x192 / p16)
_SRC_GRIDS = {"vit_b16": (16, 12), "vit_h": (16, 12)}
_DEPTHS = {"vit_b16": 12, "vit_h": 32}


def convert(src: str, arch: str, target_grid=None) -> dict:
    if arch in ("resnet18", "resnet50"):
        sd = ti.load_torch_state_dict(src)
        stages = (2, 2, 2, 2) if arch == "resnet18" else (3, 4, 6, 3)
        return ti.import_resnet(sd, stage_sizes=stages)
    if arch in ("vit_b16", "vit_h"):
        sd = ti.load_torch_state_dict(src)
        return ti.import_vit(
            sd, depth=_DEPTHS[arch], scan=True,
            target_grid=target_grid, src_grid=_SRC_GRIDS[arch])
    if arch == "hamer":
        return ti.import_hamer_checkpoint(src)
    if arch == "handoccnet":
        sd = ti.load_torch_state_dict(src)
        if any(k.startswith("model.") for k in sd):
            sd = {k[len("model."):]: v for k, v in sd.items()
                  if k.startswith("model.")}
        return ti.import_handoccnet(sd)
    if arch == "wildhands":
        sd = ti.load_torch_state_dict(src)
        # released ckpts wrap the net as 'model.' inside the Lightning module
        if any(k.startswith("model.") for k in sd):
            sd = {k[len("model."):]: v for k, v in sd.items()
                  if k.startswith("model.")}
        # arch sniff: bottleneck blocks (resnet50) have a conv3
        bb = ("resnet50"
              if "hand_backbone.layer1.0.conv3.weight" in sd else "resnet18")
        return ti.import_hands_trunk(sd, backbone=bb)
    raise ValueError(f"unknown arch '{arch}'")


def save_orbax(tree: dict, out_dir: str) -> None:
    import orbax.checkpoint as ocp

    out_dir = os.path.abspath(out_dir)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out_dir, tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(out_dir: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(out_dir))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="torch .pth/.ckpt file")
    p.add_argument("--arch", required=True,
                   choices=["resnet18", "resnet50", "vit_b16", "vit_h",
                            "hamer", "wildhands", "handoccnet"])
    p.add_argument("--out", required=True, help="orbax output directory")
    p.add_argument("--target_grid", type=int, nargs=2, default=None,
                   help="(h, w) pos-embed token grid of the target model; "
                        "bicubic-resized from the checkpoint grid when it "
                        "differs (reference get_abs_pos, vit.py:26-56)")
    args = p.parse_args(argv)

    tree = convert(args.src, args.arch,
                   target_grid=tuple(args.target_grid)
                   if args.target_grid else None)
    save_orbax(tree, args.out)
    n = sum(int(np.prod(np.shape(x))) for x in
            __import__("jax").tree.leaves(tree))
    print(f"wrote {args.out} ({args.arch}, {n / 1e6:.1f}M params)")


if __name__ == "__main__":
    main()
