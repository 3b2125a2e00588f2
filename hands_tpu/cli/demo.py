"""Single-image hand-pose demo (the reference repo's demo workflow:
README.md "Demo" — estimate hand poses from one image with either the
WildHands or the HaMeR family model, via ``GenericWrapper.inference_pose``,
``src/models/generic/wrapper.py:68-76``).

    python -m hands_tpu.cli.demo --img photo.jpg --method hands_light \
        [--ckpt <orbax dir or training ckpt name>] [--out demo_out] \
        [--r_bbox x0,y0,x1,y1] [--l_bbox x0,y0,x1,y1] [--focal 1000]
    python -m hands_tpu.cli.demo --dir photos/ --batch_size 8 \
        --method hamer_light --int8 --fast_gelu   # batch serving mode

Batch serving: images (any mix of sizes — zero-padded to one raw shape)
are processed in fixed-size padded chunks so the whole run compiles one
program per stage; ``--int8``/``--fast_gelu`` enable the fused-block
W8A8 serving kernels on TPU (BENCH_NOTES.md).

Runs the real production path: native decode -> Record -> fused on-device
preprocessing (crop/KPE/normalise) -> model -> weak-persp/persp camera.
Outputs per image: ``<stem>_overlay.png`` (input + projected 2D joints +
mesh render) and ``<stem>_pred.npz`` (MANO pose/betas, 3D joints/vertices,
camera translation).

Checkpoints: ``--ckpt`` accepts a training checkpoint directory produced by
the Trainer (orbax, ``.../ckpt/<name>``) or a converted-torch tree from
``cli/convert_ckpt.py`` — leaves are merged into the model by path, so
backbone-only trees warm-start just the backbone (random heads: useful for
smoke-testing the plumbing; pass the full model tree for real predictions).
"""

from __future__ import annotations

import argparse
import os
import sys


def _parse_box(s):
    if s is None:
        return None
    import numpy as np

    vals = [float(v) for v in s.split(",")]
    if len(vals) != 4:
        raise ValueError(f"bbox must be x0,y0,x1,y1 — got '{s}'")
    return np.asarray(vals, np.float32)


def _merge_by_path(like, got, stats):
    """Merge ``got``'s leaves into ``like`` where paths+shapes match."""
    if isinstance(like, dict):
        out = {}
        for k, v in like.items():
            if isinstance(got, dict) and k in got:
                out[k] = _merge_by_path(v, got[k], stats)
            else:
                out[k] = v
                stats["missing"] += _count_leaves(v)
        return out
    import numpy as np

    if got is not None and tuple(np.shape(got)) == tuple(np.shape(like)):
        stats["loaded"] += 1
        return np.asarray(got, np.asarray(like).dtype)
    stats["shape_mismatch"] += 1
    return like


def _count_leaves(tree):
    import jax

    return len(jax.tree.leaves(tree))


def load_checkpoint_variables(variables, ckpt: str):
    """Load either a Trainer checkpoint or a converted-torch orbax tree."""
    from hands_tpu.cli.convert_ckpt import load_orbax
    from hands_tpu.train.checkpoint import CheckpointManager

    parent, name = os.path.dirname(ckpt.rstrip("/")), \
        os.path.basename(ckpt.rstrip("/"))
    if os.path.exists(os.path.join(ckpt, "metadata")) or \
            os.path.exists(os.path.join(ckpt, "_CHECKPOINT_METADATA")):
        tree = load_orbax(ckpt)
        # training checkpoints nest {state: {params: ...}}; converted trees
        # are the params pytree itself (possibly {params: ...})
        if "state" in tree:
            tree = tree["state"]
        got_params = tree.get("params", tree)
        stats = {"loaded": 0, "missing": 0, "shape_mismatch": 0}
        params = _merge_by_path(variables["params"], got_params, stats)
        bs = variables.get("batch_stats", {})
        if bs and "batch_stats" in tree:
            bs = _merge_by_path(bs, tree["batch_stats"], stats)
        print(f"checkpoint '{ckpt}': {stats['loaded']} leaves loaded, "
              f"{stats['missing']} left at init, "
              f"{stats['shape_mismatch']} shape mismatches")
        out = dict(variables)
        out["params"] = params
        if bs:
            out["batch_stats"] = bs
        return out
    # fall back to the CheckpointManager layout (ckpt dir + name)
    mgr = CheckpointManager(parent or ".")
    params = mgr.restore_params(variables["params"], name)
    out = dict(variables)
    out["params"] = params
    return out


def run_demo(argv=None):
    import jax
    import numpy as np

    from hands_tpu.config import default_config
    from hands_tpu.core.xdict import XDict
    from hands_tpu.data.datasets import _read_image
    from hands_tpu.data.device_pipeline import (DevicePreprocessor,
                                                stack_records)
    from hands_tpu.data.records import Record, default_flags
    from hands_tpu.models.registry import fetch_model, inference_pose

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img", nargs="+", default=[], help="image path(s)")
    p.add_argument("--dir", default="",
                   help="directory of images (jpg/jpeg/png), batch-served")
    p.add_argument("--batch_size", type=int, default=8,
                   help="fixed serving batch: images are processed in "
                        "padded chunks of this size so the whole run "
                        "compiles exactly one program per stage")
    p.add_argument("--fused_block", action="store_true",
                   help="hamer_light: fused ViT-block Pallas kernel "
                        "(TPU-only; 1.42x, BENCH_NOTES.md)")
    p.add_argument("--int8", action="store_true",
                   help="hamer_light: W8A8 int8 serving (implies "
                        "--fused_block; lossy, see BENCH_NOTES.md)")
    p.add_argument("--fast_gelu", action="store_true",
                   help="tanh-approx GELU (lossy serving knob)")
    p.add_argument("--method", default="hands_light",
                   choices=["hands_light", "hamer_light", "arctic_sf_light",
                            "handoccnet_light"])
    p.add_argument("--ckpt", default="", help="orbax checkpoint dir "
                   "(training ckpt or cli/convert_ckpt output)")
    p.add_argument("--out", default="demo_out")
    p.add_argument("--r_bbox", default=None,
                   help="right-hand box x0,y0,x1,y1 (image pixels); "
                        "defaults to the full image")
    p.add_argument("--l_bbox", default=None, help="left-hand box")
    p.add_argument("--focal", type=float, default=None,
                   help="intrinsics focal (pixels); default: weak-persp "
                        "policy f=1000 scaled like the reference "
                        "(epic_dataset.py:238-249)")
    p.add_argument("--no_vis", action="store_true",
                   help="skip the overlay PNG (predictions npz only)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="backbone compute dtype (float32 favours precision; "
                        "bfloat16 is the TPU serving path and reuses its "
                        "compiled programs)")
    args = p.parse_args(argv)

    cfg = default_config(
        args.method,
        use_render_seg_loss=False, use_grasp_loss=False,
        compute_dtype=args.dtype,
        fused_block=args.fused_block,
        quant_int8=args.int8,  # default_config implies fused_block
        fast_gelu=args.fast_gelu,
    )
    os.makedirs(args.out, exist_ok=True)

    r_box = _parse_box(args.r_bbox)
    l_box = _parse_box(args.l_bbox)

    paths = list(args.img)
    if args.dir:
        import glob

        for ext in ("jpg", "jpeg", "png", "JPG", "JPEG", "PNG"):
            paths += sorted(glob.glob(os.path.join(args.dir, f"*.{ext}")))
    if not paths:
        print("no input images (--img or --dir)")
        return 1

    records = []
    for path in paths:
        img, ok = _read_image(path)
        if not ok:
            print(f"WARNING: could not decode {path}; skipping")
            continue
        H, W = img.shape[:2]
        if args.focal is not None:
            K = np.asarray([[args.focal, 0, W / 2], [0, args.focal, H / 2],
                            [0, 0, 1]], np.float32)
            use_gt_k = 1.0
        else:
            K = np.asarray([[1000.0, 0, W / 2], [0, 1000.0, H / 2],
                            [0, 0, 1]], np.float32)
            use_gt_k = 0.0  # weak-persp K like the EPIC eval path
        records.append(Record(
            imgname=path, image=img, K=K,
            r_bbox=r_box, l_bbox=l_box,
            bbox_mode=1.0,  # crop from provided boxes (full image if None)
            use_gt_k=use_gt_k,
            right_valid=1.0, left_valid=1.0,
            loss_flags=default_flags(),
            dataset="demo",
        ))
    if not records:
        print("no decodable images")
        return 1

    # heterogeneous sizes -> one fixed raw shape: zero-pad bottom/right to
    # the max H/W (principal point and boxes are unchanged by that padding),
    # so the whole run compiles exactly one program per stage
    max_h = max(r.image.shape[0] for r in records)
    max_w = max(r.image.shape[1] for r in records)
    for r in records:
        h, w = r.image.shape[:2]
        if (h, w) != (max_h, max_w):
            canvas = np.zeros((max_h, max_w, 3), r.image.dtype)
            canvas[:h, :w] = r.image
            r.image = canvas

    import copy as _copy

    bs = max(1, min(args.batch_size, len(records)))
    pre = DevicePreprocessor(cfg, is_train=False)
    model = fetch_model(cfg)
    variables = None
    n_written = 0
    for s in range(0, len(records), bs):
        chunk = list(records[s:s + bs])
        n_real = len(chunk)
        while len(chunk) < bs:  # pad the tail chunk to the fixed batch
            pad = _copy.copy(chunk[-1])
            pad.right_valid = 0.0
            pad.left_valid = 0.0
            chunk.append(pad)
        stacked = stack_records(chunk)
        inputs, targets, meta = pre(stacked, jax.random.PRNGKey(0))
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), inputs, meta)
            if args.ckpt:
                variables = load_checkpoint_variables(variables, args.ckpt)

        out = inference_pose(model, variables, inputs, meta)

        keep = [k for k in out if k.startswith("pred.mano.")
                or k == "pred.feat_vec"]
        for i in range(n_real):
            rec = chunk[i]
            stem = os.path.splitext(os.path.basename(rec.imgname))[0]
            payload = {}
            for k in keep:
                v = out[k]
                if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0 \
                        and v.shape[0] >= len(chunk):
                    payload[k] = np.asarray(v[i])
            np.savez(os.path.join(args.out, f"{stem}_pred.npz"), **payload)

        if not args.no_vis:
            from hands_tpu.utils.vis import visualize_all

            vis_dict = XDict()
            vis_dict.merge(XDict(inputs).prefix("inputs."))
            vis_dict.merge(XDict({k[len("pred."):]: v
                                  for k, v in out.items()
                                  if k.startswith("pred.")}).prefix("pred."))
            vis_dict.merge(XDict(targets).prefix("targets."))
            vis_dict.merge(XDict(meta).prefix("meta_info."))
            try:
                images = visualize_all(vis_dict, cfg, max_examples=n_real)
                for name, im in images:
                    idx = int(name.split("__")[0] or 0)
                    stem = os.path.splitext(
                        os.path.basename(chunk[idx].imgname))[0]
                    _save_png(np.asarray(im), os.path.join(
                        args.out, f"{stem}_{name.replace('/', '_')}.png"))
            except Exception as e:  # vis must not kill the demo
                print(f"visualization failed (non-fatal): {e}")
        n_written += n_real
    print(f"wrote predictions for {n_written} image(s) -> {args.out}")
    return 0


def _save_png(img, path):
    import numpy as np

    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img * (255.0 if img.max() <= 1.001 else 1.0),
                      0, 255).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(img).save(path)
    except ImportError:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, img)


def main(argv=None):
    return run_demo(argv)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
