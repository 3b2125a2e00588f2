"""Data-format smoke test (reference ``scripts_method/sample_data.py:46``):
load a dataset, MANO-FK the GT, project to 2D, and render joint/vertex
overlays to ``logs/sample_data`` so a human can eyeball dataloader geometry.
"""

from __future__ import annotations

import os
import sys


def main(argv=None):
    import numpy as np

    from hands_tpu.config import construct_args
    from hands_tpu.data.datasets import fetch_dataset
    from hands_tpu.data.device_pipeline import DevicePreprocessor, stack_records
    from hands_tpu.ops import mano as manolib

    cfg = construct_args(argv)
    # GT intrinsics path: with the fixed weak-persp K (use_gt_k=False) the 3D
    # targets live in the real camera while j2d lives in patch space, so FK
    # reprojection only lines up under the patch-adjusted GT K.
    cfg = cfg.replace(use_gt_k=True)
    dataset_name = "sample"
    try:
        ds = fetch_dataset(cfg, dataset_name, "train")
    except Exception:
        print("sample dataset files not found; falling back to synthetic")
        ds = fetch_dataset(cfg, "synthetic", "train")

    import jax
    import jax.numpy as jnp

    out_dir = "logs/sample_data"
    os.makedirs(out_dir, exist_ok=True)

    records = [ds[i] for i in range(min(4, len(ds)))]
    stacked = stack_records(records)
    pre = DevicePreprocessor(cfg, is_train=False)
    inputs, targets, meta = pre(stacked, jax.random.PRNGKey(0))

    # FK the GT MANO params and reproject — both overlays must land on the
    # hand if the dataset's geometry is consistent
    mano_r = manolib.load_mano(True)
    out = manolib.mano_forward(
        mano_r,
        targets["mano.beta.r"],
        targets["mano.pose.r"][:, 3:],
        targets["mano.pose.r"][:, :3],
    )
    T0 = (targets["mano.j3d.full.r"] - out.joints).mean(axis=1)
    j3d_cam = out.joints + T0[:, None, :]
    K = meta["intrinsics"]
    proj = jnp.einsum("bij,bnj->bni", K, j3d_cam)
    j2d_fk = np.asarray(proj[..., :2] / jnp.maximum(proj[..., 2:], 1e-9))
    j2d_gt = (np.asarray(targets["mano.j2d.norm.r"])[..., :2] + 1) * 0.5 * cfg.img_res

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mean = np.asarray(cfg.img_norm_mean)
    std = np.asarray(cfg.img_norm_std)
    for i in range(len(records)):
        img = np.asarray(inputs["img"][i]) * std + mean
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.imshow(np.clip(img, 0, 1))
        ax.scatter(j2d_gt[i, :, 0], j2d_gt[i, :, 1], c="lime", s=12,
                   label="GT j2d")
        ax.scatter(j2d_fk[i, :, 0], j2d_fk[i, :, 1], c="red", s=8, marker="x",
                   label="MANO FK reproj")
        ax.legend()
        ax.set_title(records[i].imgname)
        fig.savefig(os.path.join(out_dir, f"sample_{i}.png"), dpi=80)
        plt.close(fig)
        err = np.linalg.norm(j2d_fk[i] - j2d_gt[i], axis=-1).mean()
        print(f"sample {i}: mean FK-vs-GT reprojection err {err:.2f}px "
              f"-> {out_dir}/sample_{i}.png")


if __name__ == "__main__":
    main(sys.argv[1:])
