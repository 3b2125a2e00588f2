"""Validation-epoch visualisation.

The reference's ``src/callbacks/vis/visualize_arctic.py:392`` (keypoint
scatter figures + GT/pred mesh overlays with side views) and
``common/vis_utils.py`` (fig2img, bbox plotting, grids), rebuilt on
matplotlib + the software renderer — no EGL/pyrender dependency.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from hands_tpu.render.software import overlay_mesh, rotate_sideview  # noqa: E402


def fig2img(fig) -> np.ndarray:
    """Matplotlib figure -> (H, W, 3) uint8 (vis_utils.py:70)."""
    fig.canvas.draw()
    buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    return buf.reshape(h, w, 4)[..., :3].copy()


def plot_2d_bbox(ax, bbox_xyxy, color="y"):
    x0, y0, x1, y1 = bbox_xyxy
    ax.plot([x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0], color=color, lw=1)


def denormalize_image(img_chw_or_hwc: np.ndarray, mean, std) -> np.ndarray:
    img = np.asarray(img_chw_or_hwc)
    if img.shape[0] == 3 and img.ndim == 3:
        img = img.transpose(1, 2, 0)
    return np.clip(img * np.asarray(std) + np.asarray(mean), 0, 1)


def visualize_kps(
    image: np.ndarray,  # (H, W, 3) [0,1]
    kp_sets: List[Tuple[str, np.ndarray]],  # [(label, (J, 2) pixel coords)]
    title: str = "",
) -> np.ndarray:
    fig, ax = plt.subplots(figsize=(4, 4), dpi=75)
    ax.imshow(image)
    for label, kp in kp_sets:
        ax.scatter(kp[:, 0], kp[:, 1], s=10, label=label)
    ax.legend(fontsize=6)
    ax.set_title(title, fontsize=7)
    ax.axis("off")
    out = fig2img(fig)
    plt.close(fig)
    return out


def visualize_mesh_overlay(
    image: np.ndarray,  # (H, W, 3) [0,1]
    verts_list: List[np.ndarray],  # camera-space (V, 3) meshes
    faces_list: List[np.ndarray],
    K: np.ndarray,
    sideview: bool = True,
) -> np.ndarray:
    """GT/pred overlay + optional side view, concatenated horizontally
    (visualize_rends semantics)."""
    colors = [(0.65, 0.74, 0.86), (0.86, 0.65, 0.65)]
    over = image.copy()
    for i, (v, f) in enumerate(zip(verts_list, faces_list)):
        over = overlay_mesh(over, v, f, K, color=colors[i % 2])
    panels = [over]
    if sideview:
        side = np.ones_like(image)
        for i, (v, f) in enumerate(zip(verts_list, faces_list)):
            side = overlay_mesh(side, rotate_sideview(v), f, K,
                                color=colors[i % 2])
        panels.append(side)
    return np.concatenate(panels, axis=1)


def visualize_all(vis_dict, cfg, max_examples: int = 1,
                  prefix: str = "") -> List[Tuple[str, np.ndarray]]:
    """Build the per-epoch image set from a vis dict of inputs/pred/targets
    (wrapper mode='vis' output). Returns [(name, HWC uint8/float image)]."""
    from hands_tpu.ops import mano as manolib

    images = []
    imgs = np.asarray(vis_dict["inputs.img"])
    K = np.asarray(vis_dict["meta_info.intrinsics"])
    mano_r = manolib.load_mano(True)
    mano_l = manolib.load_mano(False)
    faces_r = np.asarray(mano_r.faces)
    faces_l = np.asarray(mano_l.faces)

    n = min(max_examples, imgs.shape[0])
    for i in range(n):
        img = denormalize_image(imgs[i], cfg.img_norm_mean, cfg.img_norm_std)
        kp_sets = []
        for side in ("r", "l"):
            for src, tag in (("pred", "pred"), ("targets", "gt")):
                key = f"{src}.mano.j2d.norm.{side}"
                if key in vis_dict:
                    kp = np.asarray(vis_dict[key][i])[:, :2]
                    kp_px = (kp + 1) * 0.5 * cfg.img_res
                    kp_sets.append((f"{tag}.{side}", kp_px))
        images.append((f"{prefix}kps_{i}", visualize_kps(img, kp_sets)))

        verts, faces = [], []
        for side, f in (("r", faces_r), ("l", faces_l)):
            key = f"pred.mano.v3d.cam.{side}"
            if key in vis_dict:
                verts.append(np.asarray(vis_dict[key][i]))
                faces.append(f)
        if verts:
            images.append(
                (f"{prefix}mesh_{i}",
                 visualize_mesh_overlay(img, verts, faces, K[i]))
            )
    return images
