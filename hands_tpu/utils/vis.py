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


def im_list_to_plt(image_list, figsize=(15, 8), title_list=None) -> np.ndarray:
    """One-row titled panel strip (reference vis_utils.im_list_to_plt:121)."""
    fig, axes = plt.subplots(nrows=1, ncols=len(image_list), figsize=figsize)
    if len(image_list) == 1:
        axes = [axes]
    for idx, (ax, im) in enumerate(zip(axes, image_list)):
        ax.imshow(np.clip(im, 0, 1) if im.dtype != np.uint8 else im)
        if title_list is not None:
            ax.set_title(title_list[idx])
        ax.axis("off")
    fig.tight_layout()
    im = fig2img(fig)
    plt.close(fig)
    return im


def visualize_one_example_kps(
    image: np.ndarray,  # (H, W, 3) [0,1]
    j2d_r: np.ndarray, j2d_l: np.ndarray,  # (21, 2) pixel coords
    j2d_proj_r: np.ndarray, j2d_proj_l: np.ndarray,  # K-reprojected 3D
    joints_valid_r: np.ndarray, joints_valid_l: np.ndarray,  # (21,)
    flag: str,
) -> np.ndarray:
    """The reference's 2x2 keypoint diagnostic grid, hands-only layout
    (visualize_arctic.visualize_one_example:47-115): [0] annotated 2D
    keypoints, [1] 2D bbox panel, [2] 3D joints reprojected through K,
    [3] 3D bbox panel; valid joints only, right='r' / left='b', marker 'x'.
    """
    vr = np.where(np.asarray(joints_valid_r) == 1)[0]
    vl = np.where(np.asarray(joints_valid_l) == 1)[0]
    fig, ax = plt.subplots(2, 2, figsize=(8, 8))
    ax = ax.reshape(-1)
    ax[0].imshow(image)
    ax[0].scatter(j2d_r[vr, 0], j2d_r[vr, 1], color="r", marker="x")
    ax[0].scatter(j2d_l[vl, 0], j2d_l[vl, 1], color="b", marker="x")
    ax[0].set_title(f"{flag} 2D keypoints")
    ax[1].imshow(image)
    ax[1].set_title(f"{flag} 2D bbox")
    ax[2].imshow(image)
    ax[2].scatter(j2d_proj_r[vr, 0], j2d_proj_r[vr, 1], color="r", marker="x")
    ax[2].scatter(j2d_proj_l[vl, 0], j2d_proj_l[vl, 1], color="b", marker="x")
    ax[2].set_title(f"{flag} 3D keypoints reprojection from cam")
    ax[3].imshow(image)
    ax[3].set_title(f"{flag} 3D keypoints reprojection from cam")
    plt.subplots_adjust(wspace=0.05, hspace=0.2)
    fig.tight_layout()
    out = fig2img(fig)
    plt.close(fig)
    return out


def visualize_rend_stack(
    image: np.ndarray,
    verts_list: List[np.ndarray],
    faces_list: List[np.ndarray],
    K: np.ndarray,
) -> np.ndarray:
    """In-image render + 3 rotated side views at linspace(45, 300, 3),
    stacked vertically (reference visualize_rend:216-268)."""
    over = image.copy()
    colors = [(100 / 255, 100 / 255, 254 / 255),
              (183 / 255, 100 / 255, 254 / 255)]  # mesh_color_dict r/l
    for i, (v, f) in enumerate(zip(verts_list, faces_list)):
        over = overlay_mesh(over, v, f, K, color=colors[i % 2])
    panels = [over]
    if verts_list:
        for angle in np.linspace(45, 300, 3):
            side = np.ones_like(image)
            for i, (v, f) in enumerate(zip(verts_list, faces_list)):
                side = overlay_mesh(side, rotate_sideview(v, angle), f, K,
                                    color=colors[i % 2])
            panels.append(side)
    else:
        panels = [image] * 4  # reference's dummy fallback (L:263-266)
    return np.concatenate(panels, axis=0)


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


def _project2d(j3d: np.ndarray, K: np.ndarray) -> np.ndarray:
    p = j3d @ K.T
    return p[:, :2] / np.maximum(p[:, 2:], 1e-9)


def visualize_all(vis_dict, cfg, max_examples: int = 1,
                  prefix: str = "") -> List[Tuple[str, np.ndarray]]:
    """The reference's per-epoch image set (visualize_arctic.visualize_all:
    392, hands-only layout): a GT and a pred 2x2 keypoint grid per example
    plus a titled [input | GT render | pred render] strip where each render
    panel is the in-image overlay stacked over 3 rotated side views.
    Returns [(fig_name, HWC uint8 image)].
    """
    from hands_tpu.ops import mano as manolib

    images = []
    imgs = np.asarray(vis_dict["inputs.img"])
    K = np.asarray(vis_dict["meta_info.intrinsics"])
    faces = {"r": np.asarray(manolib.load_mano(True).faces),
             "l": np.asarray(manolib.load_mano(False).faces)}
    B = imgs.shape[0]
    ones21 = np.ones(21)

    def get(key, i, default=None):
        return np.asarray(vis_dict[key][i]) if key in vis_dict else default

    n = min(max_examples, B)
    for i in range(n):
        img = denormalize_image(imgs[i], cfg.img_norm_mean, cfg.img_norm_std)
        jv_r = get("targets.joints_valid_r", i, ones21)
        jv_l = get("targets.joints_valid_l", i, ones21)

        # GT + pred keypoint grids (reference runs visualize_kps per flag)
        for flag, src in (("targets", "targets"), ("pred", "pred")):
            j2d = {}
            proj = {}
            missing = False
            for s in ("r", "l"):
                kp = get(f"{src}.mano.j2d.norm.{s}", i)
                if kp is None:
                    missing = True
                    break
                j2d[s] = (kp[:, :2] + 1) * 0.5 * cfg.img_res
                j3d = get(f"{src}.mano.j3d.cam.{s}", i)
                if j3d is None:
                    j3d = get(f"{src}.mano.j3d.full.{s}", i)
                proj[s] = (_project2d(j3d, K[i]) if j3d is not None
                           else j2d[s])
            if missing:
                continue
            grid = visualize_one_example_kps(
                img, j2d["r"], j2d["l"], proj["r"], proj["l"], jv_r, jv_l,
                flag)
            images.append((f"{prefix}{i}__{flag}_kps", grid))

        # [input | GT render | pred render] titled strip
        panels = [img]
        titles = ["input image"]
        for src, title in (("targets", "GT"), ("pred", "pred w/ pred_cam_t")):
            verts, fcs = [], []
            for s in ("r", "l"):
                v = get(f"{src}.mano.v3d.cam.{s}", i)
                if v is not None:
                    verts.append(v)
                    fcs.append(faces[s])
            if verts:
                panels.append(visualize_rend_stack(img, verts, fcs, K[i]))
                titles.append(title)
        if len(panels) > 1:
            rv = float(np.asarray(get("targets.right_valid", i, 1.0)))
            lv = float(np.asarray(get("targets.left_valid", i, 1.0)))
            strip = im_list_to_plt(panels, figsize=(15, 8), title_list=titles)
            images.append(
                (f"{prefix}{i}__rend_rvalid={rv:g}, lvalid={lv:g}", strip))
    return images
