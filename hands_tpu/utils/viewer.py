"""Headless sequence viewer: render predicted hand meshes over a sequence
into a GIF / frame strip.

Replaces the reference's aitviewer-based ``common/viewer.py`` (interactive
OpenGL) with a dependency-light offline equivalent built on the software
renderer — usable on a headless TPU host; output is a file you can scp.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from hands_tpu.render.software import overlay_mesh, rotate_sideview


def render_sequence(
    images: np.ndarray,  # (T, H, W, 3) float [0,1]
    verts_seq: List[np.ndarray],  # list over hands: (T, V, 3) camera-space
    faces_list: List[np.ndarray],
    K: np.ndarray,  # (3, 3) or (T, 3, 3)
    sideview: bool = False,
) -> np.ndarray:
    """-> (T, H, W*(1+side), 3) rendered frames."""
    T = images.shape[0]
    colors = [(0.65, 0.74, 0.86), (0.86, 0.65, 0.65)]
    frames = []
    for t in range(T):
        Kt = K if K.ndim == 2 else K[t]
        frame = images[t].copy()
        for i, (vs, f) in enumerate(zip(verts_seq, faces_list)):
            frame = overlay_mesh(frame, vs[t], f, Kt, color=colors[i % 2])
        if sideview:
            side = np.ones_like(images[t])
            for i, (vs, f) in enumerate(zip(verts_seq, faces_list)):
                side = overlay_mesh(side, rotate_sideview(vs[t]), f, Kt,
                                    color=colors[i % 2])
            frame = np.concatenate([frame, side], axis=1)
        frames.append(frame)
    return np.stack(frames)


def save_gif(frames: np.ndarray, path: str, fps: int = 10) -> str:
    """(T, H, W, 3) float [0,1] -> animated GIF."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = [Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
            for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return path


def save_strip(frames: np.ndarray, path: str, max_frames: int = 8) -> str:
    """Horizontal contact-sheet of evenly spaced frames."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    idx = np.linspace(0, len(frames) - 1, min(max_frames, len(frames)))
    strip = np.concatenate([frames[int(i)] for i in idx], axis=1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.imsave(path, np.clip(strip, 0, 1))
    return path
