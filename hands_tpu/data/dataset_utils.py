"""Split bookkeeping: deterministic subsampling, split sizes, padding helpers.

Mirrors ``/root/reference/src/datasets/dataset_utils.py``: the mini/tiny/small
split sizes (``get_num_images:138``), the seeded deterministic subsample with
its RNG-stream sanity guard (``downsample:189`` — after ``seed(1)`` the first
``randint(0, 100)`` must be 17; this pins the exact subset selection across
python versions), and small utilities (``pad_jts2d:172``).
"""

from __future__ import annotations

import random
from typing import List, Sequence

import numpy as np

# reference get_num_images (dataset_utils.py:138-168), exact values
_SPLIT_SIZES = {
    "minitrain": 300,
    "tinytrain": 12000,
    "smalltrain": 100000,
    "minival": 80,
    "tinyval": 500,
    "smallval": 12000,
    "minitest": 200,
    "tinytest": 6000,
    "smalltest": 12000,
}


def get_num_images(split: str, num_images: int) -> int:
    if split in ("train", "val", "test"):
        return num_images
    if split in _SPLIT_SIZES:
        return min(_SPLIT_SIZES[split], num_images)
    raise ValueError(f"unknown split '{split}'")


def downsample(fnames: Sequence, split: str) -> List:
    """Deterministic subsample of a file list for mini/small splits.

    Uses python's Mersenne stream seeded at 1 with a guard assert, exactly
    like the reference, so the selected subsets are identical.
    """
    if "small" not in split and "mini" not in split and "tiny" not in split:
        return list(fnames)
    rng = random.Random(1)
    assert rng.randint(0, 100) == 17, (
        "RNG stream drift: deterministic split subsampling would differ "
        "from the reference selection"
    )
    fnames = list(fnames)
    num_samples = get_num_images(split, len(fnames))
    # random.sample on the seeded stream — byte-identical subset selection
    # to the reference (dataset_utils.py:187-199)
    return rng.sample(fnames, num_samples)


def pad_jts2d(jts: np.ndarray) -> np.ndarray:
    """(J, 2) -> (J, 3) with confidence 1 appended."""
    num_jts = jts.shape[0]
    return np.concatenate([jts, np.ones((num_jts, 1), jts.dtype)], axis=1)


def transform_kp2d_to_crop(kp2d: np.ndarray, bbox_cxcys) -> np.ndarray:
    """Map full-image 2D keypoints into the pre-cropped (speedup) image's
    coordinate system (reference ``data_utils.transform_kp2d:256``: crop is
    max-side x1.5 of the (cx, cy, scale) box, resized to 1000px)."""
    cx, cy, scale = bbox_cxcys
    s = 200 * scale
    factor = 1000.0 / (1.5 * s)
    out = kp2d.copy()
    out[:, 0] = (out[:, 0] - (cx - 1.5 / 2 * s)) * factor
    out[:, 1] = (out[:, 1] - (cy - 1.5 / 2 * s)) * factor
    return out


def transform_2d_for_speedup(speedup: bool, is_egocam: bool,
                             joints2d_r, joints2d_l, bbox_crop,
                             ego_image_scale: float):
    """Remap labels for pre-cropped ("speedup") images
    (reference ``transform_2d_for_speedup_light:90``): egocam images are
    uniformly downscaled; static-cam images are crop-resampled to 1000px."""
    joints2d_r = np.copy(joints2d_r)
    joints2d_l = np.copy(joints2d_l)
    bbox_crop = list(bbox_crop)
    if speedup:
        if is_egocam:
            joints2d_r[:, :2] *= ego_image_scale
            joints2d_l[:, :2] *= ego_image_scale
            bbox_crop = [v * ego_image_scale for v in bbox_crop]
        else:
            joints2d_r = transform_kp2d_to_crop(joints2d_r, bbox_crop)
            joints2d_l = transform_kp2d_to_crop(joints2d_l, bbox_crop)
            bbox_crop = [500.0, 500.0, 1000.0 / (1.5 * 200)]
    return joints2d_r, joints2d_l, bbox_crop


def get_valid(j2d: np.ndarray, img_w: int, img_h: int, min_visible: int = 3):
    """Per-joint visibility from in-frame test + sample validity (strictly
    more than ``min_visible`` joints visible, epic_dataset.py:499-500)."""
    vis = (
        (j2d[:, 0] >= 0) & (j2d[:, 0] < img_w)
        & (j2d[:, 1] >= 0) & (j2d[:, 1] < img_h)
    ).astype(np.float32)
    return vis, float(vis.sum() > min_visible)
