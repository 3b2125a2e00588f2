"""Golden-parity tests: hands_tpu.ops.preprocess / data.dataset_utils vs the
reference's own cv2/numpy preprocessing (common/data_utils.py), imported
directly from /root/reference.

Where the reference path is stochastic (augm_params, jitter_*), the RNG
streams differ by construction (global np.random vs counter-based PRNGKey),
so parity is asserted on the *distributions* (moments, ranges, event
probabilities) over large fixed-seed samples. Where the reference quantizes
(j2d ``transform`` rounds to int pixels), tolerance is one pixel.
"""

import cv2
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_compat
from hands_tpu.data import dataset_utils as jdu
from hands_tpu.ops import preprocess as jpp

pytestmark = pytest.mark.heavy

ref_du = ref_compat.load("common.data_utils")


def _close(ref, mine, atol=1e-5):
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=atol, rtol=0)


def _smooth_image(rng, h=320, w=400):
    """Low-frequency uint8 image: isolates geometric parity from
    interpolation-kernel softness differences."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (
        127 + 80 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
        + 40 * np.sin((xx + yy) / 51.0)
    )
    img = np.stack([base, np.roll(base, 7, 0), np.roll(base, 13, 1)], axis=-1)
    return np.clip(img + rng.randn(h, w, 3), 0, 255).astype(np.uint8)


# ------------------------------------------------------------ affine algebra
def test_gen_trans_from_patch_cv(rng):
    for _ in range(5):
        cx, cy = rng.uniform(50, 250, 2)
        side = rng.uniform(60, 180)
        sc = rng.uniform(0.8, 1.3)
        rot = rng.uniform(-40, 40)
        out = 224
        ref_inv = ref_du.gen_trans_from_patch_cv(
            cx, cy, side, side, out, out, sc, rot, inv=True)
        mine = np.asarray(jpp.crop_transform(
            jnp.asarray([cx], jnp.float32), jnp.asarray([cy], jnp.float32),
            jnp.asarray([side * sc], jnp.float32), jnp.asarray([rot], jnp.float32),
            out))[0]
        _close(ref_inv, mine, atol=1e-3)
        # forward map = inverse of mine
        ref_fwd = ref_du.gen_trans_from_patch_cv(
            cx, cy, side, side, out, out, sc, rot, inv=False)
        A = np.concatenate([mine, [[0, 0, 1]]], axis=0)
        _close(ref_fwd, np.linalg.inv(A)[:2], atol=1e-3)


# ------------------------------------------------------------------ warping
def test_generate_patch_image_clean_axis_aligned(rng):
    img = _smooth_image(rng)
    cx, cy, side, out = 190.0, 150.0, 140.0, 224
    ref_patch, _, _ = ref_du.generate_patch_image_clean(
        img.astype(np.float32), [cx, cy, side, side], 1.0, 0.0, [out, out],
        cv2.INTER_LINEAR)
    mine = np.asarray(jpp.crop_resize_separable(
        jnp.asarray(img, jnp.float32)[None], jnp.asarray([cx]), jnp.asarray([cy]),
        jnp.asarray([side]), out))[0]
    # interior only: cv2 replicates the border differently than the zero pad
    err = np.abs(ref_patch[8:-8, 8:-8] - mine[8:-8, 8:-8])
    assert err.max() < 1.0, err.max()  # <1/255 of dynamic range on smooth input


def test_generate_patch_image_clean_rotated(rng):
    """Full production rotated-crop path (sqrt2-margin crop -> 3-shear DFT
    rotation -> central slice) vs the reference's single rotated cv2 warp —
    including the corners, which sample real image content in both."""
    img = _smooth_image(rng)
    cx, cy, side, out, rot = 200.0, 160.0, 150.0, 224, 17.0
    ref_patch, _, _ = ref_du.generate_patch_image_clean(
        img.astype(np.float32), [cx, cy, side, side], 1.0, rot, [out, out],
        cv2.INTER_LINEAR)
    augm = {"sc": jnp.asarray([1.0]), "rot": jnp.asarray([rot]),
            "pn": jnp.ones((1, 3))}
    mine = np.asarray(jpp.rgb_crop_augment(
        jnp.asarray(img, jnp.float32)[None],
        jnp.asarray([[cx, cy]]), jnp.asarray([side / 200.0]), augm, out,
        antialias=False))[0] * 255.0
    err = np.abs(ref_patch - mine)
    # 3-shear sinc interpolation vs single bilinear warp on smooth input:
    # sub-1% of dynamic range everywhere including corners
    assert np.median(err) < 0.6 and err.max() < 3.0, (np.median(err), err.max())


def test_generate_patch_image_blur_path(rng):
    """generate_patch_image (data_utils.py:94) = GaussianBlur(5, 8) + warp;
    mine = gaussian_blur + separable crop (the rgb_processing pipeline)."""
    img = _smooth_image(rng)
    cx, cy, side, out = 190.0, 150.0, 140.0, 224
    ref_patch, _, _ = ref_du.generate_patch_image(
        img.astype(np.float32), [cx, cy, side, side], 1.0, 0.0, [out, out],
        cv2.INTER_LINEAR)
    blurred = jpp.gaussian_blur(jnp.asarray(img, jnp.float32)[None])
    mine = np.asarray(jpp.crop_resize_separable(
        blurred, jnp.asarray([cx]), jnp.asarray([cy]), jnp.asarray([side]), out))[0]
    err = np.abs(ref_patch[8:-8, 8:-8] - mine[8:-8, 8:-8])
    assert err.max() < 1.5, err.max()


# ----------------------------------------------------------------- keypoints
def test_transform_kp2d(rng):
    kp2d = rng.uniform(0, 800, (21, 2))
    bbox = (400.0, 300.0, 1.1)
    ref = ref_du.transform_kp2d(kp2d.copy(), bbox)
    _close(ref, jdu.transform_kp2d_to_crop(kp2d.copy(), bbox), atol=1e-4)


def test_j2d_processing(rng):
    """Reference quantizes each point to int pixels (transform(),
    data_utils.py:37-45) -> parity within 1 px of crop space."""
    img_res = 224
    for rot in (0.0, 21.0):
        kp = np.concatenate(
            [rng.uniform(80, 260, (21, 2)), np.ones((21, 1))], axis=1)
        center = np.array([170.0, 150.0])
        bbox_dim = 0.9  # scale units (x200 px)
        augm = {"sc": 1.1, "rot": rot, "flip": 0, "pn": np.ones(3)}
        ref = ref_du.j2d_processing(kp.copy(), center, bbox_dim, augm, img_res)
        mine = np.asarray(jpp.j2d_crop_transform(
            jnp.asarray(kp, jnp.float32)[None],
            jnp.asarray(center, jnp.float32)[None],
            jnp.asarray([bbox_dim], jnp.float32),
            {"sc": jnp.asarray([1.1]), "rot": jnp.asarray([rot])},
            img_res))[0]
        # 1 px in [-1,1] normalised coords = 2/img_res
        _close(ref[:, :2], mine[:, :2], atol=2.5 * 2.0 / img_res)
        _close(ref[:, 2], mine[:, 2])


def test_pose_processing(rng):
    pose = rng.randn(48).astype(np.float64)
    augm = {"rot": 23.0, "sc": 1.0, "flip": 0, "pn": np.ones(3)}
    ref = ref_du.pose_processing(pose.copy(), augm)
    mine = np.asarray(jpp.pose_aug_rotate(
        jnp.asarray(pose, jnp.float32)[None], jnp.asarray([23.0])))[0]
    _close(ref, mine, atol=1e-4)


def test_normalize_unnormalize_kp2d(rng):
    kp = np.concatenate([rng.uniform(0, 224, (21, 2)), np.ones((21, 1))], 1)
    ref = ref_du.normalize_kp2d_np(kp.astype(np.float32), 224)
    from hands_tpu.core import camera as jcam
    _close(ref, jcam.normalize_kp2d(jnp.asarray(kp, jnp.float32), 224), atol=1e-5)
    back = ref_du.unnormalize_2d_kp(ref, 224)
    _close(back[:, :2], jcam.unnormalize_kp2d(jnp.asarray(ref, jnp.float32), 224),
           atol=1e-4)
    kp_t = torch.tensor(kp, dtype=torch.float32)[None]
    ref_t = ref_du.normalize_kp2d(kp_t, 224).numpy()
    _close(ref_t[0], jcam.normalize_kp2d(jnp.asarray(kp, jnp.float32), 224), atol=1e-5)


# ---------------------------------------------------------------- intrinsics
def test_get_wp_intrix():
    from hands_tpu.core import camera as jcam
    ref = ref_du.get_wp_intrix(1000.0, 224).numpy()
    _close(ref, jcam.weak_perspective_intrinsics(1000.0, 224), atol=1e-5)


def test_get_aug_intrix_gt_k(rng):
    from hands_tpu.core import camera as jcam
    K = np.array([[600.0, 0, 310], [0, 620, 250], [0, 0, 1]], np.float32)
    cx, cy, sc = 300.0, 240.0, 1.15
    ref = ref_du.get_aug_intrix(
        torch.tensor(K.copy()), 1000.0, 224, True, cx, cy, sc).numpy()
    mine = np.asarray(jcam.crop_adjusted_intrinsics(
        jnp.asarray(K)[None], jnp.asarray([cx]), jnp.asarray([cy]),
        jnp.asarray([sc]), 224))[0]
    _close(ref, mine, atol=1e-2)
    ref_wp = ref_du.get_aug_intrix(None, 1000.0, 224, False, 0, 0, 1.0).numpy()
    _close(ref_wp, jcam.weak_perspective_intrinsics(1000.0, 224), atol=1e-5)


def test_denormalize_images_inverse_of_normalize(rng):
    imgs = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    normed = np.asarray(jpp.normalize_imagenet(jnp.asarray(imgs), mean, std))
    nchw = torch.tensor(normed.transpose(0, 3, 1, 2))
    back = ref_du.denormalize_images(nchw).numpy().transpose(0, 2, 3, 1)
    _close(imgs, back, atol=1e-5)


# -------------------------------------------------------------- distributions
def test_augm_params_distributions():
    np.random.seed(0)
    N = 4000
    flip_p, noise, rotf, scf = 0.5, 0.4, 30.0, 0.25
    ref = [ref_du.augm_params(True, flip_p, noise, rotf, scf) for _ in range(N)]
    r_flip = np.array([d["flip"] for d in ref], float)
    r_rot = np.array([d["rot"] for d in ref], float)
    r_sc = np.array([d["sc"] for d in ref], float)
    r_pn = np.array([d["pn"] for d in ref], float)

    mine = jpp.augm_params(jax.random.PRNGKey(0), N, True, flip_p, noise, rotf, scf)
    m_flip, m_rot = np.asarray(mine["flip"]), np.asarray(mine["rot"])
    m_sc, m_pn = np.asarray(mine["sc"]), np.asarray(mine["pn"])

    assert abs(r_flip.mean() - m_flip.mean()) < 0.04
    assert abs((r_rot == 0).mean() - (m_rot == 0).mean()) < 0.04  # 60% gate
    nz_r, nz_m = r_rot[r_rot != 0], m_rot[m_rot != 0]
    assert abs(nz_r.std() - nz_m.std()) < 3.0
    assert nz_m.min() >= -2 * rotf and nz_m.max() <= 2 * rotf
    assert abs(r_sc.mean() - m_sc.mean()) < 0.02
    assert abs(r_sc.std() - m_sc.std()) < 0.02
    assert m_sc.min() >= 1 - scf and m_sc.max() <= 1 + scf
    assert abs(r_pn.mean() - m_pn.mean()) < 0.02
    assert m_pn.min() >= 1 - noise and m_pn.max() <= 1 + noise
    # eval mode: all identity
    ev = jpp.augm_params(jax.random.PRNGKey(0), 8, False, flip_p, noise, rotf, scf)
    assert np.asarray(ev["rot"]).max() == 0 and np.asarray(ev["sc"]).min() == 1


def test_jitter_bbox_distribution():
    np.random.seed(1)
    N = 4000
    bbox = np.array([40.0, 60.0, 120.0, 80.0])
    ref = np.stack([ref_du.jitter_bbox(bbox.copy()) for _ in range(N)])
    mine = np.asarray(jpp.jitter_bbox(
        jax.random.PRNGKey(1), jnp.tile(jnp.asarray(bbox, jnp.float32), (N, 1))))
    # size untouched in both (the reference computes then discards scale jitter)
    _close(np.tile(bbox[2:], (N, 1)), mine[:, 2:], atol=1e-4)
    assert np.allclose(ref[:, 2:], bbox[2:])
    for i in (0, 1):
        assert abs(ref[:, i].mean() - mine[:, i].mean()) < 1.5
        assert abs(ref[:, i].std() - mine[:, i].std()) < 1.0


def test_jitter_intrinsics_distribution():
    np.random.seed(2)
    N = 4000
    K = np.array([[600.0, 0, 310], [0, 620, 250], [0, 0, 1]], np.float32)
    ref = np.stack([ref_du.jitter_intrinsics(K.copy()) for _ in range(N)])
    mine = np.asarray(jpp.jitter_intrinsics(
        jax.random.PRNGKey(2), jnp.tile(jnp.asarray(K)[None], (N, 1, 1))))
    for (i, j) in ((0, 0), (1, 1), (0, 2), (1, 2)):
        assert abs(np.log(ref[:, i, j]).mean() - np.log(mine[:, i, j]).mean()) < 0.02, (i, j)
        assert abs(ref[:, i, j].std() - mine[:, i, j].std()) / K[i, j] < 0.05, (i, j)


# ---------------------------------------------------------------- crop & pad
def test_crop_and_pad(rng):
    import types
    img = (_smooth_image(rng, 224, 224).astype(np.float32) / 255.0)
    args = types.SimpleNamespace(img_res=224, img_res_ds=96)
    bbox = np.array([40.0, 60.0, 100.0, 70.0])  # xywh
    ref_crop, ref_bbox = ref_du.crop_and_pad(
        img.transpose(2, 0, 1), bbox, args, scale=1.5)
    ref_crop = ref_crop.transpose(1, 2, 0)

    xyxy = np.array([[bbox[0], bbox[1], bbox[0] + bbox[2], bbox[1] + bbox[3]]])
    mine_bbox = np.asarray(jpp.crop_and_pad_bbox(
        jnp.asarray(xyxy, jnp.float32), 224, scale=1.5))[0]
    np.testing.assert_allclose(mine_bbox, ref_bbox, atol=1.0)

    mine_crop = np.asarray(jpp.crop_and_pad_images(
        jnp.asarray(img, jnp.float32)[None], jnp.asarray(xyxy, jnp.float32), 96,
        scale=1.5, method="cubic"))[0]
    # integer-centre rounding in the reference vs float centre here -> half a
    # source pixel of shift worst-case; compare interiors loosely
    err = np.abs(ref_crop[6:-6, 6:-6] - mine_crop[6:-6, 6:-6])
    assert np.median(err) < 0.02 and err.max() < 0.15, (np.median(err), err.max())
