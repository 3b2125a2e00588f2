"""On-device preprocessing parity vs cv2 reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hands_tpu.ops import preprocess as pp

cv2 = pytest.importorskip("cv2")


def _cv_trans(cx, cy, size, rot, out_res, inv=True):
    """cv2 ground-truth affine (the reference's gen_trans_from_patch_cv)."""
    def rot2d(pt, rad):
        c, s = np.cos(rad), np.sin(rad)
        return np.array([pt[0] * c - pt[1] * s, pt[0] * s + pt[1] * c],
                        np.float32)

    rad = np.pi * rot / 180
    src_c = np.array([cx, cy], np.float32)
    src_down = rot2d([0, size * 0.5], rad)
    src_right = rot2d([size * 0.5, 0], rad)
    dst_c = np.array([out_res * 0.5, out_res * 0.5], np.float32)
    dst_down = np.array([0, out_res * 0.5], np.float32)
    dst_right = np.array([out_res * 0.5, 0], np.float32)
    src = np.stack([src_c, src_c + src_down, src_c + src_right])
    dst = np.stack([dst_c, dst_c + dst_down, dst_c + dst_right])
    if inv:
        return cv2.getAffineTransform(dst, src).astype(np.float32)
    return cv2.getAffineTransform(src, dst).astype(np.float32)


def test_crop_transform_matches_cv2():
    rng = np.random.RandomState(0)
    for _ in range(5):
        cx, cy = rng.uniform(50, 400, 2)
        size = rng.uniform(80, 300)
        rot = rng.uniform(-60, 60)
        M_ours = np.asarray(
            pp.crop_transform(
                jnp.asarray([cx]), jnp.asarray([cy]), jnp.asarray([size]),
                jnp.asarray([rot]), 224,
            )
        )[0]
        M_cv = _cv_trans(cx, cy, size, rot, 224, inv=True)
        np.testing.assert_allclose(M_ours, M_cv, atol=1e-3)


def test_warp_matches_cv2_bilinear():
    rng = np.random.RandomState(1)
    img = rng.rand(240, 320, 3).astype(np.float32) * 255
    cx, cy, size, rot = 160.0, 120.0, 150.0, 20.0
    M_inv = pp.crop_transform(
        jnp.asarray([cx]), jnp.asarray([cy]), jnp.asarray([size]),
        jnp.asarray([rot]), 64,
    )
    ours = np.asarray(pp.warp_affine(jnp.asarray(img)[None], M_inv, 64,
                                     method="bilinear"))[0]
    M_fwd = _cv_trans(cx, cy, size, rot, 64, inv=False)
    ref = cv2.warpAffine(img, M_fwd, (64, 64), flags=cv2.INTER_LINEAR)
    # interiors must agree closely (borders differ by clamping convention)
    diff = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
    assert np.median(diff) < 0.5, np.median(diff)
    assert (diff < 2.0).mean() > 0.97


def test_warp_cubic_close_to_cv2_cubic():
    rng = np.random.RandomState(2)
    img = np.asarray(
        np.outer(np.sin(np.arange(200) / 7.0), np.cos(np.arange(200) / 5.0)),
        np.float32,
    )[..., None] * 100 + 100
    M_inv = pp.crop_transform(
        jnp.asarray([100.0]), jnp.asarray([100.0]), jnp.asarray([120.0]),
        jnp.asarray([0.0]), 96,
    )
    ours = np.asarray(pp.warp_affine(jnp.asarray(img)[None], M_inv, 96,
                                     method="cubic"))[0, ..., 0]
    M_fwd = _cv_trans(100, 100, 120, 0, 96, inv=False)
    ref = cv2.warpAffine(img[..., 0], M_fwd, (96, 96), flags=cv2.INTER_CUBIC)
    diff = np.abs(ours[4:-4, 4:-4] - ref[4:-4, 4:-4])
    assert np.median(diff) < 0.5, np.median(diff)


def test_j2d_transform_consistent_with_warp():
    """A keypoint's transformed position must equal where the warp puts the
    pixel content under it."""
    kp = jnp.asarray([[[150.0, 100.0]]])  # (B=1, J=1, 2)
    center = jnp.asarray([[160.0, 110.0]])
    bbox_dim = jnp.asarray([0.8])
    augm = {"sc": jnp.asarray([1.1]), "rot": jnp.asarray([25.0]),
            "pn": jnp.ones((1, 3)), "flip": jnp.zeros(1)}
    out = np.asarray(pp.j2d_crop_transform(kp, center, bbox_dim, augm, 224))[0, 0]
    # invert manually: map the normalised point back through M and compare
    crop_dim = float(augm["sc"][0]) * 0.8 * 200.0
    M = np.asarray(pp.crop_transform(center[:, 0], center[:, 1],
                                     jnp.asarray([crop_dim]),
                                     augm["rot"], 224))[0]
    px = (out + 1) * 0.5 * 224
    src = M[:, :2] @ px + M[:, 2]
    np.testing.assert_allclose(src, [150.0, 100.0], atol=1e-2)


def test_augm_params_distributions():
    key = jax.random.PRNGKey(0)
    d = pp.augm_params(key, 4096, True, flip_prob=0.5, noise_factor=0.4,
                       rot_factor=30.0, scale_factor=0.25)
    rot = np.asarray(d["rot"])
    sc = np.asarray(d["sc"])
    pn = np.asarray(d["pn"])
    assert abs(np.asarray(d["flip"]).mean() - 0.5) < 0.05
    assert (np.abs(rot) <= 60.0 + 1e-5).all()
    assert 0.55 < (rot == 0).mean() < 0.65  # zeroed w.p. 0.6
    assert (sc >= 0.75 - 1e-6).all() and (sc <= 1.25 + 1e-6).all()
    assert (pn >= 0.6 - 1e-6).all() and (pn <= 1.4 + 1e-6).all()
    # eval mode: identity
    d_eval = pp.augm_params(key, 8, False, 0.5, 0.4, 30.0, 0.25)
    assert np.asarray(d_eval["rot"]).sum() == 0
    assert np.asarray(d_eval["sc"]).min() == 1.0


def test_kpe_angles_match_reference_formula():
    K = jnp.asarray([[[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]]])
    bbox = jnp.asarray([[50.0, 60.0, 150.0, 180.0]])
    ca = np.asarray(pp.kpe_center_angles(bbox, K))[0]
    np.testing.assert_allclose(
        ca, [np.arctan2(100 - 112, 1000), np.arctan2(120 - 112, 1000)],
        atol=1e-6,
    )
    corners = np.asarray(pp.kpe_corner_angles(bbox, K))[0]
    np.testing.assert_allclose(
        corners[:2], [np.arctan2(50 - 112, 1000), np.arctan2(60 - 112, 1000)],
        atol=1e-6,
    )
    dense, mask = pp.kpe_dense_angles(bbox, K, 32)
    assert dense.shape == (1, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(mask), 1.0)
    np.testing.assert_allclose(
        np.asarray(dense)[0, 0, 0], corners[:2], atol=1e-6
    )


def test_crop_and_pad_bbox_square():
    # box fully inside the image: square, centred, side = max(w,h)*1.5
    bbox = jnp.asarray([[80.0, 90.0, 140.0, 120.0]])  # w=60, h=30
    out = np.asarray(pp.crop_and_pad_bbox(bbox, img_res=224, scale=1.5))[0]
    np.testing.assert_allclose(out, [110 - 45, 105 - 45, 110 + 45, 105 + 45])
    # box near the border: result clipped into the canvas (reference clips too)
    bbox2 = jnp.asarray([[10.0, 20.0, 110.0, 70.0]])
    out2 = np.asarray(pp.crop_and_pad_bbox(bbox2, img_res=224, scale=1.5))[0]
    assert out2.min() >= 0 and out2.max() <= 223


def test_jitter_bbox_translation_only():
    key = jax.random.PRNGKey(3)
    bbox = jnp.asarray([[10.0, 20.0, 100.0, 50.0]] * 64)
    out = np.asarray(pp.jitter_bbox(key, bbox))
    np.testing.assert_allclose(out[:, 2:], np.asarray(bbox)[:, 2:])  # size kept
    assert (np.abs(out[:, 0] - 10.0) <= 0.2 * 100 + 1e-5).all()


def test_full_pipeline_jit_and_batched():
    """The whole preprocessing chain compiles as one program."""
    key = jax.random.PRNGKey(0)
    B, H, W = 4, 120, 160
    imgs = jax.random.uniform(key, (B, H, W, 3)) * 255
    center = jnp.tile(jnp.asarray([[80.0, 60.0]]), (B, 1))
    bbox_dim = jnp.full((B,), 0.5)
    K = jnp.tile(
        jnp.asarray([[[1000.0, 0, 80], [0, 1000.0, 60], [0, 0, 1]]]), (B, 1, 1))

    @jax.jit
    def pipeline(key, imgs):
        augm = pp.augm_params(key, B, True, 0.0, 0.4, 30.0, 0.25)
        patch = pp.rgb_crop_augment(imgs, center, bbox_dim, augm, 64)
        bbox = jnp.tile(jnp.asarray([[10.0, 10.0, 50.0, 50.0]]), (B, 1))
        crop = pp.crop_and_pad_images(patch, bbox, 64)
        ca = pp.kpe_center_angles(bbox, K)
        norm = pp.normalize_imagenet(crop, (0.485, 0.456, 0.406),
                                     (0.229, 0.224, 0.225))
        return norm, ca

    out, ca = pipeline(key, imgs)
    assert out.shape == (B, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(ca)).all()


def test_separable_matches_gather_warp():
    """Axis-aligned separable resample == general gather warp."""
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(2, 120, 160, 3).astype(np.float32))
    cx = jnp.asarray([80.0, 60.0])
    cy = jnp.asarray([60.0, 70.0])
    size = jnp.asarray([90.0, 150.0])
    M = pp.crop_transform(cx, cy, size, jnp.zeros(2), 64)
    ref = pp.warp_affine(img, M, 64, method="bilinear")
    sep = pp.crop_resize_separable(img, cx, cy, size, 64, method="bilinear")
    np.testing.assert_allclose(np.asarray(sep), np.asarray(ref), atol=1e-4)


def test_two_pass_rotation_matches_single_warp():
    """crop+scale then rotate-about-centre == one rotated warp (isotropic
    scale commutes with rotation)."""
    rng = np.random.RandomState(6)
    img = jnp.asarray(rng.rand(1, 200, 200, 1).astype(np.float32))
    img = jnp.asarray(
        np.outer(np.sin(np.arange(200) / 9.0),
                 np.cos(np.arange(200) / 7.0)).astype(np.float32)
    )[None, :, :, None]
    cx, cy = jnp.asarray([100.0]), jnp.asarray([100.0])
    size, rot = jnp.asarray([120.0]), jnp.asarray([25.0])
    M = pp.crop_transform(cx, cy, size, rot, 96)
    ref = pp.warp_affine(img, M, 96, method="bilinear")
    two = pp.crop_resize_separable(img, cx, cy, size, 96, "bilinear")
    two = pp.rotate_patch(two, rot, "bilinear")
    # compare interiors: rotate_patch uses sinc (DFT) interpolation, the
    # oracle bilinear — differences are interpolation-method softness
    d = np.abs(np.asarray(two) - np.asarray(ref))[0, 12:-12, 12:-12]
    assert np.median(d) < 0.03, np.median(d)
    assert np.percentile(d, 95) < 0.12


def test_shear_rotation_matches_gather():
    """Gather-free 3-shear rotation == single-pass gather warp (within
    double-interpolation softness)."""
    img = np.outer(np.sin(np.arange(224) / 9.0),
                   np.cos(np.arange(224) / 7.0)).astype(np.float32)
    img = jnp.asarray(np.tile(np.stack([img, img * 0.5, img * 0.2], -1)[None],
                              (2, 1, 1, 1)))
    rot = jnp.asarray([25.0, -40.0])
    ref = pp.rotate_patch_gather(img, rot)
    new = pp.rotate_patch(img, rot)
    d = np.abs(np.asarray(ref) - np.asarray(new))[:, 20:-20, 20:-20]
    assert np.median(d) < 0.02
    assert np.percentile(d, 95) < 0.06


def test_shear_rotation_zero_is_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(2, 96, 96, 3), jnp.float32)
    out = pp.rotate_patch(img, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
