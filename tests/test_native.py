"""Native host library (C++ decode/warp/collate) parity tests."""

import numpy as np
import pytest

from hands_tpu.utils import native

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _grad_img(h=120, w=160):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([xs % 256, ys % 256, (xs + ys) % 256], -1).astype(np.uint8)


def test_png_decode_exact():
    img = _grad_img()
    ok, enc = cv2.imencode(".png", img[:, :, ::-1])
    out = native.decode_image(enc.tobytes())
    np.testing.assert_array_equal(out, img)


def test_jpeg_decode_matches_cv2():
    img = _grad_img()
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, 95])
    ours = native.decode_image(enc.tobytes())
    ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1]
    np.testing.assert_array_equal(ours, ref)  # same libjpeg -> bit-exact


def test_corrupt_bytes_return_none():
    assert native.decode_image(b"\xff\xd8\xffgarbage") is None
    assert native.decode_image(b"not an image") is None


def test_warp_matches_cv2():
    img = _grad_img()
    M_fwd = cv2.getRotationMatrix2D((80, 60), 20, 0.9)
    ref = cv2.warpAffine(img, M_fwd, (100, 90), flags=cv2.INTER_LINEAR)
    M_inv = cv2.invertAffineTransform(M_fwd)
    ours = native.warp_affine(img, M_inv, (90, 100))
    d = np.abs(ref.astype(int) - ours.astype(int))
    assert np.median(d) == 0
    assert np.percentile(d, 99) <= 1


def test_warp_normalize_fused():
    img = _grad_img()
    M = np.asarray([[1.0, 0.0, 10.0], [0.0, 1.0, 5.0]], np.float32)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out = native.warp_affine_normalize(img, M, (64, 64), mean, std)
    # interior pixel: straight crop -> normalised source pixel
    expect = (img[5 + 30, 10 + 30].astype(np.float32) / 255 - np.asarray(mean)) \
        / np.asarray(std)
    np.testing.assert_allclose(out[30, 30], expect, atol=1e-2)


def test_stack_images():
    imgs = [_grad_img(), _grad_img()]
    out = native.stack_images(imgs)
    assert out.shape == (2, 120, 160, 3) and out.dtype == np.float32
    np.testing.assert_allclose(out[0], imgs[0].astype(np.float32) / 255,
                               atol=1e-6)


def test_dataset_read_image_uses_native(tmp_path):
    from hands_tpu.data.datasets import _read_image

    img = _grad_img()
    p = str(tmp_path / "t.png")
    cv2.imwrite(p, img[:, :, ::-1])
    out, ok = _read_image(p)
    assert ok
    np.testing.assert_array_equal(out, img)
    # missing file -> zero image, ok=False
    out2, ok2 = _read_image(str(tmp_path / "missing.jpg"))
    assert not ok2 and out2.sum() == 0


def test_jpeg_decode_at_scale():
    """libjpeg scale_denom decode: 1/d dims, content matches an area resize
    of the full decode on smooth images (native decode-at-scale knob for
    frames that only feed a small on-device patch)."""
    cv2 = pytest.importorskip("cv2")
    if not native.available():
        pytest.skip("native lib not built")
    yy, xx = np.mgrid[0:240, 0:320]
    img = np.stack([(xx / 4) % 255, (yy / 3) % 255, ((xx + yy) / 5) % 255],
                   -1).astype(np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 2)
    ok, enc = cv2.imencode(".jpg", img, [int(cv2.IMWRITE_JPEG_QUALITY), 95])
    assert ok
    data = enc.tobytes()
    full = native.decode_image(data)
    for d in (2, 4):
        small = native.decode_image(data, scale_denom=d)
        assert small.shape == (-(-240 // d), -(-320 // d), 3)
        ref = cv2.resize(full, (small.shape[1], small.shape[0]),
                         interpolation=cv2.INTER_AREA)
        assert np.abs(ref.astype(float) - small.astype(float)).mean() < 3.0


def test_epic_decode_downscale_geometry(tmp_path, monkeypatch):
    """decode_downscale scales image AND label geometry together: the
    normalised patch-space keypoints must match the full-res decode."""
    cv2 = pytest.importorskip("cv2")
    import jax
    from hands_tpu.config import default_config
    from tests.test_real_layout_fixtures import _build_epic_tree
    from hands_tpu.data import datasets as D
    from hands_tpu.data.device_pipeline import DeviceDataLoader

    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    _build_epic_tree(str(tmp_path))

    outs = {}
    for d in (1, 2):
        cfg = default_config("hands_light", use_render_seg_loss=False,
                             use_grasp_loss=False,
                             decode_downscale=d)
        ds = D.EPICDataset(cfg, "val")
        rec = ds[0]
        assert rec.image.shape[0] == -(-96 // d)
        dl = DeviceDataLoader(ds, cfg, batch_size=2, is_train=False, seed=0,
                              drop_last=False)
        _, targets, _ = next(iter(dl))
        outs[d] = np.asarray(targets["mano.j2d.norm.r"])
    np.testing.assert_allclose(outs[1][..., :2], outs[2][..., :2], atol=0.02)
