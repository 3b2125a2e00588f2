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
