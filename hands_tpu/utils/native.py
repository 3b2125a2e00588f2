"""ctypes bindings for the native host runtime (``native/hands_host.cpp``).

Replaces the reference's cv2 dependency in the data-loading hot path with a
first-party C++ library: JPEG/PNG decode (libjpeg/libpng), fused
warp+normalize, and batch collation. Auto-builds with make on first import
if the shared object is missing; falls back to None so pure-python paths
keep working (callers must check :func:`available`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libhands_host.so"))

_u8p = ctypes.POINTER(ctypes.c_uint8)
_f32p = ctypes.POINTER(ctypes.c_float)
_i32p = ctypes.POINTER(ctypes.c_int)


@lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.jpeg_probe.argtypes = [_u8p, ctypes.c_long, _i32p, _i32p, _i32p]
    lib.jpeg_probe.restype = ctypes.c_int
    lib.jpeg_decode_rgb.argtypes = [_u8p, ctypes.c_long, _u8p, ctypes.c_int,
                                    ctypes.c_int]
    lib.jpeg_decode_rgb.restype = ctypes.c_int
    if hasattr(lib, "jpeg_decode_rgb_scaled"):
        lib.jpeg_decode_rgb_scaled.argtypes = [
            _u8p, ctypes.c_long, _u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, _i32p, _i32p,
        ]
        lib.jpeg_decode_rgb_scaled.restype = ctypes.c_int
    lib.png_probe.argtypes = [_u8p, ctypes.c_long, _i32p, _i32p]
    lib.png_probe.restype = ctypes.c_int
    lib.png_decode_rgb.argtypes = [_u8p, ctypes.c_long, _u8p, ctypes.c_int,
                                   ctypes.c_int]
    lib.png_decode_rgb.restype = ctypes.c_int
    lib.warp_affine_bilinear_u8.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p, _u8p,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.warp_affine_normalize_f32.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p, _f32p,
        ctypes.c_int, ctypes.c_int, _f32p, _f32p,
    ]
    lib.stack_u8_to_f32.argtypes = [
        ctypes.POINTER(_u8p), ctypes.c_int, ctypes.c_long, _f32p,
        ctypes.c_float,
    ]
    return lib


def available() -> bool:
    return _lib() is not None


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(_u8p)


def decode_image(data: bytes, scale_denom: int = 1) -> Optional[np.ndarray]:
    """Decode JPEG or PNG bytes -> (H, W, 3) uint8 RGB. None on failure.

    ``scale_denom`` in {1, 2, 4, 8} decodes JPEGs at 1/denom resolution via
    libjpeg's scaled iDCT (~denom^2 cheaper) — the right host-side knob when
    the frame feeds a small on-device patch. PNGs ignore it.
    """
    lib = _lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if data[:3] == b"\xff\xd8\xff":
        if lib.jpeg_probe(_as_u8p(buf), len(data), ctypes.byref(h),
                          ctypes.byref(w), ctypes.byref(c)):
            return None
        if scale_denom > 1 and hasattr(lib, "jpeg_decode_rgb_scaled"):
            cap_h = -(-h.value // scale_denom) + 8
            cap_w = -(-w.value // scale_denom) + 8
            out = np.empty((cap_h, cap_w, 3), np.uint8)
            oh = ctypes.c_int()
            ow = ctypes.c_int()
            if lib.jpeg_decode_rgb_scaled(
                    _as_u8p(buf), len(data), _as_u8p(out), scale_denom,
                    cap_h, cap_w, ctypes.byref(oh), ctypes.byref(ow)):
                return None
            return np.ascontiguousarray(
                out.reshape(-1)[: oh.value * ow.value * 3]
                .reshape(oh.value, ow.value, 3))
        out = np.empty((h.value, w.value, 3), np.uint8)
        if lib.jpeg_decode_rgb(_as_u8p(buf), len(data), _as_u8p(out), h.value,
                               w.value):
            return None
        return out
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if lib.png_probe(_as_u8p(buf), len(data), ctypes.byref(h),
                         ctypes.byref(w)):
            return None
        out = np.empty((h.value, w.value, 3), np.uint8)
        if lib.png_decode_rgb(_as_u8p(buf), len(data), _as_u8p(out), h.value,
                              w.value):
            return None
        return out
    return None


def read_image(path: str) -> Optional[np.ndarray]:
    try:
        with open(path, "rb") as f:
            return decode_image(f.read())
    except OSError:
        return None


def warp_affine(src: np.ndarray, M: np.ndarray, out_hw) -> np.ndarray:
    """Inverse-map bilinear warp (dst->src M, 2x3), zero border."""
    lib = _lib()
    assert lib is not None
    src = np.ascontiguousarray(src, np.uint8)
    M = np.ascontiguousarray(M, np.float32)
    dh, dw = out_hw
    out = np.empty((dh, dw, src.shape[2]), np.uint8)
    lib.warp_affine_bilinear_u8(
        _as_u8p(src), src.shape[0], src.shape[1], src.shape[2],
        M.ctypes.data_as(_f32p), _as_u8p(out), dh, dw,
    )
    return out


def warp_affine_normalize(src: np.ndarray, M: np.ndarray, out_hw, mean,
                          std) -> np.ndarray:
    """Fused warp + /255 + ImageNet normalise -> float32 NHWC."""
    lib = _lib()
    assert lib is not None
    src = np.ascontiguousarray(src, np.uint8)
    M = np.ascontiguousarray(M, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    dh, dw = out_hw
    out = np.empty((dh, dw, src.shape[2]), np.float32)
    lib.warp_affine_normalize_f32(
        _as_u8p(src), src.shape[0], src.shape[1], src.shape[2],
        M.ctypes.data_as(_f32p), out.ctypes.data_as(_f32p), dh, dw,
        mean.ctypes.data_as(_f32p), std.ctypes.data_as(_f32p),
    )
    return out


def stack_images(imgs) -> np.ndarray:
    """Collate same-shape HWC uint8 images -> (N, H, W, C) float32 in [0,1]."""
    lib = _lib()
    assert lib is not None
    imgs = [np.ascontiguousarray(im, np.uint8) for im in imgs]
    n = len(imgs)
    hwc = int(np.prod(imgs[0].shape))
    out = np.empty((n,) + imgs[0].shape, np.float32)
    ptrs = (_u8p * n)(*[_as_u8p(im) for im in imgs])
    lib.stack_u8_to_f32(ptrs, n, hwc, out.ctypes.data_as(_f32p),
                        np.float32(1.0 / 255.0))
    return out
