"""Fused on-device preprocessing: batched crop / warp / augment / KPE.

The reference does all of this per-sample on CPU workers with cv2
(``/root/reference/common/data_utils.py``: ``gen_trans_from_patch_cv:56``,
``generate_patch_image:94``, ``augm_params:136``, ``rgb_processing:182``,
``j2d_processing:273``, ``crop_and_pad:495``; KPE angles in
``src/datasets/hands_light_dataset.py:256-352``). Here the whole pipeline is
batched XLA running on device — one fused program per batch, no Python loop,
differentiable where meaningful, driven by ``jax.random`` so augmentation is
reproducible from a single key.

Semantics match the reference's math exactly for: affine crop matrices,
augmentation distributions (rot ~ clip(N(0, rf)·2), zeroed w.p. 0.6; scale ~
clip(N(1, sf)); channel noise ~ U[1±nf]), keypoint transforms, intrinsics
updates and KPE angles. Image *resampling* uses bilinear or Catmull-Rom
bicubic gathers (cv2 INTER_CUBIC analogue); pixel-level parity with cv2 is
approximate by design — the parity contract is on keypoints/intrinsics/KPE
(exact) and downstream metrics, not on interpolated pixels (SURVEY §7.3).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp


# ------------------------------------------------------------ affine algebra
def crop_transform(
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    src_size: jnp.ndarray,
    rot_deg: jnp.ndarray,
    out_res: int,
) -> jnp.ndarray:
    """Batched dst->src affine maps for square crops (inverse warp).

    Matches ``gen_trans_from_patch_cv(..., inv=True)``: a source square of
    side ``src_size`` centred at (cx, cy), rotated by ``rot_deg``, maps onto
    the (out_res x out_res) patch. Returns (B, 2, 3) with
    ``src_xy = M @ [dst_x, dst_y, 1]``.
    """
    rot_rad = jnp.deg2rad(rot_deg)
    cs, sn = jnp.cos(rot_rad), jnp.sin(rot_rad)
    s = src_size / out_res  # scale dst px -> src px
    half = out_res / 2.0
    # rotation about the patch centre then translate to (cx, cy)
    a00 = cs * s
    a01 = -sn * s
    a10 = sn * s
    a11 = cs * s
    tx = cx - (a00 * half + a01 * half)
    ty = cy - (a10 * half + a11 * half)
    return jnp.stack(
        [jnp.stack([a00, a01, tx], -1), jnp.stack([a10, a11, ty], -1)], axis=-2
    )


# ----------------------------------------------------------------- resampling
def _gather_pixels(img: jnp.ndarray, xi: jnp.ndarray, yi: jnp.ndarray):
    """img (H, W, C); xi, yi int arrays (...,). Returns (..., C) with zeros
    outside bounds (cv2 BORDER_CONSTANT 0)."""
    H, W, _ = img.shape
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    vals = img[yc, xc]  # advanced indexing -> gather
    return vals * inb[..., None]


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Keys bicubic weight (cv2's INTER_CUBIC uses a=-0.75)."""
    at = jnp.abs(t)
    w1 = ((a + 2) * at - (a + 3)) * at * at + 1.0
    w2 = ((a * at - 5 * a) * at + 8 * a) * at - 4 * a
    return jnp.where(at <= 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def warp_affine(
    images: jnp.ndarray,  # (B, H, W, C)
    M_inv: jnp.ndarray,  # (B, 2, 3) dst->src
    out_res: int,
    method: str = "bilinear",
) -> jnp.ndarray:
    """Batched inverse-map affine warp -> (B, out_res, out_res, C)."""
    B = images.shape[0]
    ys, xs = jnp.meshgrid(
        jnp.arange(out_res, dtype=jnp.float32),
        jnp.arange(out_res, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    dst = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)  # (P, 3)
    src = jnp.einsum("bij,pj->bpi", M_inv, dst)  # (B, P, 2)
    sx, sy = src[..., 0], src[..., 1]

    def sample_one(img, sx, sy):
        if method == "nearest":
            return _gather_pixels(
                img, jnp.round(sx).astype(jnp.int32), jnp.round(sy).astype(jnp.int32)
            )
        if method == "bilinear":
            x0 = jnp.floor(sx).astype(jnp.int32)
            y0 = jnp.floor(sy).astype(jnp.int32)
            fx = (sx - x0)[..., None]
            fy = (sy - y0)[..., None]
            v00 = _gather_pixels(img, x0, y0)
            v01 = _gather_pixels(img, x0 + 1, y0)
            v10 = _gather_pixels(img, x0, y0 + 1)
            v11 = _gather_pixels(img, x0 + 1, y0 + 1)
            top = v00 * (1 - fx) + v01 * fx
            bot = v10 * (1 - fx) + v11 * fx
            return top * (1 - fy) + bot * fy
        if method == "cubic":
            x0 = jnp.floor(sx).astype(jnp.int32)
            y0 = jnp.floor(sy).astype(jnp.int32)
            acc = 0.0
            for dy in range(-1, 3):
                wy = _cubic_kernel(sy - (y0 + dy))[..., None]
                row = 0.0
                for dx in range(-1, 3):
                    wx = _cubic_kernel(sx - (x0 + dx))[..., None]
                    row = row + wx * _gather_pixels(img, x0 + dx, y0 + dy)
                acc = acc + wy * row
            return acc
        raise ValueError(method)

    out = jax.vmap(sample_one)(images, sx, sy)
    return out.reshape(B, out_res, out_res, images.shape[-1])


# ------------------------------------------------- separable (MXU) resample
def _interp_weights(src: jnp.ndarray, in_size: int, method: str) -> jnp.ndarray:
    """Interpolation weight matrix W (..., out, in): out = W @ signal.

    Rows are the bilinear hat (or Keys bicubic) evaluated at the fractional
    source coordinate; coordinates outside [0, in) produce (near-)zero rows,
    matching the gather path's zero border.
    """
    idx = jnp.arange(in_size, dtype=src.dtype)
    d = src[..., None] - idx  # (..., out, in)
    if method == "bilinear":
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    elif method == "cubic":
        w = _cubic_kernel(d)
    elif method == "nearest":
        w = (jnp.abs(d) <= 0.5).astype(src.dtype)
    else:
        raise ValueError(method)
    # no explicit border mask: weights vanish for out-of-range coordinates,
    # which reproduces the gather path's zero border exactly
    return w


def separable_resample(
    images: jnp.ndarray,  # (B, H, W, C)
    y_src: jnp.ndarray,  # (B, outH) source y for each output row
    x_src: jnp.ndarray,  # (B, outW) source x for each output column
    method: str = "bilinear",
) -> jnp.ndarray:
    """Axis-aligned resample as two batched matmuls (TPU-native warp).

    Per-pixel gathers run at ~1e8 elem/s on TPU and dominate the pipeline;
    the same resample expressed as interpolation-weight matmuls rides the
    MXU at TFLOP rates (~1000x faster at 224^2 x batch 64). Only valid for
    zero-rotation affine maps — rotation composes as a separate pass.
    """
    with jax.default_matmul_precision("float32"):
        Wy = _interp_weights(y_src, images.shape[1], method)  # (B, oh, H)
        Wx = _interp_weights(x_src, images.shape[2], method)  # (B, ow, W)
        tmp = jnp.einsum("boh,bhwc->bowc", Wy, images)
        return jnp.einsum("bpw,bowc->bopc", Wx, tmp)


def crop_resize_separable(
    images: jnp.ndarray,  # (B, H, W, C)
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    src_size: jnp.ndarray,
    out_res: int,
    method: str = "bilinear",
) -> jnp.ndarray:
    """Axis-aligned square crop+resize (the rot=0 case of ``crop_transform``
    + ``warp_affine``) on the MXU."""
    s = src_size / out_res
    half = out_res / 2.0
    grid = jnp.arange(out_res, dtype=jnp.float32)
    x_src = s[:, None] * grid[None, :] + (cx - s * half)[:, None]
    y_src = s[:, None] * grid[None, :] + (cy - s * half)[:, None]
    return separable_resample(images, y_src, x_src, method=method)


def rotate_patch_gather(
    images: jnp.ndarray,  # (B, R, R, C) square patch
    rot_deg: jnp.ndarray,  # (B,)
    method: str = "bilinear",
) -> jnp.ndarray:
    """Reference-exact single-pass rotation via the gather warp (slow on TPU:
    ~1e8 gathers/s; kept as the parity oracle for :func:`rotate_patch`)."""
    res = images.shape[1]
    M = crop_transform(
        jnp.full_like(rot_deg, res / 2.0), jnp.full_like(rot_deg, res / 2.0),
        jnp.full_like(rot_deg, float(res)), rot_deg, res,
    )
    return warp_affine(images, M, res, method=method)


def _shear_pass_fft(images: jnp.ndarray, t: jnp.ndarray, axis: int,
                    max_shift: int) -> jnp.ndarray:
    """Per-row/column fractional shift via the Fourier shift theorem.

    out[.., p, ..] = in[.., p + t, ..] becomes a dense phase multiply in the
    frequency domain — zero gathers, and XLA lowers the FFT to MXU matmuls
    on TPU. Zero-padding by ``max_shift`` keeps wrapped content out of the
    valid region. Interpolation is sinc (exact shift) rather than bilinear —
    closer to the reference's INTER_CUBIC than bilinear is, with mild Gibbs
    ringing at hard edges.
    """
    pad = int(max_shift) + 2
    pad_width = [(0, 0)] * 4
    pad_width[axis] = (pad, pad)
    x = jnp.pad(images, pad_width)
    N = x.shape[axis]
    X = jnp.fft.fft(x, axis=axis)
    k = jnp.fft.fftfreq(N).astype(jnp.float32)  # (N,) cycles/sample
    # out(p) = in(p + t)  <=>  X_out(k) = X_in(k) * exp(+2i pi k t)
    if axis == 2:
        phase = jnp.exp(2j * jnp.pi * k[None, None, :, None]
                        * t[:, :, None, None])
    else:
        phase = jnp.exp(2j * jnp.pi * k[None, :, None, None]
                        * t[:, None, :, None])
    out = jnp.real(jnp.fft.ifft(X * phase, axis=axis))
    sl = [slice(None)] * 4
    sl[axis] = slice(pad, N - pad)
    return out[tuple(sl)].astype(images.dtype)


def _dft_matrices(N: int):
    p = np.arange(N)
    ang = 2.0 * np.pi * np.outer(p, p) / N
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _shear_pass_dft(images: jnp.ndarray, t: jnp.ndarray, axis: int,
                    max_shift: int) -> jnp.ndarray:
    """Fractional per-row/column shift via an explicit real DFT.

    ``jnp.fft`` is unimplemented on some TPU runtimes, so the shift theorem
    is evaluated with shared (N, N) cos/sin matmuls (pure MXU work) and a
    dense per-row phase rotation in between — zero gathers:

        X = x C - i x S;  Y = X e^{+2 i pi f t};  out = Re(IDFT(Y))

    Zero-padding by ``max_shift`` keeps wraparound out of the valid region.
    Sinc interpolation (exact shift); mild ringing at hard edges, closer to
    the reference's INTER_CUBIC than bilinear.
    """
    pad = int(max_shift) + 2
    pad_width = [(0, 0)] * 4
    pad_width[axis] = (pad, pad)
    x = jnp.pad(images.astype(jnp.float32), pad_width)
    N = x.shape[axis]
    C, S = _dft_matrices(N)

    with jax.default_matmul_precision("float32"):
        if axis == 2:
            Xc = jnp.einsum("bhwc,wk->bhkc", x, C)
            Xs = jnp.einsum("bhwc,wk->bhkc", x, S)
        else:
            Xc = jnp.einsum("bhwc,hk->bkwc", x, C)
            Xs = jnp.einsum("bhwc,hk->bkwc", x, S)

        f = jnp.arange(N, dtype=jnp.float32) / N
        # alias frequencies above Nyquist to negative (shift must use the
        # principal frequency, else the phase ramp wraps)
        f = jnp.where(f > 0.5, f - 1.0, f)
        if axis == 2:
            phi = 2.0 * jnp.pi * f[None, None, :] * t[:, :, None]  # (B,H,N)
            phi = phi[..., None]  # (B, H, N, 1)
        else:
            phi = 2.0 * jnp.pi * f[None, :, None] * t[:, None, :]  # (B,N,W)
            phi = phi[..., None]
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        Yc = Xc * cphi + Xs * sphi
        Ys = Xs * cphi - Xc * sphi

        if axis == 2:
            out = (jnp.einsum("bhkc,kp->bhpc", Yc, C)
                   + jnp.einsum("bhkc,kp->bhpc", Ys, S)) / N
        else:
            out = (jnp.einsum("bkwc,kp->bpwc", Yc, C)
                   + jnp.einsum("bkwc,kp->bpwc", Ys, S)) / N

    sl = [slice(None)] * 4
    sl[axis] = slice(pad, N - pad)
    return out[tuple(sl)].astype(images.dtype)


def _shear_pass(images: jnp.ndarray, t: jnp.ndarray, axis: int,
                max_shift: int) -> jnp.ndarray:
    """Gather-free fractional per-row (axis=2) or per-column (axis=1) shift.

    out[.., y, x, .] = (1-f) img[.., y, x+i, .] + f img[.., y, x+i+1, .]
    with t = i + f varying along the orthogonal axis. Implemented as a
    ``lax.scan`` over the integer shift k: each step is one contiguous
    dynamic slice of a zero-padded image + a select — pure HBM streaming,
    no per-pixel gathers.
    """
    B = images.shape[0]
    size = images.shape[axis]
    pad_width = [(0, 0)] * 4
    pad_width[axis] = (max_shift + 1, max_shift + 1)
    padded = jnp.pad(images, pad_width)

    i = jnp.floor(t).astype(jnp.int32)  # (B, size_orth)
    f = (t - i).astype(images.dtype)
    # broadcast masks/fracs to image layout
    if axis == 2:
        sel_shape = (B, -1, 1, 1)
    else:
        sel_shape = (B, 1, -1, 1)
    fB = f.reshape(sel_shape)

    def step(acc, k):
        shift = k + max_shift + 1
        lo = jax.lax.dynamic_slice_in_dim(padded, shift, size, axis=axis)
        hi = jax.lax.dynamic_slice_in_dim(padded, shift + 1, size, axis=axis)
        sel = (i == k).reshape(sel_shape)
        return acc + jnp.where(sel, (1 - fB) * lo + fB * hi, 0.0), None

    ks = jnp.arange(-max_shift, max_shift + 1)
    out, _ = jax.lax.scan(step, jnp.zeros_like(images), ks)
    return out


def rotate_patch(
    images: jnp.ndarray,  # (B, R, R, C) square patch
    rot_deg: jnp.ndarray,  # (B,)
    method: str = "bilinear",
    max_rot_deg: float = 60.0,
) -> jnp.ndarray:
    """Rotate square patches about their centre, gather-free.

    Paeth three-shear decomposition R(th) = Shx(-tan(th/2)) Shy(sin th)
    Shx(-tan(th/2)): each shear is a per-row/column fractional 1-D shift,
    evaluated as a scan of contiguous dynamic slices (HBM-streaming, ~30 ms
    at bs64/224^2 vs ~1 s for the per-pixel gather warp). ``max_rot_deg``
    bounds the static shift range (augmentation clips rotation to
    +-2*rot_factor = +-60 deg by default).
    """
    if method == "nearest":
        # nearest = bilinear weights rounded; reuse the same passes on the
        # rounded shift (adequate for masks)
        pass
    res = images.shape[1]
    c = (res - 1) / 2.0
    rad = jnp.deg2rad(rot_deg)
    # the three sampling passes compose to the dst->src map
    # Shx(a) . Shy(b) . Shx(a) = R(th) — exactly the gather path's matrix
    a = -jnp.tan(rad / 2.0)  # (B,)
    b = jnp.sin(rad)

    coords = jnp.arange(res, dtype=images.dtype) - c  # (res,)
    max_a = float(np.tan(np.deg2rad(max_rot_deg) / 2.0)) * (res / 2.0) + 2
    max_b = float(np.sin(np.deg2rad(max_rot_deg))) * (res / 2.0) + 2

    shear = _shear_pass_dft if method != "scan" else _shear_pass
    tx = a[:, None] * coords[None, :]  # per-row x shift (B, res)
    x1 = shear(images, tx, axis=2, max_shift=int(np.ceil(max_a)))
    ty = b[:, None] * coords[None, :]  # per-column y shift (B, res)
    x2 = shear(x1, ty, axis=1, max_shift=int(np.ceil(max_b)))
    x3 = shear(x2, tx, axis=2, max_shift=int(np.ceil(max_a)))
    return x3


def gaussian_blur(images: jnp.ndarray, kernel: int = 5, sigma: float = 8.0):
    """Separable Gaussian blur, NHWC (the reference's cv2 anti-alias pass)."""
    half = kernel // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-(x * x) / (2 * sigma * sigma))
    k = k / k.sum()
    C = images.shape[-1]
    kh = jnp.tile(k.reshape(1, kernel, 1, 1), (1, 1, 1, C))  # HWIO depthwise
    kv = jnp.tile(k.reshape(kernel, 1, 1, 1), (1, 1, 1, C))
    dn = jax.lax.conv_dimension_numbers(images.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        images, kh, (1, 1), [(0, 0), (half, half)], dimension_numbers=dn,
        feature_group_count=C,
    )
    out = jax.lax.conv_general_dilated(
        out, kv, (1, 1), [(half, half), (0, 0)], dimension_numbers=dn,
        feature_group_count=C,
    )
    return out


# -------------------------------------------------------------- augmentation
def augm_params(
    key: jax.Array,
    batch: int,
    is_train: bool,
    flip_prob: float,
    noise_factor: float,
    rot_factor: float,
    scale_factor: float,
):
    """Batched augmentation draws (reference ``augm_params``, exact
    distributions). Returns dict of (B,)-arrays: flip, rot (deg), sc and
    (B,3) pn channel gains."""
    if not is_train:
        return {
            "flip": jnp.zeros(batch),
            "pn": jnp.ones((batch, 3)),
            "rot": jnp.zeros(batch),
            "sc": jnp.ones(batch),
        }
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    flip = (jax.random.uniform(k1, (batch,)) <= flip_prob).astype(jnp.float32)
    pn = jax.random.uniform(
        k2, (batch, 3), minval=1 - noise_factor, maxval=1 + noise_factor
    )
    rot = jnp.clip(
        jax.random.normal(k3, (batch,)) * rot_factor, -2 * rot_factor,
        2 * rot_factor,
    )
    rot = jnp.where(jax.random.uniform(k4, (batch,)) <= 0.6, 0.0, rot)
    sc = jnp.clip(
        jax.random.normal(k5, (batch,)) * scale_factor + 1.0,
        1 - scale_factor, 1 + scale_factor,
    )
    return {"flip": flip, "pn": pn, "rot": rot, "sc": sc}


def _rot_margin_res(img_res: int) -> int:
    """Smallest even patch side >= img_res * sqrt(2): the central img_res
    window of a rotation of this patch never touches the zero corners."""
    big = int(np.ceil(img_res * np.sqrt(2.0)))
    return big + (big - img_res) % 2


def rgb_crop_augment(
    images: jnp.ndarray,  # (B, H, W, 3) uint8/float in [0, 255]
    center: jnp.ndarray,  # (B, 2)
    bbox_dim: jnp.ndarray,  # (B,) normalised bbox scale (x200 px)
    augm: dict,
    img_res: int,
    antialias: bool = True,
    method: str = "bilinear",
    apply_rot: bool = True,
) -> jnp.ndarray:
    """Batched ``rgb_processing``: blur -> rotated square crop of side
    ``sc * bbox_dim * 200`` -> channel noise -> [0,1] NHWC float.

    TPU decomposition: the isotropic crop+scale runs as a separable MXU
    resample; the (train-only) in-plane rotation is a second pass on the
    small patch. Isotropic scaling commutes with rotation about the patch
    centre, so the composition equals the reference's single rotated warp
    up to interpolation softness. ``apply_rot`` must be static: eval
    pipelines skip the gather pass entirely.
    """
    imgs = images.astype(jnp.float32)
    if antialias:
        imgs = gaussian_blur(imgs)
    crop_dim = augm["sc"] * bbox_dim * 200.0
    if apply_rot:
        # sqrt(2) margin: the rotated square samples real image content at
        # the corners (the reference's single warp does), instead of the
        # zero wedge a tight crop-then-rotate would produce.
        big = _rot_margin_res(img_res)
        patch = crop_resize_separable(
            imgs, center[:, 0], center[:, 1], crop_dim * (big / img_res), big,
            method=method)
        patch = rotate_patch(patch, augm["rot"], method=method)
        off = (big - img_res) // 2
        patch = patch[:, off:off + img_res, off:off + img_res, :]
    else:
        patch = crop_resize_separable(
            imgs, center[:, 0], center[:, 1], crop_dim, img_res, method=method)
    patch = jnp.clip(patch * augm["pn"][:, None, None, :], 0.0, 255.0)
    return patch / 255.0


def mask_crop(
    masks: jnp.ndarray, center: jnp.ndarray, bbox_dim: jnp.ndarray, augm: dict,
    img_res: int,
    apply_rot: bool = True,
) -> jnp.ndarray:
    """Batched ``mask_processing``: nearest-neighbour crop, no blur/noise."""
    crop_dim = augm["sc"] * bbox_dim * 200.0
    if masks.ndim == 3:
        masks = masks[..., None]
    masksf = masks.astype(jnp.float32)
    if apply_rot:
        big = _rot_margin_res(img_res)
        patch = crop_resize_separable(
            masksf, center[:, 0], center[:, 1], crop_dim * (big / img_res),
            big, method="nearest")
        patch = rotate_patch(patch, augm["rot"], method="nearest")
        off = (big - img_res) // 2
        patch = patch[:, off:off + img_res, off:off + img_res, :]
    else:
        patch = crop_resize_separable(
            masksf, center[:, 0], center[:, 1], crop_dim, img_res,
            method="nearest")
    return patch


# ----------------------------------------------------------- keypoint math
def j2d_crop_transform(
    kp2d: jnp.ndarray,  # (B, J, 2+) pixel coords in source image
    center: jnp.ndarray,  # (B, 2)
    bbox_dim: jnp.ndarray,  # (B,)
    augm: dict,
    img_res: int,
) -> jnp.ndarray:
    """Batched ``j2d_processing``: map keypoints through the same crop+rot
    transform and normalise to [-1, 1]."""
    crop_dim = augm["sc"] * bbox_dim * 200.0
    M = crop_transform(center[:, 0], center[:, 1], crop_dim, augm["rot"], img_res)
    # invert the 2x3 dst->src map to get src->dst
    A = M[:, :, :2]
    t = M[:, :, 2]
    A_inv = jnp.linalg.inv(A)
    xy = jnp.einsum("bij,bnj->bni", A_inv, kp2d[..., :2] - t[:, None, :])
    xy_norm = 2.0 * xy / img_res - 1.0
    return jnp.concatenate([xy_norm, kp2d[..., 2:]], axis=-1)


def pose_aug_rotate(pose: jnp.ndarray, rot_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate the global-orient entry of flattened MANO poses (B, 48) by the
    in-plane augmentation rotation (reference ``pose_processing``)."""
    from hands_tpu.core import rot as rotlib

    glob = rotlib.rot_aa(pose[:, :3], rot_deg)
    return jnp.concatenate([glob, pose[:, 3:]], axis=-1)


def jitter_bbox(key: jax.Array, bbox: jnp.ndarray, t_stdev: float = 0.2):
    """Translation-only bbox jitter (reference ``jitter_bbox:463`` — its scale
    jitter is computed then discarded, a quirk we deliberately drop).
    bbox: (B, 4) [x0, y0, w, h]."""
    B = bbox.shape[0]
    wh = bbox[:, 2:]
    center = bbox[:, :2] + wh / 2
    jt = (jax.random.uniform(key, (B, 2)) * 2 - 1) * t_stdev * wh
    new_center = center + jt
    return jnp.concatenate([new_center - wh / 2, wh], axis=-1)


def jitter_intrinsics(key: jax.Array, K: jnp.ndarray,
                      s_stdev: float = 0.5, t_stdev: float = 0.2) -> jnp.ndarray:
    """Batched intrinsics jitter (reference ``jitter_intrinsics``,
    data_utils.py:483): log-uniform focal scale exp(U(-s, s)) applied to
    fx/fy, multiplicative principal-point shift cx *= 1 + U(-t, t)).
    K: (B, 3, 3)."""
    B = K.shape[0]
    ks, kt = jax.random.split(key)
    jitter_s = jnp.exp(jax.random.uniform(ks, (B,)) * s_stdev * 2 - s_stdev)
    jitter_t = jax.random.uniform(kt, (B, 2)) * t_stdev * 2 - t_stdev
    K = K.at[:, 0, 0].multiply(jitter_s)
    K = K.at[:, 1, 1].multiply(jitter_s)
    K = K.at[:, 0, 2].multiply(1.0 + jitter_t[:, 0])
    K = K.at[:, 1, 2].multiply(1.0 + jitter_t[:, 1])
    return K


def crop_and_pad_bbox(
    bbox_xyxy: jnp.ndarray, img_res: int, scale: float = 1.5
) -> jnp.ndarray:
    """Square max-side crop box (reference ``crop_and_pad:495``): centre of
    the bbox, side = max(w, h) * scale; returns clipped [x0, y0, x1, y1]."""
    x0, y0, x1, y1 = (bbox_xyxy[:, i] for i in range(4))
    xm = (x0 + x1) // 2
    ym = (y0 + y1) // 2
    size = jnp.maximum(x1 - x0, y1 - y0) * scale
    out = jnp.stack(
        [xm - size // 2, ym - size // 2, xm + size // 2, ym + size // 2], -1
    )
    return jnp.clip(out, 0, img_res - 1)


def crop_and_pad_images(
    images: jnp.ndarray,  # (B, H, W, C) float [0,1]
    bbox_xyxy: jnp.ndarray,  # (B, 4)
    out_res: int,
    scale: float = 1.5,
    method: str = "bilinear",
) -> jnp.ndarray:
    """Crop the (already-augmented) full patch to the per-hand square box.

    Always axis-aligned -> separable MXU resample (no gathers)."""
    x0, y0, x1, y1 = (bbox_xyxy[:, i] for i in range(4))
    cx = (x0 + x1) / 2.0
    cy = (y0 + y1) / 2.0
    size = jnp.maximum(x1 - x0, y1 - y0) * scale
    out = crop_resize_separable(images, cx, cy, size, out_res, method=method)
    return jnp.clip(out, 0.0, 1.0)


# ------------------------------------------------------------------- KPE
def kpe_center_angles(bbox_xyxy: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(B, 2) ray angles of the crop centre: arctan2(c - pp, f)
    (hands_light_dataset.py:259-266)."""
    center = (bbox_xyxy[:, :2] + bbox_xyxy[:, 2:]) / 2.0
    ax = jnp.arctan2(center[:, 0] - K[:, 0, 2], K[:, 0, 0])
    ay = jnp.arctan2(center[:, 1] - K[:, 1, 2], K[:, 1, 1])
    return jnp.stack([ax, ay], axis=-1)


def kpe_corner_angles(bbox_xyxy: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(B, 8) ray angles of the 4 crop corners, corner-major [x, y] pairs
    (hands_light_dataset.py:270-278)."""
    x0, y0, x1, y1 = (bbox_xyxy[:, i] for i in range(4))
    corners = jnp.stack(
        [
            jnp.stack([x0, y0], -1), jnp.stack([x0, y1], -1),
            jnp.stack([x1, y0], -1), jnp.stack([x1, y1], -1),
        ],
        axis=1,
    )  # (B, 4, 2)
    pp = jnp.stack([K[:, 0, 2], K[:, 1, 2]], -1)[:, None, :]
    f = jnp.stack([K[:, 0, 0], K[:, 1, 1]], -1)[:, None, :]
    return jnp.arctan2(corners - pp, f).reshape(-1, 8)


def kpe_dense_angles(
    bbox_xyxy: jnp.ndarray, K: jnp.ndarray, img_res: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense per-pixel ray angles over each crop, padded to (img_res,
    img_res) with a validity mask (hands_light_dataset.py:282-300).

    TPU-first formulation: instead of the reference's ragged
    (bbox-height x bbox-width) grids scattered into a fixed canvas, sample a
    fixed (img_res x img_res) lattice across the bbox — static shapes, no
    scatter, mask all-ones. Returns angles (B, H, W, 2) NHWC + mask (B, H, W).
    """
    B = bbox_xyxy.shape[0]
    t = jnp.linspace(0.0, 1.0, img_res)
    x0, y0, x1, y1 = (bbox_xyxy[:, i] for i in range(4))
    gx = x0[:, None] + (x1 - x0)[:, None] * t[None, :]  # (B, W)
    gy = y0[:, None] + (y1 - y0)[:, None] * t[None, :]  # (B, H)
    ax = jnp.arctan2(gx[:, None, :] - K[:, 0, 2, None, None], K[:, 0, 0, None, None])
    ay = jnp.arctan2(gy[:, :, None] - K[:, 1, 2, None, None], K[:, 1, 1, None, None])
    ax = jnp.broadcast_to(ax, (B, img_res, img_res))
    ay = jnp.broadcast_to(ay, (B, img_res, img_res))
    angles = jnp.stack([ax, ay], axis=-1)
    return angles, jnp.ones((B, img_res, img_res), jnp.float32)


# ---------------------------------------------------------------- normalise
def normalize_imagenet(images: jnp.ndarray, mean, std) -> jnp.ndarray:
    """[0,1] NHWC -> ImageNet-normalised."""
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


# -------------------------------------------------------------------- PCL
def _pcl_rotation_from_position(pos: jnp.ndarray) -> jnp.ndarray:
    """Virtual-camera rotation looking along the ray through ``pos``
    (PerspectiveCropLayers; reference hands_light_dataset.py:357-366).
    pos: (B, 3) normalised ray directions (z=1). Returns (B, 3, 3)
    R_virt2orig."""
    x, y = pos[:, 0], pos[:, 1]
    n1x = jnp.sqrt(1 + x * x)
    d1x = 1.0 / n1x
    d1xy = 1.0 / jnp.sqrt(1 + x * x + y * y)
    d1xy1x = 1.0 / jnp.sqrt((1 + x * x + y * y) * (1 + x * x))
    zeros = jnp.zeros_like(x)
    R = jnp.stack(
        [d1x, -x * y * d1xy1x, x * d1xy,
         zeros, n1x * d1xy, y * d1xy,
         -x * d1x, -y * d1xy1x, d1xy], axis=-1)
    return R.reshape(-1, 3, 3)


def _pcl_virtual_intrinsics(pos: jnp.ndarray, K: jnp.ndarray,
                            bbox_wh: jnp.ndarray) -> jnp.ndarray:
    """Virtual camera K with focal at the image plane + slant compensation
    (reference ``bK_virt``). Output is in unit [0,1] image coordinates."""
    p_len = jnp.linalg.norm(pos, axis=-1)
    sx = 1.0 / jnp.sqrt(pos[:, 0] ** 2 + pos[:, 2] ** 2)
    sy = jnp.sqrt(pos[:, 0] ** 2 + 1) / jnp.sqrt(
        pos[:, 0] ** 2 + pos[:, 1] ** 2 + 1)
    bbox_comp = bbox_wh * jnp.stack([sx, sy], -1)
    f_orig = jnp.stack([K[:, 0, 0], K[:, 1, 1]], -1)
    f_comp = p_len[:, None] * f_orig / jnp.maximum(bbox_comp, 1e-6)
    B = pos.shape[0]
    Kv = jnp.zeros((B, 3, 3))
    Kv = Kv.at[:, 0, 0].set(f_comp[:, 0])
    Kv = Kv.at[:, 1, 1].set(f_comp[:, 1])
    Kv = Kv.at[:, 0, 2].set(0.5)
    Kv = Kv.at[:, 1, 2].set(0.5)
    Kv = Kv.at[:, 2, 2].set(1.0)
    return Kv


def warp_homography(images: jnp.ndarray, P: jnp.ndarray, out_res: int,
                    unit_grid: bool = True) -> jnp.ndarray:
    """Sample images through a projective map: dst unit coords -> src pixels.

    P: (B, 3, 3) with src_homo = P @ [u, v, 1] for u, v in [0, 1].
    """
    B = images.shape[0]
    t = jnp.linspace(0.0, 1.0, out_res)
    vs, us = jnp.meshgrid(t, t, indexing="ij")
    grid = jnp.stack([us, vs, jnp.ones_like(us)], -1).reshape(-1, 3)  # (P, 3)
    src = jnp.einsum("bij,pj->bpi", P, grid)
    # the -0.5 matches torch grid_sample(align_corners=False) pixel-EDGE
    # normalisation: a projected pixel coordinate p samples source texel
    # p - 0.5 (reference pcl branch, hands_light_dataset.py:417-421, 458)
    sx = src[..., 0] / jnp.maximum(jnp.abs(src[..., 2]), 1e-8) * jnp.sign(
        src[..., 2] + 1e-12) - 0.5
    sy = src[..., 1] / jnp.maximum(jnp.abs(src[..., 2]), 1e-8) * jnp.sign(
        src[..., 2] + 1e-12) - 0.5

    def sample_one(img, sx, sy):
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        v00 = _gather_pixels(img, x0, y0)
        v01 = _gather_pixels(img, x0 + 1, y0)
        v10 = _gather_pixels(img, x0, y0 + 1)
        v11 = _gather_pixels(img, x0 + 1, y0 + 1)
        return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (
            v10 * (1 - fx) + v11 * fx) * fy

    out = jax.vmap(sample_one)(images, sx, sy)
    return out.reshape(B, out_res, out_res, images.shape[-1])


def pcl_crop(
    images: jnp.ndarray,  # (B, H, W, C) the full patch, [0, 1]
    bbox_xyxy: jnp.ndarray,  # (B, 4) hand box in patch pixels
    K: jnp.ndarray,  # (B, 3, 3) patch intrinsics
    out_res: int,
):
    """Perspective-crop-layer resample (reference pcl branch,
    hands_light_dataset.py:354-467): rotate a virtual camera toward the
    hand's ray, build the homography P = K_c @ R_virt2orig @ K_virt^-1 and
    sample. Returns (crops (B, out_res, out_res, C), R_virt2orig (B, 3, 3))
    — the model must rotate its predicted global orient by R."""
    # geometry matmuls must be f32 on TPU — bf16 MXU default rounds the
    # sampling coordinates by ~half a pixel
    with jax.default_matmul_precision("float32"):
        center = (bbox_xyxy[:, :2] + bbox_xyxy[:, 2:]) / 2.0
        wh = jnp.maximum(bbox_xyxy[:, 2:] - bbox_xyxy[:, :2], 1.0)
        size = jnp.maximum(wh[:, 0], wh[:, 1])
        bbox_wh = jnp.stack([size, size], -1)

        K_inv = jnp.linalg.inv(K)
        pos = jnp.einsum("bij,bj->bi", K_inv, to_homo2d(center))
        R = _pcl_rotation_from_position(pos)
        Kv = _pcl_virtual_intrinsics(pos, K, bbox_wh)
        P = K @ R @ jnp.linalg.inv(Kv)
        crops = warp_homography(images, P, out_res)
    return crops, R


def to_homo2d(xy: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


def kpe_center_coords(bbox_xyxy: jnp.ndarray, img_res: int) -> jnp.ndarray:
    """sinusoidal_cc center "angles": normalised crop coords
    ``2*c/img_res - 1`` (hands_light_dataset.py:337-341)."""
    center = (bbox_xyxy[:, :2] + bbox_xyxy[:, 2:]) / 2.0
    return 2.0 * center / img_res - 1.0


def kpe_corner_coords(bbox_xyxy: jnp.ndarray, img_res: int) -> jnp.ndarray:
    """sinusoidal_cc corner "angles": (B, 8) normalised crop coords,
    corner-major [x, y] pairs (hands_light_dataset.py:344-352)."""
    x0, y0, x1, y1 = (bbox_xyxy[:, i] for i in range(4))
    corners = jnp.stack(
        [
            jnp.stack([x0, y0], -1), jnp.stack([x0, y1], -1),
            jnp.stack([x1, y0], -1), jnp.stack([x1, y1], -1),
        ],
        axis=1,
    )  # (B, 4, 2)
    return (2.0 * corners / img_res - 1.0).reshape(-1, 8)


def kpe_camconv_dense(
    bbox_xyxy: jnp.ndarray, K: jnp.ndarray, img_res: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cam_conv 6-channel dense encoding (hands_light_dataset.py:302-333):
    per-pixel [ray angle x/y, pixel offset from principal point x/y,
    centred coord x/y]. Same fixed-lattice reformulation as
    :func:`kpe_dense_angles` (static shapes, mask all-ones). Returns
    (B, H, W, 6) NHWC + mask (B, H, W)."""
    B = bbox_xyxy.shape[0]
    t = jnp.linspace(0.0, 1.0, img_res)
    x0, y0, x1, y1 = (bbox_xyxy[:, i] for i in range(4))
    gx = x0[:, None] + (x1 - x0)[:, None] * t[None, :]  # (B, W)
    gy = y0[:, None] + (y1 - y0)[:, None] * t[None, :]  # (B, H)
    gx = jnp.broadcast_to(gx[:, None, :], (B, img_res, img_res))
    gy = jnp.broadcast_to(gy[:, :, None], (B, img_res, img_res))
    dx = gx - K[:, 0, 2, None, None]
    dy = gy - K[:, 1, 2, None, None]
    ax = jnp.arctan2(dx, K[:, 0, 0, None, None])
    ay = jnp.arctan2(dy, K[:, 1, 1, None, None])
    cxn = 2.0 * gx / img_res - 1.0
    cyn = 2.0 * gy / img_res - 1.0
    enc = jnp.stack([ax, ay, dx, dy, cxn, cyn], axis=-1)
    return enc, jnp.ones((B, img_res, img_res), jnp.float32)
