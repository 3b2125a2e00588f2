"""Fully-fused ViT transformer block as ONE Pallas TPU kernel.

VERDICT r2 #1: the round-2 ceiling decomposition (BENCH_NOTES.md) attributes
~200 ms of the 637 ms ViT-H bs256 forward to activation HBM traffic that XLA
cannot fuse past matmul materialisation points (LN/qkv/attention/MLP-hidden
tensors are 126-504 MB each per block). This kernel keeps the whole block —
LN1 -> qkv -> attention -> proj -> +res -> LN2 -> MLP -> +res — resident in
VMEM per batch tile, with every weight matrix VMEM-resident across the grid
(constant index maps: DMA'd once per block, ~40 MB bf16 vs v5e's 128 MB
VMEM), so per-block HBM traffic collapses to read-x + write-out (~250 MB)
plus one weight stream.

Matches the reference block semantics exactly
(``/root/reference/src/models/hamer_light/vit.py`` Block: pre-LN eps 1e-6,
fused qkv with bias, head_dim^-0.5 scaling, f32 softmax, exact-erf GELU)
with the same bf16 rounding points as the XLA path in
``models/backbones/vit.py:Block`` — parity is asserted at bf16 resolution by
``tests/test_vit_block_pallas.py``.

Inference-only (no custom VJP): training keeps the XLA block, whose
backward composes with remat/scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layernorm_f32(x32, scale, bias, eps=1e-6):
    # flax nn.LayerNorm semantics to the f32 rounding order: fast variance
    # (var = max(0, E[x^2] - E[x]^2)) and mul = rsqrt(var+eps)*scale applied
    # as ONE multiplier (flax _normalize folds scale into mul before the
    # elementwise multiply — a different order flips bf16 ulps downstream)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    mul = jax.lax.rsqrt(var + eps) * scale
    return (x32 - mu) * mul + bias


def _erfc_f32(u):
    """f32 erfc via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7 — below
    bf16 resolution), cancellation-free on both signs: for u >= 0 the
    polynomial IS erfc; for u < 0 use 2 - erfc(-u). Mosaic has no erf/erfc
    lowering (only erf_inv), so the kernel cannot call jax.nn.gelu's exact
    path (it lowers to an `erfc` primitive); exp IS lowered."""
    a = jnp.abs(u)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    pe = poly * jnp.exp(-a * a)
    return jnp.where(u >= 0, pe, 2.0 - pe)


def _gelu_mosaic(x, fast: bool):
    """GELU usable inside a Mosaic kernel. fast=True: the tanh approximation
    (tanh lowers natively — identical to jax.nn.gelu(approximate=True)).
    fast=False: exact erfc-form (the same formulation jax.nn.gelu lowers to:
    0.5*x*erfc(-x/sqrt2)) computed in f32 via _erfc_f32; differs from XLA's
    erfc by <=1 bf16 ulp wherever |gelu| is non-negligible
    (tests/test_vit_block_pallas.py::test_mosaic_gelu)."""
    if fast:
        return jax.nn.gelu(x, approximate=True)
    # mimic jax.nn.gelu's exact lowering op-for-op (mul 0.5x; d = -x/sqrt2;
    # e = erfc(d); out = 0.5x * e) INCLUDING its bf16 intermediate
    # roundings, so outputs agree except where the 1.5e-7 polynomial error
    # crosses a rounding boundary
    half_x = jnp.asarray(0.5, x.dtype) * x
    d = (-x) * jnp.asarray(2.0**-0.5, x.dtype)
    e = _erfc_f32(d.astype(jnp.float32)).astype(x.dtype)
    return half_x * e


def block_math(x, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
               ln2_s, ln2_b, w1, b1, w2, b2,
               *, num_heads: int, fast_gelu: bool):
    """The whole block on plain arrays — called by the Pallas kernel body,
    and directly unit-testable: composed of exactly the ops (and bf16
    rounding points) the XLA path emits, so it matches the Flax Block
    bit-for-bit (tests/test_vit_block_pallas.py asserts 0 diff)."""
    TB, N, C = x.shape
    H = num_heads
    D = C // H
    bf16 = jnp.bfloat16

    # all ops stay 3-D (TB, N, C), matching the Flax block's dot_general
    # layouts exactly — a (rows, C) reshape changes f32 accumulation tiling
    # and costs occasional 1-ulp bf16 flips
    x32 = x.astype(jnp.float32)

    # ---- LN1 (f32, like nn.LayerNorm(dtype=f32)) -> bf16 for the MXU
    y = _layernorm_f32(x32, ln1_s, ln1_b).astype(bf16)

    # ---- fused qkv projection (one MXU matmul; bf16 output with f32
    # internal accumulation = the exact nn.Dense lowering; an explicit
    # f32-output-then-round picks a different accumulation split on the CPU
    # backend and costs 1-ulp flips)
    def matmul(a, b):
        return jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=bf16)

    qkv = matmul(y, wqkv)
    qkv = qkv + bqkv.astype(bf16)  # nn.Dense rounding point
    qkv = qkv.reshape(TB, N, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (TB, N, H, D)

    # ---- attention: verbatim the XLA path's einsums/rounding points
    # (models/backbones/vit.py Attention with an f32 input: the logits
    # einsum emits bf16 before the f32 softmax; the probs stay f32 because
    # `attn.astype(x.dtype)` casts to the f32 LayerNorm output dtype; the
    # p@v einsum promotes v to f32 and its output is only rounded to bf16
    # inside the proj Dense) — bit-parity with the compiled block
    scale = D**-0.5
    s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v)
    o = o.reshape(TB, N, C).astype(bf16)  # proj Dense input promotion

    # ---- proj + residual
    def dense(t, w, b):
        return matmul(t, w) + b.astype(bf16)

    x1 = x + dense(o, wproj, bproj)  # bf16 residual, same as the XLA path

    # ---- LN2 + MLP
    y2 = _layernorm_f32(x1.astype(jnp.float32), ln2_s, ln2_b).astype(bf16)
    h = dense(y2, w1, b1)
    h = jax.nn.gelu(h, approximate=fast_gelu)
    return x1 + dense(h, w2, b2)


def _vit_block_kernel(
    x_ref, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
    ln2_s, ln2_b, w1, b1, w2, b2, out_ref, o_scratch,
    *, num_heads: int, fast_gelu: bool,
):
    """Mosaic-native body: same math/rounding points as ``block_math`` but
    restricted to what tpu.matmul/vector-layout supports — 32-bit dot
    accumulators (f32 out + one bf16 round = the MXU's own bf16-dot
    behaviour), no lane-splitting head reshapes (static 80-wide lane slices
    per head, results written into a VMEM scratch), erfc-free exact GELU
    (``_gelu_mosaic``)."""
    TB, N, C = x_ref.shape
    H = num_heads
    D = C // H
    bf16 = jnp.bfloat16

    def matmul_bf16(a, b):
        r = jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return r.astype(bf16)

    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    y = _layernorm_f32(x32, ln1_s[:], ln1_b[:]).astype(bf16)
    qkv = matmul_bf16(y, wqkv[:]) + bqkv[:].astype(bf16)  # (TB, N, 3C)

    scale = D**-0.5
    for h in range(H):
        qh = qkv[:, :, h * D:(h + 1) * D] * jnp.asarray(scale, bf16)
        kh = qkv[:, :, C + h * D:C + (h + 1) * D]
        vh = qkv[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        sh = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (TB, N, N)
        sh = sh.astype(bf16).astype(jnp.float32)  # XLA's bf16 logits point
        ph = jax.nn.softmax(sh, axis=-1)
        # probs stay f32 in the XLA path; f32 x f32 keeps Mosaic's 32-bit
        # accumulator requirement
        oh = jax.lax.dot_general(
            ph, vh.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (TB, N, D)
        o_scratch[:, :, h * D:(h + 1) * D] = oh.astype(bf16)

    x1 = x + (matmul_bf16(o_scratch[:], wproj[:])
              + bproj[:].astype(bf16))
    y2 = _layernorm_f32(x1.astype(jnp.float32), ln2_s[:], ln2_b[:]).astype(bf16)
    hmid = _gelu_mosaic(matmul_bf16(y2, w1[:]) + b1[:].astype(bf16),
                        fast_gelu)
    out_ref[:] = x1 + (matmul_bf16(hmid, w2[:])
                        + b2[:].astype(bf16))


def _quant_rows_f32(a32):
    """Symmetric per-row dynamic int8 quantisation of a 2-D f32 tensor.

    Per-row (= per-token here: every row is one token's channel vector)
    scales track the activation range far tighter than Int8Dense's
    per-tensor scale (models/backbones/vit.py) — LayerNorm outputs are
    zero-mean/unit-var per token, so row maxima are well-conditioned."""
    s = jnp.max(jnp.abs(a32), axis=-1, keepdims=True) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(a32 / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _int8_dot(q, s_rows, wq, ws_cols):
    """(R,K)i8 x (K,M)i8 -> i32 on the MXU's int8 path (2x bf16 peak on
    v5e), dequantised to f32 with the row/column scales."""
    r = jax.lax.dot_general(
        q, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return r.astype(jnp.float32) * s_rows * ws_cols


def _vit_block_int8_kernel(
    x_ref, ln1_s, ln1_b, wqkv_q, sqkv, bqkv, wproj_q, sproj, bproj,
    ln2_s, ln2_b, w1_q, s1, b1, w2_q, s2, b2, out_ref, o_scratch,
    *, num_heads: int, fast_gelu: bool,
):
    """W8A8 variant of ``_vit_block_kernel``: the four dense matmuls
    (qkv/proj/MLP — ~97.5% of block FLOPs) run int8 x int8 -> int32 with
    per-output-channel weight scales and per-token dynamic activation
    scales; attention stays bf16/f32 (2.5% of FLOPs, and logits/probs
    precision matters there). Lossy by construction — serving mode, the
    bf16 kernel remains the parity path."""
    TB, N, C = x_ref.shape
    H = num_heads
    D = C // H
    R = TB * N
    bf16 = jnp.bfloat16

    x = x_ref[:]
    x32 = x.astype(jnp.float32).reshape(R, C)

    # ---- LN1 -> int8 qkv
    y32 = _layernorm_f32(x32, ln1_s[:], ln1_b[:])
    qy, sy = _quant_rows_f32(y32)
    qkv = (_int8_dot(qy, sy, wqkv_q[:], sqkv[:]) + bqkv[:]) \
        .astype(bf16).reshape(TB, N, 3 * C)

    # ---- attention (bf16 MXU, f32 softmax) — same as the bf16 kernel
    scale = D**-0.5
    for h in range(H):
        qh = qkv[:, :, h * D:(h + 1) * D] * jnp.asarray(scale, bf16)
        kh = qkv[:, :, C + h * D:C + (h + 1) * D]
        vh = qkv[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        sh = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ph = jax.nn.softmax(sh, axis=-1)
        oh = jax.lax.dot_general(
            ph, vh.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_scratch[:, :, h * D:(h + 1) * D] = oh.astype(bf16)

    # ---- int8 proj + residual
    qo, so = _quant_rows_f32(o_scratch[:].astype(jnp.float32).reshape(R, C))
    x1 = x32 + _int8_dot(qo, so, wproj_q[:], sproj[:]) + bproj[:]

    # ---- LN2 + int8 MLP
    y2 = _layernorm_f32(x1, ln2_s[:], ln2_b[:])
    qy2, sy2 = _quant_rows_f32(y2)
    hmid = _gelu_mosaic(
        _int8_dot(qy2, sy2, w1_q[:], s1[:]) + b1[:], fast_gelu)
    qh, shs = _quant_rows_f32(hmid)
    out = x1 + _int8_dot(qh, shs, w2_q[:], s2[:]) + b2[:]
    out_ref[:] = out.reshape(TB, N, C).astype(bf16)


def quantize_weight_int8(w):
    """f32/bf16 (K, M) weight -> (int8 (K, M), f32 (M,)) per-output-channel
    symmetric scales. Same convention as Int8Dense
    (models/backbones/vit.py)."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=0) / 127.0 + 1e-12
    return jnp.round(w32 / s).astype(jnp.int8), s


def _quant_static(a32):
    """Quantise an f32 tensor already expressed in the quantised domain
    (the static 1/scale is folded into the producing op): bare
    round/clip/cast — no reduce, no rescale."""
    return jnp.clip(jnp.round(a32), -127.0, 127.0).astype(jnp.int8)


def _vit_block_int8_static_kernel(
    x_ref, ln1_s, ln1_b, wqkv_q, dqkv, bqkv, inv_proj, wproj_q, dproj,
    bproj, ln2_s, ln2_b, w1_q, d1, b1, inv_mlp2, w2_q, d2, b2,
    out_ref, o_scratch,
    *, num_heads: int, fast_gelu: bool,
):
    """Static-calibrated W8A8 variant of ``_vit_block_int8_kernel``.

    VERDICT r3 #1: the dynamic kernel burns VPU/HBM on a per-token max-abs
    reduce + per-row rescale at each of the four quantisation points. Here
    the per-CHANNEL activation scales come from offline calibration
    (``models/backbones/vit.py`` sow points + ``ops/calibration.py``) and
    are folded OUTSIDE the kernel:

    - qkv / MLP-in: 1/s is folded into the producing LayerNorm's
      scale+bias, so the LN output lands directly in the quantised domain
      (quantisation = one round/clip/cast, nothing else);
    - attention-out / GELU-out: 1/s is a per-channel vector multiply
      (replacing the dynamic reduce+divide);
    - the dequant side absorbs diag(s_act) into the weight matrix before
      per-output-channel weight quantisation (done in the wrapper), so the
      epilogue stays one per-column multiply — identical to the dynamic
      kernel's weight-scale multiply.

    Net in-kernel cost per dense op: round+clip+cast (and one broadcast
    multiply for the two non-LN points) — the minimum any int8 path pays.

    Further cost choices vs the dynamic kernel (each measured on-chip,
    BENCH_NOTES "static int8"):
    - bf16 residual stream (like the bf16 PARITY kernel's rounding points;
      the dynamic kernel kept it f32) — halves the (R, C) VPU/VMEM
      traffic at every residual/LN touch,
    - probs cast to bf16 for the p@v dot (full-rate MXU instead of the
      f32 unit; probs are in [0,1], quantisation noise dominates),
    - attention output quantised per-head AT THE WRITE (int8 scratch,
      1/2 the bf16 scratch bytes; the per-channel 1/s rides the same
      write).
    """
    TB, N, C = x_ref.shape
    H = num_heads
    D = C // H
    R = TB * N
    bf16 = jnp.bfloat16

    def idot(q, wq_ref, dq_ref, b_ref):
        acc = jax.lax.dot_general(
            q, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * dq_ref[:] + b_ref[:]

    x = x_ref[:]
    x32 = x.astype(jnp.float32).reshape(R, C)

    # ---- LN1 (scale/bias pre-divided by s_qkv) -> already-quantised domain
    qy = _quant_static(_layernorm_f32(x32, ln1_s[:], ln1_b[:]))
    qkv = idot(qy, wqkv_q, dqkv, bqkv).astype(bf16).reshape(TB, N, 3 * C)

    # ---- attention (bf16 MXU logits + p@v, f32 softmax)
    scale = D**-0.5
    inv_proj_f = inv_proj[:]
    for h in range(H):
        qh = qkv[:, :, h * D:(h + 1) * D] * jnp.asarray(scale, bf16)
        kh = qkv[:, :, C + h * D:C + (h + 1) * D]
        vh = qkv[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
        sh = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ph = jax.nn.softmax(sh, axis=-1).astype(bf16)
        oh = jax.lax.dot_general(
            ph, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # quantise at the write: per-channel 1/s folded into the store
        o_scratch[:, :, h * D:(h + 1) * D] = _quant_static(
            oh * inv_proj_f[h * D:(h + 1) * D])

    # ---- int8 proj + bf16 residual (the bf16 kernel's rounding point)
    qo = o_scratch[:].reshape(R, C)
    x1 = x + idot(qo, wproj_q, dproj, bproj) \
        .astype(bf16).reshape(TB, N, C)

    # ---- LN2 (pre-scaled) + int8 MLP
    x1_32 = x1.astype(jnp.float32).reshape(R, C)
    qy2 = _quant_static(_layernorm_f32(x1_32, ln2_s[:], ln2_b[:]))
    hmid = _gelu_mosaic(idot(qy2, w1_q, d1, b1), fast_gelu)
    qh = _quant_static(hmid * inv_mlp2[:])
    out = x1 + idot(qh, w2_q, d2, b2).astype(bf16).reshape(TB, N, C)
    out_ref[:] = out


def _pick_tile(B: int) -> int:
    # TB=8 is the measured optimum (BENCH_NOTES "Block tile sweep": int8
    # 8.99 ms vs 9.35 at TB=4; TB=16 no longer closes against VMEM)
    for tb in (8, 4, 2):
        if B % tb == 0:
            return tb
    return 1


@functools.partial(
    jax.jit, static_argnames=("num_heads", "fast_gelu", "interpret", "tile"))
def vit_block_fused(x, params, *, num_heads: int, fast_gelu: bool = False,
                    interpret: bool = False, tile: int | None = None):
    """Run one full transformer block as a single Pallas kernel.

    x: (B, N, C) bf16 tokens. params: dict with ln1_scale/ln1_bias/
    wqkv/bqkv/wproj/bproj/ln2_scale/ln2_bias/w1/b1/w2/b2 (f32 — cast to
    bf16 here, outside the kernel, so the in-kernel weight residency is
    half-size).
    """
    B, N, C = x.shape
    TB = tile if tile is not None else _pick_tile(B)
    assert B % TB == 0, (B, TB)
    bf16 = jnp.bfloat16
    x = x.astype(bf16)

    # matmul weights/biases go to bf16 (the nn.Dense promotion); LayerNorm
    # scale/bias stay f32 (nn.LayerNorm(dtype=f32) keeps them f32)
    p = {k: (v.astype(jnp.float32) if k.startswith("ln")
             else v.astype(bf16)) for k, v in params.items()}
    hidden = p["w1"].shape[1]

    def vec_spec(n):
        return pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)

    def mat_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    flops_mat = 2 * B * N * C * (3 * C + C + 2 * hidden) \
        + 4 * B * N * N * C
    kernel = functools.partial(
        _vit_block_kernel, num_heads=num_heads, fast_gelu=fast_gelu)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), bf16),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec(C), vec_spec(C),                    # ln1
            mat_spec((C, 3 * C)), vec_spec(3 * C),       # qkv
            mat_spec((C, C)), vec_spec(C),               # proj
            vec_spec(C), vec_spec(C),                    # ln2
            mat_spec((C, hidden)), vec_spec(hidden),     # mlp in
            mat_spec((hidden, C)), vec_spec(C),          # mlp out
        ],
        out_specs=pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TB, N, C), bf16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_mat,
            bytes_accessed=2 * B * N * C * 2 + 2 * sum(
                int(v.size) for v in p.values()),
            transcendentals=B * N * (hidden + N * num_heads),
        ),
        interpret=interpret,
    )(
        x, p["ln1_scale"], p["ln1_bias"], p["wqkv"], p["bqkv"],
        p["wproj"], p["bproj"], p["ln2_scale"], p["ln2_bias"],
        p["w1"], p["b1"], p["w2"], p["b2"],
    )


def _block_xla_flat(x, params, *, num_heads: int, fast_gelu: bool):
    """The XLA path with ``vit_block_fused``'s exact dtype prep — the
    differentiable twin of the kernel (block_math == Flax Block
    bit-for-bit, see tests)."""
    p = {k: (v.astype(jnp.float32) if k.startswith("ln")
             else v.astype(jnp.bfloat16)) for k, v in params.items()}
    return block_math(
        x.astype(jnp.bfloat16), p["ln1_scale"], p["ln1_bias"], p["wqkv"],
        p["bqkv"], p["wproj"], p["bproj"], p["ln2_scale"], p["ln2_bias"],
        p["w1"], p["b1"], p["w2"], p["b2"],
        num_heads=num_heads, fast_gelu=fast_gelu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def vit_block_fused_trainable(x, params, num_heads, fast_gelu=False,
                              interpret=False):
    """``vit_block_fused`` with a custom VJP: TRAINING-SAFE.

    Forward: the fused Pallas kernel (1.42x the XLA block on-chip).
    Backward: recompute through ``_block_xla_flat`` (bit-identical math to
    the Flax Block) and take XLA's own gradients — exactly the gradients
    the XLA block would produce, at the cost of one XLA forward recompute
    in the backward pass.

    This makes the fused block *block-granular rematerialisation by
    construction*: only (x, params) are saved between fwd and bwd, the
    same residuals ``jax.checkpoint`` would keep — so use it WITHOUT
    nn.remat (remat on top would run the fused forward a second time for
    nothing). Per-block training cost: fused-fwd + XLA-fwd + XLA-bwd,
    vs remat's XLA-fwd x2 + XLA-bwd.
    """
    return vit_block_fused(x, params, num_heads=num_heads,
                           fast_gelu=fast_gelu, interpret=interpret)


def _trainable_fwd(x, params, num_heads, fast_gelu, interpret):
    out = vit_block_fused(x, params, num_heads=num_heads,
                          fast_gelu=fast_gelu, interpret=interpret)
    return out, (x, params)


def _trainable_bwd(num_heads, fast_gelu, interpret, res, g):
    x, params = res
    _, vjp = jax.vjp(
        functools.partial(_block_xla_flat, num_heads=num_heads,
                          fast_gelu=fast_gelu), x, params)
    return vjp(g.astype(jnp.bfloat16))


vit_block_fused_trainable.defvjp(_trainable_fwd, _trainable_bwd)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "fast_gelu", "interpret", "tile"))
def vit_block_fused_int8(x, params, *, num_heads: int,
                         fast_gelu: bool = False, interpret: bool = False,
                         tile: int | None = None):
    """W8A8 serving variant of ``vit_block_fused``.

    Same param dict; weights are quantised to int8 (per-output-channel
    scales) in XLA just outside the kernel — negligible next to the
    matmuls, and the int8 weight residency halves the per-block VMEM
    weight stream (~20 MB vs ~40 MB bf16). Activations are quantised
    per-token inside the kernel. Lossy: use for throughput-critical
    serving; accuracy deltas are characterised in BENCH_NOTES.md."""
    B, N, C = x.shape
    TB = tile if tile is not None else _pick_tile(B)
    assert B % TB == 0, (B, TB)
    bf16 = jnp.bfloat16
    x = x.astype(bf16)

    wqkv_q, sqkv = quantize_weight_int8(params["wqkv"])
    wproj_q, sproj = quantize_weight_int8(params["wproj"])
    w1_q, s1 = quantize_weight_int8(params["w1"])
    w2_q, s2 = quantize_weight_int8(params["w2"])
    f32 = jnp.float32
    hidden = w1_q.shape[1]

    def vec_spec(n):
        return pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)

    def mat_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    flops_mat = 2 * B * N * C * (3 * C + C + 2 * hidden) \
        + 4 * B * N * N * C
    kernel = functools.partial(
        _vit_block_int8_kernel, num_heads=num_heads, fast_gelu=fast_gelu)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), bf16),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec(C), vec_spec(C),                          # ln1
            mat_spec((C, 3 * C)), vec_spec(3 * C), vec_spec(3 * C),  # qkv
            mat_spec((C, C)), vec_spec(C), vec_spec(C),        # proj
            vec_spec(C), vec_spec(C),                          # ln2
            mat_spec((C, hidden)), vec_spec(hidden), vec_spec(hidden),
            mat_spec((hidden, C)), vec_spec(C), vec_spec(C),   # mlp out
        ],
        out_specs=pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TB, N, C), bf16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_mat,
            bytes_accessed=2 * B * N * C * 2
            + sum(int(w.size) for w in (wqkv_q, wproj_q, w1_q, w2_q)),
            transcendentals=B * N * (hidden + N * num_heads),
        ),
        interpret=interpret,
    )(
        x,
        params["ln1_scale"].astype(f32), params["ln1_bias"].astype(f32),
        wqkv_q, sqkv, params["bqkv"].astype(f32),
        wproj_q, sproj, params["bproj"].astype(f32),
        params["ln2_scale"].astype(f32), params["ln2_bias"].astype(f32),
        w1_q, s1, params["b1"].astype(f32),
        w2_q, s2, params["b2"].astype(f32),
    )


def fold_static_scales(params: dict, act_scales: dict) -> dict:
    """Fold per-channel static activation scales into the block operands.

    ``act_scales``: dict with keys ``qkv`` (C,), ``proj`` (C,), ``mlp1``
    (C,), ``mlp2`` (hidden,) — f32 scales (quantised value = x / s), from
    ``ops/calibration.py``. Returns the flat operand dict
    ``vit_block_fused_int8_static`` consumes:

    - LN scale/bias divided by the consumer's activation scale (the LN
      output lands in the quantised domain),
    - weights premultiplied by diag(s_act) along the contraction axis,
      THEN weight-quantised per output channel (so the activation scales
      ride the existing per-column dequant multiply — zero extra epilogue
      cost, and per-channel activation granularity instead of the dynamic
      kernel's per-token or Int8Dense's per-tensor),
    - 1/s vectors for the two points whose producer is not a LayerNorm
      (attention-out, GELU-out).

    All pure elementwise/weight-sized ops: jit once with the weights and
    the result is reusable across serving calls (``prepare`` once), or
    leave inline and XLA recomputes ~100 MB of elementwise per block per
    batch — measured immaterial at bs256 next to the matmuls.
    """
    f32 = jnp.float32
    s_qkv = act_scales["qkv"].astype(f32)
    s_proj = act_scales["proj"].astype(f32)
    s_mlp1 = act_scales["mlp1"].astype(f32)
    s_mlp2 = act_scales["mlp2"].astype(f32)

    def absorb(w, s_in):
        return quantize_weight_int8(w.astype(f32) * s_in[:, None])

    wqkv_q, dqkv = absorb(params["wqkv"], s_qkv)
    wproj_q, dproj = absorb(params["wproj"], s_proj)
    w1_q, d1 = absorb(params["w1"], s_mlp1)
    w2_q, d2 = absorb(params["w2"], s_mlp2)
    return {
        "ln1_s": params["ln1_scale"].astype(f32) / s_qkv,
        "ln1_b": params["ln1_bias"].astype(f32) / s_qkv,
        "wqkv_q": wqkv_q, "dqkv": dqkv,
        "bqkv": params["bqkv"].astype(f32),
        "inv_proj": 1.0 / s_proj,
        "wproj_q": wproj_q, "dproj": dproj,
        "bproj": params["bproj"].astype(f32),
        "ln2_s": params["ln2_scale"].astype(f32) / s_mlp1,
        "ln2_b": params["ln2_bias"].astype(f32) / s_mlp1,
        "w1_q": w1_q, "d1": d1, "b1": params["b1"].astype(f32),
        "inv_mlp2": 1.0 / s_mlp2,
        "w2_q": w2_q, "d2": d2, "b2": params["b2"].astype(f32),
    }


@functools.partial(
    jax.jit, static_argnames=("num_heads", "fast_gelu", "interpret", "tile"))
def vit_block_fused_int8_static(x, params, act_scales, *, num_heads: int,
                                fast_gelu: bool = False,
                                interpret: bool = False,
                                tile: int | None = None):
    """Static-calibrated W8A8 serving block (VERDICT r3 #1).

    Same param dict as ``vit_block_fused``; ``act_scales`` holds the four
    calibrated per-channel activation scale vectors (see
    ``fold_static_scales``). All folding happens in XLA outside the
    kernel; in-kernel quantisation is a bare round/clip/cast."""
    B, N, C = x.shape
    TB = tile if tile is not None else _pick_tile(B)
    assert B % TB == 0, (B, TB)
    bf16 = jnp.bfloat16
    x = x.astype(bf16)

    op = fold_static_scales(params, act_scales)
    hidden = op["w1_q"].shape[1]

    def vec_spec(n):
        return pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)

    def mat_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    flops_mat = 2 * B * N * C * (3 * C + C + 2 * hidden) \
        + 4 * B * N * N * C
    kernel = functools.partial(
        _vit_block_int8_static_kernel, num_heads=num_heads,
        fast_gelu=fast_gelu)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), bf16),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec(C), vec_spec(C),                          # ln1'
            mat_spec((C, 3 * C)), vec_spec(3 * C), vec_spec(3 * C),  # qkv
            vec_spec(C),                                       # inv_proj
            mat_spec((C, C)), vec_spec(C), vec_spec(C),        # proj
            vec_spec(C), vec_spec(C),                          # ln2'
            mat_spec((C, hidden)), vec_spec(hidden), vec_spec(hidden),
            vec_spec(hidden),                                  # inv_mlp2
            mat_spec((hidden, C)), vec_spec(C), vec_spec(C),   # mlp out
        ],
        out_specs=pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TB, N, C), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_mat,
            bytes_accessed=2 * B * N * C * 2 + sum(
                int(op[k].size) for k in ("wqkv_q", "wproj_q", "w1_q",
                                          "w2_q")),
            transcendentals=B * N * (hidden + N * num_heads),
        ),
        interpret=interpret,
    )(
        x,
        op["ln1_s"], op["ln1_b"], op["wqkv_q"], op["dqkv"], op["bqkv"],
        op["inv_proj"], op["wproj_q"], op["dproj"], op["bproj"],
        op["ln2_s"], op["ln2_b"], op["w1_q"], op["d1"], op["b1"],
        op["inv_mlp2"], op["w2_q"], op["d2"], op["b2"],
    )


def block_int8_static_xla(x, params, act_scales, *, num_heads: int,
                          fast_gelu: bool = False):
    """Pure-XLA twin of ``vit_block_fused_int8_static`` — same folded
    operands, same quantisation points and rounding order. Used by the
    parity tests (kernel vs twin must agree exactly in interpret mode) and
    as the CPU fallback."""
    B, N, C = x.shape
    H = num_heads
    D = C // H
    R = B * N
    bf16 = jnp.bfloat16
    op = fold_static_scales(params, act_scales)

    def idot(q, wq):
        return jax.lax.dot_general(
            q, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)

    x = x.astype(bf16)
    x32 = x.astype(jnp.float32).reshape(R, C)
    qy = _quant_static(_layernorm_f32(x32, op["ln1_s"], op["ln1_b"]))
    qkv = (idot(qy, op["wqkv_q"]) * op["dqkv"] + op["bqkv"]) \
        .astype(bf16).reshape(B, N, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bnhd,bmhd->bhnm", q * jnp.asarray(D**-0.5, bf16), k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(bf16)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v,
                   preferred_element_type=jnp.float32)
    qo = _quant_static(o.reshape(R, C) * op["inv_proj"])
    x1 = x.reshape(R, C) + (idot(qo, op["wproj_q"]) * op["dproj"]
                            + op["bproj"]).astype(bf16)
    qy2 = _quant_static(_layernorm_f32(
        x1.astype(jnp.float32), op["ln2_s"], op["ln2_b"]))
    hmid = _gelu_mosaic(idot(qy2, op["w1_q"]) * op["d1"] + op["b1"],
                        fast_gelu)
    qh = _quant_static(hmid * op["inv_mlp2"])
    out = x1 + (idot(qh, op["w2_q"]) * op["d2"] + op["b2"]).astype(bf16)
    return out.reshape(B, N, C)


def block_params_from_flax(block_params: dict) -> dict:
    """Map a Flax Block param subtree (models/backbones/vit.py naming) to the
    flat dict ``vit_block_fused`` takes."""
    return {
        "ln1_scale": block_params["norm1"]["scale"],
        "ln1_bias": block_params["norm1"]["bias"],
        "wqkv": block_params["attn"]["qkv"]["kernel"],
        "bqkv": block_params["attn"]["qkv"]["bias"],
        "wproj": block_params["attn"]["proj"]["kernel"],
        "bproj": block_params["attn"]["proj"]["bias"],
        "ln2_scale": block_params["norm2"]["scale"],
        "ln2_bias": block_params["norm2"]["bias"],
        "w1": block_params["mlp"]["Dense_0"]["kernel"],
        "b1": block_params["mlp"]["Dense_0"]["bias"],
        "w2": block_params["mlp"]["Dense_1"]["kernel"],
        "b2": block_params["mlp"]["Dense_1"]["bias"],
    }
