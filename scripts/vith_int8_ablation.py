"""In-kernel ablation of the static-int8 fused ViT block (VERDICT r3 #1).

The static-calibrated W8A8 kernel measures ~8.2 ms/block at ViT-H bs256
while its int8 matmul roofline is ~4.9 ms — ~3.3 ms/block of non-matmul
time. This probe times knock-out variants of the kernel (each piece
replaced by the cheapest shape-preserving stand-in) so the gap can be
attributed op-class by op-class instead of guessed:

  full        the production static kernel (baseline)
  no_ln       LayerNorms -> plain per-channel multiply (no mean/var reduce)
  no_quant    round/clip -> bare cast (quantisation arithmetic cost)
  no_gelu     GELU -> identity (transcendental cost, MLP-hidden width)
  no_softmax  softmax -> scaled bf16 cast of the logits (exp + reduces)
  no_attn     whole attention chain skipped (o_scratch <- cheap cast)
  attn_i8     attention dots int8 (q@k and p@v on the int8 MXU path,
              fixed probe scales — timing only, NOT an accuracy claim)
  attn_merged head python-loop -> one (TB*H)-batched dot pair (relayout
              cost vs loop-of-small-dots cost)
  mm_only     4 int8 dots back-to-back, nothing else (the MXU floor)

Numbers land in BENCH_NOTES.md "static int8".

  python scripts/vith_int8_ablation.py [--batch 256] [--iters 30]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hands_tpu.ops.vit_block_pallas import (  # noqa: E402
    _gelu_mosaic, _layernorm_f32, _quant_static, fold_static_scales)
from scripts.vith_tile_autotune import bench, make_params  # noqa: E402


def _ablation_kernel(
    x_ref, ln1_s, ln1_b, wqkv_q, dqkv, bqkv, inv_proj, wproj_q, dproj,
    bproj, ln2_s, ln2_b, w1_q, d1, b1, inv_mlp2, w2_q, d2, b2,
    out_ref, o_scratch,
    *, num_heads: int, fast_gelu: bool, mode: str,
):
    """The static kernel body with one piece knocked out per `mode`.
    Dataflow/shapes/dtypes match the production kernel exactly; only the
    knocked-out op is replaced by its cheapest stand-in."""
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

    def ln(x32, s_ref, b_ref):
        if mode == "no_ln":
            return x32 * s_ref[:] + b_ref[:]
        return _layernorm_f32(x32, s_ref[:], b_ref[:])

    def quant(a32):
        if mode == "no_quant":
            return a32.astype(jnp.int8)
        return _quant_static(a32)

    def gelu(a):
        if mode == "no_gelu":
            return a
        return _gelu_mosaic(a, fast_gelu)

    x = x_ref[:]

    if mode == "mm_only":
        # 4 int8 dots back-to-back: the MXU floor. Chained via bare casts
        # so nothing can be dead-code-eliminated.
        q0 = x.astype(jnp.float32).reshape(R, C).astype(jnp.int8)
        a = idot(q0, wqkv_q, dqkv, bqkv)
        q1 = a[:, :C].astype(jnp.int8)
        b = idot(q1, wproj_q, dproj, bproj)
        q2 = b.astype(jnp.int8)
        c = idot(q2, w1_q, d1, b1)
        q3 = c.astype(jnp.int8)
        d = idot(q3, w2_q, d2, b2)
        out_ref[:] = d.astype(bf16).reshape(TB, N, C)
        return

    x32 = x.astype(jnp.float32).reshape(R, C)
    qy = quant(ln(x32, ln1_s, ln1_b))
    qkv = idot(qy, wqkv_q, dqkv, bqkv).astype(bf16).reshape(TB, N, 3 * C)

    scale = D**-0.5
    inv_proj_f = inv_proj[:]
    if mode == "no_attn":
        o_scratch[:] = quant(
            qkv[:, :, :C].astype(jnp.float32) * inv_proj_f)
    elif mode == "attn_merged":
        # one batched dot pair over TB*H instead of a python loop of H
        # small dots (costs head transposes/relayouts instead)
        qkv4 = qkv.reshape(TB, N, 3, H, D)
        qm = jnp.transpose(qkv4[:, :, 0], (0, 2, 1, 3)) \
            .reshape(TB * H, N, D) * jnp.asarray(scale, bf16)
        km = jnp.transpose(qkv4[:, :, 1], (0, 2, 1, 3)).reshape(TB * H, N, D)
        vm = jnp.transpose(qkv4[:, :, 2], (0, 2, 1, 3)).reshape(TB * H, N, D)
        sm = jax.lax.dot_general(
            qm, km, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        pm = jax.nn.softmax(sm, axis=-1).astype(bf16)
        om = jax.lax.dot_general(
            pm, vm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (TB*H, N, D)
        oh = jnp.transpose(om.reshape(TB, H, N, D), (0, 2, 1, 3)) \
            .reshape(TB, N, C)
        o_scratch[:] = quant(oh * inv_proj_f)
    elif mode == "attn_i8":
        # int8 MXU attention dots with fixed probe scales (timing only)
        qs = jnp.float32(0.05)
        for h in range(H):
            qh = quant(qkv[:, :, h * D:(h + 1) * D]
                       .astype(jnp.float32) * (scale / qs))
            kh = quant(qkv[:, :, C + h * D:C + (h + 1) * D]
                       .astype(jnp.float32) * (1.0 / qs))
            vh = quant(qkv[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
                       .astype(jnp.float32) * (1.0 / qs))
            sh = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32) \
                * (qs * qs)
            ph = jax.nn.softmax(sh, axis=-1)
            pq = quant(ph * 127.0)  # probs in [0,1] -> full int8 range
            oh = jax.lax.dot_general(
                pq, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32) \
                * (qs / 127.0)
            o_scratch[:, :, h * D:(h + 1) * D] = quant(
                oh * inv_proj_f[h * D:(h + 1) * D])
    else:
        for h in range(H):
            qh = qkv[:, :, h * D:(h + 1) * D] * jnp.asarray(scale, bf16)
            kh = qkv[:, :, C + h * D:C + (h + 1) * D]
            vh = qkv[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
            sh = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if mode == "no_softmax":
                ph = (sh * 0.01).astype(bf16)
            else:
                ph = jax.nn.softmax(sh, axis=-1).astype(bf16)
            oh = jax.lax.dot_general(
                ph, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_scratch[:, :, h * D:(h + 1) * D] = quant(
                oh * inv_proj_f[h * D:(h + 1) * D])

    qo = o_scratch[:].reshape(R, C)
    x1 = x + idot(qo, wproj_q, dproj, bproj).astype(bf16).reshape(TB, N, C)

    x1_32 = x1.astype(jnp.float32).reshape(R, C)
    qy2 = quant(ln(x1_32, ln2_s, ln2_b))
    hmid = gelu(idot(qy2, w1_q, d1, b1))
    qh2 = quant(hmid * inv_mlp2[:])
    out = x1 + idot(qh2, w2_q, d2, b2).astype(bf16).reshape(TB, N, C)
    out_ref[:] = out


def run_variant(x, params, scales, *, num_heads, mode, tile, fast_gelu=True):
    B, N, C = x.shape
    TB = tile
    bf16 = jnp.bfloat16
    op = fold_static_scales(params, scales)
    hidden = op["w1_q"].shape[1]

    def vec_spec(n):
        return pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)

    def mat_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _ablation_kernel, num_heads=num_heads, fast_gelu=fast_gelu,
        mode=mode)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), bf16),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec(C), vec_spec(C),
            mat_spec((C, 3 * C)), vec_spec(3 * C), vec_spec(3 * C),
            vec_spec(C),
            mat_spec((C, C)), vec_spec(C), vec_spec(C),
            vec_spec(C), vec_spec(C),
            mat_spec((C, hidden)), vec_spec(hidden), vec_spec(hidden),
            vec_spec(hidden),
            mat_spec((hidden, C)), vec_spec(C), vec_spec(C),
        ],
        out_specs=pl.BlockSpec((TB, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TB, N, C), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=False,
    )(
        x.astype(bf16),
        op["ln1_s"], op["ln1_b"], op["wqkv_q"], op["dqkv"], op["bqkv"],
        op["inv_proj"], op["wproj_q"], op["dproj"], op["bproj"],
        op["ln2_s"], op["ln2_b"], op["w1_q"], op["d1"], op["b1"],
        op["inv_mlp2"], op["w2_q"], op["d2"], op["b2"],
    )


MODES = ["full", "no_ln", "no_quant", "no_gelu", "no_softmax", "no_attn",
         "attn_i8", "attn_merged", "mm_only"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tiles", type=int, nargs="+", default=[8])
    ap.add_argument("--modes", nargs="+", default=MODES)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    C, heads, hidden, N = 1280, 16, 5120, 192
    rng = np.random.RandomState(0)
    params = make_params(rng, C, hidden)
    x = jnp.asarray(rng.randn(args.batch, N, C) * 0.5, jnp.bfloat16)
    scales = {
        "qkv": jnp.full((C,), 4.0 / 127),
        "proj": jnp.full((C,), 2.0 / 127),
        "mlp1": jnp.full((C,), 4.0 / 127),
        "mlp2": jnp.full((hidden,), 2.0 / 127),
    }

    results = {}
    for mode in args.modes:
        for tb in args.tiles:
            if args.batch % tb:
                continue
            fn = jax.jit(functools.partial(
                run_variant, scales=scales, num_heads=heads, mode=mode,
                tile=tb))
            try:
                ms = bench(fn, x, params, args.iters)
                results[(mode, tb)] = ms
                print(f"{mode:12s} TB={tb:3d}: {ms:8.2f} ms/block",
                      flush=True)
            except Exception as e:
                print(f"{mode:12s} TB={tb:3d}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)

    base = results.get(("full", args.tiles[0]))
    if base:
        print("\nattribution (full - variant, ms):")
        for (mode, tb), ms in results.items():
            if mode != "full" and tb == args.tiles[0]:
                print(f"  {mode:12s}: {base - ms:+7.2f}")


if __name__ == "__main__":
    main()
