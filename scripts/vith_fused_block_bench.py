"""On-chip measurement: fused ViT-block Pallas kernel vs the XLA block.

VERDICT r2 #1 scoreboard run. Honest timing (scalar-fetch barrier; see
BENCH_NOTES.md "Timing methodology correction") of the REAL ViT-H backbone
(models/backbones/vit.py, scan-stacked) at bs256 256x192, plus a bf16-level
parity check between the two paths on the same params.

  python scripts/vith_fused_block_bench.py [--batch 256] [--variant h]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from hands_tpu.models.backbones.vit import VIT_CONFIGS, ViTBackbone


def bench(model, params, x, iters=10):
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    float(jnp.ravel(fwd(params, x))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--variant", default="h")
    p.add_argument("--fast_gelu", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    print("devices:", jax.devices(), flush=True)

    kw = dict(variant=args.variant, dtype=jnp.bfloat16, use_scan=True,
              fast_gelu=args.fast_gelu)
    ref = ViTBackbone(**kw)
    fused = ViTBackbone(fused_block=True, **kw)

    B = args.batch
    x = jnp.asarray(np.random.RandomState(0).rand(B, 256, 192, 3),
                    jnp.bfloat16)
    params = jax.jit(ref.init)(jax.random.PRNGKey(0), x)
    params = jax.device_put(params)

    # parity first, small batch (jitted — eager apply through the axon
    # tunnel dispatches per-op and never finishes)
    xs = x[:4]
    a = np.asarray(jax.jit(ref.apply)(params, xs), np.float32)
    b = np.asarray(jax.jit(fused.apply)(params, xs), np.float32)
    denom = np.maximum(np.abs(a), 1.0)
    print(f"e2e parity ({VIT_CONFIGS[args.variant]['depth']} blocks): "
          f"max rel {np.max(np.abs(a - b) / denom):.3e}  "
          f"mean abs {np.mean(np.abs(a - b)):.3e}", flush=True)

    # single-block parity on chip (the e2e number compounds per-block ulp
    # drift over depth; the per-block deviation is the honest resolution
    # statement)
    from hands_tpu.models.backbones.vit import Block
    from hands_tpu.ops.vit_block_pallas import (
        block_params_from_flax, vit_block_fused)

    cfgv = VIT_CONFIGS[args.variant]
    C = cfgv["embed_dim"]
    tokens = jnp.asarray(
        np.random.RandomState(1).randn(4, 192, C) * 0.5, jnp.bfloat16)
    blk = Block(num_heads=cfgv["num_heads"], mlp_ratio=cfgv["mlp_ratio"],
                dtype=jnp.bfloat16, fast_gelu=args.fast_gelu)
    bvars = blk.init(jax.random.PRNGKey(2), tokens)
    ra = np.asarray(jax.jit(blk.apply)(bvars, tokens), np.float32)
    rb = np.asarray(vit_block_fused(
        tokens, block_params_from_flax(bvars["params"]),
        num_heads=cfgv["num_heads"], fast_gelu=args.fast_gelu), np.float32)
    dd = np.maximum(np.abs(ra), 1.0)
    print(f"single-block parity: max rel {np.max(np.abs(ra - rb) / dd):.3e} "
          f"mean abs {np.mean(np.abs(ra - rb)):.3e}", flush=True)

    dt = bench(ref, params, x, args.iters)
    print(f"xla    block: {dt*1e3:8.1f} ms  {B/dt:8.1f} crops/s", flush=True)
    dtf = bench(fused, params, x, args.iters)
    print(f"fused  block: {dtf*1e3:8.1f} ms  {B/dtf:8.1f} crops/s "
          f"({dt/dtf:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
