"""On-chip tile autotune for the fused ViT-block Pallas kernels.

Sweeps the batch-tile size TB (the only free scheduling knob the kernel
exposes, ``vit_block_fused(..., tile=)``) for the bf16, int8, and
int8+fast_gelu variants at ViT-H serving shapes (bs256, 192 tokens,
C=1280) and prints ms/block per tile. The default heuristic is
``_pick_tile`` (TB=4); this script is the evidence for keeping or moving
that default.

  python scripts/vith_tile_autotune.py [--batch 256] [--iters 30]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_params(rng, C, hidden):
    return {
        "ln1_scale": jnp.ones(C), "ln1_bias": jnp.zeros(C),
        "wqkv": jnp.asarray(rng.randn(C, 3 * C) * 0.03, jnp.float32),
        "bqkv": jnp.zeros(3 * C),
        "wproj": jnp.asarray(rng.randn(C, C) * 0.03, jnp.float32),
        "bproj": jnp.zeros(C),
        "ln2_scale": jnp.ones(C), "ln2_bias": jnp.zeros(C),
        "w1": jnp.asarray(rng.randn(C, hidden) * 0.03, jnp.float32),
        "b1": jnp.zeros(hidden),
        "w2": jnp.asarray(rng.randn(hidden, C) * 0.03, jnp.float32),
        "b2": jnp.zeros(C),
    }


def bench(fn, x, params, iters):
    out = fn(x, params)
    float(jnp.ravel(out)[0])  # honest barrier (tunnel: block_until_ready
    t0 = time.perf_counter()  # does not block, BENCH_NOTES.md)
    for _ in range(iters):
        out = fn(x, params)
    float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tiles", type=int, nargs="+",
                    default=[2, 4, 8, 16])
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    from hands_tpu.ops.vit_block_pallas import (vit_block_fused,
                                                vit_block_fused_int8,
                                                vit_block_fused_int8_static)

    C, heads, hidden, N = 1280, 16, 5120, 192  # ViT-H, 256x192/16
    rng = np.random.RandomState(0)
    params = make_params(rng, C, hidden)
    x = jnp.asarray(rng.randn(args.batch, N, C) * 0.5, jnp.bfloat16)

    import functools

    # plausible calibrated scales for the static variant (value only
    # affects clipping, not timing)
    scales = {
        "qkv": jnp.full((C,), 4.0 / 127),
        "proj": jnp.full((C,), 2.0 / 127),
        "mlp1": jnp.full((C,), 4.0 / 127),
        "mlp2": jnp.full((hidden,), 2.0 / 127),
    }

    def static_fn(x, params, tile=None, fast_gelu=False):
        return vit_block_fused_int8_static(
            x, params, scales, num_heads=heads, fast_gelu=fast_gelu,
            tile=tile)

    variants = {
        "bf16": functools.partial(vit_block_fused, num_heads=heads),
        "int8": functools.partial(vit_block_fused_int8, num_heads=heads),
        "int8+fast_gelu": functools.partial(
            vit_block_fused_int8, num_heads=heads, fast_gelu=True),
        "int8_static": static_fn,
        "int8_static+fg": functools.partial(static_fn, fast_gelu=True),
    }
    for name, fn in variants.items():
        for tb in args.tiles:
            if args.batch % tb:
                continue
            try:
                ms = bench(functools.partial(fn, tile=tb), x, params,
                           args.iters)
                print(f"{name:16s} TB={tb:3d}: {ms:8.2f} ms/block",
                      flush=True)
            except Exception as e:  # VMEM overflow at large TB is expected
                print(f"{name:16s} TB={tb:3d}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
