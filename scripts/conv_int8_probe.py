"""Probe: does XLA on v5e lower int8 convolutions to the MXU's int8 path
with a real speedup over bf16?

If yes, a W8A8 ResNet serving mode is worth building for the WildHands
flagship pipeline (the reference's flagship model is conv-bound,
BENCH_NOTES.md "conv-MFU probe"); if no, this probe is the documented
evidence for not building it. Times ``lax.conv_general_dilated`` NHWC at
representative ResNet-50 layer shapes, bf16 vs int8->int32.

  python scripts/conv_int8_probe.py [--batch 64] [--iters 50]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# (H, W, Cin, Cout, k, stride) — the ResNet-50 FLOPs backbone at 224 input
SHAPES = [
    (56, 56, 64, 64, 3, 1),
    (56, 56, 64, 256, 1, 1),
    (28, 28, 128, 128, 3, 1),
    (14, 14, 256, 256, 3, 1),
    (7, 7, 512, 512, 3, 1),
    (14, 14, 1024, 256, 1, 1),
]


def conv(x, w, stride, prefer=None):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer)


def bench(fn, *args, iters=50):
    out = fn(*args)
    float(jnp.ravel(out)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.ravel(out)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    B = args.batch
    for H, W, Ci, Co, k, s in SHAPES:
        x = rng.randn(B, H, W, Ci)
        w = rng.randn(k, k, Ci, Co) * 0.05
        xb = jnp.asarray(x, jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        xi = jnp.asarray(np.clip(x * 30, -127, 127), jnp.int8)
        wi = jnp.asarray(np.clip(w * 600, -127, 127), jnp.int8)
        f_bf = jax.jit(lambda a, b: conv(a, b, s))
        f_i8 = jax.jit(lambda a, b: conv(a, b, s, prefer=jnp.int32))
        try:
            ms_bf = bench(f_bf, xb, wb, iters=args.iters)
        except Exception as e:
            ms_bf = float("nan")
            print("bf16 FAIL:", str(e)[:120])
        try:
            ms_i8 = bench(f_i8, xi, wi, iters=args.iters)
            note = f"{ms_bf / ms_i8:5.2f}x"
        except Exception as e:
            ms_i8, note = float("nan"), f"int8 FAIL {str(e)[:90]}"
        gflop = 2 * B * H * W * Co * k * k * Ci / s / s / 1e9
        print(f"{H}x{W}x{Ci}->{Co} k{k}s{s}: bf16 {ms_bf:7.3f} ms "
              f"({gflop / max(ms_bf, 1e-9):6.1f} TF/s)  int8 {ms_i8:7.3f} ms"
              f"  {note}", flush=True)


if __name__ == "__main__":
    main()
