"""WildHands conv-MFU probe (VERDICT r2 #8).

The fused hands_light pipeline sits at ~31% model MFU; BENCH_NOTES
attributes the gap to conv shape mix (3-channel stem, 64-256 channel early
stages underfilling the 128x128 MXU). This script measures where the
ResNet-50 forward time actually goes at the production shapes
(glb B=64 + hand crops 2B=128 -> effective conv batch 192 @ 224x224) and
probes the candidate levers:

1. per-stage cumulative timing (stem / pool / stage1..4),
2. stem layout: stock 7x7 s2 NHWC vs NCHW dimension-numbers,
3. stem space-to-depth: 7x7 s2 on 3 ch -> 4x4 s1 on 12 ch (the MLPerf
   ResNet trick; mathematically exact after weight rearrangement —
   equivalence asserted here on a small case),
4. bf16 vs f32 input shipping into the stem.

Run: ``python scripts/convmfu_probe.py`` (TPU by default).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch_one(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, iters=20):
    out = fn(*args)
    fetch_one(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_one(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def stem_weights(key):
    w = jax.random.normal(key, (7, 7, 3, 64), jnp.float32) * 0.05
    return w


def s2d_weights(w):
    """(7,7,3,64) -> (4,4,12,64): pad the kernel to 8x8 then fold 2x2
    pixel blocks into channels, matching space_to_depth's (hoff, woff, c)
    channel order."""
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w8 = w8.reshape(4, 2, 4, 2, w.shape[2], w.shape[3])
    return w8.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, -1, w.shape[3])


def space_to_depth(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def stem_stock(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stem_nchw(x_nchw, w_oihw):
    return jax.lax.conv_general_dilated(
        x_nchw, w_oihw, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def stem_s2d(x, w4):
    # pad input to 232 (left 3, right 5) so every 7x7 stride-2 window is a
    # 4x4 window over 2x2 pixel blocks; VALID conv then yields 113 rows,
    # slice to the 112 the stock stem produces
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    y = jax.lax.conv_general_dilated(
        space_to_depth(xp), w4, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, :112, :112, :]


def check_equivalence():
    key = jax.random.PRNGKey(0)
    w = stem_weights(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    with jax.default_matmul_precision("float32"):
        a = stem_stock(x, w)
        b = stem_s2d(x, s2d_weights(w))
    d = float(jnp.abs(a - b).max())
    print(f"s2d stem equivalence: max abs diff {d:.2e} "
          f"(out {a.shape} vs {b.shape})")
    assert d < 1e-4, d


def probe_stems(B=192):
    key = jax.random.PRNGKey(0)
    w = stem_weights(key).astype(jnp.bfloat16)
    w4 = s2d_weights(stem_weights(key)).astype(jnp.bfloat16)
    x = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(1), (B, 224, 224, 3), jnp.bfloat16))
    x_nchw = jnp.transpose(x, (0, 3, 1, 2))
    w_oihw = jnp.transpose(w, (3, 2, 0, 1))

    t_stock = timeit(jax.jit(stem_stock), x, w)
    t_nchw = timeit(jax.jit(stem_nchw), x_nchw, w_oihw)
    t_s2d = timeit(jax.jit(stem_s2d), x, w4)
    # s2d with the transpose fused behind a relu+pool consumer (closer to
    # in-model), and f32 input (transfer dtype probe)
    flops = 2 * B * 112 * 112 * 7 * 7 * 3 * 64 / 1e9
    print(f"stem bs{B} (stock NHWC): {t_stock:.2f} ms "
          f"({flops / t_stock:.0f} GFLOP/s eff)")
    print(f"stem bs{B} (NCHW dims): {t_nchw:.2f} ms")
    print(f"stem bs{B} (space-to-depth 4x4s1): {t_s2d:.2f} ms "
          f"({t_stock / t_s2d:.2f}x)")
    return t_stock, t_s2d


def probe_stages(B=192):
    """Cumulative timing of the resnet50 forward truncated after each
    stage, eval mode, bf16 — differences give per-stage cost in-model."""
    import flax.linen as nn

    from hands_tpu.models.backbones.resnet import Bottleneck

    class Truncated(nn.Module):
        upto: int  # 0=stem+pool, 1..4 = stages

        @nn.compact
        def __call__(self, x):
            dtype = jnp.bfloat16
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=dtype, name="conv_stem")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=dtype,
                             name="bn_stem")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
            for i, n in enumerate((3, 4, 6, 3)):
                if i + 1 > self.upto:
                    break
                for j in range(n):
                    strides = 2 if i > 0 and j == 0 else 1
                    x = Bottleneck(filters=64 * 2 ** i, strides=strides,
                                   dtype=dtype,
                                   name=f"stage{i+1}_block{j}")(x)
            return x

    x = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(1), (B, 224, 224, 3), jnp.bfloat16))
    prev = 0.0
    names = ["stem+pool", "stage1", "stage2", "stage3", "stage4"]
    full_vars = None
    for upto in range(5):
        m = Truncated(upto=upto)
        v = m.init(jax.random.PRNGKey(0), x[:1])
        fn = jax.jit(lambda v, x, m=m: m.apply(v, x))
        t = timeit(fn, v, x)
        print(f"resnet50 bs{B} through {names[upto]:9s}: {t:7.2f} ms "
              f"(+{t - prev:6.2f} ms)")
        prev = t
        full_vars = v
    return prev


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_equivalence()
    total = probe_stages()
    probe_stems()
    # full-model reference point
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import bench_model
    crops = bench_model("hands_light", 64, fused_preprocess=False)
    print(f"hands_light bs64 model-only: {crops:.0f} crops/s "
          f"(resnet50 fwd total above: {total:.1f} ms of "
          f"{2 * 64 / crops * 1e3:.1f} ms step)")
    print("CONV MFU PROBE DONE")
