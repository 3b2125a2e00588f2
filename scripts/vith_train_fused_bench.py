"""On-chip ViT-H TRAINING-pass bench: XLA block + per-block remat (the
round-2 training path) vs the fused Pallas block with its custom VJP
(block-granular remat by construction — fused fwd + XLA recompute/bwd).

  python scripts/vith_train_fused_bench.py [--batch 32]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hands_tpu.models.backbones.vit import ViTBackbone


def bench_train(model, params, x, iters=10):
    def loss(p, x):
        return jnp.sum(model.apply(p, x).astype(jnp.float32) ** 2)

    step = jax.jit(jax.grad(loss))
    g = step(params, x)
    float(jnp.ravel(jax.tree.leaves(g)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(params, x)
    float(jnp.ravel(jax.tree.leaves(g)[0])[0])
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    print("devices:", jax.devices(), flush=True)

    B = args.batch
    x = jnp.asarray(np.random.RandomState(0).rand(B, 256, 192, 3),
                    jnp.bfloat16)
    base = ViTBackbone(variant="h", dtype=jnp.bfloat16, use_scan=True)
    params = jax.device_put(jax.jit(base.init)(jax.random.PRNGKey(0), x))

    configs = [
        ("xla + remat", dict(use_checkpoint=True)),
        ("fused-block custom VJP (no remat)", dict(fused_block=True)),
    ]
    for name, kw in configs:
        model = ViTBackbone(variant="h", dtype=jnp.bfloat16, use_scan=True,
                            **kw)
        try:
            dt = bench_train(model, params, x, iters=args.iters)
            print(f"{name:38s}: {dt*1e3:8.1f} ms/fwd+bwd  "
                  f"{B/dt:7.1f} crops/s", flush=True)
        except Exception as e:
            print(f"{name:38s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
