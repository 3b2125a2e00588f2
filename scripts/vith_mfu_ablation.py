"""ViT-H forward-throughput ablations on the real chip (VERDICT r1 #8).

Measures bs256 crops/s for the stock backbone and one-change-at-a-time
variants to locate the missing MFU (results + decomposition in
BENCH_NOTES.md "ViT-H MFU ablation"):

  stock            current ViTBackbone (exact GELU, f32 softmax+LN)
  no_softmax       linear attention (softmax cost probe)
  no_attn(out=v)   attention einsums removed entirely
  stock_bs512      batch-scaling probe

Timing uses a one-scalar fetch barrier (block_until_ready does not block
through the axon tunnel). Run:
  python scripts/vith_mfu_ablation.py [--batch 256] [--variant h]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn  # noqa: E402

from hands_tpu.models.backbones.vit import VIT_CONFIGS  # noqa: E402


class AblAttention(nn.Module):
    num_heads: int
    softmax_f32: bool = True
    mode: str = "full"  # full | no_softmax | no_attn (out = v)
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = head_dim**-0.5
        if self.mode == "no_attn":
            out = v.reshape(B, N, C)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
            if self.mode == "no_softmax":
                attn = attn * (1.0 / N)
            elif self.softmax_f32:
                attn = jax.nn.softmax(attn.astype(jnp.float32),
                                      axis=-1).astype(x.dtype)
            else:
                attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class AblBlock(nn.Module):
    num_heads: int
    mlp_ratio: float
    softmax_f32: bool = True
    ln_f32: bool = True
    attn_mode: str = "full"

    @nn.compact
    def __call__(self, x, _):
        C = x.shape[-1]
        ln_dt = jnp.float32 if self.ln_f32 else jnp.bfloat16
        y = nn.LayerNorm(dtype=ln_dt, name="norm1")(x)
        x = x + AblAttention(self.num_heads, self.softmax_f32,
                             self.attn_mode, name="attn")(y)
        y = nn.LayerNorm(dtype=ln_dt, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=jnp.bfloat16)(y)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(C, dtype=jnp.bfloat16)(h)
        return x, None


class AblViT(nn.Module):
    variant: str = "h"
    softmax_f32: bool = True
    ln_f32: bool = True
    attn_mode: str = "full"

    @nn.compact
    def __call__(self, x):
        cfg = VIT_CONFIGS[self.variant]
        C = cfg["embed_dim"]
        B, H, W, _ = x.shape
        hp, wp = H // 16, W // 16
        x = nn.Conv(C, (16, 16), strides=(16, 16), padding=((2, 2), (2, 2)),
                    dtype=jnp.bfloat16, name="patch_embed")(x)
        x = x.reshape(B, hp * wp, C)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, hp * wp, C), jnp.float32)
        x = x + pos.astype(x.dtype)
        scanned = nn.scan(AblBlock, variable_axes={"params": 0},
                          split_rngs={"params": True},
                          length=cfg["depth"])
        x, _ = scanned(cfg["num_heads"], cfg["mlp_ratio"],
                       self.softmax_f32, self.ln_f32, self.attn_mode,
                       name="blocks")(x, None)
        x = nn.LayerNorm(dtype=jnp.float32, name="last_norm")(x)
        return x.reshape(B, hp, wp, C)


def bench_one(name, model, B, iters=10):
    x = jnp.asarray(np.random.RandomState(0).rand(B, 256, 192, 3),
                    jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    # block_until_ready is a no-op through the axon tunnel: force a scalar
    # fetch of the last output as the timing barrier (in-order device queue)
    float(jnp.ravel(fwd(params, x))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    float(jnp.ravel(out)[0])
    dt = (time.perf_counter() - t0) / iters
    cps = B / dt
    print(f"{name:18s} {dt*1e3:8.1f} ms  {cps:8.1f} crops/s "
          f"({cps / 795 * 100:.0f}% of roofline)", flush=True)
    return cps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--variant", default="h")
    args = p.parse_args()
    print("devices:", jax.devices(), flush=True)
    B, v = args.batch, args.variant
    bench_one("stock(f32 sm+ln)", AblViT(v, True, True), B)
    bench_one("no_softmax", AblViT(v, True, True, "no_softmax"), B)
    bench_one("no_attn(out=v)", AblViT(v, True, True, "no_attn"), B)
    bench_one("stock_bs512", AblViT(v, True, True), 2 * B, iters=5)


if __name__ == "__main__":
    main()
