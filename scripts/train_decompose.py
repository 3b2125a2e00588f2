"""ViT-H training-step ceiling decomposition (VERDICT r3 #4).

The inference side got a full roofline decomposition (BENCH_NOTES
"Ceiling decomposition"); this script does the same for the training
step: where do the ~580 ms of a ViT-H bs32 train step go — remat
recompute, backward matmuls, optimizer HBM traffic, or the heads/loss?

Measured pieces (all the REAL HaMeR train program, synthetic batch,
bf16 activations, f32 params/Adam — `train/step.py:make_train_step`):

  fwd_eval        model forward, eval mode (parity path, remat moot)
  fwd_train       train-mode forward value only (dropout rng threaded)
  grad            jax.grad of the full loss  (fwd + remat recompute + bwd)
  full_step       make_train_step: grad + global-norm clip + Adam + donate
  opt_only        apply_gradients with precomputed grads (optimizer HBM)
  grad_noremat    same grad with per-block remat DISABLED (if it fits;
                  isolates the recompute tax)
  trunk_grad      ViT trunk alone fwd+bwd (isolates heads+loss+GT share)

Derived: bwd = grad - fwd_train - recompute; recompute = grad -
grad_noremat (same batch); MFU against 3x fwd FLOPs (4x with remat).

Usage: python scripts/train_decompose.py [--batch 32] [--iters 10]
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

VIT_H_FWD_GFLOP_PER_CROP = 243.0  # BENCH_NOTES roofline section


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def timeit_chain(fn, state, *args, iters=10):
    """Time a state -> state update with the input state DONATED (the
    production memory regime: one 8 GB f32 params+Adam state resident, not
    two — without donation ViT-H OOMs the 16 GB chip, measured). The state
    is threaded through the calls; returns (dt, final_state)."""
    state = fn(state, *args)
    _sync(state.step)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state, *args)
    _sync(state.step)
    return (time.perf_counter() - t0) / iters, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    B = args.batch
    print("devices:", jax.devices(), flush=True)

    from hands_tpu.config import default_config
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.models.backbones.vit import ViTBackbone
    from hands_tpu.models.hamer_light import HamerLightModel
    from hands_tpu.train.state import create_train_state
    from hands_tpu.train.step import (_forward_and_loss, make_train_step)

    cfg = default_config("hamer_light", compute_dtype="bfloat16",
                         use_render_seg_loss=False, use_grasp_loss=False)
    model = HamerLightModel(cfg, vit_variant="h")
    batch = make_batch(cfg, B, seed=0)
    inputs, _, meta = batch
    rng = jax.random.PRNGKey(0)

    variables = jax.jit(model.init)(jax.random.PRNGKey(1), inputs, meta)
    state = jax.device_put(create_train_state(cfg, variables))
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.1f} M", flush=True)

    rows = {}

    # --- forward, eval mode ---------------------------------------------
    fwd_eval = jax.jit(lambda p, bs, b: _forward_and_loss(
        model, cfg, p, bs, b, rng, train=False)[0])
    rows["fwd_eval"] = timeit(fwd_eval, state.params, state.batch_stats,
                              batch, iters=args.iters)

    # --- forward, train mode (value only: remat wrappers present but
    #     jax.checkpoint only pays on the backward) -----------------------
    fwd_train = jax.jit(lambda p, bs, b: _forward_and_loss(
        model, cfg, p, bs, b, rng, train=True)[0])
    rows["fwd_train"] = timeit(fwd_train, state.params, state.batch_stats,
                               batch, iters=args.iters)

    # --- grad only (remat ON: the hamer_light ViT-H training default) ----
    def loss_fn(p, bs, b):
        return _forward_and_loss(model, cfg, p, bs, b, rng, train=True)[0]

    grad = jax.jit(jax.grad(loss_fn))
    rows["grad"] = timeit(grad, state.params, state.batch_stats, batch,
                          iters=args.iters)
    grads0 = grad(state.params, state.batch_stats, batch)

    # --- optimizer update only (clip + Adam + param write) ---------------
    # donated chain: timing is value-independent, so threading the updated
    # state through is free and keeps one optimizer state resident
    opt = jax.jit(lambda s, g: s.apply_gradients(g), donate_argnums=(0,))
    rows["opt_only"], state = timeit_chain(opt, state, grads0,
                                           iters=args.iters)
    del grads0  # 2.7 GB f32 — free before the full step's internal grads

    # --- full train step (donated, the production configuration) ---------
    step = make_train_step(model, cfg, donate=True)
    rows["full_step"], state = timeit_chain(
        lambda s, b, r: step(s, b, r)[0], state, batch, rng,
        iters=args.iters)
    del state  # free params+Adam before the trunk-only section

    # --- trunk-level remat ablation + trunk-only fwd+bwd ------------------
    # The use_checkpoint flag is constructor-level on ViTBackbone; measure
    # the remat recompute tax where the flag is directly controllable (the
    # trunk is ~97% of the model's FLOPs), plus fused-block custom VJP.
    x = jnp.asarray(np.random.RandomState(0).rand(2 * B, 256, 192, 3),
                    jnp.bfloat16)  # 2 hand crops per sample
    tparams = None
    for tag, kw in [("trunk_grad", dict(use_checkpoint=True)),
                    ("trunk_grad_noremat", dict(use_checkpoint=False)),
                    ("trunk_grad_fusedvjp", dict(fused_block=True))]:
        trunk = ViTBackbone(variant="h", dtype=jnp.bfloat16, use_scan=True,
                            **kw)
        if tparams is None:
            tparams = jax.device_put(
                jax.jit(trunk.init)(jax.random.PRNGKey(0), x))
        try:
            tgrad = jax.jit(jax.grad(lambda p, x, t=trunk: jnp.sum(
                t.apply(p, x).astype(jnp.float32) ** 2)))
            rows[tag] = timeit(tgrad, tparams, x, iters=args.iters)
        except Exception as e:  # OOM without remat is an allowed outcome
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # --- report -----------------------------------------------------------
    crops = 2 * B
    fwd_flop = crops * VIT_H_FWD_GFLOP_PER_CROP * 1e9
    print(f"\n== ViT-H HaMeR train decomposition, bs={B} ({crops} crops) ==")
    for k, dt in rows.items():
        print(f"{k:13s}: {dt*1e3:8.1f} ms   {crops/dt:7.1f} crops/s",
              flush=True)
    g, f = rows["grad"], rows["fwd_train"]
    print(f"\nbwd+recompute = grad - fwd_train       = {1e3*(g-f):7.1f} ms "
          f"({(g-f)/g*100:.0f}% of grad)")
    if "trunk_grad_noremat" in rows and "trunk_grad" in rows:
        tg, nr = rows["trunk_grad"], rows["trunk_grad_noremat"]
        print(f"remat recompute tax (trunk)             = {1e3*(tg-nr):7.1f} ms "
              f"({(tg-nr)/tg*100:.0f}% of trunk grad)")
    fs, op = rows["full_step"], rows["opt_only"]
    print(f"optimizer (clip+Adam+write)             = {1e3*op:7.1f} ms "
          f"({op/fs*100:.0f}% of full step)")
    if "trunk_grad" in rows:
        print(f"heads+loss+GT share = grad - trunk_grad = "
              f"{1e3*(g-rows['trunk_grad']):7.1f} ms")
    mfu3 = 3 * fwd_flop / rows["full_step"] / 394e12  # v5e bf16 peak
    mfu4 = 4 * fwd_flop / rows["full_step"] / 394e12
    print(f"train-step MFU: {mfu3*100:.1f}% (3x fwd FLOPs) / "
          f"{mfu4*100:.1f}% (4x, counting remat recompute)")


if __name__ == "__main__":
    main()
