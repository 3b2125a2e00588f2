"""Run the exported serving artifact on the REAL chip (VERDICT r3 #6).

`cli/export.py` produces a self-contained StableHLO module (weights baked
in); round 3 only smoke-executed it on CPU. This script closes the serving
story end-to-end on the tunnel-attached TPU:

1. builds the ViT-H HaMeR serving program (fused-block Pallas kernel,
   optional --int8/--int8_static/--fast_gelu, matching bench.py's modes),
2. exports it (`jax.export`, platform = the live backend), serializes to
   disk, deserializes — the full artifact roundtrip,
3. executes BOTH the live jit program and the deserialized artifact on the
   same raw record batch on the chip,
4. asserts numerics (identical compiled math -> tight tolerance) and that
   artifact throughput is within ~5% of the live program.

Usage: python scripts/export_onchip_check.py [--bs 256] [--int8_static
       --fast_gelu] [--iters 10]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fetch_one(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _fetch_one(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch_one(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=256)
    p.add_argument("--variant", default="h",
                   help="ViT variant (tiny for CPU smoke)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int8_static", action="store_true")
    p.add_argument("--fast_gelu", action="store_true")
    p.add_argument("--out", default="/tmp/hands_tpu_serving_vith.hlo")
    p.add_argument("--params_args", action="store_true",
                   help="weights-as-arguments artifact (required at ViT-H "
                        "size: the constants-baked module is ~2.7 GB and "
                        "breaks the compile transport — measured)")
    args = p.parse_args()
    print("devices:", jax.devices(), flush=True)

    from jax import export as jexport

    from bench import bench_model  # noqa: F401 (shares calibration flow)
    from hands_tpu.cli.export import (build_serving_fn,
                                      build_serving_fn_params_arg,
                                      example_raw_batch)
    from hands_tpu.config import default_config
    from hands_tpu.data.device_pipeline import DevicePreprocessor
    from hands_tpu.models.hamer_light import HamerLightModel

    cfg = default_config(
        "hamer_light", compute_dtype="bfloat16",
        use_render_seg_loss=False, use_grasp_loss=False,
        fused_block=True, quant_int8=args.int8 or args.int8_static,
        quant_int8_static=args.int8_static, fast_gelu=args.fast_gelu)
    model = HamerLightModel(cfg, vit_variant=args.variant)

    raw = example_raw_batch(cfg, args.bs, raw_hw=(224, 224))
    raw = {k: jnp.asarray(v) for k, v in raw.items()}
    pre = DevicePreprocessor(cfg, is_train=False)
    key = jax.random.PRNGKey(0)
    inputs0, _, meta0 = pre._process(
        jax.tree.map(lambda x: x[:2], raw), key)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs0, meta0)

    if args.int8_static:
        from hands_tpu.cli.calibrate import calibrate_scales
        from hands_tpu.ops import calibration as calib_lib

        calib = []
        for b in range(2):
            ib, _, mb = pre._process(raw, jax.random.PRNGKey(b + 1))
            calib.append((ib, mb))
        scales = calibrate_scales("hamer_vith", variables, calib,
                                  vit_variant=args.variant)
        variables = dict(variables)
        variables["params"] = calib_lib.inject_scales(
            variables["params"], scales)

    if args.params_args:
        serve2 = build_serving_fn_params_arg(cfg, model)
        live = jax.jit(serve2)
        live_args = (variables, raw)
    else:
        serve = build_serving_fn(cfg, model, variables)
        live = jax.jit(serve)
        live_args = (raw,)

    # --- live program ------------------------------------------------------
    live_out = live(*live_args)
    dt_live = timeit(live, *live_args, iters=args.iters)
    print(f"live jit     : {dt_live*1e3:8.1f} ms  "
          f"{2*args.bs/dt_live:7.1f} crops/s", flush=True)

    # --- export -> serialize -> deserialize -> execute ---------------------
    exp = jexport.export(live)(*live_args)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"artifact: {args.out} ({len(blob)/1e6:.1f} MB, "
          f"platforms={exp.platforms})", flush=True)
    with open(args.out, "rb") as f:
        exp2 = jexport.deserialize(f.read())

    art_out = exp2.call(*live_args)
    dt_art = timeit(exp2.call, *live_args, iters=args.iters)
    print(f"artifact call: {dt_art*1e3:8.1f} ms  "
          f"{2*args.bs/dt_art:7.1f} crops/s  "
          f"({dt_live/dt_art*100:.1f}% of live speed)", flush=True)

    # --- numerics ----------------------------------------------------------
    worst = 0.0
    for k in sorted(live_out):
        a = np.asarray(live_out[k], np.float32)
        b = np.asarray(art_out[k], np.float32)
        d = float(np.max(np.abs(a - b))) if a.size else 0.0
        worst = max(worst, d)
    print(f"max abs drift artifact vs live (all outputs): {worst:.3e}",
          flush=True)
    assert worst <= 1e-5, worst
    ratio = dt_art / dt_live
    assert ratio <= 1.05, f"artifact {ratio:.2f}x slower than live"
    print("EXPORT ONCHIP CHECK: OK", flush=True)


if __name__ == "__main__":
    main()
