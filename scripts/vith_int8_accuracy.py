"""On-chip accuracy characterisation of the W8A8 int8 fused-block kernel.

Runs the full depth-32 ViT-H HaMeR model twice on the same preprocessed
batch — fused-block bf16 vs fused-block int8 — and reports output drift on
the regression targets (MANO pose 6D / betas / camera). This is the number
quoted in BENCH_NOTES.md next to the int8 throughput.

Usage: python scripts/vith_int8_accuracy.py  (real chip; ~2 compiles)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast_gelu", action="store_true",
                    help="measure the int8+fast_gelu serving combo")
    args = ap.parse_args()
    from hands_tpu.config import default_config
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import (DevicePreprocessor,
                                                stack_records)
    from hands_tpu.models.hamer_light import HamerLightModel

    B = 32
    outs = {}
    for tag, int8 in (("bf16", False), ("int8", True)):
        cfg = default_config(
            "hamer_light", compute_dtype="bfloat16",
            use_render_seg_loss=False, fused_block=True, quant_int8=int8,
            fast_gelu=args.fast_gelu and int8)
        model = HamerLightModel(cfg, vit_variant="h")
        ds = SyntheticRecordDataset(cfg, "train", length=8)
        recs = [ds[i % len(ds)] for i in range(B)]
        raw = {k: jnp.asarray(v) for k, v in stack_records(recs).items()
               if not k.startswith("_")}
        pre = DevicePreprocessor(cfg, is_train=False)
        inputs, _, meta = pre._process(raw, jax.random.PRNGKey(0))
        variables = model.init(jax.random.PRNGKey(0), inputs, meta)
        variables = jax.device_put(variables)
        out = jax.jit(lambda v, i, m: model(v, i, m, train=False))(
            variables, inputs, meta)
        outs[tag] = {k: np.asarray(v, np.float32)
                     for k, v in out.items()
                     if hasattr(v, "shape") and v.size}
        print(f"{tag}: {sorted(outs[tag])}")

    for k in sorted(set(outs["bf16"]) & set(outs["int8"])):
        a, b = outs["bf16"][k], outs["int8"][k]
        if a.dtype.kind not in "fc":
            continue
        d = np.abs(a - b)
        scale = max(np.abs(a).std(), 1e-6)
        print(f"{k:32s} max {d.max():.3e}  mean {d.mean():.3e}  "
              f"(|ref| std {scale:.3e}, max/std {d.max()/scale:.3f})")


if __name__ == "__main__":
    main()
