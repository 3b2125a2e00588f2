"""Benchmark: flagship-model inference throughput on the TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): crops/sec/chip at batched inference with
on-device preprocessing. Baseline target: 5000 crops/sec/chip (ViT-H on
v5e). Until the HaMeR ViT-H path lands, this measures the WildHands
(hands_light, 2x ResNet-50 + heads + MANO) forward; the metric field says
which model was measured.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def main():
    from hands_tpu.config import default_config
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.models.hands_light import HandsLightModel

    batch_size = 64
    cfg = default_config(
        "hands_light",
        compute_dtype="bfloat16",
        use_render_seg_loss=False,  # inference path
        use_grasp_loss=True,
    )
    inputs, targets, meta_info = make_batch(cfg, batch_size=batch_size, seed=0)
    model = HandsLightModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta_info)

    fwd = jax.jit(lambda v, i, m: model(v, i, m, train=False))
    out = fwd(variables, inputs, meta_info)
    jax.block_until_ready(out)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fwd(variables, inputs, meta_info)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    # 2 hand crops per sample (R+L) — "crops/sec" in the reference's sense
    crops_per_sec = 2 * batch_size / dt
    baseline = 5000.0  # BASELINE.json north-star target (ViT-H crops/s/chip)
    print(
        json.dumps(
            {
                "metric": f"hands_light bs{batch_size} inference crops/sec/chip",
                "value": round(crops_per_sec, 1),
                "unit": "crops/sec",
                "vs_baseline": round(crops_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
