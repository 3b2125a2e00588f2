"""EPIC-HandKps-scale end-to-end eval sweep on the chip (VERDICT r4 #7).

The reference's headline eval is the EPIC-HandKps 5,000-image pix_err sweep
(``/root/reference/src/utils/eval_modules.py:410-428``, eval set
``hands_5000.pkl`` — ``src/datasets/epic_dataset.py:35``). The per-step eval
path here is measured at ~3.4k samples/s, but the full-scale loop — host
record fetch + native decode + on-device preprocessing + model + batched
metrics + the drop_last=False padded tail, 5,000 images through ONE compiled
program — had never been run end-to-end on the device.

This script runs exactly that, on EPIC-shaped synthetic records (the real
pkl is a licensed download; the synthetic records exercise the identical
Record -> DeviceDataLoader -> Trainer.validate path and the same image
sizes), and reports:

  - dataset build time (host, one batched MANO FK per hand)
  - epoch 1 wall (includes compile)
  - epoch 2 wall (steady state) -> samples/s end-to-end incl. host I/O
  - the metric dict (sanity: finite, padded tail correctly NaN-masked)

Usage: python scripts/epic5000_sweep.py [--n 5000] [--bs 128]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--bs", type=int, default=128,
                    help="test batch size (reference test_bs=128)")
    ap.add_argument("--model", default="hands_light")
    ap.add_argument("--packed", action="store_true",
                    help="pack the records once (cli/pack_records fast "
                    "path) and sweep from the mmap — the production "
                    "serving layout; without it, per-record synthetic "
                    "image GENERATION (slower than real JPEG decode) "
                    "dominates the host side")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    from hands_tpu.config import default_config
    from hands_tpu.core.xdict import device_view
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import DeviceDataLoader
    from hands_tpu.models.registry import fetch_model
    from hands_tpu.train.state import create_train_state
    from hands_tpu.train.trainer import Trainer
    from hands_tpu.utils.experiment import Experiment

    cfg = default_config(
        args.model, compute_dtype="bfloat16", test_batch_size=args.bs,
        use_render_seg_loss=False, exp_key="epic5000")

    t0 = time.time()
    dataset = SyntheticRecordDataset(cfg, split="val", length=args.n)
    len(dataset)  # force label build (batched MANO FK)
    if args.packed:
        import os

        from hands_tpu.data.packed import PackedRecordDataset, pack_dataset

        pdir = f"/tmp/epic5000_packed_{args.n}"
        if not os.path.exists(os.path.join(pdir, "meta.json")):
            pack_dataset(dataset, pdir)
        dataset = PackedRecordDataset(pdir)
        assert len(dataset) == args.n
    loader = DeviceDataLoader(dataset, cfg, cfg.test_batch_size,
                              is_train=False, drop_last=False)
    t_build = time.time() - t0
    print(f"dataset: {args.n} EPIC-shaped records built in {t_build:.1f}s "
          f"({len(loader)} batches of {cfg.test_batch_size}, padded tail="
          f"{args.n % cfg.test_batch_size})", flush=True)

    model = fetch_model(cfg)
    first = next(iter(loader))
    inputs, _, meta = first
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs,
                                    device_view(meta))
    state = create_train_state(cfg, variables)
    trainer = Trainer(cfg, model, Experiment(cfg, root="/tmp/epic5000_logs"))

    t1 = time.time()
    metrics = trainer.validate(state, loader)
    t_ep1 = time.time() - t1
    t2 = time.time()
    metrics2 = trainer.validate(state, loader)
    t_ep2 = time.time() - t2

    # attribution pass: the input pipeline alone (host fetch + stack +
    # ship + on-device preprocessing, no model/metrics) — isolates how much
    # of the epoch is loader vs compute. In this environment the ship leg
    # crosses the axon tunnel, which a real TPU host does not have.
    t3 = time.time()
    nb = 0
    for b in loader:
        jax.block_until_ready(b[0]["img"])
        nb += 1
    t_loader = time.time() - t3

    for k, v in sorted(metrics.items()):
        assert np.isfinite(v), f"non-finite metric {k}={v}"
        d = abs(v - metrics2[k])
        assert d < 1e-4 * max(1.0, abs(v)), (k, v, metrics2[k])
    print("metrics:", json.dumps({k: round(v, 4)
                                  for k, v in sorted(metrics.items())}))
    print(f"epoch1 (incl. compile): {t_ep1:.1f}s")
    print(f"epoch2 (steady):        {t_ep2:.1f}s = "
          f"{args.n / t_ep2:,.0f} samples/s end-to-end incl. host I/O")
    print(f"loader-only pass:       {t_loader:.1f}s = "
          f"{args.n / t_loader:,.0f} samples/s (fetch+stack+ship+preproc; "
          f"model+metrics+gather ≈ {t_ep2 - t_loader:.1f}s)")
    print(json.dumps({
        "metric": f"epic{args.n}_e2e_eval", "value": round(args.n / t_ep2, 1),
        "unit": "samples/s", "epoch1_s": round(t_ep1, 1),
        "epoch2_s": round(t_ep2, 1), "loader_s": round(t_loader, 1),
        "build_s": round(t_build, 1)}))
    print("EPIC SWEEP DONE")


if __name__ == "__main__":
    main()
