"""Calibrate static int8 activation scales for the ViT serving path.

Runs N batches through the plain bf16 forward with the calibration sow
points enabled (``models/backbones/vit.py``), converts the per-channel
activation maxima to symmetric int8 scales, and writes them to an ``.npz``
(keys qkv/proj/mlp1/mlp2, each (depth, channels)). Serving then loads the
npz and injects the scales into the ``act_scale_*`` params
(``ops/calibration.py::inject_scales``) before running with
``Config.quant_int8_static``:

    python -m hands_tpu.cli.calibrate --method hamer_light \
        [--ckpt <orbax dir>] [--batches 8] [--batch_size 32] \
        [--margin 1.0] -o scales.npz

The reference has no quantised serving path at all
(``/root/reference/src/models/generic/wrapper.py`` serves f32 torch);
this is the standard post-training-quantisation calibration flow, built
TPU-first: the scales fold into LayerNorm params / weight matrices so the
fused kernel's quantisation is a bare round/clip/cast (BENCH_NOTES.md
"static int8").
"""

from __future__ import annotations

import argparse

import numpy as np

_POINTS = ("qkv", "proj", "mlp1", "mlp2")


def save_scales_npz(path: str, scales: dict) -> None:
    np.savez(path, **{k: np.asarray(scales[k], np.float32)
                      for k in _POINTS})


def load_scales_npz(path: str) -> dict:
    import jax.numpy as jnp

    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in _POINTS}


def build_model(method: str, vit_variant: str, **overrides):
    """Model + cfg for a given method; hamer defaults to the full ViT-H."""
    from hands_tpu.config import default_config
    from hands_tpu.models.hamer_light import HamerLightModel
    from hands_tpu.models.registry import fetch_model

    cfg = default_config(
        "hamer_light" if method == "hamer_vith" else method,
        compute_dtype="bfloat16", use_render_seg_loss=False,
        use_grasp_loss=False, **overrides)
    if method in ("hamer_vith", "hamer_light"):
        model = HamerLightModel(cfg, vit_variant=vit_variant)
    else:
        model = fetch_model(cfg)
    return cfg, model


def synthetic_batches(cfg, batch_size: int, n_batches: int):
    """(inputs, meta) eval batches from the synthetic record pipeline —
    the same distribution scripts/chip_numerics_check.py trains on."""
    import jax
    import jax.numpy as jnp

    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import (DevicePreprocessor,
                                                stack_records)

    ds = SyntheticRecordDataset(cfg, "train", length=min(batch_size * 2, 16))
    pre = DevicePreprocessor(cfg, is_train=False)
    for b in range(n_batches):
        recs = [ds[(b * batch_size + i) % len(ds)]
                for i in range(batch_size)]
        stacked = stack_records(recs)
        raw = {k: jnp.asarray(v) for k, v in stacked.items()
               if not k.startswith("_")}
        inputs, _, meta = pre._process(raw, jax.random.PRNGKey(b))
        yield inputs, meta


def calibrate_scales(method: str, variables: dict, batches,
                     vit_variant: str = "h", margin: float = 1.0) -> dict:
    """Run the calibration forward over ``batches`` of (inputs, meta) and
    return the scale dict. ``variables`` must come from a model init'd
    with ``quant_int8_static`` (so trees line up) or plain (extra
    act_scale slots are not required for stats collection)."""
    from hands_tpu.ops import calibration as calib

    cfg_cal, model_cal = build_model(method, vit_variant,
                                     quant_calibrate=True)

    amax = None
    for inputs, _meta in batches:
        _, mutated = model_cal.net.apply(
            variables, inputs, train=False, mutable=["quant_stats"])
        amax = calib.merge_amax(
            amax, calib.extract_amax(mutated["quant_stats"]))
    assert amax is not None
    return calib.amax_to_scales(amax, margin=margin)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--method", default="hamer_vith",
                   choices=["hamer_vith", "hamer_light"])
    p.add_argument("--vit_variant", default="h")
    p.add_argument("--ckpt", default="",
                   help="orbax checkpoint dir; random init if omitted "
                        "(plumbing smoke only — calibrate trained weights "
                        "for real serving)")
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--margin", type=float, default=1.0,
                   help=">1 leaves clip headroom for unseen data")
    p.add_argument("-o", "--out", default="scales.npz")
    args = p.parse_args(argv)

    import jax

    cfg, model = build_model(args.method, args.vit_variant)
    batches = list(synthetic_batches(cfg, args.batch_size, args.batches))
    inputs0, meta0 = batches[0]
    variables = model.init(jax.random.PRNGKey(0), inputs0, meta0)
    if args.ckpt:
        from hands_tpu.cli.demo import load_checkpoint_variables

        variables = load_checkpoint_variables(variables, args.ckpt)

    scales = calibrate_scales(args.method, variables, batches,
                              vit_variant=args.vit_variant,
                              margin=args.margin)
    save_scales_npz(args.out, scales)
    for k in _POINTS:
        s = np.asarray(scales[k])
        print(f"{k}: shape {s.shape} scale range "
              f"[{s.min():.3e}, {s.max():.3e}]")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
