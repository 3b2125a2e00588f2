"""Export the serving path as a self-contained AOT artifact (jax.export).

The reference repo serves predictions by holding a live torch process
around ``GenericWrapper.inference_pose`` (``src/models/generic/
wrapper.py:68-76``); there is no deployable model artifact. For a
TPU-production framework the serving unit is the *compiled program*: this
CLI packages the full fused pipeline — raw uint8 record batch -> on-device
preprocessing (crop/KPE/normalise) -> model forward -> MANO predictions —
as ONE StableHLO module with the checkpoint weights baked in as
constants, serialized with ``jax.export``. The artifact is
host-independent: it can be exported on a CPU dev box with
``--platform tpu`` and loaded/executed on a TPU serving host with nothing
but jax installed (no hands_tpu, no model code, no checkpoint plumbing).

    python -m hands_tpu.cli.export --method hands_light --batch_size 64 \
        [--ckpt <orbax dir>] [--platform tpu cpu] [--raw_hw 840x600] \
        [--int8 --fast_gelu --fused_block] -o serving.hlo
    python -m hands_tpu.cli.export --run serving.hlo   # smoke-execute

Input contract (written to the ``.json`` sidecar): the dict produced by
``data/device_pipeline.stack_records`` for a batch of ``batch_size``
records whose images are zero-padded to ``raw_hw`` (the same fixed-chunk
convention the batch demo uses, ``cli/demo.py --dir``). Output: the
model's prediction dict (plain str->array), MANO pose/shape/joints/
vertices/camera per hand.

Serving knobs (``--int8``/``--fast_gelu``/``--fused_block``) bake the
fused-block Pallas kernels into the artifact; these lower only for
``--platform tpu`` (Mosaic custom calls have no CPU lowering).

``--params_args`` switches to the big-model layout: the module takes the
weights as ARGUMENTS and the artifact is ``{module.hlo, module.hlo.params
.npz, module.hlo.json}`` — a constants-baked ViT-H module is ~2.7 GB of
program and chokes XLA ingestion (measured: the remote-compile transport
breaks, logs/r05/export_onchip.log); the args-mode module is a few MB and
the weights load once at startup (needs flax for the msgpack restore).
"""

from __future__ import annotations

import argparse
import json
import os


def build_serving_fn(cfg, model, variables):
    """Raw stacked record batch -> plain dict of prediction arrays.

    The returned callable closes over ``variables`` (baked into the
    exported module as constants) and a fixed PRNG key (eval-mode
    preprocessing draws no augmentation; the key is threaded only to keep
    one code path with training, device_pipeline.py).
    """
    import jax

    from hands_tpu.data.device_pipeline import DevicePreprocessor

    pre = DevicePreprocessor(cfg, is_train=False)
    key = jax.random.PRNGKey(0)

    def serve(raw: dict) -> dict:
        inputs, _, meta = pre._process(raw, key)
        pred = model(variables, inputs, meta, train=False)
        return {k: v for k, v in dict(pred).items()
                if hasattr(v, "shape") and hasattr(v, "dtype")}

    return serve


def build_serving_fn_params_arg(cfg, model):
    """Like ``build_serving_fn`` but the exported module takes
    ``(variables, raw)`` as ARGUMENTS instead of baking the weights in as
    constants.

    Why both modes exist: constants-baked is the zero-plumbing small-model
    artifact, but for ViT-H the baked module carries ~2.7 GB of f32
    weights — XLA must ingest a multi-GB program (and this environment's
    remote-compile transport breaks outright: 'Broken pipe', measured,
    logs/r05/export_onchip.log). Params-as-args keeps the module a few MB;
    the weights travel in a sidecar ``.params.npz`` (flax msgpack) loaded
    once at serving startup — the standard big-model serving layout.
    """
    import jax

    from hands_tpu.data.device_pipeline import DevicePreprocessor

    pre = DevicePreprocessor(cfg, is_train=False)
    key = jax.random.PRNGKey(0)

    def serve(variables, raw: dict) -> dict:
        inputs, _, meta = pre._process(raw, key)
        pred = model(variables, inputs, meta, train=False)
        return {k: v for k, v in dict(pred).items()
                if hasattr(v, "shape") and hasattr(v, "dtype")}

    return serve


def example_raw_batch(cfg, batch_size: int, raw_hw):
    """A representative stacked raw batch fixing the artifact's shapes."""
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import stack_records

    ds = SyntheticRecordDataset(cfg, "train", length=min(batch_size, 8),
                                img_hw=tuple(raw_hw))
    recs = [ds[i % len(ds)] for i in range(batch_size)]
    stacked = stack_records(recs)
    return {k: v for k, v in stacked.items() if not k.startswith("_")}


def export_serving(cfg, model, variables, batch_size: int,
                   raw_hw=(840, 600), platforms=None,
                   params_as_args: bool = False):
    """Export the fused serving program; returns ``jax.export.Exported``.

    ``params_as_args=True`` exports the 2-argument ``serve(variables,
    raw)`` module (see ``build_serving_fn_params_arg``); the caller is
    responsible for shipping the weights alongside."""
    import jax
    from jax import export as jexport

    raw = example_raw_batch(cfg, batch_size, raw_hw)
    raw = {k: jax.numpy.asarray(v) for k, v in raw.items()}
    plat = list(platforms) if platforms else None
    if params_as_args:
        serve = build_serving_fn_params_arg(cfg, model)
        exp = jexport.export(jax.jit(serve), platforms=plat)(variables, raw)
    else:
        serve = build_serving_fn(cfg, model, variables)
        exp = jexport.export(jax.jit(serve), platforms=plat)(raw)
    return exp, raw


def run_artifact(path: str):
    """Deserialize and smoke-execute an exported artifact on zeros."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(path + ".json") as f:
        sidecar = json.load(f)
    print(f"artifact: {sidecar['method']} bs={sidecar['batch_size']} "
          f"platforms={exp.platforms}")
    raw = {
        k: jnp.zeros(tuple(spec["shape"]), spec["dtype"])
        for k, spec in sidecar["input_spec"].items()
    }
    if sidecar.get("params_file"):
        import flax

        pf = os.path.join(os.path.dirname(os.path.abspath(path)),
                          sidecar["params_file"])
        with open(pf, "rb") as f:
            variables = flax.serialization.msgpack_restore(f.read())
        out = exp.call(variables, raw)
    else:
        out = exp.call(raw)
    for k in sorted(out):
        v = np.asarray(out[k])
        print(f"  {k}: {v.shape} {v.dtype} finite={np.isfinite(v).all()}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--method", default="hands_light")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--ckpt", default="", help="orbax checkpoint dir "
                   "(training ckpt or cli/convert_ckpt output); random "
                   "init if omitted (plumbing smoke only)")
    p.add_argument("--raw_hw", default="840x600",
                   help="raw record image HxW the artifact accepts "
                        "(inputs must be zero-padded to this, like "
                        "cli/demo.py --dir chunks)")
    p.add_argument("--platform", nargs="+", default=None,
                   help="target platform(s), e.g. 'tpu' or 'tpu cpu'; "
                        "default: the exporting host's backend")
    p.add_argument("--backbone", default=None,
                   help="override cfg.backbone (e.g. resnet18)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fused_block", action="store_true")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--fast_gelu", action="store_true")
    p.add_argument("--params_args", action="store_true",
                   help="export weights as module ARGUMENTS with a "
                        ".params.npz sidecar instead of baked constants "
                        "(required for ViT-H-sized models: a multi-GB "
                        "constants-baked module chokes XLA ingestion)")
    p.add_argument("-o", "--out", default="serving.hlo")
    p.add_argument("--run", default="",
                   help="instead of exporting: deserialize + execute the "
                        "given artifact on zero inputs")
    args = p.parse_args(argv)

    if args.run:
        run_artifact(args.run)
        return 0

    import jax

    from hands_tpu.config import default_config
    from hands_tpu.models.registry import fetch_model

    overrides = dict(
        compute_dtype=args.dtype,
        use_render_seg_loss=False, use_grasp_loss=False,
        fused_block=args.fused_block, quant_int8=args.int8,
        fast_gelu=args.fast_gelu,
    )
    if args.backbone:
        overrides["backbone"] = args.backbone
    cfg = default_config(args.method, **overrides)
    model = fetch_model(cfg)

    raw_hw = tuple(int(v) for v in args.raw_hw.split("x"))
    raw = example_raw_batch(cfg, 2, raw_hw)
    pre_key = jax.random.PRNGKey(0)
    from hands_tpu.data.device_pipeline import DevicePreprocessor

    pre = DevicePreprocessor(cfg, is_train=False)
    inputs0, _, meta0 = pre._process(
        jax.tree.map(lambda x: jax.numpy.asarray(x), raw), pre_key)
    variables = model.init(jax.random.PRNGKey(0), inputs0, meta0)
    if args.ckpt:
        from hands_tpu.cli.demo import load_checkpoint_variables

        variables = load_checkpoint_variables(variables, args.ckpt)

    exp, example = export_serving(cfg, model, variables, args.batch_size,
                                  raw_hw, args.platform,
                                  params_as_args=args.params_args)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    params_file = ""
    if args.params_args:
        import flax

        params_file = os.path.basename(args.out) + ".params.npz"
        pf = os.path.join(os.path.dirname(os.path.abspath(args.out)),
                          params_file)
        import jax as _jax

        with open(pf, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(
                _jax.device_get(variables)))
    sidecar = {
        "method": args.method,
        "batch_size": args.batch_size,
        "raw_hw": list(raw_hw),
        "platforms": list(exp.platforms),
        "dtype": args.dtype,
        "fused_block": args.fused_block,
        "quant_int8": args.int8,
        "fast_gelu": args.fast_gelu,
        "ckpt": args.ckpt,
        "params_file": params_file,
        "input_spec": {
            k: {"shape": list(v.shape), "dtype": str(v.dtype)}
            for k, v in example.items()
        },
        "output_keys": sorted(
            str(k) for k in exp.out_tree.unflatten(
                [0] * exp.out_tree.num_leaves)),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(sidecar, f, indent=1)
    print(f"exported {args.method} bs={args.batch_size} "
          f"platforms={list(exp.platforms)} -> {args.out} "
          f"({len(blob) / 1e6:.1f} MB + sidecar)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
