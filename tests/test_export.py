"""jax.export serving artifact: round-trip parity + CLI smoke.

The exported artifact packages the full fused serving program (raw record
batch -> on-device preprocessing -> model -> predictions) with weights
baked in; these tests prove (a) deserialize+call reproduces the live
pipeline exactly, (b) the CLI writes a loadable artifact + sidecar, and
(c) cross-platform export (CPU host -> tpu-targeted module) lowers.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hands_tpu.config import default_config


def _tiny_setup(batch_size=2, raw_hw=(64, 48)):
    from hands_tpu.cli.export import build_serving_fn, example_raw_batch
    from hands_tpu.data.device_pipeline import DevicePreprocessor
    from hands_tpu.models.registry import fetch_model

    cfg = default_config("arctic_sf_light", backbone="resnet18",
                         compute_dtype="float32",
                         use_render_seg_loss=False, use_grasp_loss=False)
    model = fetch_model(cfg)
    raw = example_raw_batch(cfg, batch_size, raw_hw)
    raw = {k: jnp.asarray(v) for k, v in raw.items()}
    pre = DevicePreprocessor(cfg, is_train=False)
    inputs0, _, meta0 = pre._process(raw, jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(0), inputs0, meta0)
    serve = build_serving_fn(cfg, model, variables)
    return cfg, model, variables, raw, serve


def test_export_round_trip():
    from jax import export as jexport

    from hands_tpu.cli.export import export_serving

    cfg, model, variables, raw, serve = _tiny_setup()
    direct = jax.jit(serve)(raw)
    exp, example = export_serving(cfg, model, variables, 2, (64, 48),
                                  platforms=["cpu"])
    # the example batch the exporter fixed shapes with == our raw batch
    assert {k: tuple(v.shape) for k, v in example.items()} == \
        {k: tuple(v.shape) for k, v in raw.items()}

    exp2 = jexport.deserialize(exp.serialize())
    out = exp2.call(raw)
    assert set(out) == set(direct)
    for k in direct:
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(direct[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=str(k))


def test_export_targets_tpu_from_cpu_host():
    """Cross-platform AOT: a tpu-targeted module exports on a CPU host
    (the dev-box -> serving-host workflow the CLI documents)."""
    from hands_tpu.cli.export import export_serving

    cfg, model, variables, raw, _ = _tiny_setup()
    exp, _ = export_serving(cfg, model, variables, 2, (64, 48),
                            platforms=["tpu", "cpu"])
    assert "tpu" in exp.platforms
    blob = exp.serialize()
    assert len(blob) > 1000  # weights are baked in


def test_export_params_args_round_trip():
    """The big-model layout (weights as module ARGUMENTS, not baked
    constants — required at ViT-H size where the baked module is ~2.7 GB):
    same outputs as the constants-baked artifact, much smaller module."""
    from jax import export as jexport

    from hands_tpu.cli.export import export_serving

    cfg, model, variables, raw, serve = _tiny_setup()
    direct = jax.jit(serve)(raw)

    exp, _ = export_serving(cfg, model, variables, 2, (64, 48),
                            platforms=["cpu"], params_as_args=True)
    baked, _ = export_serving(cfg, model, variables, 2, (64, 48),
                              platforms=["cpu"])
    # the whole point: the args-mode module does not carry the weights
    assert len(exp.serialize()) < len(baked.serialize()) / 10

    exp2 = jexport.deserialize(exp.serialize())
    out = exp2.call(variables, raw)
    assert set(out) == set(direct)
    for k in direct:
        # args-mode is a DIFFERENT compiled program than the baked jit
        # (no constant folding of the weights), so exact-schedule parity
        # does not hold; measured worst case is a handful of elements at
        # ~1e-5 relative (f32)
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(direct[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=str(k))


def test_export_cli_params_args(tmp_path, capsys):
    """CLI end to end in args mode: artifact + .params.npz sidecar written,
    --run restores the weights and executes."""
    from hands_tpu.cli.export import main

    art = str(tmp_path / "serving.hlo")
    rc = main(["--method", "arctic_sf_light", "--backbone", "resnet18",
               "--dtype", "float32", "--batch_size", "2",
               "--raw_hw", "64x48", "--platform", "cpu", "-o", art,
               "--params_args"])
    assert rc == 0
    sidecar = json.loads((tmp_path / "serving.hlo.json").read_text())
    assert sidecar["params_file"] == "serving.hlo.params.npz"
    assert (tmp_path / "serving.hlo.params.npz").stat().st_size > 1000

    rc = main(["--run", art])
    assert rc == 0
    msgs = capsys.readouterr().out
    assert "finite=True" in msgs


def test_export_cli_smoke(tmp_path, capsys):
    from hands_tpu.cli.export import main

    art = str(tmp_path / "serving.hlo")
    rc = main(["--method", "arctic_sf_light", "--backbone", "resnet18",
               "--dtype", "float32", "--batch_size", "2",
               "--raw_hw", "64x48", "--platform", "cpu", "-o", art])
    assert rc == 0
    sidecar = json.loads((tmp_path / "serving.hlo.json").read_text())
    assert sidecar["batch_size"] == 2
    assert sidecar["input_spec"]["image"]["shape"] == [2, 64, 48, 3]
    assert sidecar["input_spec"]["image"]["dtype"] == "uint8"
    assert any("joints3d" in k or "j3d" in k for k in sidecar["output_keys"])

    rc = main(["--run", art])
    assert rc == 0
    msgs = capsys.readouterr().out
    assert "finite=True" in msgs


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
