"""CLI entry points end-to-end on synthetic data (tiny configs)."""

import json
import os

import numpy as np
import pytest


def test_evaluate_cli_debug(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from hands_tpu.cli.evaluate import main

    metrics = main(["--method", "hands_light", "--debug",
                    "--test_batch_size", "2"])
    assert "loss" in metrics
    assert any(k.startswith("metric.") for k in metrics)
    assert np.isfinite(metrics["loss"])


def test_construct_args_reference_flags():
    from hands_tpu.config import construct_args

    cfg = construct_args([
        "--method", "arctic_sf_light", "--trainsplit", "minitrain",
        "--valsplit", "minival", "--lr", "3e-4", "--batch_size", "4",
        "--acc_grad", "2", "--setup", "p1", "--exp_key", "abc123def",
        "--lr_dec_epoch", "10", "20",
    ])
    assert cfg.method == "arctic_sf_light"
    assert cfg.lr == 3e-4
    assert cfg.batch_size == 4
    assert cfg.acc_grad == 2
    assert cfg.setup == "p1"
    assert cfg.lr_dec_epoch == (10, 20)
    # method defaults applied under overrides (reference
    # configs/arctic_light.py: mixed dataset, full-image inputs, no pos enc)
    assert cfg.dataset == "hands+assembly+epic_grasp+epic_seg"
    assert cfg.pos_enc is None
    assert cfg.no_crops is True


def test_debug_flag_behavior():
    from hands_tpu.config import construct_args

    cfg = construct_args(["--method", "hands_light", "--debug"])
    assert cfg.batch_size == 1 and cfg.trainsplit == "minitrain"
    cfg2 = construct_args(["--method", "hands_light", "-f"])
    assert cfg2.batch_size == 8 and cfg2.log_every == 5


def test_demo_cli_single_image(tmp_path):
    """cli/demo.py: one JPEG -> Record -> fused preprocessing -> model ->
    per-image prediction npz + overlay PNGs (the reference README's demo
    workflow on the real production path)."""
    cv2 = pytest.importorskip("cv2")
    img = (np.random.RandomState(0).rand(240, 320, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "hand.jpg")
    cv2.imwrite(p, img)
    out = str(tmp_path / "out")

    from hands_tpu.cli.demo import main

    rc = main(["--img", p, "--method", "hands_light", "--out", out,
               "--r_bbox", "40,40,200,200", "--no_vis"])
    assert rc == 0
    d = np.load(os.path.join(out, "hand_pred.npz"))
    j3d = d["pred.mano.j3d.cam.r"]
    assert j3d.shape == (21, 3) and np.all(np.isfinite(j3d))
    assert d["pred.mano.beta.r"].shape == (10,)


def test_demo_cli_batched_dir(tmp_path):
    """Batch serving mode: a directory of mixed-size images is zero-padded
    to one raw shape and processed in fixed-size padded chunks (2 chunks
    here: 3 images, bs2) — per-image npz written for every real image."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(2)
    d = tmp_path / "imgs"
    d.mkdir()
    for i, (h, w) in enumerate([(240, 320), (200, 280), (240, 320)]):
        cv2.imwrite(str(d / f"im{i}.jpg"),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
    out = str(tmp_path / "out")

    from hands_tpu.cli.demo import main

    rc = main(["--dir", str(d), "--batch_size", "2",
               "--method", "hands_light", "--out", out, "--no_vis"])
    assert rc == 0
    for i in range(3):
        f = np.load(os.path.join(out, f"im{i}_pred.npz"))
        j3d = f["pred.mano.j3d.cam.r"]
        assert j3d.shape == (21, 3) and np.all(np.isfinite(j3d))


def test_demo_cli_ckpt_roundtrip(tmp_path):
    """--ckpt loads an orbax tree (convert_ckpt-style) by path-merge and the
    demo predictions change accordingly."""
    cv2 = pytest.importorskip("cv2")
    import jax

    img = (np.random.RandomState(1).rand(240, 320, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "h.jpg")
    cv2.imwrite(p, img)

    # build a full-model params tree with a recognisable perturbation and
    # save it via the converter's orbax writer
    from hands_tpu.cli.convert_ckpt import save_orbax
    from hands_tpu.cli.demo import main
    from hands_tpu.config import default_config
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import DevicePreprocessor, stack_records
    from hands_tpu.models.registry import fetch_model

    cfg = default_config("hands_light", use_render_seg_loss=False,
                         use_grasp_loss=False, compute_dtype="float32")
    ds = SyntheticRecordDataset(cfg, "val", length=2)
    stacked = stack_records([ds[0]])
    pre = DevicePreprocessor(cfg, is_train=False)
    inputs, _, meta = pre(stacked, jax.random.PRNGKey(0))
    model = fetch_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    perturbed = jax.tree.map(lambda x: x + 0.01, variables["params"])
    ckpt_dir = str(tmp_path / "ckpt_tree")
    save_orbax({"params": jax.tree.map(np.asarray, perturbed)}, ckpt_dir)

    out0 = str(tmp_path / "out0")
    out1 = str(tmp_path / "out1")
    assert main(["--img", p, "--out", out0, "--no_vis"]) == 0
    assert main(["--img", p, "--out", out1, "--no_vis",
                 "--ckpt", ckpt_dir]) == 0
    a = np.load(os.path.join(out0, "h_pred.npz"))["pred.mano.j3d.cam.r"]
    b = np.load(os.path.join(out1, "h_pred.npz"))["pred.mano.j3d.cam.r"]
    assert np.all(np.isfinite(b))
    assert np.abs(a - b).max() > 1e-6  # the loaded weights took effect
