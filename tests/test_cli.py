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
