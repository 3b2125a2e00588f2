"""Dataloader factory (reference ``src/factory.py:119``): split resolution,
train/val loader construction, seeding."""

from __future__ import annotations

from hands_tpu.config import Config
from hands_tpu.data.datasets import fetch_dataset
from hands_tpu.data.device_pipeline import DeviceDataLoader, PrefetchLoader


def fetch_dataloader(cfg: Config, mode: str):
    if mode == "train":
        dataset = fetch_dataset(cfg, cfg.dataset, cfg.trainsplit)
        loader = DeviceDataLoader(
            dataset, cfg, cfg.batch_size, is_train=True, seed=cfg.seed,
        )
        # overlap host decode/stacking with device steps (the reference's
        # num_workers analogue)
        return PrefetchLoader(loader) if cfg.num_workers > 0 else loader
    if mode in ("val", "eval", "test"):
        split = cfg.valsplit if mode == "val" else "test"
        dataset = fetch_dataset(cfg, cfg.val_dataset, split)
        return DeviceDataLoader(
            dataset, cfg, cfg.test_batch_size, is_train=False, seed=cfg.seed,
            drop_last=False,
        )
    raise ValueError(f"unknown mode '{mode}'")
