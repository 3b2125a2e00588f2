"""Dataloader factory (reference ``src/factory.py:119``): split resolution,
train/val loader construction, seeding."""

from __future__ import annotations

import numpy as np

from hands_tpu.config import Config
from hands_tpu.data.datasets import fetch_dataset
from hands_tpu.data.device_pipeline import DeviceDataLoader, PrefetchLoader

# meta keys carried as python lists, not arrays (reference
# ``src/factory.py:110-114``)
_LIST_KEYS = ("imgname", "query_names")


def collate_windowed(data_list):
    """Temporal-window concat collate (reference ``collate_custom_fn``,
    ``src/factory.py:77-116``): each sample is an (inputs, targets,
    meta_info) triple whose tensors already carry a leading window axis;
    samples are CONCATENATED along axis 0 (window frames become batch rows),
    except list-valued meta keys (imgname/query_names) which are summed.

    The temporal path is vestigial in the reference — ``temp_loader: False``
    (``src/parsers/configs/generic.py:18``) disables it for every shipped
    config — but the collate contract is kept so windowed datasets can be
    plugged in without touching the loader.
    """
    def cat(vals, key=None, listlike=False):
        if listlike:
            return sum((list(v) for v in vals), [])
        return np.concatenate([np.asarray(v) for v in vals], axis=0)

    outs = []
    for part_idx in range(3):
        keys = data_list[0][part_idx].keys()
        is_meta = part_idx == 2
        out = {
            k: cat([d[part_idx][k] for d in data_list],
                   listlike=is_meta and k in _LIST_KEYS)
            for k in keys
        }
        outs.append(out)
    return tuple(outs)


def _host_shard():
    """(process_id, num_processes) — each host's loader fetches only its
    row range of every global batch (multi-host, parallel/distributed.py)."""
    import jax

    return (jax.process_index(), jax.process_count())


def fetch_dataloader(cfg: Config, mode: str):
    if mode == "train":
        dataset = fetch_dataset(cfg, cfg.dataset, cfg.trainsplit)
        loader = DeviceDataLoader(
            dataset, cfg, cfg.batch_size, is_train=True, seed=cfg.seed,
            shard=_host_shard(),
        )
        # overlap host decode/stacking with device steps (the reference's
        # num_workers analogue)
        return PrefetchLoader(loader) if cfg.num_workers > 0 else loader
    if mode in ("val", "eval", "test"):
        split = cfg.valsplit if mode == "val" else "test"
        dataset = fetch_dataset(cfg, cfg.val_dataset, split)
        return DeviceDataLoader(
            dataset, cfg, cfg.test_batch_size, is_train=False, seed=cfg.seed,
            drop_last=False, shard=_host_shard(),
        )
    raise ValueError(f"unknown mode '{mode}'")
