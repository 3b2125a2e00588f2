"""Training entry point (reference ``scripts_method/train.py``).

Usage:
    python -m hands_tpu.cli.train --method hands_light [flags]
    python -m hands_tpu.cli.train --debug        # synthetic mini run

Flags mirror the reference's parser (``src/parsers/generic_parser.py``).
"""

from __future__ import annotations

import sys


def main(argv=None):
    from hands_tpu.config import construct_args

    cfg = construct_args(argv)
    if cfg.num_processes > 1:
        # multi-host launch (reference: Lightning multi-node DDP,
        # scripts_method/train.py:61-72): wire the process group BEFORE any
        # device use so jax.devices() spans every host over DCN
        from hands_tpu.parallel.distributed import initialize_from_config

        cfg = initialize_from_config(cfg)
    # NOTE: --debug must NOT enable jax_debug_nans — the data schema carries
    # NaN BY DESIGN (meta ``dist`` for non-ego records, NaN-masked metric
    # arrays mirroring the reference's np.nanmean semantics), so a global
    # NaN trap fires on healthy batches. The trainer instead asserts the
    # LOSS is finite every step (the reference's xdict.has_invalid analog).
    if cfg.debug or cfg.fast_dev_run:
        # synthetic data path: no downloads needed (mirrors --debug minitrain)
        cfg = cfg.replace(dataset="synthetic", val_dataset="synthetic",
                          use_render_seg_loss=False)

    from hands_tpu.data.factory import fetch_dataloader
    from hands_tpu.models.registry import fetch_model
    from hands_tpu.train.trainer import Trainer
    from hands_tpu.utils.experiment import Experiment

    exp = Experiment(cfg)
    print(f"experiment {exp.key} -> {exp.dir}")
    model = fetch_model(cfg)
    train_loader = fetch_dataloader(cfg, "train")
    val_loader = fetch_dataloader(cfg, "val")

    trainer = Trainer(cfg, model, exp)
    num_epochs = 1 if (cfg.debug or cfg.fast_dev_run) else None
    state = trainer.fit(train_loader, val_loader, num_epochs=num_epochs)
    print("training done; last checkpoint at", trainer.ckpt.ckpt_dir)
    return state


if __name__ == "__main__":
    main(sys.argv[1:])
