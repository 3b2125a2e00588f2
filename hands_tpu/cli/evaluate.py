"""Evaluation entry point: batched metric sweep over a val/test split
(the reference's validation-only path through ``train.py`` + the
EPIC-HandKps 5000-image eval, SURVEY §6/BASELINE config #5)."""

from __future__ import annotations

import json
import sys


def main(argv=None):
    from hands_tpu.config import construct_args
    from hands_tpu.core.xdict import device_view

    cfg = construct_args(argv)
    if cfg.num_processes > 1:
        # multi-host eval sweep: same process-group wiring as cli.train
        from hands_tpu.parallel.distributed import initialize_from_config

        cfg = initialize_from_config(cfg)
    import sys as _sys

    # --eval_on overrides the eval dataset (reference generic_parser.py)
    if "--eval_on" in (argv or _sys.argv):
        idx = (argv or _sys.argv).index("--eval_on")
        cfg = cfg.replace(val_dataset=(argv or _sys.argv)[idx + 1])
    if cfg.debug or cfg.fast_dev_run:
        cfg = cfg.replace(val_dataset="synthetic", use_render_seg_loss=False)

    import jax

    from hands_tpu.data.factory import fetch_dataloader
    from hands_tpu.models.registry import fetch_model
    from hands_tpu.train.checkpoint import CheckpointManager
    from hands_tpu.train.state import create_train_state
    from hands_tpu.train.trainer import Trainer
    from hands_tpu.utils.experiment import Experiment

    model = fetch_model(cfg)
    val_loader = fetch_dataloader(cfg, "val")

    first = next(iter(val_loader))
    inputs, _, meta = first
    variables = model.init(jax.random.PRNGKey(0), inputs, device_view(meta))
    state = create_train_state(cfg, variables)

    if cfg.infer_ckpt:
        import os

        ckpt = CheckpointManager(os.path.dirname(cfg.infer_ckpt))
        params = ckpt.restore_params(state.params,
                                     os.path.basename(cfg.infer_ckpt))
        state = state.replace(params=params)

    trainer = Trainer(cfg, model, Experiment(cfg))
    metrics = trainer.validate(state, val_loader)
    print(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
