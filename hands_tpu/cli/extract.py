"""Feature extraction (the reference's ``mode='extract'`` path,
``src/models/generic/wrapper.py:157-164``): run the model over a split and
dump per-sequence prediction dumps (feat_vec + imgnames + selected keys)."""

from __future__ import annotations

import os
import sys
from collections import defaultdict


def main(argv=None):
    import jax
    import numpy as np

    from hands_tpu.config import construct_args
    from hands_tpu.core.xdict import device_view
    from hands_tpu.data.factory import fetch_dataloader
    from hands_tpu.models.registry import fetch_model
    from hands_tpu.train.checkpoint import CheckpointManager
    from hands_tpu.train.state import create_train_state

    cfg = construct_args(argv)
    if cfg.debug or cfg.fast_dev_run:
        cfg = cfg.replace(val_dataset="synthetic", use_render_seg_loss=False)
    model = fetch_model(cfg)
    loader = fetch_dataloader(cfg, "val")

    first = next(iter(loader))
    inputs, _, meta = first
    variables = model.init(jax.random.PRNGKey(0), inputs, device_view(meta))
    state = create_train_state(cfg, variables)
    if cfg.infer_ckpt:
        ckpt = CheckpointManager(os.path.dirname(cfg.infer_ckpt))
        params = ckpt.restore_params(state.params,
                                     os.path.basename(cfg.infer_ckpt))
        state = state.replace(params=params)

    fwd = jax.jit(lambda v, i, m: model(v, i, m, train=False))
    per_seq = defaultdict(lambda: defaultdict(list))
    keep_keys = ["feat_vec", "mano.cam_t.r", "mano.cam_t.l",
                 "mano.beta.r", "mano.beta.l"]
    for inputs, targets, meta in loader:
        meta_dev = device_view(meta)
        pred = fwd({"params": state.params,
                    "batch_stats": state.batch_stats}, inputs, meta_dev)
        for i, imgname in enumerate(meta["imgname"]):
            seq = "/".join(imgname.split("/")[:-1]) or "seq"
            per_seq[seq]["imgname"].append(imgname)
            for k in keep_keys:
                if k in pred:
                    per_seq[seq][f"pred.{k}"].append(np.asarray(pred[k][i]))

    out_dir = os.path.join("logs", cfg.exp_key or "extract", "eval")
    os.makedirs(out_dir, exist_ok=True)
    for seq, data in per_seq.items():
        payload = {
            k: (np.stack(v) if isinstance(v[0], np.ndarray) else v)
            for k, v in data.items()
        }
        name = seq.replace("/", "__") + ".npy"
        np.save(os.path.join(out_dir, name), payload)
    print(f"extracted {len(per_seq)} sequences -> {out_dir}")
    return out_dir


if __name__ == "__main__":
    main(sys.argv[1:])
