"""Experiment lifecycle + metric logging.

Replaces ``common/comet_utils.py`` / ``common/tb_utils.py``: experiment dirs
under ``logs/<exp_key>`` (random 9-hex key, ``generate_exp_key`` semantics),
``args.json`` dump, resume reusing the key embedded in a checkpoint path,
and a dual logging backend — JSONL metrics (always) plus TensorBoard when
requested (``cfg.logger == 'tensorboard'``; torch's SummaryWriter).
"""

from __future__ import annotations

import dataclasses
import json
import os
import secrets
import time
from typing import Dict, Optional

from hands_tpu.config import Config


def generate_exp_key() -> str:
    """Random 9-hex experiment key (comet_utils.py:136-142)."""
    return secrets.token_hex(5)[:9]


def exp_key_from_ckpt_path(ckpt_path: str) -> Optional[str]:
    """Resume reuses the experiment key from 'logs/<key>/checkpoints/...'
    (comet_utils.py:68-69)."""
    parts = os.path.normpath(ckpt_path).split(os.sep)
    if "logs" in parts:
        i = parts.index("logs")
        if i + 1 < len(parts):
            return parts[i + 1]
    return None


class Experiment:
    def __init__(self, cfg: Config, root: str = "logs"):
        key = cfg.exp_key or exp_key_from_ckpt_path(cfg.resume_ckpt or "")
        self.key = key or generate_exp_key()
        self.dir = os.path.join(root, self.key)
        self.ckpt_dir = os.path.join(self.dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.cfg = cfg
        # multi-host: every process shares the key/dirs (cli/train.py
        # broadcasts process 0's key), but only rank 0 writes logs — the
        # Lightning rank_zero_only logging convention
        import jax

        self._rank0 = jax.process_index() == 0
        if self._rank0:
            self._save_args(cfg)
        self._metrics_f = (
            open(os.path.join(self.dir, "metrics.jsonl"), "a")
            if self._rank0 else None)
        self._tb = None
        if cfg.logger == "tensorboard" and not cfg.mute and self._rank0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=self.dir)
            except Exception:
                self._tb = None

    def _save_args(self, cfg: Config):
        with open(os.path.join(self.dir, "args.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)

    def log_dict(self, metrics: Dict[str, float], step: int, postfix: str = ""):
        if self._metrics_f is None:  # non-zero rank: no-op
            return
        payload = {
            (k + postfix): float(v) for k, v in metrics.items()
        }
        payload["step"] = int(step)
        payload["time"] = time.time()
        self._metrics_f.write(json.dumps(payload) + "\n")
        self._metrics_f.flush()
        if self._tb is not None:
            for k, v in payload.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)

    def push_images(self, images, step: int):
        """Log HWC uint8/float images (tb_utils.push_images:116)."""
        if self._tb is not None:
            import numpy as np

            for i, (name, img) in enumerate(images):
                self._tb.add_image(name, np.asarray(img), step,
                                   dataformats="HWC")

    def close(self):
        if self._metrics_f is not None:
            self._metrics_f.close()
        if self._tb is not None:
            self._tb.close()
