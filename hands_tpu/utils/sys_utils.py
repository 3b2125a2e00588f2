"""Filesystem / reproducibility helpers (reference ``common/sys_utils.py`` +
``common/torch_utils.py:reset_all_seeds``)."""

from __future__ import annotations

import os
import random
import shutil
from typing import Iterable

import numpy as np


def mkdir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def copy_repo(src: str, dst: str, ignores: Iterable[str] = ()) -> None:
    """Snapshot the code into the experiment dir (reference copies the repo
    per run for reproducibility)."""
    default_ignores = ["logs", ".git", "__pycache__", "*.pyc", "*.so",
                       "*.npy", "*.pkl"]
    patterns = list(default_ignores) + list(ignores)
    shutil.copytree(
        src, dst, ignore=shutil.ignore_patterns(*patterns), dirs_exist_ok=True
    )


def reset_all_seeds(seed: int) -> None:
    """Seed python + numpy (jax randomness is explicit-key, nothing global)."""
    random.seed(seed)
    np.random.seed(seed)
