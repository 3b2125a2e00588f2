"""Load the reference's torch modules for golden-parity testing.

The parity contract (BASELINE.md: <1e-3 output parity) is proven by importing
``/root/reference``'s own numpy/torch/cv2 code and asserting against it
directly, rather than re-deriving its math inline in tests.

Only modules that import cleanly with the installed deps (torch CPU, cv2,
numpy) are loadable. ``loguru`` (absent) is stubbed. ``src.utils.eval_modules``
has an import-time NameError in its registry (eval_modules.py:711 references
an undefined ``eval_mpjpe_mano``); :func:`load_eval_modules` loads it with
that single registry entry removed so the rest of the module is testable.
"""

from __future__ import annotations

import functools
import importlib
import sys
import types

REF = "/root/reference"


def _ensure_path() -> None:
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "loguru" not in sys.modules:
        stub = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, _name):
                return lambda *a, **k: None

        stub.logger = _Logger()
        sys.modules["loguru"] = stub


@functools.lru_cache(maxsize=None)
def load(name: str):
    """Import a reference module (e.g. ``common.rot``) and return it."""
    _ensure_path()
    return importlib.import_module(name)


@functools.lru_cache(maxsize=None)
def load_eval_modules():
    """Load src/utils/eval_modules.py with the broken registry line dropped."""
    _ensure_path()
    path = f"{REF}/src/utils/eval_modules.py"
    with open(path) as f:
        src = f.read()
    src = src.replace('"mpjpe.mano": eval_mpjpe_mano,', "")
    mod = types.ModuleType("ref_eval_modules")
    mod.__file__ = path
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod
