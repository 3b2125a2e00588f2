"""Golden parity: per-method config defaults vs the reference's own
``src/parsers/configs/*.py`` (imported and read directly).

The reference config modules all mutate one shared ``DEFAULT_ARGS_EGO``
dict at import time, so each is loaded with a fresh parser package.
"""

import importlib
import sys

import pytest

from tests import ref_compat
from hands_tpu.config import default_config

pytestmark = pytest.mark.heavy

# reference knobs intentionally not carried 1:1 (TPU-native replacements
# or vestigial): vis_every (we visualize per eval epoch), pretrained (we use
# --load_backbone with converted ckpts), logger string casing
_SKIP = {
    "vis_every",   # we visualize per eval epoch
    "pretrained",  # replaced by --load_backbone + cli/convert_ckpt
    "logger",
    "method",      # the reference generic dict carries a stale 'arctic'
    "trainsplit", "valsplit",  # run-level choices (reference defaults to
                               # the debug mini splits; real runs override)
    # GPU/SLURM submission machinery, N/A on TPU (parallel/ is the
    # equivalent surface)
    "gpu_ids", "agent_id", "cluster_node", "bid", "gpu_arch", "gpu_min_mem",
}
# per-method skips: handoccnet ignores the config backbone (it builds its
# own FPN internally); ours labels it 'fpn' for clarity
_METHOD_SKIP = {"handoccnet_light": {"backbone"}}

_METHOD_TO_REF = {
    "hands_light": "hands_light",
    "arctic_sf_light": "arctic_light",
    "hamer_light": "hamer_light",
    "handoccnet_light": "handoccnet_light",
}


def _load_ref_config(name):
    ref_compat._ensure_path()
    for m in list(sys.modules):
        if m.startswith("src.parsers"):
            del sys.modules[m]
    mod = importlib.import_module(f"src.parsers.configs.{name}")
    return dict(mod.DEFAULT_ARGS_EGO)


@pytest.mark.parametrize("method,ref_name", sorted(_METHOD_TO_REF.items()))
def test_method_defaults_match_reference(method, ref_name):
    ref = _load_ref_config(ref_name)
    cfg = default_config(method)
    for key, want in ref.items():
        if key in _SKIP or key in _METHOD_SKIP.get(method, ()) \
                or not hasattr(cfg, key):
            continue
        got = getattr(cfg, key)
        if isinstance(want, (list, tuple)):
            assert tuple(got) == tuple(want), (key, got, want)
            continue
        if key == "pos_enc":
            assert got == want, key
            continue
        if isinstance(want, bool):
            assert bool(got) == want, (key, got, want)
        elif isinstance(want, (int, float)):
            assert float(got) == float(want), (key, got, want)
        elif isinstance(want, str):
            assert got == want, (key, got, want)
    # every reference flag must exist on the Config (full flag-surface
    # coverage, vestigial ones excepted)
    missing = [k for k in ref
               if not hasattr(cfg, k) and k not in _SKIP]
    assert not missing, f"Config lacks reference flags: {missing}"
