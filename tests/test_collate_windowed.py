"""Golden parity: temporal-window concat collate vs the reference's
``collate_custom_fn`` (src/factory.py:77-116). The temporal loader is
vestigial in the reference (``temp_loader: False``,
src/parsers/configs/generic.py:18) but the collate contract is kept."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_compat
from hands_tpu.data.factory import collate_windowed


def _window_sample(rng, window=3):
    inputs = {"img": rng.rand(window, 4, 4).astype(np.float32)}
    targets = {"mano.pose.r": rng.rand(window, 48).astype(np.float32)}
    meta = {
        "intrinsics": rng.rand(window, 3, 3).astype(np.float32),
        "imgname": [f"im{rng.randint(1000)}" for _ in range(window)],
        "query_names": [f"obj{rng.randint(9)}" for _ in range(window)],
    }
    return inputs, targets, meta


def _load_ref_collate():
    """Exec only collate_custom_fn from src/factory.py (importing the module
    pulls in comet_ml, absent here)."""
    import ast
    import types

    path = f"{ref_compat.REF}/src/factory.py"
    with open(path) as f:
        tree = ast.parse(f.read())
    fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name == "collate_custom_fn")
    mod = types.ModuleType("ref_factory_collate")
    mod.torch = torch
    exec(compile(ast.Module([fn], []), path, "exec"), mod.__dict__)
    return mod


def test_collate_windowed_matches_reference():
    ref_factory = _load_ref_collate()
    rng = np.random.RandomState(0)
    samples = [_window_sample(rng) for _ in range(4)]

    def to_torch(s):
        i, t, m = s
        tt = lambda d: {k: torch.from_numpy(v) if isinstance(v, np.ndarray)
                        else v for k, v in d.items()}
        return tt(i), tt(t), tt(m)

    ref_i, ref_t, ref_m = ref_factory.collate_custom_fn(
        [to_torch(s) for s in samples])
    our_i, our_t, our_m = collate_windowed(samples)

    np.testing.assert_array_equal(our_i["img"], ref_i["img"].numpy())
    np.testing.assert_array_equal(our_t["mano.pose.r"],
                                  ref_t["mano.pose.r"].numpy())
    np.testing.assert_array_equal(our_m["intrinsics"],
                                  ref_m["intrinsics"].numpy())
    assert our_m["imgname"] == ref_m["imgname"]
    assert our_m["query_names"] == ref_m["query_names"]
    assert our_i["img"].shape[0] == 12  # 4 samples x 3-frame windows
