"""Golden parity for the sequence/object acceleration metrics and a
registry-diff guarantee that every key in the reference's ``eval_fn_dict``
(``src/utils/eval_modules.py:708``) has a counterpart (or a documented drop).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_compat
from hands_tpu.train import metrics as hand_metrics
from hands_tpu.train import metrics_object as mo

pytestmark = pytest.mark.heavy


def _seq_fixture(T=20, Vh=16, Vo=12, seed=0):
    """Synthetic sequence with invalid frames sprinkled in so the
    3-frame acc validity window and per-hand validity both matter."""
    rng = np.random.RandomState(seed)
    f32 = np.float32

    def r(*shape):
        return rng.randn(*shape).astype(f32)

    targets = {
        "mano.v3d.cam.r": r(T, Vh, 3),
        "mano.v3d.cam.l": r(T, Vh, 3),
        "mano.j3d.cam.r": r(T, 5, 3),
        "mano.j3d.cam.l": r(T, 5, 3),
        "object.v.cam": r(T, Vo, 3),
        "object.parts_ids": np.tile(
            rng.randint(1, 3, size=(Vo,)).astype(np.int64), (T, 1)),
        "is_valid": (rng.rand(T) > 0.15).astype(f32),
        "right_valid": (rng.rand(T) > 0.2).astype(f32),
        "left_valid": (rng.rand(T) > 0.2).astype(f32),
        "dist.ro": np.abs(r(T, Vh)) * 0.01,
        "dist.lo": np.abs(r(T, Vh)) * 0.01,
        "dist.or": np.abs(r(T, Vo)) * 0.01,
        "dist.ol": np.abs(r(T, Vo)) * 0.01,
    }
    # ensure at least one part-2 ("bottom") vertex for the object root
    targets["object.parts_ids"][:, 0] = 2
    pred = {
        "mano.v3d.cam.r": targets["mano.v3d.cam.r"] + 0.01 * r(T, Vh, 3),
        "mano.v3d.cam.l": targets["mano.v3d.cam.l"] + 0.01 * r(T, Vh, 3),
        "mano.j3d.cam.r": targets["mano.j3d.cam.r"] + 0.01 * r(T, 5, 3),
        "mano.j3d.cam.l": targets["mano.j3d.cam.l"] + 0.01 * r(T, 5, 3),
        "object.v.cam": targets["object.v.cam"] + 0.01 * r(T, Vo, 3),
        "dist.ro": targets["dist.ro"] + 0.001 * r(T, Vh),
        "dist.lo": targets["dist.lo"] + 0.001 * r(T, Vh),
        # reference slices pred object fields to the GT's num_verts
        # (eval_modules.py:638-642): give pred 3 extra padded verts
        "dist.or": np.concatenate(
            [targets["dist.or"] + 0.001 * r(T, Vo), np.zeros((T, 3), f32)], 1),
        "dist.ol": np.concatenate(
            [targets["dist.ol"] + 0.001 * r(T, Vo), np.zeros((T, 3), f32)], 1),
    }
    return pred, targets


def _to_torch(d):
    return {k: torch.from_numpy(np.asarray(v)) for k, v in d.items()}


@pytest.mark.parametrize("seed", [0, 2])
def test_acc_err_pose_matches_reference(seed):
    ref_ev = ref_compat.load_eval_modules()
    pred, targets = _seq_fixture(seed=seed)
    ref_out = ref_ev.eval_acc_pose(_to_torch(pred), _to_torch(targets), {})

    Vo = targets["object.v.cam"].shape[1]
    meta = {"object.v.mask": np.ones((targets["is_valid"].shape[0], Vo),
                                     np.float32),
            "part_ids": targets["object.parts_ids"].astype(np.float32)}
    ours = mo.eval_acc_pose(pred, targets, meta)
    for key in ["acc/h", "acc/o"]:
        np.testing.assert_allclose(
            np.asarray(ours[key]), ref_out[key], rtol=2e-4, atol=2e-4,
            err_msg=key)


@pytest.mark.parametrize("seed", [0, 2])
def test_acc_err_field_matches_reference(seed):
    ref_ev = ref_compat.load_eval_modules()
    pred, targets = _seq_fixture(seed=seed)
    ref_out = ref_ev.eval_acc_field(_to_torch(pred), _to_torch(targets), {})

    T = targets["is_valid"].shape[0]
    Vo = targets["object.v.cam"].shape[1]
    # dense repo form: pred padded to Vo+3, mask marks the real verts
    mask = np.concatenate(
        [np.ones((T, Vo), np.float32), np.zeros((T, 3), np.float32)], 1)
    targets_padded = dict(targets)
    for k in ["dist.or", "dist.ol"]:
        targets_padded[k] = np.concatenate(
            [targets[k], np.zeros((T, 3), np.float32)], 1)
    meta = {"object.v.mask": mask}
    ours = mo.eval_acc_field(pred, targets_padded, meta)
    for key in ["acc/ho", "acc/oh"]:
        np.testing.assert_allclose(
            np.asarray(ours[key]), ref_out[key], rtol=2e-4, atol=2e-4,
            err_msg=key)


def test_registry_covers_reference_eval_fn_dict():
    """Every key of the reference registry (eval_modules.py:708-722) maps to
    a repo implementation or a documented drop."""
    ref_ev = ref_compat.load_eval_modules()
    ref_keys = set(ref_ev.eval_fn_dict)

    covered = {
        # hand metric registry (train/metrics.py)
        "mpjpe.ra", "mpjpe.pa.ra", "mrrpe.rl", "pix_err",
        # object/sequence registry (train/metrics_object.py)
        "aae", "success_rate", "avg_err_field", "cdev",
        "acc_err_pose", "acc_err_field",
        # "mrrpe" in the reference is hand-root->object-root
        # (eval_modules.py:345) == our eval_mrrpe_ro
        "mrrpe",
        # sequence-level, host-side function (not dict-dispatched here)
        "mdev",
    }
    # sanity: the claimed coverage really exists in the repo registries
    assert {"mpjpe.ra", "mpjpe.pa.ra", "mrrpe.rl",
            "pix_err"} <= set(hand_metrics.eval_fn_dict)
    assert {"aae", "success_rate", "avg_err_field", "cdev", "acc_err_pose",
            "acc_err_field", "mrrpe.ro"} <= set(mo.object_eval_fn_dict)
    assert callable(mo.eval_motion_deviation)

    # "mpjpe.mano" is a reference latent bug: eval_fn_dict references an
    # undefined eval_mpjpe_mano (eval_modules.py:711) -- importing the module
    # raises NameError; documented drop (SURVEY 7.3, PARITY.md).
    missing = ref_keys - covered - {"mpjpe.mano"}
    assert not missing, f"uncovered reference eval keys: {missing}"
