"""Eval metric semantics: NaN masking, Procrustes, known values."""

import jax.numpy as jnp
import numpy as np

from hands_tpu.core.xdict import XDict
from hands_tpu.ops.procrustes import similarity_align
from hands_tpu.train import metrics as M


def test_procrustes_exact_recovery(rng):
    """A scaled+rotated+translated cloud aligns back exactly."""
    from hands_tpu.core import rot as rotlib

    S1 = jnp.asarray(rng.randn(4, 21, 3), jnp.float32)
    R = rotlib.axis_angle_to_matrix(jnp.asarray(rng.randn(4, 3), jnp.float32))
    s = jnp.asarray(rng.rand(4) * 2 + 0.5, jnp.float32)
    t = jnp.asarray(rng.randn(4, 3), jnp.float32)
    S2 = s[:, None, None] * jnp.einsum("bij,bnj->bni", R, S1) + t[:, None, :]
    S1_hat = similarity_align(S1, S2)
    np.testing.assert_allclose(np.asarray(S1_hat), np.asarray(S2), atol=1e-4)


def test_procrustes_reflection_handled(rng):
    """Mirrored clouds must still produce det(R)=+1 alignment (no flip)."""
    S1 = jnp.asarray(rng.randn(2, 21, 3), jnp.float32)
    S2 = S1 * jnp.asarray([-1.0, 1.0, 1.0])
    S1_hat = similarity_align(S1, S2)
    assert np.isfinite(np.asarray(S1_hat)).all()


def _fake_eval_batch(B=4):
    rs = np.random.RandomState(0)
    j3d_r = jnp.asarray(rs.randn(B, 21, 3), jnp.float32)
    j3d_l = jnp.asarray(rs.randn(B, 21, 3), jnp.float32)
    targets = XDict({
        "mano.j3d.cam.r": j3d_r,
        "mano.j3d.cam.l": j3d_l,
        "mano.j2d.r": jnp.asarray(rs.rand(B, 21, 2) * 224, jnp.float32),
        "mano.j2d.l": jnp.asarray(rs.rand(B, 21, 2) * 224, jnp.float32),
        "is_valid": jnp.ones(B),
        "right_valid": jnp.asarray([1.0, 1, 0, 1]),
        "left_valid": jnp.asarray([1.0, 0, 0, 1]),
        "joints_valid_r": jnp.ones((B, 21)),
        "joints_valid_l": jnp.ones((B, 21)),
    })
    return targets


def test_mpjpe_perfect_pred_is_zero():
    targets = _fake_eval_batch()
    pred = XDict({
        "mano.j3d.cam.r": targets["mano.j3d.cam.r"],
        "mano.j3d.cam.l": targets["mano.j3d.cam.l"],
    })
    out = M.eval_mpjpe_ra(pred, targets, XDict())
    v = np.asarray(out["mpjpe/ra/h"])
    # valid entries ~0; sample 2 (both hands invalid) must be NaN
    assert np.isnan(v[2])
    np.testing.assert_allclose(v[[0, 1, 3]], 0.0, atol=1e-3)


def test_mpjpe_known_offset():
    """Root-aligned MPJPE of a rigid translation is zero; of a per-joint
    1mm jitter is ~1mm."""
    targets = _fake_eval_batch()
    pred = XDict({
        "mano.j3d.cam.r": targets["mano.j3d.cam.r"] + 0.5,  # rigid -> RA kills it
        "mano.j3d.cam.l": targets["mano.j3d.cam.l"],
    })
    out = M.eval_mpjpe_ra(pred, targets, XDict())
    np.testing.assert_allclose(np.asarray(out["mpjpe/ra/h"])[0], 0.0, atol=1e-3)


def test_mrrpe():
    targets = _fake_eval_batch()
    pred = XDict({
        "mano.j3d.cam.r": targets["mano.j3d.cam.r"],
        "mano.j3d.cam.l": targets["mano.j3d.cam.l"] + jnp.asarray([0.01, 0, 0]),
    })
    out = M.eval_mrrpe_rl(pred, targets, XDict())
    v = np.asarray(out["mrrpe/r/l"])
    np.testing.assert_allclose(v[0], 10.0, rtol=1e-4)  # 10mm
    assert np.isnan(v[1]) and np.isnan(v[2])  # left/both invalid


def test_pix_err_nan_masking():
    targets = _fake_eval_batch()
    pred = XDict({
        "mano.j2d.r": targets["mano.j2d.r"] + 2.0,
        "mano.j2d.l": targets["mano.j2d.l"],
    })
    out = M.eval_pix_err(pred, targets, XDict())
    v = np.asarray(out["pix_err/h"])
    assert v.shape == (4, 42)
    # right err = |(2,2)| = 2*sqrt(2) for valid rows
    np.testing.assert_allclose(v[0, :21], 2 * np.sqrt(2), rtol=1e-5)
    assert np.isnan(v[2]).all()  # fully invalid sample
