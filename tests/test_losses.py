"""Loss kernel semantics: masking, flag gating, zero-guards."""

import jax.numpy as jnp
import numpy as np

from hands_tpu.train import losses


def test_vector_loss_masks_invalid():
    pred = jnp.ones((4, 3))
    gt = jnp.zeros((4, 3))
    valid = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    out = np.asarray(losses.vector_loss(pred, gt, valid))
    assert out.shape == (4, 3)
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[0], 1.0)


def test_vector_loss_zero_guard():
    """All-invalid batch must produce exactly zero (reference
    loss_modules.py:101-105), not a mean over garbage."""
    pred = jnp.full((4, 3), 100.0)
    gt = jnp.zeros((4, 3))
    valid = jnp.zeros(4)
    out = np.asarray(losses.vector_loss(pred, gt, valid))
    np.testing.assert_allclose(out, 0.0)


def test_joints_loss_per_joint_mask():
    pred = jnp.ones((2, 5, 2))
    gt = jnp.zeros((2, 5, 2))
    jv = jnp.asarray([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]], jnp.float32)
    out = np.asarray(losses.joints_loss(pred, gt, jv)).reshape(2, 5, 2)
    assert out[0, 2:].sum() == 0
    assert out[0, :2].sum() == 4


def test_hand_kp3d_root_aligned():
    """A constant offset between pred and gt must vanish (root alignment)."""
    gt = jnp.asarray(np.random.RandomState(0).randn(2, 21, 3), jnp.float32)
    pred = gt + 5.0
    jv = jnp.ones((2, 21))
    out = np.asarray(losses.hand_kp3d_loss(pred, gt, jv))
    np.testing.assert_allclose(out, 0.0, atol=1e-9)


def test_grasp_ce_masked():
    logits = jnp.zeros((3, 9))
    labels = jnp.asarray([0, 1, 2])
    valid = jnp.asarray([1.0, 0.0, 1.0])
    out = np.asarray(losses.grasp_ce_loss(logits, labels, valid)).ravel()
    assert out[1] == 0
    np.testing.assert_allclose(out[0], np.log(9.0), rtol=1e-5)


def test_flag_gating_drops_terms():
    """Per-dataset flags must zero the corresponding loss terms."""
    from hands_tpu.config import default_config
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.core.xdict import XDict

    from hands_tpu.ops import mano as manolib
    from hands_tpu.train.process import process_data_light

    cfg = default_config("hands_light", use_grasp_loss=False,
                         use_render_seg_loss=False)
    inputs, targets, meta_info = make_batch(cfg, 2, seed=0)
    _, targets, meta_info = process_data_light(
        manolib.load_mano(True), manolib.load_mano(False),
        inputs, targets, meta_info, cfg.img_res,
    )

    # fabricate a pred that disagrees with GT everywhere
    B = 2
    pred = XDict({
        "mano.pose.r": jnp.zeros((B, 16, 3, 3)) + jnp.eye(3),
        "mano.pose.l": jnp.zeros((B, 16, 3, 3)) + jnp.eye(3),
        "mano.beta.r": jnp.ones((B, 10)),
        "mano.beta.l": jnp.ones((B, 10)),
        "mano.j3d.cam.r": jnp.ones((B, 21, 3)),
        "mano.j3d.cam.l": jnp.ones((B, 21, 3)),
        "mano.j2d.norm.r": jnp.ones((B, 21, 2)),
        "mano.j2d.norm.l": jnp.ones((B, 21, 2)),
        "mano.cam_t.wp.r": jnp.ones((B, 3)),
        "mano.cam_t.wp.l": jnp.ones((B, 3)),
        "mano.cam_t.wp.init.r": jnp.ones((B, 3)),
        "mano.cam_t.wp.init.l": jnp.ones((B, 3)),
    })

    ld_on = losses.compute_loss_light(pred, targets, meta_info, cfg)
    meta_off = XDict(meta_info)
    for k in ["is_j2d_loss", "is_j3d_loss", "is_pose_loss", "is_beta_loss",
              "is_cam_loss"]:
        meta_off.overwrite(k, jnp.zeros(B))
    ld_off = losses.compute_loss_light(pred, targets, meta_off, cfg)

    assert float(losses.total_loss(ld_on)) > 0
    np.testing.assert_allclose(float(losses.total_loss(ld_off)), 0.0, atol=1e-9)
