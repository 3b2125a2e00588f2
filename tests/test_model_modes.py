"""Remaining model modes: pcl, perspective_correction, tf_decoder, dense KPE,
no_crops, separate_hands, vit_b_16."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hands_tpu.config import default_config
from hands_tpu.data.datasets import SyntheticRecordDataset
from hands_tpu.data.device_pipeline import DevicePreprocessor, stack_records
from hands_tpu.models.hands_light import HandsLightModel


def _run(cfg, extra_inputs=None):
    from hands_tpu.data.synthetic import make_batch

    inputs, targets, meta = make_batch(cfg, 2, seed=0)
    if extra_inputs:
        for k, v in extra_inputs.items():
            inputs[k] = v
    model = HandsLightModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    pred = model(variables, inputs, meta, train=False)
    assert np.isfinite(np.asarray(pred["mano.j3d.cam.r"])).all()
    return pred


BASE = dict(backbone="resnet18", compute_dtype="float32", use_glb_feat=False,
            use_grasp_loss=False, use_render_seg_loss=False)


def test_pcl_mode_pipeline_and_model():
    cfg = default_config("hands_light", pos_enc="pcl", **BASE)
    ds = SyntheticRecordDataset(cfg, "train", length=2)
    stacked = stack_records([ds[0], ds[1]])
    pre = DevicePreprocessor(cfg, is_train=False)
    inputs, targets, meta = pre(stacked, jax.random.PRNGKey(0))
    assert inputs["r_rot"].shape == (2, 3, 3)
    # R_virt2orig is a rotation matrix
    R = np.asarray(inputs["r_rot"])
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", R, R),
        np.broadcast_to(np.eye(3), R.shape), atol=1e-5)

    model = HandsLightModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    pred = model(variables, inputs, meta, train=False)
    assert np.isfinite(np.asarray(pred["mano.j2d.norm.l"])).all()


def test_perspective_correction_mode():
    cfg = default_config("hands_light", pos_enc="perspective_correction",
                         **BASE)
    pred = _run(cfg)
    # rotating the global orient keeps valid rotations
    R = np.asarray(pred["mano.pose.r"])[:, 0]
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_tf_decoder_mode():
    cfg = default_config("hands_light", tf_decoder=True,
                         pos_enc="center+corner_latent", **BASE)
    _run(cfg)


def test_dense_latent_mode():
    cfg = default_config("hands_light", pos_enc="dense_latent", **BASE)
    ds = SyntheticRecordDataset(cfg, "train", length=2)
    stacked = stack_records([ds[0], ds[1]])
    pre = DevicePreprocessor(cfg, is_train=False)
    inputs, targets, meta = pre(stacked, jax.random.PRNGKey(0))
    assert "r_dense_angle" in inputs
    model = HandsLightModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    pred = model(variables, inputs, meta, train=False)
    assert np.isfinite(np.asarray(pred["mano.beta.r"])).all()


def test_no_crops_mode():
    cfg = default_config("hands_light", no_crops=True, use_glb_feat=True,
                         pos_enc=None, backbone="resnet18",
                         compute_dtype="float32", use_grasp_loss=False,
                         use_render_seg_loss=False)
    _run(cfg)


def test_separate_hands_mode():
    cfg = default_config("hands_light", separate_hands=True, pos_enc=None,
                         **{k: v for k, v in BASE.items()})
    _run(cfg)


def test_hamer_dense_latent_kpe():
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import DevicePreprocessor, stack_records
    from hands_tpu.models.hamer_light import HamerLightModel

    cfg = default_config("hamer_light", pos_enc="dense_latent",
                         compute_dtype="float32", use_grasp_loss=False,
                         use_render_seg_loss=False)
    ds = SyntheticRecordDataset(cfg, "train", length=2)
    stacked = stack_records([ds[0], ds[1]])
    pre = DevicePreprocessor(cfg, is_train=False)
    inputs, targets, meta = pre(stacked, jax.random.PRNGKey(0))
    assert "r_dense_angle" in inputs
    model = HamerLightModel(cfg, vit_variant="tiny")
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    pred = model(variables, inputs, meta, train=False)
    assert np.isfinite(np.asarray(pred["mano.j3d.cam.r"])).all()


def test_handoccnet_dense_latent_kpe():
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import DevicePreprocessor, stack_records
    from hands_tpu.models.registry import fetch_model

    cfg = default_config("handoccnet_light", pos_enc="dense_latent",
                         compute_dtype="float32", use_grasp_loss=False,
                         use_render_seg_loss=False)
    ds = SyntheticRecordDataset(cfg, "train", length=1)
    stacked = stack_records([ds[0]])
    pre = DevicePreprocessor(cfg, is_train=False)
    inputs, targets, meta = pre(stacked, jax.random.PRNGKey(0))
    model = fetch_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    pred = model(variables, inputs, meta, train=False)
    assert np.isfinite(np.asarray(pred["mano.j2d.norm.l"])).all()


def test_inference_pose_demo_path():
    """Reference wrapper.inference_pose parity: merged inputs./pred./meta_info.
    namespaces (generic/wrapper.py:68-76)."""
    import jax

    from hands_tpu.config import default_config
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.models.hands_light import HandsLightModel
    from hands_tpu.models.registry import inference_pose

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        use_glb_feat=False, use_grasp_loss=False, use_render_seg_loss=False,
    )
    inputs, targets, meta = make_batch(cfg, 1, seed=0)
    model = HandsLightModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    out = inference_pose(model, variables, inputs, meta)
    assert "inputs.img" in out
    assert "pred.mano.j3d.cam.r" in out or any(
        k.startswith("pred.mano") for k in out)
    assert "meta_info.intrinsics" in out
