"""Forward-pass smoke + schema checks for every model family in the registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hands_tpu.config import default_config
from hands_tpu.data.synthetic import make_batch

REQUIRED_PRED_KEYS = [
    "mano.pose.r", "mano.pose.l", "mano.beta.r", "mano.beta.l",
    "mano.j3d.cam.r", "mano.j3d.cam.l", "mano.v3d.cam.r", "mano.v3d.cam.l",
    "mano.j2d.norm.r", "mano.j2d.norm.l", "mano.cam_t.wp.r", "mano.cam_t.wp.l",
    "mano.cam_t.wp.init.r", "mano.cam_t.wp.init.l", "mano.cam_t.r",
    "mano.cam_t.l", "mano.joints3d.r", "mano.vertices.l",
]


def _check_pred(pred, B):
    for key in REQUIRED_PRED_KEYS:
        assert key in pred, f"missing prediction key {key}"
        v = np.asarray(pred[key])
        assert v.shape[0] == B
        assert np.isfinite(v).all(), f"non-finite {key}"


def test_arctic_sf_light_forward():
    from hands_tpu.models.registry import fetch_model

    cfg = default_config("arctic_sf_light", backbone="resnet18",
                         compute_dtype="float32")
    model = fetch_model(cfg)
    inputs, _, meta_info = make_batch(cfg, 2, seed=0)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta_info)
    pred = model(variables, inputs, meta_info, train=False)
    _check_pred(pred, 2)


def test_hamer_light_forward_tiny_vit():
    from hands_tpu.models.hamer_light import HamerLightModel

    cfg = default_config("hamer_light", compute_dtype="float32",
                         use_grasp_loss=True)
    model = HamerLightModel(cfg, vit_variant="tiny")
    inputs, _, meta_info = make_batch(cfg, 2, seed=0)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta_info)
    pred = model(variables, inputs, meta_info, train=False)
    _check_pred(pred, 2)
    assert pred["grasp.r"].shape == (2, 9)


def test_handoccnet_light_forward():
    from hands_tpu.models.registry import fetch_model

    cfg = default_config("handoccnet_light", compute_dtype="float32")
    model = fetch_model(cfg)
    inputs, _, meta_info = make_batch(cfg, 1, seed=0)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta_info)
    pred = model(variables, inputs, meta_info, train=False)
    _check_pred(pred, 1)


def test_registry_unknown_method():
    from hands_tpu.models.registry import fetch_model

    with pytest.raises(KeyError):
        fetch_model(default_config("hands_light").replace(method="nope"))


def test_vit_int8_and_fast_gelu_knobs():
    """quant_int8 / fast_gelu: same param tree as the fp path (checkpoints
    load unchanged), small bounded output deviation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hands_tpu.models.backbones.vit import ViTBackbone

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 48, 3), jnp.float32)
    fp = ViTBackbone(variant="tiny")
    params = fp.init(jax.random.PRNGKey(0), x)
    o_fp = np.asarray(fp.apply(params, x))
    for knob in (dict(quant_int8=True), dict(fast_gelu=True)):
        m = ViTBackbone(variant="tiny", **knob)
        # identical param structure: the fp tree applies directly
        o = np.asarray(m.apply(params, x))
        rel = np.abs(o - o_fp).mean() / (np.abs(o_fp).mean() + 1e-9)
        assert 0 < rel < 0.05, (knob, rel)
