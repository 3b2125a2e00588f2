"""Train-step smoke for the HaMeR and HandOccNet families."""

import jax
import numpy as np
import pytest

from hands_tpu.config import default_config
from hands_tpu.data.synthetic import make_batch
from hands_tpu.train.state import create_train_state
from hands_tpu.train.step import make_train_step


def _one_step(model, cfg, B=1):
    batch = make_batch(cfg, B, seed=0)
    inputs, _, meta = batch
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    state = create_train_state(cfg, variables)
    step = make_train_step(model, cfg)
    state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    return logs


def test_hamer_train_step():
    from hands_tpu.models.hamer_light import HamerLightModel

    cfg = default_config("hamer_light", compute_dtype="float32",
                         use_grasp_loss=True, use_render_seg_loss=False,
                         img_res=160, img_res_ds=160)
    model = HamerLightModel(cfg, vit_variant="tiny")
    logs = _one_step(model, cfg, B=2)
    assert logs["loss/grasp/r"] >= 0


def test_handoccnet_train_step():
    from hands_tpu.models.registry import fetch_model

    cfg = default_config("handoccnet_light", compute_dtype="float32",
                         use_grasp_loss=False, use_render_seg_loss=False,
                         img_res=160, img_res_ds=160)
    model = fetch_model(cfg)
    _one_step(model, cfg, B=1)
