"""Optimizer semantics: MultiStep LR schedule, grad accumulation, clipping."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hands_tpu.config import default_config
from hands_tpu.train.state import create_train_state, make_optimizer


def _toy_state(cfg, steps_per_epoch=10):
    variables = {"params": {"w": jnp.ones(4)}}
    return create_train_state(cfg, variables, steps_per_epoch=steps_per_epoch)


def test_lr_decays_at_boundaries():
    cfg = default_config("hands_light", lr=1e-2, lr_dec_epoch=(1,),
                         lr_dec_factor=10.0)
    state = _toy_state(cfg, steps_per_epoch=2)
    grads = {"w": jnp.ones(4)}
    deltas = []
    for _ in range(4):
        old = state.params["w"]
        state = state.apply_gradients(grads)
        deltas.append(float(jnp.abs(state.params["w"] - old).mean()))
    # Adam step size ~ lr; after the boundary (step 2) it drops ~10x
    assert deltas[0] / deltas[3] > 5.0


def test_grad_accumulation():
    cfg = default_config("hands_light", lr=1e-2, acc_grad=2)
    state = _toy_state(cfg)
    grads = {"w": jnp.ones(4)}
    p0 = state.params["w"]
    state = state.apply_gradients(grads)
    # first micro-step: params unchanged (accumulating)
    np.testing.assert_allclose(np.asarray(state.params["w"]), np.asarray(p0))
    state = state.apply_gradients(grads)
    assert float(jnp.abs(state.params["w"] - p0).sum()) > 0


def test_gradient_clipping():
    cfg = default_config("hands_light", lr=1.0, grad_clip=1.0)
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros(4)}
    opt_state = tx.init(params)
    huge = {"w": jnp.full(4, 1e6)}
    updates, _ = tx.update(huge, opt_state, params)
    # post-clip global norm fed into adam; update magnitude bounded ~lr
    assert float(jnp.abs(updates["w"]).max()) < 10.0


def test_pck_metric():
    from hands_tpu.core.xdict import XDict
    from hands_tpu.train.metrics import eval_pck

    B = 2
    gt = jnp.zeros((B, 21, 2))
    pred_good = XDict({"mano.j2d.r": gt + 3.0, "mano.j2d.l": gt + 3.0})
    targets = XDict({
        "mano.j2d.r": gt, "mano.j2d.l": gt,
        "is_valid": jnp.ones(B), "right_valid": jnp.ones(B),
        "left_valid": jnp.ones(B),
        "joints_valid_r": jnp.ones((B, 21)),
        "joints_valid_l": jnp.ones((B, 21)),
    })
    out = eval_pck(pred_good, targets, XDict())
    # err = 3*sqrt(2) ~ 4.24 < 5 -> 100% at 5px
    np.testing.assert_allclose(np.asarray(out["pck/5px"]), 100.0)
