"""Jitted, mesh-sharded train / eval steps.

The TPU equivalent of the reference's Lightning ``training_step`` →
``GenericWrapper.forward`` → backward/clip/step chain
(``common/abstract_pl.py:46``, ``src/models/generic/wrapper.py:77``): one
fused XLA program per step containing GT processing (stop-gradient), the
model forward, flag-gated losses, backward, clipping, and the Adam update.
Data parallelism is expressed with ``NamedSharding`` on the batch; XLA
inserts the gradient all-reduce over the mesh's ``data`` axis (ICI).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from hands_tpu.config import Config
from hands_tpu.core.xdict import XDict
from hands_tpu.train import losses as losslib
from hands_tpu.train import metrics as metriclib
from hands_tpu.train.process import process_data_light
from hands_tpu.train.state import TrainState


def _forward_and_loss(model, cfg: Config, params, batch_stats, batch, rng,
                      train: bool):
    inputs, targets, meta_info = batch
    inputs, targets, meta_info = process_data_light(
        model.mano_r, model.mano_l, inputs, targets, meta_info, cfg.img_res
    )
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"dropout": rng} if train else None
    if train:
        pred, new_state = model(
            variables, inputs, meta_info, train=True, rngs=rngs, mutable=True
        )
        new_bs = new_state.get("batch_stats", batch_stats)
    else:
        pred = model(variables, inputs, meta_info, train=False)
        new_bs = batch_stats
    loss_dict = losslib.compute_loss_light(pred, targets, meta_info, cfg)
    total = losslib.total_loss(loss_dict)
    return total, (loss_dict, pred, targets, new_bs)


def make_train_step(model, cfg: Config, donate: bool = True) -> Callable:
    """Returns jitted ``train_step(state, batch, rng) -> (state, logs)``.

    ``donate=True`` donates the input state (halves peak param memory on
    TPU); callers that reuse the pre-step state must pass ``donate=False``.
    """

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            return _forward_and_loss(
                model, cfg, params, state.batch_stats, batch, rng, train=True
            )

        grads, (loss_dict, _, _, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        logs = {k: v for k, (v, _) in loss_dict.items()}
        logs["loss"] = losslib.total_loss(loss_dict)
        # pre-clip global grad norm (common/torch_utils.py:grad_norm)
        logs["grad_norm"] = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree.leaves(grads)))
        return new_state, logs

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, cfg: Config, metric_specs=None) -> Callable:
    """Returns jitted ``eval_step(state, batch) -> (metrics XDict, loss dict)``.

    Mirrors wrapper.forward(mode="test"): forward, loss (for loss__val
    checkpoint selection), 2D denorm, batched metrics.
    """
    metric_specs = metric_specs or ["mrrpe.rl", "mpjpe.ra", "mpjpe.pa.ra", "pix_err"]

    def eval_step(state: TrainState, batch):
        total, (loss_dict, pred, targets, _) = _forward_and_loss(
            model, cfg, state.params, state.batch_stats, batch,
            jax.random.PRNGKey(0), train=False,
        )
        # denormalise 2D keys for pixel metrics (wrapper.py:118-134)
        pred = XDict(pred)
        targets = XDict(targets)
        for key in list(pred.keys()):
            if "2d.norm" in key:
                denorm = key.replace(".norm", "")
                pred[denorm] = 0.5 * cfg.img_res * (pred[key][..., :2] + 1)
        for key in list(targets.keys()):
            if "2d.norm" in key:
                denorm = key.replace(".norm", "")
                targets[denorm] = 0.5 * cfg.img_res * (targets[key][..., :2] + 1)

        _, _, meta_info = batch
        metrics = metriclib.evaluate_metrics(pred, targets, meta_info, metric_specs)
        logs = {k: v for k, (v, _) in loss_dict.items()}
        logs["loss"] = total
        return metrics, logs

    return jax.jit(eval_step)
