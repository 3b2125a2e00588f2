"""Train state + optimiser construction.

Optimiser semantics follow the reference (``common/abstract_pl.py:178``):
Adam at ``cfg.lr`` with a MultiStep schedule (decay by ``1/lr_dec_factor`` at
``lr_dec_epoch`` boundaries), global-norm gradient clipping at
``cfg.grad_clip`` (``scripts_method/train.py:58``), and gradient accumulation
over ``cfg.acc_grad`` micro-batches (``train.py:60``) via ``optax.MultiSteps``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from hands_tpu.config import Config


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000):
    if cfg.lr_dec_epoch:
        boundaries = {
            int(e) * steps_per_epoch: 1.0 / cfg.lr_dec_factor
            for e in cfg.lr_dec_epoch
        }
        schedule = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    else:
        schedule = cfg.lr
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(schedule),
    )
    if cfg.acc_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.acc_grad)
    return tx


def create_train_state(cfg: Config, variables, steps_per_epoch: int = 1000):
    tx = make_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
