"""The training/eval loop: the TPU-native ``AbstractPL`` + Lightning Trainer
(``/root/reference/common/abstract_pl.py:46-177``, ``scripts_method/
train.py:57-83``).

Semantics preserved: running-window mean of *unweighted* per-term losses
logged every ``log_every`` steps; validation every ``eval_every_epoch``
epochs with per-image metric arrays nanmean'd and ``__val``-postfixed;
checkpoint selection on min ``loss__val`` (top-3 + last); one sanity val
batch before training; full resume restoring optimizer/epoch.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Optional

import jax
import numpy as np

from hands_tpu.config import Config
from hands_tpu.core.xdict import device_view
from hands_tpu.train.checkpoint import CheckpointManager
from hands_tpu.train.state import create_train_state
from hands_tpu.train.step import make_eval_step, make_train_step
from hands_tpu.utils.experiment import Experiment


class Trainer:
    def __init__(self, cfg: Config, model, experiment: Optional[Experiment] = None):
        self.cfg = cfg
        self.model = model
        self.exp = experiment or Experiment(cfg)
        self.ckpt = CheckpointManager(self.exp.ckpt_dir)
        self.train_step = make_train_step(model, cfg)
        metric_specs = (
            ["pix_err"] if cfg.val_dataset == "epic"
            else ["mrrpe.rl", "mpjpe.ra", "mpjpe.pa.ra", "pix_err"]
        )
        self.eval_step = make_eval_step(model, cfg, metric_specs)
        # ZeRO-3 FSDP (Config.fsdp): shard TrainState + batches over the
        # data mesh; the jitted steps are unchanged — GSPMD inserts the
        # per-layer all-gathers / grad reduce-scatters (parallel/fsdp.py).
        # Multi-host (jax.distributed initialised by cli/train.py): the same
        # mesh spans every host's devices over DCN, batches are assembled
        # from per-host shards, and only process 0 writes checkpoints.
        self.mesh = None
        self.multihost = jax.process_count() > 1
        if ((cfg.get("fsdp", False) or self.multihost)
                and len(jax.devices()) > 1):
            from hands_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
        if self.multihost:
            # establish the cross-process collective context with a trivial
            # psum BEFORE the minutes-long first train-step program: context
            # init has a short rendezvous deadline (30 s on gloo) and
            # processes reach the first collective of a freshly-compiled
            # program far more than that apart; the context is keyed by the
            # participating ranks and reused by every later collective
            from jax.sharding import NamedSharding, PartitionSpec as P

            probe = jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, P(cfg.mesh_axis_names[0])),
                np.ones((jax.local_device_count(),), np.float32))
            assert float(jax.jit(lambda t: t.sum())(probe)) == \
                jax.device_count()

    def _place_state(self, state):
        """FSDP/multi-host state placement, once before the loop (no-op
        otherwise). Multi-host without FSDP = DDP-style: params + optimiser
        replicated over the global mesh."""
        if self.mesh is None:
            return state
        if self.multihost and not self.cfg.get("fsdp", False):
            from hands_tpu.parallel.distributed import replicate_tree_global

            return replicate_tree_global(state, self.mesh)
        from hands_tpu.parallel.fsdp import shard_train_state

        return shard_train_state(state, self.mesh)

    def _place_batch(self, batch):
        """Batch-shard one batch over the data mesh (no-op otherwise).
        Multi-host: the loader yields this host's row range only; assemble
        the global batch-sharded arrays from the local shards."""
        if self.mesh is None:
            return batch
        if self.multihost:
            from hands_tpu.parallel.distributed import shard_batch_global

            return shard_batch_global(batch, self.mesh)
        from hands_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, self.mesh)

    def _save_last(self, state, epoch):
        # orbax save is itself a multi-process collective (every process
        # calls it; orbax's primary host writes) — do NOT gate it per rank,
        # that deadlocks its internal sync_global_processes barrier
        self.ckpt.save_last(state, epoch)

    def _save_top_k(self, state, epoch, monitor_value):
        self.ckpt.save_top_k(state, epoch, monitor_value)

    # ------------------------------------------------------------------ fit
    def fit(self, train_loader, val_loader=None, num_epochs: Optional[int] = None):
        cfg = self.cfg
        num_epochs = num_epochs or cfg.num_epoch

        first = (train_loader.peek() if hasattr(train_loader, "peek")
                 else next(iter(train_loader)))
        inputs, _, meta = first
        meta_dev = device_view(meta)
        variables = self.model.init(jax.random.PRNGKey(cfg.seed), inputs, meta_dev)
        if cfg.get("load_backbone", ""):
            # pretrained backbone warm start from a cli/convert_ckpt orbax
            # dir (the reference's load_state_dict path, hamer model.py:34-44)
            from hands_tpu.cli.convert_ckpt import load_orbax
            from hands_tpu.train.checkpoint import graft_backbone_variables

            variables = graft_backbone_variables(
                variables, load_orbax(cfg.load_backbone))
            print(f"grafted pretrained backbone from {cfg.load_backbone}")
        state = create_train_state(cfg, variables, steps_per_epoch=len(train_loader))

        start_epoch = 0
        if cfg.resume_ckpt and self.ckpt.has_checkpoint("last"):
            state, start_epoch = self.ckpt.restore(state, "last")
            print(f"resumed from epoch {start_epoch}")
        elif cfg.load_ckpt:
            import os

            warm = CheckpointManager(os.path.dirname(cfg.load_ckpt))
            params = warm.restore_params(
                state.params, os.path.basename(cfg.load_ckpt))
            state = state.replace(params=params)

        state = self._place_state(state)

        # one sanity val batch before training (train.py:70)
        if val_loader is not None:
            self._sanity_val(state, val_loader)

        rng = jax.random.PRNGKey(cfg.seed)
        global_step = int(state.step)
        window = defaultdict(list)
        # --profile_steps N: jax.profiler trace of steps [2, 2+N) (rank 0)
        tracer = None
        if cfg.get("profile_steps", 0) and jax.process_index() == 0:
            import os

            from hands_tpu.utils.profiling import StepTrace

            tracer = StepTrace(os.path.join(self.exp.dir, "trace"),
                               cfg.profile_steps)
        step_in_run = 0
        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            for batch in train_loader:
                if tracer is not None:
                    tracer.update(step_in_run)
                inputs, targets, meta = batch
                meta_dev = device_view(meta)
                rng, sub = jax.random.split(rng)
                state, logs = self.train_step(
                    state, self._place_batch((inputs, targets, meta_dev)), sub)
                global_step += 1
                step_in_run += 1
                for k, v in logs.items():
                    window[k].append(float(v))
                if cfg.debug and not np.isfinite(window["loss"][-1]):
                    # xdict.has_invalid analog (hmr_layer.py:85): fail fast
                    # in --debug; NaN-masked metric arrays are exempt by
                    # construction (only the scalar loss is checked)
                    raise FloatingPointError(
                        f"non-finite loss at step {global_step}")
                if global_step % cfg.log_every == 0:
                    means = {k: float(np.mean(v)) for k, v in window.items()}
                    self.exp.log_dict(means, global_step, postfix="__train")
                    window.clear()
                if cfg.save_every_steps and \
                        global_step % cfg.save_every_steps == 0:
                    # mid-epoch preemption checkpoint (resume replays the
                    # rest of the epoch; step counter is restored exactly)
                    self._save_last(state, epoch)

            epoch_time = time.time() - t0
            self.exp.log_dict({"epoch_time_s": epoch_time}, global_step)

            if val_loader is not None and (epoch + 1) % cfg.eval_every_epoch == 0:
                val_metrics = self.validate(state, val_loader)
                self.exp.log_dict(val_metrics, global_step, postfix="__val")
                self._save_top_k(state, epoch, val_metrics["loss"])
                if not cfg.no_vis and not self.multihost:
                    # vis renders host-side from one local batch; under
                    # multi-host a single-host eval run produces it
                    self.visualize(state, val_loader, global_step)
            self._save_last(state, epoch + 1)
        if tracer is not None:
            tracer.close()
        return state

    # ------------------------------------------------------------ visualise
    def visualize(self, state, loader, step: int, max_examples: int = 1):
        """Render kp/mesh overlays for one batch and push to the experiment
        (abstract_pl.py:164-168 / visualize_all)."""
        from hands_tpu.core.xdict import XDict
        from hands_tpu.utils.vis import visualize_all

        batch = next(iter(loader))
        inputs, targets, meta = batch
        meta_dev = device_view(meta)
        # populate GT FK keys (v3d/j3d.cam) so the GT render panel exists
        # (reference wrapper mode='vis' runs process_data first)
        if hasattr(self.model, "mano_r"):
            from hands_tpu.train.process import process_data_light

            inputs, targets, meta_dev = process_data_light(
                self.model.mano_r, self.model.mano_l, inputs, targets,
                meta_dev, self.cfg.img_res)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        pred = self.model(variables, inputs, meta_dev, train=False)
        vis_dict = XDict()
        vis_dict.merge(XDict(inputs).prefix("inputs."))
        vis_dict.merge(XDict(pred).prefix("pred."))
        vis_dict.merge(XDict(targets).prefix("targets."))
        vis_dict.merge(XDict(meta_dev).prefix("meta_info."))
        try:
            images = visualize_all(vis_dict, self.cfg, max_examples)
            self.exp.push_images(images, step)
        except Exception as e:  # vis must never kill a training run
            print(f"visualization failed (non-fatal): {e}")

    # ------------------------------------------------------------- validate
    def _sanity_val(self, state, val_loader):
        batch = next(iter(val_loader))
        inputs, targets, meta = batch
        self.eval_step(
            state, self._place_batch((inputs, targets, device_view(meta))))

    def validate(self, state, val_loader) -> dict:
        """Eval epoch: nanmean of per-image metric arrays + mean losses
        (abstract_pl.py:119-141 / pl_utils.reform_outputs)."""
        metric_arrays = defaultdict(list)
        losses = defaultdict(list)
        for batch in val_loader:
            inputs, targets, meta = batch
            metrics, logs = self.eval_step(
                state,
                self._place_batch((inputs, targets, device_view(meta))))
            if self.multihost:
                # per-image metric rows are batch-sharded over hosts; gather
                # so every host nanmeans the identical full array
                from hands_tpu.parallel.distributed import gather_to_host

                metrics = gather_to_host(dict(metrics))
            for k, v in metrics.items():
                metric_arrays[k].append(np.asarray(v))
            for k, v in logs.items():
                losses[k].append(float(v))
        out = {}
        for k, arrs in metric_arrays.items():
            out["metric." + k] = float(np.nanmean(np.concatenate(arrs, axis=0)))
        for k, vals in losses.items():
            out[k] = float(np.mean(vals))
        return out
