"""Orbax checkpointing with the reference's selection semantics.

Mirrors ``ModelCheckpoint(monitor='loss__val', save_top_k=3, save_last=True)``
(``/root/reference/scripts_method/train.py:39-47``) and the resume path
(``--resume_ckpt`` restoring optimizer/epoch, ``comet_utils.py:68-69``):
checkpoints live under ``logs/<exp_key>/checkpoints``; ``last`` is always
written; the three best-by-``loss__val`` are kept.

Multi-host: orbax is natively multi-process — ``save`` is a collective
(every process must call it; orbax's primary host performs the directory
ops and replicated-array writes). The manager therefore runs on ALL
processes with the same shared ``ckpt_dir``; only the host-side
bookkeeping (scores.json, stale-checkpoint deletion) is gated to
process 0.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, top_k: int = 3):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.top_k = top_k
        self._ckptr = ocp.StandardCheckpointer()
        self._primary = jax.process_index() == 0
        self._scores_path = os.path.join(self.ckpt_dir, "scores.json")
        self._scores = {}
        if os.path.exists(self._scores_path):
            self._scores = json.load(open(self._scores_path))

    # ------------------------------------------------------------------ save
    def _state_payload(self, state, epoch: int):
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": np.asarray(epoch),
        }

    def save_last(self, state, epoch: int):
        path = os.path.join(self.ckpt_dir, "last")
        self._ckptr.save(path, self._state_payload(state, epoch), force=True)
        self._ckptr.wait_until_finished()

    def save_top_k(self, state, epoch: int, monitor_value: float):
        """Keep the ``top_k`` lowest ``loss__val`` checkpoints."""
        name = f"epoch_{epoch:04d}"
        self._scores[name] = float(monitor_value)
        keep = sorted(self._scores, key=self._scores.get)[: self.top_k]
        if name in keep:
            self._ckptr.save(
                os.path.join(self.ckpt_dir, name),
                self._state_payload(state, epoch), force=True,
            )
            self._ckptr.wait_until_finished()
        for stale in [k for k in self._scores if k not in keep]:
            del self._scores[stale]
            stale_p = os.path.join(self.ckpt_dir, stale)
            if self._primary and os.path.exists(stale_p):
                import shutil

                shutil.rmtree(stale_p, ignore_errors=True)
        if self._primary:
            with open(self._scores_path, "w") as f:
                json.dump(self._scores, f)

    # --------------------------------------------------------------- restore
    def restore(self, state, name: str = "last"):
        """Restore a full train state (resume). Returns (state, epoch)."""
        path = os.path.join(self.ckpt_dir, name)
        target = self._state_payload(state, 0)
        restored = self._ckptr.restore(path, target)
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        return new_state, int(restored["epoch"])

    def restore_params(self, params_like, name: str = "last"):
        """Warm start: params only, tolerant of missing keys (the
        ``load_state_dict(strict=False)`` analogue, train.py:34-37)."""
        path = os.path.join(self.ckpt_dir, name)
        full = self._ckptr.restore(path)
        saved = full.get("params", full)

        def merge(like, got):
            if isinstance(like, dict):
                return {
                    k: merge(v, got[k]) if isinstance(got, dict) and k in got
                    else v
                    for k, v in like.items()
                }
            return got if got is not None else like

        return merge(params_like, saved)

    def has_checkpoint(self, name: str = "last") -> bool:
        return os.path.exists(os.path.join(self.ckpt_dir, name))


def _leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def graft_backbone_variables(variables: dict, tree: dict) -> dict:
    """Warm-start converted backbone weights (``cli/convert_ckpt`` output)
    into a model's variables — the reference's
    ``self.backbone.load_state_dict`` path (hamer_light/model.py:34-44,
    resnet.py:294 ``pretrained=True``).

    The converted tree is scope-less ({"params": {...}, "batch_stats"?});
    every top-level scope of ``variables["params"]`` whose subtree contains
    the converted keys with identical leaf shapes receives the graft (so one
    ResNet checkpoint fills both ``hand_backbone`` and ``glb_backbone``, and
    a ViT one lands in HaMeR's ``backbone``). Raises if nothing matched.
    """
    import copy

    out = copy.deepcopy({k: dict(v) for k, v in variables.items()})
    grafted = []
    for col in ("params", "batch_stats"):
        src = tree.get(col)
        if not src:
            continue
        for scope, sub in out.get(col, {}).items():
            if not isinstance(sub, dict):
                continue
            ok = True
            for path, leaf in _leaf_paths(src):
                node = sub
                for k in path:
                    if not isinstance(node, dict) or k not in node:
                        ok = False
                        break
                    node = node[k]
                if not ok or getattr(node, "shape", None) != np.shape(leaf):
                    ok = False
                    break
            if not ok:
                continue
            new_sub = copy.deepcopy(sub)
            for path, leaf in _leaf_paths(src):
                node = new_sub
                for k in path[:-1]:
                    node = node[k]
                node[path[-1]] = jnp.asarray(leaf)
            out[col][scope] = new_sub
            grafted.append(f"{col}/{scope}")
    if not any(g.startswith("params/") for g in grafted):
        raise ValueError(
            "backbone graft found no matching scope (shapes/structure "
            "mismatch) — check --load_backbone arch vs model backbone")
    return out
