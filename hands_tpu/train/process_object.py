"""Template-mesh + interaction-field GT preparation (full-ArcticNet path).

JAX forms of ``/root/reference/src/callbacks/process/process_generic.py``:
T-pose template meshes for hands and objects (root-normalised, joint+vertex
token sequences for graph/transformer decoders) and the GT hand<->object
distance fields (``prepare_interfield``, :97) computed with the batched kNN.
"""

from __future__ import annotations

import jax.numpy as jnp

from hands_tpu.core.object_tensors import (
    ObjectTensors, object_forward_7d,
)
from hands_tpu.core.xdict import XDict
from hands_tpu.ops import knn as knnlib
from hands_tpu.ops import mano as manolib

DIST_MIN, DIST_MAX = 0.0, 0.10  # meters, reference clamp


def prepare_mano_template(batch_size: int, model: manolib.ManoModel,
                          is_right: bool):
    """T-pose MANO, root-normalised; returns (joints+sub_verts tokens,
    joints+full_verts tokens), expanded to batch."""
    zeros = jnp.zeros((1, 10))
    out = manolib.mano_forward(
        model, zeros, jnp.zeros((1, 45)), jnp.zeros((1, 3)))
    root = out.joints[:, :1]
    joints = out.joints - root
    verts = out.vertices - root
    verts_sub = manolib.decimate_verts(out.vertices, is_right) - root

    ref = jnp.concatenate([joints, verts_sub], axis=1)
    ref_full = jnp.concatenate([joints, verts], axis=1)
    tile = lambda x: jnp.broadcast_to(x, (batch_size,) + x.shape[1:])  # noqa
    return tile(ref), tile(ref_full)


def prepare_object_template(batch_size: int, tensors: ObjectTensors,
                            obj_idx: jnp.ndarray):
    """T-pose object (zero articulation/rotation), mm -> m, centred."""
    out = object_forward_7d(
        tensors,
        angles=jnp.zeros((batch_size, 1)),
        global_orient=jnp.zeros((batch_size, 3)),
        transl=None,
        obj_idx=obj_idx,
    )
    v_sub = out["v_sub"] / 1000.0
    v_full = out["v"] / 1000.0
    center = v_sub.mean(axis=1, keepdims=True)
    return (v_sub - center, out["parts_sub_ids"], v_full - center, out["mask"])


def prepare_interfield(targets: XDict, max_dist: float = DIST_MAX) -> XDict:
    """GT hand<->object distance fields + closest-vertex indices
    (process_generic.py:97): dist.ro/.lo per MANO vertex, dist.or/.ol per
    object vertex, clamped to [0, max_dist]."""
    out = XDict(targets)
    v_o = targets["object.v.cam"]
    v_len = targets["object.v_len"]
    for side in ("r", "l"):
        v_h = targets[f"mano.v3d.cam.{side}"]
        d_ho, i_ho = knnlib.compute_dist_mano_to_obj(
            v_h, v_o, v_len, DIST_MIN, max_dist)
        d_oh, i_oh = knnlib.compute_dist_obj_to_mano(
            v_h, v_o, v_len, DIST_MIN, max_dist)
        out[f"dist.{side}o"] = d_ho
        out[f"idx.{side}o"] = i_ho
        out[f"dist.o{side}"] = d_oh
        out[f"idx.o{side}"] = i_oh
    return out
