"""ARCTIC articulated-object model in pure JAX.

Re-design of ``/root/reference/common/object_tensors.py:36-295``: the 11
two-part objects (box, capsulemachine, ketchup, laptop, microwave, mixer,
notebook, phone, scissors, waffleiron, espressomachine) articulate about a
z-axis hinge; ``forward_7d`` applies articulation (top part only) + global
rotation + translation to padded vertices / sub-vertices / 3D bbox corners /
keypoints. All transforms are batched quaternion rotations; ragged meshes
are padded to a fixed max length with a mask (XLA-static shapes instead of
the reference's per-sample list padding).

Mesh data comes from ARCTIC's downloads (``$DATA_DIR/arctic/.../meta``)
when present (OBJ parsing is built in — no trimesh dependency), else a
deterministic synthetic object set with the same structure.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, List, NamedTuple

import jax.numpy as jnp
import numpy as np

from hands_tpu.core import rot as rotlib
from hands_tpu.core.xdict import XDict

OBJECTS = [
    "capsulemachine", "box", "ketchup", "laptop", "microwave", "mixer",
    "notebook", "espressomachine", "waffleiron", "scissors", "phone",
]

Z_AXIS = np.asarray([0.0, 0.0, -1.0], np.float32)


def parse_obj(path: str):
    """Minimal wavefront OBJ parser: vertices + triangle faces."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:4]]
                faces.append(idx)
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


class ObjectTensors(NamedTuple):
    """Padded per-object tensors, stacked over the 11 objects."""

    v: jnp.ndarray  # (O, Vmax, 3) padded template vertices (mm)
    mask: jnp.ndarray  # (O, Vmax) valid-vertex mask
    v_len: jnp.ndarray  # (O,)
    v_sub: jnp.ndarray  # (O, S, 3) subsampled verts
    parts_ids: jnp.ndarray  # (O, Vmax) 1=top(articulated) 2=bottom
    parts_sub_ids: jnp.ndarray  # (O, S)
    f: jnp.ndarray  # (O, Fmax, 3) padded faces
    f_len: jnp.ndarray  # (O,)
    bbox_top: jnp.ndarray  # (O, 8, 3)
    bbox_bottom: jnp.ndarray  # (O, 8, 3)
    kp_top: jnp.ndarray  # (O, 16, 3)
    kp_bottom: jnp.ndarray  # (O, 16, 3)
    diameter: jnp.ndarray  # (O,)


def _synthetic_object(rng: np.random.RandomState, n_v: int):
    """Two-part box-ish object: top half articulates about z."""
    v = rng.randn(n_v, 3).astype(np.float32) * 40.0  # mm scale
    parts = np.where(v[:, 2] > 0, 1, 2).astype(np.int32)  # 1=top, 2=bottom
    f = rng.randint(0, n_v, (2 * n_v, 3)).astype(np.int32)
    return v, parts, f


@lru_cache(maxsize=1)
def build_object_tensors(n_sub: int = 600) -> ObjectTensors:
    """Load ARCTIC object meshes if available, else synthesize."""
    base = os.path.join(
        os.environ.get("DATA_DIR", ""),
        "arctic/data/arctic_data/data/meta/object_vtemplates",
    )
    rng = np.random.RandomState(7)
    vs, parts, fs = [], [], []
    for i, name in enumerate(OBJECTS):
        obj_dir = os.path.join(base, name)
        if os.environ.get("DATA_DIR") and os.path.isdir(obj_dir):
            v, f = parse_obj(os.path.join(obj_dir, "mesh.obj"))
            v = v  # ARCTIC templates are mm
            try:
                with open(os.path.join(obj_dir, "parts.json")) as fp:
                    p = np.asarray(json.load(fp), np.int32)
                    p = p + 1 if p.min() == 0 else p
            except Exception:
                p = np.full(len(v), 2, np.int32)
        else:
            v, p, f = _synthetic_object(rng, 2800 + i * 97)
        vs.append(v)
        parts.append(p)
        fs.append(f)

    v_max = max(len(v) for v in vs)
    f_max = max(len(f) for f in fs)
    O = len(OBJECTS)
    V = np.zeros((O, v_max, 3), np.float32)
    M = np.zeros((O, v_max), np.float32)
    P = np.zeros((O, v_max), np.int32)
    F = np.zeros((O, f_max, 3), np.int32)
    v_len = np.zeros(O, np.int32)
    f_len = np.zeros(O, np.int32)
    v_sub = np.zeros((O, n_sub, 3), np.float32)
    p_sub = np.zeros((O, n_sub), np.int32)
    bbox_top = np.zeros((O, 8, 3), np.float32)
    bbox_bottom = np.zeros((O, 8, 3), np.float32)
    kp_top = np.zeros((O, 16, 3), np.float32)
    kp_bottom = np.zeros((O, 16, 3), np.float32)
    diameter = np.zeros(O, np.float32)

    def corners(lo, hi):
        return np.asarray(
            [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
             for z in (lo[2], hi[2])], np.float32)

    for i, (v, p, f) in enumerate(zip(vs, parts, fs)):
        n = len(v)
        V[i, :n] = v
        M[i, :n] = 1
        P[i, :n] = p
        F[i, : len(f)] = f
        v_len[i] = n
        f_len[i] = len(f)
        sub_idx = np.linspace(0, n - 1, n_sub).astype(np.int64)
        v_sub[i] = v[sub_idx]
        p_sub[i] = p[sub_idx]
        for part, bb, kp in ((1, bbox_top, kp_top), (2, bbox_bottom, kp_bottom)):
            pv = v[p == part]
            if len(pv) == 0:
                pv = v
            bb[i] = corners(pv.min(0), pv.max(0))
            kp_idx = np.linspace(0, len(pv) - 1, 16).astype(np.int64)
            kp[i] = pv[kp_idx]
        diameter[i] = float(np.linalg.norm(v.max(0) - v.min(0)))

    return ObjectTensors(
        v=jnp.asarray(V), mask=jnp.asarray(M), v_len=jnp.asarray(v_len),
        v_sub=jnp.asarray(v_sub), parts_ids=jnp.asarray(P),
        parts_sub_ids=jnp.asarray(p_sub), f=jnp.asarray(F),
        f_len=jnp.asarray(f_len), bbox_top=jnp.asarray(bbox_top),
        bbox_bottom=jnp.asarray(bbox_bottom), kp_top=jnp.asarray(kp_top),
        kp_bottom=jnp.asarray(kp_bottom), diameter=jnp.asarray(diameter),
    )


def _quat_apply(q: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate points (B, N, 3) by unit quaternions (B, 4) [w, x, y, z]."""
    w, xyz = q[:, :1], q[:, 1:]
    t = 2.0 * jnp.cross(jnp.broadcast_to(xyz[:, None, :], pts.shape), pts)
    return pts + w[:, :, None] * t + jnp.cross(
        jnp.broadcast_to(xyz[:, None, :], pts.shape), t
    )


def object_forward_7d(
    tensors: ObjectTensors,
    angles: jnp.ndarray,  # (B, 1) articulation radians
    global_orient: jnp.ndarray,  # (B, 3) axis-angle
    transl: jnp.ndarray | None,  # (B, 3) meters -> applied in mm by caller
    obj_idx: jnp.ndarray,  # (B,) int object index into OBJECTS
) -> XDict:
    """Batched articulated-object FK (reference ``forward_7d_batch:42``).

    Returns padded vertices (mm, like the reference — callers convert),
    sub-verts, 16+16 keypoints, 8+8 bbox corners, masks/lengths/parts.
    """
    out = XDict()
    out["diameter"] = tensors.diameter[obj_idx]
    out["v_len"] = tensors.v_len[obj_idx]
    out["f"] = tensors.f[obj_idx]
    out["f_len"] = tensors.f_len[obj_idx]
    out["mask"] = tensors.mask[obj_idx]
    out["parts_ids"] = tensors.parts_ids[obj_idx]
    out["parts_sub_ids"] = tensors.parts_sub_ids[obj_idx]

    v = tensors.v[obj_idx]
    v_sub = tensors.v_sub[obj_idx]

    quat_arti = rotlib.axis_angle_to_quaternion(
        jnp.asarray(Z_AXIS)[None, :] * angles.reshape(-1, 1)
    )
    quat_global = rotlib.axis_angle_to_quaternion(global_orient.reshape(-1, 3))

    def articulate_then_rotate(pts, is_top_mask=None):
        top = _quat_apply(quat_arti, pts)
        if is_top_mask is not None:
            pts = jnp.where(is_top_mask[..., None] == 1, top, pts)
        else:
            pts = top
        pts = _quat_apply(quat_global, pts)
        if transl is not None:
            pts = pts + transl[:, None, :]
        return pts

    out["v"] = articulate_then_rotate(v, out["parts_ids"])
    out["v_sub"] = articulate_then_rotate(v_sub, out["parts_sub_ids"])
    bbox_top = articulate_then_rotate(tensors.bbox_top[obj_idx])
    kp_top = articulate_then_rotate(tensors.kp_top[obj_idx])

    def rotate_only(pts):
        pts = _quat_apply(quat_global, pts)
        if transl is not None:
            pts = pts + transl[:, None, :]
        return pts

    bbox_bottom = rotate_only(tensors.bbox_bottom[obj_idx])
    kp_bottom = rotate_only(tensors.kp_bottom[obj_idx])

    out["bbox3d"] = jnp.concatenate([bbox_top, bbox_bottom], axis=1)
    out["kp3d"] = jnp.concatenate([kp_top, kp_bottom], axis=1)
    return out


def object_names_to_idx(names: List[str]) -> np.ndarray:
    return np.asarray([OBJECTS.index(n) for n in names])
