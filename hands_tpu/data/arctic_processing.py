"""ARCTIC offline GT build: raw mocap params -> per-sequence training labels.

TPU-native rework of ``/root/reference/src/arctic/processing.py`` +
``preprocess_dataset.py`` + ``split.py``: per sequence, world-frame MANO and
articulated-object FK, world->camera transforms for the 9 views (1 ego + 8
static), distortion-aware 2D projection for the egocam, bbox derivation
(fixed 2800x2000 ego crop, object-driven static-cam boxes clamped to >=600px)
and in-frame validity flags — all batched jitted JAX instead of the
reference's per-batch torch loop. The split builder concatenates per-seq
outputs into ``splits/{setup}_{split}.npy``.

Notes vs the reference:
- SMPL-X body FK runs when the sequence ships ``smplx.npy`` params
  (``preprocess_dataset.py:125-139``), via ``ops/smplx_body.py`` — the
  reference's own path is unrunnable as shipped (``processing.py:438``
  calls ``human_models.build_subject_smplx``, defined nowhere in the
  snapshot; see ops/smplx_body.py docstring).
- Distortion uses the same 8-coefficient rational+tangential model
  (``hands_tpu.core.transforms.distort_pts3d``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from hands_tpu.core import transforms as tf
from hands_tpu.core.object_tensors import (
    OBJECTS, build_object_tensors, object_forward_7d,
)
from hands_tpu.ops import mano as manolib

EGO_IMAGE_SIZE = (2800, 2000)  # (w, h), processing.py:66-68,364


# ------------------------------------------------------------------ world FK
def forward_gt_world(params: Dict[str, jnp.ndarray], obj_name: str,
                     smplx_params: Dict[str, jnp.ndarray] | None = None):
    """World-frame FK for both hands + the object (+ the SMPL-X body when
    its param bundle is supplied — reference ``forward_gt_world``,
    processing.py:173-235, runs all three).

    params: rot_r/pose_r/trans_r/shape_r (and _l), obj_arti/obj_rot/obj_trans,
    all (T, ...) over the sequence (the raw ARCTIC ``mano.npy``/``obj.npy``
    layout, preprocess_dataset.py:77). smplx_params: the ``smplx.npy`` dict
    (transl/global_orient/body_pose/jaw_pose/leye_pose/reye_pose/
    left_hand_pose/right_hand_pose, preprocess_dataset.py:125-139).
    """
    out = {}
    if smplx_params is not None:
        from hands_tpu.ops import smplx_body

        body = smplx_body.load_body_model()
        bo = smplx_body.body_forward(
            body,
            global_orient=smplx_params["global_orient"],
            body_pose=smplx_params["body_pose"],
            jaw_pose=smplx_params["jaw_pose"],
            leye_pose=smplx_params["leye_pose"],
            reye_pose=smplx_params["reye_pose"],
            left_hand_pose=smplx_params["left_hand_pose"],
            right_hand_pose=smplx_params["right_hand_pose"],
            transl=smplx_params["transl"],
        )
        out["verts.smplx"] = bo.vertices
        out["joints.smplx"] = bo.joints
    for side, name in (("r", "right"), ("l", "left")):
        model = manolib.load_mano(side == "r")
        mo = manolib.mano_forward(
            model,
            betas=params[f"shape_{side}"],
            hand_pose=params[f"pose_{side}"],
            global_orient=params[f"rot_{side}"],
            transl=params[f"trans_{side}"],
        )
        out[f"joints.{name}"] = mo.joints
        out[f"verts.{name}"] = mo.vertices
        out[f"rot_{side}_world"] = params[f"rot_{side}"]

    tensors = build_object_tensors()
    T = params["obj_arti"].shape[0]
    obj_idx = jnp.full((T,), OBJECTS.index(obj_name), jnp.int32)
    obj = object_forward_7d(
        tensors,
        angles=params["obj_arti"].reshape(T, 1),
        global_orient=params["obj_rot"],
        transl=None,
        obj_idx=obj_idx,
    )
    # object template is mm; world frame is meters + translation
    out["verts.object"] = obj["v"] / 1000.0 + params["obj_trans"][:, None] / 1000.0
    out["kp3d.object"] = obj["kp3d"] / 1000.0 + params["obj_trans"][:, None] / 1000.0
    out["bbox3d.object"] = obj["bbox3d"] / 1000.0 + params["obj_trans"][:, None] / 1000.0
    out["object.radian"] = params["obj_arti"]
    out["object.v_len"] = obj["v_len"]
    out["object.parts_ids"] = obj["parts_ids"]
    return out


# --------------------------------------------------------------- world2cam
def forward_world2cam(out_world: dict, world2cam: jnp.ndarray):
    """Transform all world-frame point sets into each of V views.

    world2cam: (V, T, 4, 4) or (V, 4, 4). Returns list of V dicts.
    """
    views = []
    V = world2cam.shape[0]
    for v in range(V):
        w2c = world2cam[v]
        view = {}
        for key, val in out_world.items():
            if key.startswith(("joints.", "verts.", "kp3d.", "bbox3d.")):
                if w2c.ndim == 2:
                    w2c_b = jnp.broadcast_to(w2c, (val.shape[0], 4, 4))
                else:
                    w2c_b = w2c
                view[key] = tf.transform_points(w2c_b, val)
            elif key.startswith("rot_") and key.endswith("_world"):
                # camera-frame global orient: R_cam = R_w2c @ R_world
                from hands_tpu.core import rot as rotlib

                R_world = rotlib.axis_angle_to_matrix(val)
                R_w2c = w2c[..., :3, :3]
                if R_w2c.ndim == 2:
                    R_w2c = jnp.broadcast_to(R_w2c, R_world.shape)
                view[key.replace("_world", "_cam")] = rotlib.matrix_to_axis_angle(
                    R_w2c @ R_world)
        views.append(view)
    return views


# ---------------------------------------------------------------- project2d
def forward_project2d(views: List[dict], intris_mat: jnp.ndarray,
                      ego_dist_coeffs: jnp.ndarray | None = None):
    """Project every camera-space point set to pixels. View 0 is the egocam:
    its points pass through the lens-distortion model first
    (processing.py:265 + transforms.distort_pts3d_all)."""
    out2d = {}
    for v, view in enumerate(views):
        K = intris_mat[v]
        for key, val in view.items():
            if not key.startswith(("joints.", "verts.", "kp3d.", "bbox3d.")):
                continue
            pts = val
            if v == 0 and ego_dist_coeffs is not None:
                pts = tf.distort_pts3d(pts, ego_dist_coeffs)
            K_b = jnp.broadcast_to(K, (pts.shape[0], 3, 3))
            px = tf.project2d(K_b, pts)
            out2d.setdefault(key, []).append(px)
    return {k: jnp.stack(v, axis=1) for k, v in out2d.items()}  # (T, V, N, 2)


# -------------------------------------------------------------------- bbox
def compute_bbox_from_kp2d(kp2d: jnp.ndarray, obj_scale: float = 0.6):
    """Square bbox (cx, cy, scale/200px) around 2D points (processing.py:26)."""
    lo = kp2d.min(axis=-2)
    hi = kp2d.max(axis=-2)
    center = (lo + hi) / 2.0
    dim = jnp.maximum(hi - lo, 0.0).max(axis=-1) + obj_scale
    return jnp.concatenate([center, (dim / 200.0)[..., None]], axis=-1)


def forward_define_bbox(out2d: dict, obj_scale: float = 0.6):
    """Per-view crops: fixed full-frame ego box, object-driven static boxes
    clamped to >= 600px (processing.py:54-76)."""
    obj9 = out2d["verts.object"][:, :, :9] if out2d["verts.object"].shape[2] >= 9 \
        else out2d["verts.object"]
    bbox = compute_bbox_from_kp2d(obj9, obj_scale)  # (T, V, 3)
    ego = jnp.asarray(
        [EGO_IMAGE_SIZE[0] / 2.0, EGO_IMAGE_SIZE[1] / 2.0,
         EGO_IMAGE_SIZE[0] / 200.0])
    bbox = bbox.at[:, 0].set(ego)
    bbox = bbox.at[:, 1:, 2].set(jnp.maximum(bbox[:, 1:, 2], 3.0))
    return bbox


# -------------------------------------------------------------------- valid
def forward_valid(bbox: jnp.ndarray, j2d_r: jnp.ndarray, j2d_l: jnp.ndarray,
                  image_sizes: jnp.ndarray):
    """Per-joint in-frame-and-in-crop validity + per-hand flags
    (processing.py:320-382): a joint is valid if inside both the image and
    the crop box; a hand is valid if >= 3 joints are."""
    def jts_valid(j2d):
        # j2d: (T, V, J, 2); bbox: (T, V, 3); image_sizes: (V, 2) [w, h]
        cx, cy, sc = bbox[..., 0:1], bbox[..., 1:2], bbox[..., 2:3]
        dim = sc * 200.0 / 2.0
        in_crop = (
            (j2d[..., 0] >= cx - dim) & (j2d[..., 0] <= cx + dim)
            & (j2d[..., 1] >= cy - dim) & (j2d[..., 1] <= cy + dim)
        )
        w = image_sizes[None, :, 0:1]
        h = image_sizes[None, :, 1:2]
        in_img = (
            (j2d[..., 0] >= 0) & (j2d[..., 0] < w)
            & (j2d[..., 1] >= 0) & (j2d[..., 1] < h)
        )
        return (in_crop & in_img).astype(jnp.float32)

    jv_r = jts_valid(j2d_r)
    jv_l = jts_valid(j2d_l)
    return {
        "joints_valid_r": jv_r,
        "joints_valid_l": jv_l,
        "right_valid": (jv_r.sum(-1) >= 3).astype(jnp.float32),
        "left_valid": (jv_l.sum(-1) >= 3).astype(jnp.float32),
    }


# ---------------------------------------------------------------- pipeline
def process_seq(seq_dir: str, out_dir: str, export_verts: bool = False,
                batch_size: int = 320):
    """Process one raw ARCTIC sequence directory (mano.npy, obj.npy,
    egocam dist/intrinsics via meta) into a labels npy
    (processing.py:408 / preprocess_dataset.construct_loader)."""
    mano_p = os.path.join(seq_dir, "mano.npy")
    obj_p = os.path.join(seq_dir, "obj.npy")
    smplx_p = os.path.join(seq_dir, "smplx.npy")
    if not (os.path.exists(mano_p) and os.path.exists(obj_p)):
        raise FileNotFoundError(f"raw ARCTIC sequence not found at {seq_dir}")
    mano_data = np.load(mano_p, allow_pickle=True).item()
    obj_data = np.load(obj_p, allow_pickle=True)
    smplx_params = None
    if os.path.exists(smplx_p):
        smplx_raw = np.load(smplx_p, allow_pickle=True).item()
        smplx_params = {k: jnp.asarray(np.asarray(v, np.float32))
                        for k, v in smplx_raw.items()}

    seq_name = os.path.basename(seq_dir)
    obj_name = seq_name.split("_")[0]

    params = {
        "rot_r": jnp.asarray(mano_data["right"]["rot"]),
        "pose_r": jnp.asarray(mano_data["right"]["pose"]),
        "trans_r": jnp.asarray(mano_data["right"]["trans"]),
        "shape_r": jnp.broadcast_to(
            jnp.asarray(mano_data["right"]["shape"]).reshape(1, 10),
            (len(mano_data["right"]["rot"]), 10)),
        "rot_l": jnp.asarray(mano_data["left"]["rot"]),
        "pose_l": jnp.asarray(mano_data["left"]["pose"]),
        "trans_l": jnp.asarray(mano_data["left"]["trans"]),
        "shape_l": jnp.broadcast_to(
            jnp.asarray(mano_data["left"]["shape"]).reshape(1, 10),
            (len(mano_data["left"]["rot"]), 10)),
        "obj_arti": jnp.asarray(obj_data[:, 0]),
        "obj_rot": jnp.asarray(obj_data[:, 1:4]),
        "obj_trans": jnp.asarray(obj_data[:, 4:7]),
    }

    meta_p = os.path.join(os.path.dirname(os.path.dirname(seq_dir)),
                          "meta/misc.json")
    sid = os.path.basename(os.path.dirname(seq_dir))
    misc = json.load(open(meta_p))[sid]
    world2cam = jnp.asarray(misc["world2cam"])  # (V, 4, 4)
    intris = jnp.asarray(misc["intris_mat"])  # (V, 3, 3)
    dist = jnp.asarray(misc.get("dist8", np.zeros(8)))

    out_world = forward_gt_world(params, obj_name, smplx_params=smplx_params)
    views = forward_world2cam(out_world, world2cam)
    out2d = forward_project2d(views, intris, ego_dist_coeffs=dist)
    bbox = forward_define_bbox(out2d)
    image_sizes = jnp.asarray(misc.get(
        "image_size", [[2800, 2000]] + [[2800, 2000]] * (len(views) - 1)))
    valid = forward_valid(bbox, out2d["joints.right"], out2d["joints.left"],
                          image_sizes)

    payload = {
        "params": {k: np.asarray(v) for k, v in params.items()},
        "2d": {k: np.asarray(v) for k, v in out2d.items()
               if export_verts or "verts" not in k},
        "bbox": np.asarray(bbox),
        **{k: np.asarray(v) for k, v in valid.items()},
        "cam_coord": {
            key: np.asarray(jnp.stack([v[key] for v in views], axis=1))
            for key in (["joints.right", "joints.left"] +
                        (["joints.smplx"] if smplx_params is not None else []))
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    out_p = os.path.join(out_dir, f"{sid}_{seq_name}.npy")
    np.save(out_p, payload)
    return out_p


def build_split(processed_dir: str, seq_names: List[str], setup: str,
                split: str, out_dir: str):
    """Concatenate per-sequence labels into a split file (split.py:141)."""
    from hands_tpu.core.tree_utils import cat_dl, ld2dl

    seqs = []
    for name in seq_names:
        p = os.path.join(processed_dir, f"{name}.npy")
        seqs.append(np.load(p, allow_pickle=True).item())
    merged = {}
    for key in seqs[0]:
        if isinstance(seqs[0][key], dict):
            merged[key] = {
                k: np.concatenate([s[key][k] for s in seqs]) for k in seqs[0][key]
            }
        else:
            merged[key] = np.concatenate([s[key] for s in seqs])
    os.makedirs(out_dir, exist_ok=True)
    out_p = os.path.join(out_dir, f"{setup}_{split}.npy")
    np.save(out_p, merged)
    return out_p
