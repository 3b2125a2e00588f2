"""SMPL-X body model: shape blend + pose blend + LBS over the 55-joint tree.

TPU-native counterpart of the SMPL-X forward the reference's ARCTIC offline
GT build invokes (``src/arctic/processing.py:173-235`` ``forward_gt_world``
runs MANO + SMPL-X + objects; the smplx layer itself lives in the
third-party ``smplx`` package there). Same machinery as ``ops/mano.py`` at
body scale: one shape-blend einsum, one pose-blend matmul, a static unrolled
FK chain, and a single LBS einsum — all MXU-friendly dense contractions,
f32-pinned like the MANO path.

Note on the reference snapshot: ``src/arctic/processing.py:438`` calls
``human_models.build_subject_smplx``, which is defined NOWHERE in the
reference tree (``common/body_models.py`` has no such symbol) — the
reference's own SMPL-X path cannot run as shipped. The behavior implemented
here follows the upstream ARCTIC/smplx contract the call encodes: a
per-subject SMPL-X layer driven by the ``smplx_*`` param bundle
(``preprocess_dataset.py:125-139``).

Real assets: set ``SMPLX_DIR`` to a directory holding ``SMPLX_NEUTRAL.npz``
(or ``SMPLX_MALE/FEMALE.npz``) as shipped by MPI; otherwise a synthetic
model with the real field shapes is built (same policy as MANO's loader).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hands_tpu.core import rot as rotlib

NUM_JOINTS = 55  # 22 body + jaw + 2 eyes + 2x15 fingers
NUM_BODY_JOINTS = 21  # body_pose covers joints 1..21
NUM_VERTS = 10475
NUM_BETAS = 10

# Standard SMPL-X kinematic tree (smplx kintree_table):
# 0 pelvis; 1/2 hips; 3 spine1; 4/5 knees; 6 spine2; 7/8 ankles; 9 spine3;
# 10/11 feet; 12 neck; 13/14 collars; 15 head; 16/17 shoulders;
# 18/19 elbows; 20/21 wrists; 22 jaw; 23/24 eyes; 25-39 left fingers
# (index/middle/pinky/ring/thumb x3, parented to wrist 20);
# 40-54 right fingers (parented to wrist 21).
PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
    18, 19, 15, 15, 15,
    20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
    21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,
)
assert len(PARENTS) == NUM_JOINTS


class BodyModel(NamedTuple):
    v_template: jnp.ndarray  # (V, 3)
    shapedirs: jnp.ndarray  # (V, 3, NUM_BETAS)
    posedirs: jnp.ndarray  # ((J-1)*9, V*3)
    j_regressor: jnp.ndarray  # (J, V)
    lbs_weights: jnp.ndarray  # (V, J)
    faces: jnp.ndarray  # (F, 3)
    # PCA basis for 45-dim hand pose coefficients (identity => axis-angle
    # input, i.e. smplx use_pca=False)
    hands_components_l: jnp.ndarray  # (45, 45)
    hands_components_r: jnp.ndarray  # (45, 45)
    hands_mean_l: jnp.ndarray  # (45,)
    hands_mean_r: jnp.ndarray  # (45,)


class BodyOutput(NamedTuple):
    vertices: jnp.ndarray  # (B, V, 3)
    joints: jnp.ndarray  # (B, 55, 3) FK skeleton joints


def _synthetic_body_model(seed: int = 11, num_verts: int = NUM_VERTS):
    """Field-faithful random body model (same policy as MANO's synthetic
    fallback): plausible rest skeleton, dominant-joint skinning, small
    smooth blend bases. Vectorised construction."""
    rng = np.random.RandomState(seed)
    J, V = NUM_JOINTS, num_verts

    # rest joints: walk the tree with small offsets so depth grows
    parents = np.asarray(PARENTS)
    offsets = rng.randn(J, 3) * 0.08
    offsets[0] = 0.0
    joints = np.zeros((J, 3))
    for j in range(1, J):
        joints[j] = joints[parents[j]] + offsets[j]

    assign = rng.randint(0, J, size=V)
    v_template = (joints[assign] + rng.randn(V, 3) * 0.03).astype(np.float32)

    W = np.full((V, J), 1e-4)
    W[np.arange(V), assign] = 0.8
    par = parents[assign]
    has_parent = par >= 0
    W[np.arange(V)[has_parent], par[has_parent]] = 0.2
    W = W / W.sum(axis=1, keepdims=True)

    JR = np.zeros((J, V))
    counts = np.bincount(assign, minlength=J).astype(np.float64)
    counts[counts == 0] = 1.0
    JR[assign, np.arange(V)] = 1.0 / counts[assign]
    # joints with no assigned verts: regress from everything equally
    empty = np.bincount(assign, minlength=J) == 0
    JR[empty] = 1.0 / V

    shapedirs = (rng.randn(V, 3, NUM_BETAS) * 0.002).astype(np.float32)
    posedirs = (rng.randn((J - 1) * 9, V * 3) * 0.0002).astype(np.float32)
    faces = rng.randint(0, V, size=(20908, 3)).astype(np.int32)

    eye45 = jnp.eye(45, dtype=jnp.float32)
    return BodyModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(JR.astype(np.float32)),
        lbs_weights=jnp.asarray(W.astype(np.float32)),
        faces=jnp.asarray(faces),
        hands_components_l=eye45,
        hands_components_r=eye45,
        hands_mean_l=jnp.zeros(45, jnp.float32),
        hands_mean_r=jnp.zeros(45, jnp.float32),
    )


def _from_smplx_npz(path: str, use_pca: bool, flat_hand_mean: bool,
                    v_template: np.ndarray | None = None) -> BodyModel:
    """Load an MPI ``SMPLX_*.npz``. ARCTIC bakes per-subject shape into a
    subject v_template obj (upstream ``build_subject_smplx``); pass it via
    ``v_template`` to override the npz template."""
    data = np.load(path, allow_pickle=True)

    def g(key):
        return np.asarray(data[key])

    shapedirs = g("shapedirs")[..., :NUM_BETAS]
    posedirs = g("posedirs")  # (V, 3, (J-1)*9)
    posedirs = posedirs.reshape(posedirs.shape[0] * 3, -1).T
    comp_l = g("hands_componentsl")[:45] if use_pca else np.eye(45)
    comp_r = g("hands_componentsr")[:45] if use_pca else np.eye(45)
    mean_l = np.zeros(45) if flat_hand_mean else g("hands_meanl")
    mean_r = np.zeros(45) if flat_hand_mean else g("hands_meanr")
    vt = v_template if v_template is not None else g("v_template")
    return BodyModel(
        v_template=jnp.asarray(vt, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        j_regressor=jnp.asarray(g("J_regressor")[:NUM_JOINTS], jnp.float32),
        lbs_weights=jnp.asarray(g("weights")[:, :NUM_JOINTS], jnp.float32),
        faces=jnp.asarray(g("f").astype(np.int32)),
        hands_components_l=jnp.asarray(comp_l, jnp.float32),
        hands_components_r=jnp.asarray(comp_r, jnp.float32),
        hands_mean_l=jnp.asarray(mean_l.ravel(), jnp.float32),
        hands_mean_r=jnp.asarray(mean_r.ravel(), jnp.float32),
    )


@functools.lru_cache(maxsize=4)
def load_body_model(gender: str = "neutral", use_pca: bool = False,
                    flat_hand_mean: bool = True) -> BodyModel:
    smplx_dir = os.environ.get("SMPLX_DIR", "")
    path = os.path.join(smplx_dir, f"SMPLX_{gender.upper()}.npz")
    if smplx_dir and os.path.exists(path):
        return _from_smplx_npz(path, use_pca, flat_hand_mean)
    return _synthetic_body_model()


def _rigid_transform_chain(rot_mats: jnp.ndarray, joints: jnp.ndarray):
    """FK over the static SMPL-X tree (same scheme as ops/mano.py:238 —
    unrolled to a fixed DAG of 4x4 matmuls; depth <= 8)."""
    B = rot_mats.shape[0]
    rel = joints.at[:, 1:].add(-joints[:, [p for p in PARENTS[1:]], :])

    def make_T(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)
        bot = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), (B, 1, 4))
        return jnp.concatenate([top, bot], axis=-2)

    transforms = [make_T(rot_mats[:, 0], rel[:, 0])]
    for j in range(1, NUM_JOINTS):
        T_local = make_T(rot_mats[:, j], rel[:, j])
        transforms.append(transforms[PARENTS[j]] @ T_local)
    T_world = jnp.stack(transforms, axis=1)  # (B, 55, 4, 4)

    posed_joints = T_world[:, :, :3, 3]
    correction = jnp.einsum("bjik,bjk->bji", T_world[:, :, :3, :3], joints)
    A = T_world.at[:, :, :3, 3].add(-correction)
    return posed_joints, A


def body_forward(
    model: BodyModel,
    global_orient: jnp.ndarray,  # (B, 3)
    body_pose: jnp.ndarray,  # (B, 63)
    jaw_pose: jnp.ndarray,  # (B, 3)
    leye_pose: jnp.ndarray,  # (B, 3)
    reye_pose: jnp.ndarray,  # (B, 3)
    left_hand_pose: jnp.ndarray,  # (B, 45) aa, or PCA coeffs if use_pca
    right_hand_pose: jnp.ndarray,  # (B, 45)
    transl: jnp.ndarray | None = None,  # (B, 3)
    betas: jnp.ndarray | None = None,  # (B, 10)
) -> BodyOutput:
    """SMPL-X forward with the exact param bundle the ARCTIC GT build feeds
    (``preprocess_dataset.py:125-139`` -> ``processing.py:192-205``).

    Joints are the 55 FK skeleton joints (the smplx package appends face/
    feet landmark extras to 127; the ARCTIC pipeline only carries them
    through world->cam->2D, so the skeleton set is the structural
    contract — documented divergence)."""
    with jax.default_matmul_precision("float32"):
        B = global_orient.shape[0]
        dtype = global_orient.dtype

        if betas is None:
            v_shaped = jnp.broadcast_to(
                model.v_template, (B,) + model.v_template.shape)
        else:
            v_shaped = model.v_template + jnp.einsum(
                "vcs,bs->bvc", model.shapedirs, betas)
        j_rest = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped)

        lhand = model.hands_mean_l[None] + \
            left_hand_pose @ model.hands_components_l
        rhand = model.hands_mean_r[None] + \
            right_hand_pose @ model.hands_components_r
        full_pose = jnp.concatenate(
            [global_orient, body_pose, jaw_pose, leye_pose, reye_pose,
             lhand, rhand], axis=-1)  # (B, 165)
        rot_mats = rotlib.axis_angle_to_matrix(
            full_pose.reshape(B, NUM_JOINTS, 3))

        ident = jnp.eye(3, dtype=dtype)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(B, (NUM_JOINTS - 1) * 9)
        pose_offsets = (pose_feature @ model.posedirs).reshape(B, -1, 3)
        v_posed = v_shaped + pose_offsets

        posed_joints, A = _rigid_transform_chain(rot_mats, j_rest)

        T = jnp.einsum("vj,bjrc->bvrc", model.lbs_weights, A)
        V = v_posed.shape[1]
        v_homo = jnp.concatenate([v_posed, jnp.ones((B, V, 1), dtype)], axis=-1)
        verts = jnp.einsum("bvrc,bvc->bvr", T, v_homo)[..., :3]

        if transl is not None:
            verts = verts + transl[:, None, :]
            posed_joints = posed_joints + transl[:, None, :]
        return BodyOutput(vertices=verts, joints=posed_joints)
