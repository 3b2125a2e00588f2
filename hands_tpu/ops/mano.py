"""MANO hand model in pure JAX: shape blend, pose blend, linear blend skinning.

TPU-native replacement for the reference's third-party ``smplx.MANO`` wrapper
(``/root/reference/common/body_models.py:92``). The forward pass is a single
fused chain of matmuls (MXU-friendly: the 778x(10|135|16) contractions are
batched einsums) with no Python control flow, so XLA fuses it end-to-end; it
is differentiable and safe under ``jit`` / ``vmap`` / ``shard_map``.

Model data is a pytree (``ManoModel``) loaded from:
  * real MANO assets (``MANO_DIR`` env var, ``MANO_{RIGHT,LEFT}.pkl`` — the
    standard licensed download, same as the reference), or
  * a deterministic synthetic model with identical shapes/kinematics, so the
    full framework (training, eval, tests, benchmarks) runs without the
    licensed files and real assets slot in without code changes.

Joint convention matches smplx: 16 kinematic joints
[wrist, index1-3, middle1-3, pinky1-3, ring1-3, thumb1-3] followed by 5
fingertip vertices (thumb, index, middle, ring, pinky), total 21; joint 0 is
the wrist/root.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hands_tpu.core import rot as rotlib

NUM_VERTS = 778
NUM_FACES = 1538
NUM_JOINTS = 16
NUM_OUTPUT_JOINTS = 21
NUM_BETAS = 10

# Kinematic tree: parent of each of the 16 joints.
PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)

# Fingertip vertex ids (smplx VERTEX_IDS['mano'] convention), appended in the
# order thumb, index, middle, ring, pinky.
TIP_VERTEX_IDS = (744, 320, 443, 554, 671)


class ManoModel(NamedTuple):
    """MANO model tensors. A NamedTuple so it is automatically a pytree."""

    v_template: jnp.ndarray  # (778, 3)
    shapedirs: jnp.ndarray  # (778, 3, 10)
    posedirs: jnp.ndarray  # (135, 778*3)   pose-blend basis, pre-flattened
    j_regressor: jnp.ndarray  # (16, 778)
    lbs_weights: jnp.ndarray  # (778, 16)
    hand_mean: jnp.ndarray  # (45,) mean pose added when flat_hand_mean=False
    faces: jnp.ndarray  # (1538, 3) int32


class ManoOutput(NamedTuple):
    vertices: jnp.ndarray  # (B, 778, 3)
    joints: jnp.ndarray  # (B, 21, 3)


# --------------------------------------------------------------------- loading
def _synthetic_model(is_rhand: bool) -> ManoModel:
    """Deterministic stand-in with MANO's exact shapes and kinematic tree.

    Geometry is a schematic hand: a wrist hub plus five finger chains laid out
    along +x, with vertices clustered around bones so that LBS produces
    sensible articulated motion. Not anthropometric — meant for running and
    testing the stack, not for metric-accurate meshes.
    """
    rng = np.random.RandomState(20240 if is_rhand else 20241)

    # --- joint rest positions: wrist at origin, 5 chains of 3 joints
    # order: wrist, index(3), middle(3), pinky(3), ring(3), thumb(3)
    finger_dirs = {
        "index": np.array([1.0, 0.25, 0.0]),
        "middle": np.array([1.0, 0.05, 0.0]),
        "pinky": np.array([1.0, -0.4, 0.0]),
        "ring": np.array([1.0, -0.2, 0.0]),
        "thumb": np.array([0.7, 0.7, 0.2]),
    }
    seg = 0.03  # 3cm per phalanx
    joints = [np.zeros(3)]
    for name in ["index", "middle", "pinky", "ring", "thumb"]:
        d = finger_dirs[name] / np.linalg.norm(finger_dirs[name])
        base = d * 0.09  # knuckle 9cm from wrist
        for k in range(3):
            joints.append(base + d * seg * (k + 1))
    J = np.stack(joints)  # (16, 3)
    if not is_rhand:
        J[:, 0] *= -1.0

    # --- vertices: cluster around each bone segment
    per_joint = NUM_VERTS // NUM_JOINTS  # 48
    rem = NUM_VERTS - per_joint * NUM_JOINTS
    verts = []
    assign = []
    for j in range(NUM_JOINTS):
        n = per_joint + (rem if j == 0 else 0)
        center = J[j]
        pts = center + rng.randn(n, 3) * 0.012
        verts.append(pts)
        assign.extend([j] * n)
    v_template = np.concatenate(verts).astype(np.float32)  # (778, 3)
    assign = np.asarray(assign)

    # --- lbs weights: dominant weight on owning joint, some on parent
    W = np.full((NUM_VERTS, NUM_JOINTS), 1e-4)
    W[np.arange(NUM_VERTS), assign] = 0.8
    parents = np.asarray(PARENTS)
    par = parents[assign]
    has_parent = par >= 0
    W[np.arange(NUM_VERTS)[has_parent], par[has_parent]] = 0.2
    W = W / W.sum(axis=1, keepdims=True)

    # --- joint regressor: average of the vertices assigned to each joint
    JR = np.zeros((NUM_JOINTS, NUM_VERTS))
    for j in range(NUM_JOINTS):
        idx = np.where(assign == j)[0]
        JR[j, idx] = 1.0 / len(idx)

    # --- blend shapes: small smooth random bases
    shapedirs = (rng.randn(NUM_VERTS, 3, NUM_BETAS) * 0.002).astype(np.float32)
    posedirs = (rng.randn(15 * 9, NUM_VERTS * 3) * 0.0005).astype(np.float32)

    # --- faces: random triangulation over nearby vertices (topology only used
    # by the renderer; exact connectivity is irrelevant for the synthetic model)
    faces = rng.randint(0, NUM_VERTS, size=(NUM_FACES, 3)).astype(np.int32)

    return ManoModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(JR.astype(np.float32)),
        lbs_weights=jnp.asarray(W.astype(np.float32)),
        hand_mean=jnp.zeros(45, jnp.float32),
        faces=jnp.asarray(faces),
    )


class _ChumpyShim:
    """Stand-in for ``chumpy.Ch`` when unpickling MANO assets.

    The MPI-shipped pkls serialise v_template/shapedirs/posedirs/hands_mean
    as chumpy arrays; unpickling them normally requires chumpy to be
    installed (the reference gets it transitively via smplx,
    common/body_models.py:90-92). A chumpy ``Ch`` pickles as its attribute
    dict with the backing numpy array under ``'x'``; this shim accepts that
    state (and reduce-call forms) and reproduces the ``.r`` accessor, so the
    licensed files load with no chumpy dependency."""

    def __init__(self, *args, **kwargs):
        for a in args:
            if isinstance(a, np.ndarray):
                self.__dict__["x"] = a

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["x"] = state

    @property
    def r(self):
        x = self.__dict__.get("x")
        if x is None:
            raise ValueError("chumpy-pickled field carries no 'x' array; "
                             f"state keys: {sorted(self.__dict__)}")
        return np.asarray(getattr(x, "r", x))


def _mano_pickle_load(f):
    import pickle

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.split(".")[0] == "chumpy":
                return _ChumpyShim
            return super().find_class(module, name)

    return _Unpickler(f, encoding="latin1").load()


def _from_mano_pkl(path: str, is_rhand: bool) -> ManoModel:
    """Load a real MANO pickle (chumpy-serialised, as shipped by MPI)."""
    with open(path, "rb") as f:
        data = _mano_pickle_load(f)

    def _np(x):
        # chumpy arrays (or the shim) expose .r; scipy sparse expose .todense
        if hasattr(x, "r"):
            return np.asarray(x.r)
        if hasattr(x, "todense"):
            return np.asarray(x.todense())
        return np.asarray(x)

    shapedirs = _np(data["shapedirs"])[..., :NUM_BETAS]
    if not is_rhand:
        # upstream left-hand asset has mirrored shapedirs sign on x
        # (smplx applies the same correction)
        shapedirs = shapedirs * np.array([-1.0, 1.0, 1.0]).reshape(1, 3, 1)
    posedirs = _np(data["posedirs"])  # (778, 3, 135)
    posedirs = posedirs.reshape(NUM_VERTS * 3, -1).T  # (135, 778*3)
    return ManoModel(
        v_template=jnp.asarray(_np(data["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        j_regressor=jnp.asarray(_np(data["J_regressor"]), jnp.float32),
        lbs_weights=jnp.asarray(_np(data["weights"]), jnp.float32),
        hand_mean=jnp.asarray(_np(data["hands_mean"]).ravel(), jnp.float32),
        faces=jnp.asarray(_np(data["f"]).astype(np.int32)),
    )


@functools.lru_cache(maxsize=4)
def load_mano(is_rhand: bool, flat_hand_mean: bool = False) -> ManoModel:
    """Build a MANO model: real assets if ``MANO_DIR`` is set, else synthetic.

    ``flat_hand_mean=False`` (reference default, body_models.py:92) means the
    45-dim hand pose input is an offset from the dataset mean pose.
    """
    mano_dir = os.environ.get("MANO_DIR", "")
    name = "MANO_RIGHT.pkl" if is_rhand else "MANO_LEFT.pkl"
    path = os.path.join(mano_dir, name)
    if mano_dir and os.path.exists(path):
        model = _from_mano_pkl(path, is_rhand)
    else:
        model = _synthetic_model(is_rhand)
    if flat_hand_mean:
        model = model._replace(hand_mean=jnp.zeros_like(model.hand_mean))
    return model


# --------------------------------------------------------------------- forward
def _rigid_transform_chain(rot_mats: jnp.ndarray, joints: jnp.ndarray):
    """Forward kinematics over the (static) MANO tree.

    rot_mats: (B, 16, 3, 3) local joint rotations.
    joints:   (B, 16, 3) rest-pose joint locations.
    Returns posed joint locations (B, 16, 3) and per-joint skinning transforms
    A (B, 16, 4, 4) relative to the rest pose.
    """
    B = rot_mats.shape[0]
    rel = joints.at[:, 1:].add(-joints[:, [p for p in PARENTS[1:]], :])

    def make_T(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)  # (B, 3, 4)
        bot = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), (B, 1, 4)
        )
        return jnp.concatenate([top, bot], axis=-2)  # (B, 4, 4)

    # Tree depth is 3, chain is static: unrolled Python loop (16 iterations)
    # compiles to a fixed DAG of 4x4 matmuls.
    transforms = [make_T(rot_mats[:, 0], rel[:, 0])]
    for j in range(1, NUM_JOINTS):
        T_local = make_T(rot_mats[:, j], rel[:, j])
        transforms.append(transforms[PARENTS[j]] @ T_local)
    T_world = jnp.stack(transforms, axis=1)  # (B, 16, 4, 4)

    posed_joints = T_world[:, :, :3, 3]

    # subtract rest-joint contribution: A = T_world - [0 | T_world[:, :3,:3] @ j]
    correction = jnp.einsum("bjik,bjk->bji", T_world[:, :, :3, :3], joints)
    A = T_world.at[:, :, :3, 3].add(-correction)
    return posed_joints, A


def mano_forward(
    model: ManoModel,
    betas: jnp.ndarray,
    hand_pose: jnp.ndarray,
    global_orient: jnp.ndarray,
    transl: jnp.ndarray | None = None,
) -> ManoOutput:
    """MANO forward: (B,10) betas, (B,45) axis-angle hand pose (offset from
    ``hand_mean``), (B,3) axis-angle global orientation -> vertices + joints.

    Equivalent call surface to the reference's
    ``mano(betas=..., hand_pose=..., global_orient=...)`` with ``use_pca=False``.
    """
    with jax.default_matmul_precision("float32"):
        return _mano_forward_f32(model, betas, hand_pose, global_orient, transl)


def _mano_forward_f32(
    model: ManoModel,
    betas: jnp.ndarray,
    hand_pose: jnp.ndarray,
    global_orient: jnp.ndarray,
    transl: jnp.ndarray | None = None,
) -> ManoOutput:
    # Geometry must not run in TPU-default bf16 matmul precision: joint
    # positions are ~0.1m and bf16 contraction error (~4e-3 rel) would break
    # the <1e-3 parity contract. Backbone matmuls keep the fast default.
    B = betas.shape[0]
    dtype = betas.dtype

    # 1. shape blend: v_shaped = template + shapedirs . betas
    v_shaped = model.v_template + jnp.einsum(
        "vcs,bs->bvc", model.shapedirs, betas
    )

    # 2. rest joints
    j_rest = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped)

    # 3. full pose -> rotation matrices
    full_pose = jnp.concatenate(
        [global_orient, hand_pose + model.hand_mean[None]], axis=-1
    )  # (B, 48)
    rot_mats = rotlib.axis_angle_to_matrix(full_pose.reshape(B, NUM_JOINTS, 3))

    # 4. pose blend: feature = vec(R_j - I) for the 15 articulated joints
    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, 15 * 9)
    pose_offsets = (pose_feature @ model.posedirs).reshape(B, NUM_VERTS, 3)
    v_posed = v_shaped + pose_offsets

    # 5. FK + skinning transforms
    posed_joints, A = _rigid_transform_chain(rot_mats, j_rest)

    # 6. LBS: per-vertex transform = weights . A  (one MXU matmul)
    T = jnp.einsum("vj,bjrc->bvrc", model.lbs_weights, A)  # (B, 778, 4, 4)
    v_homo = jnp.concatenate([v_posed, jnp.ones((B, NUM_VERTS, 1), dtype)], axis=-1)
    verts = jnp.einsum("bvrc,bvc->bvr", T, v_homo)[..., :3]

    # 7. joints: FK-posed kinematic joints + fingertip vertices (smplx order)
    tips = verts[:, TIP_VERTEX_IDS, :]
    joints = jnp.concatenate([posed_joints, tips], axis=1)  # (B, 21, 3)

    if transl is not None:
        verts = verts + transl[:, None, :]
        joints = joints + transl[:, None, :]
    return ManoOutput(vertices=verts, joints=joints)


# ------------------------------------------------------------------- sealing
# Wrist-sealing (adds the wrist-ring centroid vertex + 16 closing faces) for
# watertight rendering, mirroring body_models.py:60.
SEAL_CIRCLE_V_ID = np.array(
    [108, 79, 78, 121, 214, 215, 279, 239, 234, 92, 38, 122, 118, 117, 119, 120],
    dtype=np.int64,
)
_SEAL_FACES_R = np.array(
    [
        [120, 108, 778], [108, 79, 778], [79, 78, 778], [78, 121, 778],
        [121, 214, 778], [214, 215, 778], [215, 279, 778], [279, 239, 778],
        [239, 234, 778], [234, 92, 778], [92, 38, 778], [38, 122, 778],
        [122, 118, 778], [118, 117, 778], [117, 119, 778], [119, 120, 778],
    ],
    dtype=np.int64,
)


@functools.lru_cache(maxsize=2)
def load_decimator(is_rhand: bool) -> jnp.ndarray:
    """195-vertex downsample matrix D (195, 778): verts_sub = D @ verts.

    Loads ARCTIC's ``mano_decimator_195.npy`` when available
    (``common/body_models.py:11-31``); otherwise builds a uniform-pooling
    matrix with identical shape/normalisation so the API works end-to-end.
    """
    path = os.path.join(
        os.environ.get("DATA_DIR", ""),
        "arctic/data/arctic_data/data/meta/mano_decimator_195.npy",
    )
    key = "D_right" if is_rhand else "D_left"
    if os.environ.get("DATA_DIR") and os.path.exists(path):
        data = np.load(path, allow_pickle=True).item()
        return jnp.asarray(np.asarray(data[key], np.float32))
    D = np.zeros((195, NUM_VERTS), np.float32)
    idx = np.linspace(0, NUM_VERTS - 1, 195).astype(np.int64)
    D[np.arange(195), idx] = 1.0
    return jnp.asarray(D)


def decimate_verts(verts: jnp.ndarray, is_rhand: bool) -> jnp.ndarray:
    """(B, 778, 3) -> (B, 195, 3) via the decimation matrix (one matmul)."""
    D = load_decimator(is_rhand)
    return jnp.einsum("sv,bvc->bsc", D, verts)


def seal_mano_mesh(v3d: jnp.ndarray, faces: jnp.ndarray, is_rhand: bool):
    """Append the wrist-ring centroid vertex and 16 sealing faces.

    v3d (B, 778, 3), faces (1538, 3) -> (B, 779, 3), (1554, 3).
    """
    seal_faces = _SEAL_FACES_R if is_rhand else _SEAL_FACES_R[:, [1, 0, 2]]
    centers = v3d[:, SEAL_CIRCLE_V_ID].mean(axis=1, keepdims=True)
    sealed = jnp.concatenate([v3d, centers], axis=1)
    all_faces = jnp.concatenate([faces, jnp.asarray(seal_faces, faces.dtype)], axis=0)
    return sealed, all_faces
