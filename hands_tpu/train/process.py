"""On-device GT preparation (the reference's ``process_data_light``,
``/root/reference/src/callbacks/process/process_arctic.py:4``).

Runs inside the jitted train/eval step (under ``stop_gradient`` — the
reference wraps it in ``no_grad``): MANO-FKs the GT parameters for both
hands, derives canonical->camera translations and the weak-perspective GT
camera, and populates the ``targets`` keys the loss consumes.
"""

from __future__ import annotations

import jax

from hands_tpu.core import camera as camlib
from hands_tpu.core.xdict import XDict
from hands_tpu.ops import mano as manolib


def process_data_light(
    mano_r: manolib.ManoModel,
    mano_l: manolib.ManoModel,
    inputs: XDict,
    targets: XDict,
    meta_info: XDict,
    img_res: int,
):
    """Populate GT-dependent target keys. Returns an updated targets XDict."""
    K = meta_info["intrinsics"]
    out = XDict(targets)

    def one_hand(model, pose, beta, j3d_full, suffix):
        gt = manolib.mano_forward(
            model, betas=beta, hand_pose=pose[:, 3:], global_orient=pose[:, :3]
        )
        # canonical-space joints/verts
        out["mano.joints3d" + suffix] = gt.joints
        out["mano.vertices" + suffix] = gt.vertices
        # translation canonical -> camera space (mean offset over joints)
        T0 = (j3d_full - gt.joints).mean(axis=1)
        out["mano.v3d.cam" + suffix] = gt.vertices + T0[:, None, :]
        out["mano.j3d.cam" + suffix] = j3d_full
        # GT camera translation: camera root minus canonical root
        cam_t = j3d_full[:, 0] - gt.joints[:, 0]
        out["mano.cam_t" + suffix] = cam_t
        avg_focal = (K[:, 0, 0] + K[:, 1, 1]) / 2.0
        out["mano.cam_t.wp" + suffix] = camlib.perspective_to_weak_perspective(
            cam_t, avg_focal, img_res
        )

    stop = jax.lax.stop_gradient
    one_hand(
        mano_r,
        stop(targets["mano.pose.r"]),
        stop(targets["mano.beta.r"]),
        stop(targets["mano.j3d.full.r"]),
        ".r",
    )
    one_hand(
        mano_l,
        stop(targets["mano.pose.l"]),
        stop(targets["mano.beta.l"]),
        stop(targets["mano.j3d.full.l"]),
        ".l",
    )
    return inputs, out, meta_info
