"""Object / interaction / sequence metrics (ArcticNet evaluation suite).

Batched JAX forms of the object-centric metrics in
``/root/reference/src/utils/eval_modules.py`` (aae:79, success_rate:431,
cdev:479, field avg errors:36, acc_err:537/625) and ``src/utils/mdev.py``
(motion deviation). Ragged object meshes use padded tensors + masks, so
every metric is dense; NaN marks invalid samples exactly like the hand
metrics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hands_tpu.core.xdict import XDict

_NAN = jnp.nan


def _nanmean(x, axis):
    mask = jnp.isfinite(x)
    s = jnp.where(mask, x, 0.0).sum(axis=axis)
    n = mask.sum(axis=axis)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), _NAN)


# ------------------------------------------------------------------ aae
def eval_degree(pred, targets, meta_info) -> XDict:
    """Absolute articulation-angle error in degrees (eval_modules.py:79)."""
    is_valid = targets["is_valid"]
    err = jnp.abs(pred["object.radian"].reshape(-1) -
                  targets["object.radian"].reshape(-1))
    err_deg = err * 180.0 / jnp.pi
    out = XDict()
    out["aae"] = jnp.where(is_valid > 0, err_deg, _NAN)
    return out


# ---------------------------------------------------------- success rate
def eval_v2v_success(pred, targets, meta_info, alpha: float = 0.05) -> XDict:
    """Root-aligned object v2v success rate at alpha x diameter
    (eval_modules.py:431): root = mean of bottom-part vertices."""
    v_gt = targets["object.v.cam"]  # (B, Vmax, 3)
    v_pred = pred["object.v.cam"]
    mask = meta_info["object.v.mask"]  # (B, Vmax) 1=valid vertex
    bottom = (meta_info["part_ids"] == 2) * mask

    def root(v):
        w = bottom / jnp.maximum(bottom.sum(axis=1, keepdims=True), 1)
        return jnp.einsum("bv,bvc->bc", w, v)

    ra_gt = v_gt - root(v_gt)[:, None]
    ra_pred = v_pred - root(v_pred)[:, None]
    d = jnp.sqrt(jnp.sum((ra_gt - ra_pred) ** 2, axis=2))  # (B, Vmax)
    thresh = meta_info["diameter"][:, None] * alpha
    hit = (d < thresh) * mask
    rate = hit.sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1) * 100.0
    out = XDict()
    out[f"success_rate/{alpha:.2f}"] = jnp.where(
        targets["is_valid"] > 0, rate, _NAN)
    return out


# ----------------------------------------------------------------- cdev
def contact_deviation(
    pred_v3d_o, pred_v3d_h, dist_ho, idx_ho, is_valid, hand_valid,
    contact_dist: float = 3e-3,
):
    """Mean displacement of in-contact hand vertices to their corresponding
    object vertices (loss_modules.py:46). Returns (B,) meters, NaN-invalid."""
    B, Vh = dist_ho.shape
    corr = jnp.take_along_axis(
        pred_v3d_o, idx_ho[:, :, None].astype(jnp.int32).repeat(3, -1), axis=1)
    disp = corr - pred_v3d_h  # (B, Vh, 3)
    cd = jnp.sqrt(jnp.sum(disp * disp, axis=2))
    valid = (hand_valid * is_valid)[:, None] * (dist_ho <= contact_dist)
    cd = jnp.where(valid > 0, cd, _NAN)
    return _nanmean(cd, axis=1)


def eval_contact_deviation(pred, targets, meta_info) -> XDict:
    cd_ro = contact_deviation(
        pred["object.v.cam"], pred["mano.v3d.cam.r"], targets["dist.ro"],
        targets["idx.ro"], targets["is_valid"], targets["right_valid"])
    cd_lo = contact_deviation(
        pred["object.v.cam"], pred["mano.v3d.cam.l"], targets["dist.lo"],
        targets["idx.lo"], targets["is_valid"], targets["left_valid"])
    out = XDict()
    out["cdev/ho"] = _nanmean(jnp.stack([cd_ro, cd_lo], 1), axis=1) * 1000.0
    return out


# ---------------------------------------------------------- field errors
def eval_field_errors(pred, targets, meta_info) -> XDict:
    """Mean |gt - pred| of hand<->object distance fields (eval_modules.py:36).

    dist.ro/.lo are per-MANO-vertex (dense, 778); dist.or/.ol are per-object-
    vertex and masked by ``object.v.mask``."""
    is_valid = targets["is_valid"]
    obj_mask = meta_info["object.v.mask"]

    def avg_err(key, mask=None):
        diff = jnp.abs(targets[key] - pred[key])
        if mask is not None:
            diff = jnp.where(mask > 0, diff, _NAN)
        err = _nanmean(diff, axis=1)
        return jnp.where(is_valid > 0, err, _NAN)

    ro = avg_err("dist.ro")
    lo = avg_err("dist.lo")
    or_ = avg_err("dist.or", obj_mask)
    ol = avg_err("dist.ol", obj_mask)
    out = XDict()
    out["avg/ho"] = _nanmean(jnp.stack([ro, lo], 1), axis=1) * 1000.0
    out["avg/oh"] = _nanmean(jnp.stack([or_, ol], 1), axis=1) * 1000.0
    return out


# ---------------------------------------------------------- acceleration
def compute_error_accel(joints_gt, joints_pred, fps: float = 30.0):
    """Sequence acceleration error (eval_modules.py:537): central difference
    [1, -2, 1] / h^2 over the frame axis. (N, J, 3) -> (N-2,)."""
    h = 1.0 / fps
    acc_gt = (joints_gt[:-2] - 2 * joints_gt[1:-1] + joints_gt[2:]) / h**2
    acc_pred = (joints_pred[:-2] - 2 * joints_pred[1:-1] + joints_pred[2:]) / h**2
    return jnp.linalg.norm(acc_pred - acc_gt, axis=2).mean(axis=1)


def _acc_window_valid(valid):
    """acc at step t needs frames {t-1, t, t+1} valid (eval_modules.py:584-590,
    the np.convolve(ones(3))==3 window). (T,) -> (T-2,) bool."""
    return (valid[:-2] * valid[1:-1] * valid[2:]) > 0


def _nan_pad_ends(x):
    """Reference pads one NaN at each sequence end so the metric array length
    equals num_frames (eval_modules.py:601-612)."""
    pad = jnp.full((1,), _NAN, x.dtype)
    return jnp.concatenate([pad, x, pad])


def eval_acc_pose(pred, targets, meta_info, fps: float = 30.0) -> XDict:
    """Per-sequence acceleration error over ROOT-ALIGNED hand + object
    vertices (eval_modules.py:537-622): hand root = joint 0, object root =
    mean of bottom-part (part id 2) vertices; frames adjacent to invalid
    ones are NaN'd; m/s^2."""
    out = XDict()
    is_valid = targets["is_valid"]
    right_valid = targets["right_valid"] * is_valid
    left_valid = targets["left_valid"] * is_valid
    mask = meta_info["object.v.mask"]
    bottom = (meta_info["part_ids"] == 2) * mask

    def obj_root(v):
        w = bottom / jnp.maximum(bottom.sum(axis=1, keepdims=True), 1)
        return jnp.einsum("bv,bvc->bc", w, v)[:, None]

    def ra(d, key, root_key):
        if root_key == "object":
            return d[key] - obj_root(d[key])
        return d[key] - d[root_key][:, :1]

    def seq_err(key, root_key, valid):
        gt = ra(targets, key, root_key)
        pr = ra(pred, key, root_key)
        e = compute_error_accel(gt, pr, fps)
        return jnp.where(_acc_window_valid(valid), e, _NAN)

    acc_r = seq_err("mano.v3d.cam.r", "mano.j3d.cam.r", right_valid)
    acc_l = seq_err("mano.v3d.cam.l", "mano.j3d.cam.l", left_valid)
    acc_o = seq_err("object.v.cam", "object", is_valid)
    out["acc/h"] = _nan_pad_ends(_nanmean(jnp.stack([acc_r, acc_l], 1), axis=1))
    # reference quirk kept for parity: acc/o is never padded back to
    # num_frames (eval_modules.py:601-622 pads acc_r/l/h only)
    out["acc/o"] = acc_o
    return out


def eval_acc_field(pred, targets, meta_info, fps: float = 30.0) -> XDict:
    """Acceleration error of the hand<->object distance fields
    (eval_modules.py:625-706): central-difference acceleration of each
    per-vertex scalar field, |pred - gt| averaged over vertices, hand->object
    legs validity-windowed by the matching hand, object->hand legs by
    is_valid; hand/object legs nanmean'd pairwise; NaN end padding."""
    is_valid = targets["is_valid"]
    right_valid = targets["right_valid"] * is_valid
    left_valid = targets["left_valid"] * is_valid
    obj_mask = meta_info["object.v.mask"] if meta_info is not None else None

    h = 1.0 / fps

    def field_acc_err(gt, pr, vmask=None):
        a_gt = (gt[:-2] - 2 * gt[1:-1] + gt[2:]) / h**2
        a_pr = (pr[:-2] - 2 * pr[1:-1] + pr[2:]) / h**2
        e = jnp.abs(a_pr - a_gt)  # (T-2, V)
        if vmask is not None:
            # padded object vertices drop out of the vertex mean (the
            # reference slices pred to the GT's num_verts instead,
            # eval_modules.py:638-642)
            e = jnp.where(vmask[1:-1] > 0, e, _NAN)
            return _nanmean(e, axis=1)
        return e.mean(axis=1)

    acc_ro = field_acc_err(targets["dist.ro"], pred["dist.ro"])
    acc_lo = field_acc_err(targets["dist.lo"], pred["dist.lo"])
    acc_or = field_acc_err(targets["dist.or"], pred["dist.or"], obj_mask)
    acc_ol = field_acc_err(targets["dist.ol"], pred["dist.ol"], obj_mask)

    acc_ro = jnp.where(_acc_window_valid(right_valid), acc_ro, _NAN)
    acc_lo = jnp.where(_acc_window_valid(left_valid), acc_lo, _NAN)
    acc_or = jnp.where(_acc_window_valid(is_valid), acc_or, _NAN)
    acc_ol = jnp.where(_acc_window_valid(is_valid), acc_ol, _NAN)

    out = XDict()
    out["acc/ho"] = _nan_pad_ends(
        _nanmean(jnp.stack([acc_ro, acc_lo], 1), axis=1))
    out["acc/oh"] = _nan_pad_ends(
        _nanmean(jnp.stack([acc_or, acc_ol], 1), axis=1))
    return out


# ------------------------------------------------------- motion deviation
def find_contact_windows(
    dist: np.ndarray,  # (T, 778) closest-object distance per MANO vertex
    dist_idx: np.ndarray,  # (T, 778) matched object vertex ids
    vo: np.ndarray,  # (Vo, 3) canonical object vertices
    contact_thres: float = 3e-3,
    window_thres: int = 15,
) -> np.ndarray:
    """Mine continuous-contact windows [start, end, hand_vid, obj_vid]
    (reference mdev.py ``find_windows``), vectorised over time with
    run-length encoding instead of the per-frame python loop. Semantics are
    reference-exact: the sliding-contact filter is the nanmean of the
    pairwise canonical-object distances with the (window_thres-sized) upper
    triangle removed, windows that reach the last frame are dropped (the
    reference only closes a window on a contact->no-contact transition),
    and the matched object vertex is the mode of the per-frame matches."""
    T, V = np.shape(dist)
    contacts = np.asarray(dist) < contact_thres
    dist_idx = np.asarray(dist_idx)
    vo = np.asarray(vo)
    cand = np.nonzero(contacts.sum(axis=0) >= window_thres)[0]
    triu = np.triu_indices(window_thres)
    windows = []
    for vidx in cand:
        col = contacts[:, vidx]
        padded = np.concatenate([[0], col.astype(np.int8), [0]])
        delta = np.diff(padded)
        starts = np.nonzero(delta == 1)[0]
        ends = np.nonzero(delta == -1)[0] - 1
        for s, e in zip(starts, ends):
            if e == T - 1:
                # the reference loop never closes a window still in contact
                # at the final frame (mdev.py:38-58)
                continue
            if e - s + 1 < window_thres:
                continue
            j_list = dist_idx[s:e + 1, vidx]
            vj = vo[j_list]
            cdist = np.linalg.norm(vj[:, None, :] - vj[None, :, :], axis=-1)
            # reference quirk kept for parity: the nan-ed triangle is sized
            # window_thres, not the actual window length (mdev.py:72-76)
            cdist = cdist.copy()
            cdist[triu] = np.nan
            if np.nanmean(cdist) > contact_thres:
                continue  # finger slid along the object surface
            vals, counts = np.unique(j_list, return_counts=True)
            jidx = int(vals[np.argmax(counts)])  # torch.mode: smallest mode
            windows.append([s, e, vidx, jidx])
    return np.asarray(windows, np.int64).reshape(-1, 4)


def compute_mdev_windows(
    windows: np.ndarray,  # (W, 4) from find_contact_windows
    v_hand: np.ndarray,  # (T, 778, 3) posed hand vertices over the sequence
    v_obj: np.ndarray,  # (T, Vo, 3) posed object vertices
    frame_valid: np.ndarray = None,  # (T,) per-frame validity
) -> np.ndarray:
    """Per-window motion deviation (reference mdev.py ``compute_mdev``):
    the hand vertex and its matched object vertex must move identically
    inside a contact window; a frame-to-frame diff counts only when both
    frames are valid (nanmean over the window). Returns (W,) metres."""
    if frame_valid is None:
        frame_valid = np.ones(v_hand.shape[0])
    frame_valid = np.asarray(frame_valid, bool)
    out = []
    for s, e, i, j in windows:
        dh = np.diff(v_hand[s:e + 1, i], axis=0)
        do = np.diff(v_obj[s:e + 1, j], axis=0)
        diff = dh - do
        valid = frame_valid[s:e + 1]
        diff_valid = valid[1:] & valid[:-1]
        norms = np.linalg.norm(diff, axis=1)
        norms = np.where(diff_valid, norms, np.nan)
        out.append(np.nanmean(norms) if diff_valid.any() else np.nan)
    return np.asarray(out, np.float64)


def compute_mdev(
    v_hand: np.ndarray,
    v_obj: np.ndarray,
    windows: np.ndarray,
    frame_valid: np.ndarray = None,
) -> float:
    """Scalar sequence mdev in mm (mean over contact windows)."""
    if len(windows) == 0:
        return float("nan")
    per_win = compute_mdev_windows(windows, v_hand, v_obj, frame_valid)
    return float(np.nanmean(per_win) * 1000.0)


def eval_mrrpe_ro(pred, targets, meta_info) -> XDict:
    """Hand-root to object-root relative position error (eval_modules.py:345):
    object root = mean of bottom-part vertices, masked-padded."""
    is_valid = targets["is_valid"]
    rv = targets["right_valid"] * is_valid
    mask = meta_info["object.v.mask"]
    bottom = (meta_info["part_ids"] == 2) * mask

    def obj_root(v):
        w = bottom / jnp.maximum(bottom.sum(axis=1, keepdims=True), 1)
        return jnp.einsum("bv,bvc->bc", w, v)

    rel_gt = obj_root(targets["object.v.cam"]) - targets["mano.j3d.cam.r"][:, 0]
    rel_pr = obj_root(pred["object.v.cam"]) - pred["mano.j3d.cam.r"][:, 0]
    err = jnp.sqrt(jnp.sum((rel_pr - rel_gt) ** 2, axis=1))
    out = XDict()
    out["mrrpe/r/o"] = jnp.where(rv > 0, err, _NAN) * 1000.0
    return out


def compute_v2v_dist(v_gt, v_pred, mask, is_valid):
    """Per-vertex L2 over padded meshes, NaN-masked
    (common/metrics.py:compute_v2v_dist_no_reduce, dense form)."""
    d = jnp.sqrt(jnp.sum((v_gt - v_pred) ** 2, axis=2))
    d = jnp.where(mask > 0, d, _NAN)
    return jnp.where(is_valid[:, None] > 0, d, _NAN)


def eval_motion_deviation(v_hand_seq, v_obj_seq, dist_seq, dist_idx_seq,
                          vo_canonical, contact_thres: float = 3e-3,
                          window_thres: int = 15,
                          frame_valid=None) -> float:
    """Sequence-level mdev (mdev.py:144, reference defaults: 3mm contact,
    15-frame windows): mine contact windows on the GT distance fields, then
    measure hand/object relative drift. Host-side."""
    windows = find_contact_windows(
        np.asarray(dist_seq), np.asarray(dist_idx_seq),
        np.asarray(vo_canonical), contact_thres, window_thres)
    return compute_mdev(np.asarray(v_hand_seq), np.asarray(v_obj_seq),
                        windows, frame_valid)


object_eval_fn_dict = {
    "mrrpe.ro": eval_mrrpe_ro,
    "aae": eval_degree,
    "success_rate": eval_v2v_success,
    "cdev": eval_contact_deviation,
    "avg_err_field": eval_field_errors,
    "acc_err_pose": eval_acc_pose,
    "acc_err_field": eval_acc_field,
}
