"""Batched on-device evaluation metrics.

TPU-native forms of ``/root/reference/src/utils/eval_modules.py`` +
``common/metrics.py``: every metric is a dense batched computation emitting
per-example arrays with NaN for invalid entries (identical masking semantics
to the reference; epoch aggregation is a nanmean). Procrustes alignment runs
as one batched SVD (``hands_tpu.ops.procrustes``) instead of a per-sample
numpy loop.

Registry: ``eval_fn_dict`` keyed like the reference ("mpjpe.ra",
"mpjpe.pa.ra", "mrrpe.rl", "pix_err").
"""

from __future__ import annotations

import jax.numpy as jnp

from hands_tpu.core.xdict import XDict
from hands_tpu.ops.procrustes import similarity_align, similarity_align_masked

_NAN = jnp.nan


def joint3d_error(gt, pred, valid_sample):
    """Per-joint L2 (B, J); rows of invalid samples are NaN."""
    dist = jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=2))
    return jnp.where(valid_sample[:, None] > 0, dist, _NAN)


def pixel_error(gt, pred, valid_jts):
    """Per-joint 2D L2 (B, J); invalid joints are NaN."""
    dist = jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=2))
    return jnp.where(valid_jts > 0, dist, _NAN)


def _nanmean(x, axis):
    mask = jnp.isfinite(x)
    s = jnp.where(mask, x, 0.0).sum(axis=axis)
    n = mask.sum(axis=axis)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), _NAN)


def eval_mpjpe_ra(pred, targets, meta_info) -> XDict:
    out = XDict()
    is_valid = targets["is_valid"]
    rv = targets["right_valid"] * is_valid
    lv = targets["left_valid"] * is_valid

    def ra(x):
        return x - x[:, :1, :]

    err_r = joint3d_error(
        ra(targets["mano.j3d.cam.r"]), ra(pred["mano.j3d.cam.r"]), rv
    ).mean(axis=1)
    err_l = joint3d_error(
        ra(targets["mano.j3d.cam.l"]), ra(pred["mano.j3d.cam.l"]), lv
    ).mean(axis=1)
    out["mpjpe/ra/h"] = _nanmean(jnp.stack([err_r, err_l], axis=1), axis=1) * 1000.0
    return out


def _masked_pa_errors(gt, pr, hand_valid, jv):
    """Per-sample (abs, rao, pa) errors under per-joint 3D validity —
    the dense batched form of the reference's EgoExo loop
    (eval_modules.py:231-317):

    - root-align by the FIRST VALID joint (the loop's ``curr[0]`` after the
      boolean gather), not joint 0;
    - means run over valid joints only;
    - the Procrustes fit uses only valid joints (masked == subset for 0/1
      weights);
    - the pa error is multiplied by ``hand_valid`` (reference
      ``compute_errors`` quirk: an invalid hand scores 0.0, not NaN);
    - hands with zero valid joints yield NaN for all three.
    """
    jvf = (jv > 0)
    any_valid = jvf.any(axis=1)
    root_idx = jnp.argmax(jvf, axis=1)

    def take_root(x):
        return jnp.take_along_axis(
            x, root_idx[:, None, None].repeat(3, axis=2), axis=1)

    def masked_mean(per_joint):
        m = _nanmean(jnp.where(jvf, per_joint, jnp.nan), axis=1)
        return jnp.where(any_valid, m, jnp.nan)

    dist_abs = jnp.sqrt(jnp.sum((gt - pr) ** 2, axis=2))
    abs_err = masked_mean(dist_abs)

    gt_ra = gt - take_root(gt)
    pr_ra = pr - take_root(pr)
    dist_ra = jnp.sqrt(jnp.sum((gt_ra - pr_ra) ** 2, axis=2))
    rao_err = masked_mean(dist_ra)

    pr_hat = similarity_align_masked(pr_ra, gt_ra, jvf.astype(gt.dtype))
    dist_pa = jnp.sqrt(jnp.sum((gt_ra - pr_hat) ** 2, axis=2))
    pa_err = masked_mean(dist_pa) * hand_valid
    pa_err = jnp.where(any_valid, pa_err, jnp.nan)
    return {"abs": abs_err, "rao": rao_err, "ra": pa_err}


def eval_mpjpe_pa_ra(pred, targets, meta_info) -> XDict:
    out = XDict()
    is_valid = targets["is_valid"]
    rv = targets["right_valid"] * is_valid
    lv = targets["left_valid"] * is_valid
    # EgoExo path: per-joint 3D validity drives a masked Procrustes
    # (reference eval_modules.py:231-317); presence of the key selects the
    # branch (static per dataset config, jit-safe)
    jv_r = targets.get("joints3d_valid_r")
    jv_l = targets.get("joints3d_valid_l")

    if jv_r is not None:
        res_r = _masked_pa_errors(
            targets["mano.j3d.cam.r"], pred["mano.j3d.cam.r"], rv, jv_r)
        res_l = _masked_pa_errors(
            targets["mano.j3d.cam.l"], pred["mano.j3d.cam.l"], lv, jv_l)
        for name in ("abs", "rao", "ra"):
            err_r, err_l = res_r[name], res_l[name]
            out[f"mpjpe/pa/{name}/r"] = err_r * 1000.0
            out[f"mpjpe/pa/{name}/l"] = err_l * 1000.0
            out[f"mpjpe/pa/{name}/h"] = (
                _nanmean(jnp.stack([err_r, err_l], axis=1), axis=1) * 1000.0)
        return out

    def pa_err(gt, pr, valid):
        gt_ra = gt - gt[:, :1, :]
        pr_ra = pr - pr[:, :1, :]
        pr_hat = similarity_align(pr_ra, gt_ra)
        return joint3d_error(gt_ra, pr_hat, valid).mean(axis=1)

    err_r = pa_err(targets["mano.j3d.cam.r"], pred["mano.j3d.cam.r"], rv)
    err_l = pa_err(targets["mano.j3d.cam.l"], pred["mano.j3d.cam.l"], lv)
    out["mpjpe/pa/ra/h"] = (
        _nanmean(jnp.stack([err_r, err_l], axis=1), axis=1) * 1000.0
    )
    return out


def eval_mrrpe_rl(pred, targets, meta_info) -> XDict:
    out = XDict()
    is_valid = targets["is_valid"]
    valid = targets["right_valid"] * targets["left_valid"] * is_valid
    rel_gt = targets["mano.j3d.cam.l"][:, 0] - targets["mano.j3d.cam.r"][:, 0]
    rel_pred = pred["mano.j3d.cam.l"][:, 0] - pred["mano.j3d.cam.r"][:, 0]
    err = jnp.sqrt(jnp.sum((rel_pred - rel_gt) ** 2, axis=1))
    out["mrrpe/r/l"] = jnp.where(valid > 0, err, _NAN) * 1000.0
    return out


def eval_pix_err(pred, targets, meta_info) -> XDict:
    out = XDict()
    is_valid = targets["is_valid"]
    rv = targets["joints_valid_r"] * (targets["right_valid"] * is_valid)[:, None]
    lv = targets["joints_valid_l"] * (targets["left_valid"] * is_valid)[:, None]
    pix_r = pixel_error(targets["mano.j2d.r"][..., :2], pred["mano.j2d.r"], rv)
    pix_l = pixel_error(targets["mano.j2d.l"][..., :2], pred["mano.j2d.l"], lv)
    out["pix_err/r"] = pix_r
    out["pix_err/l"] = pix_l
    out["pix_err/h"] = jnp.concatenate([pix_r, pix_l], axis=1)
    return out


def eval_pck(pred, targets, meta_info, thresholds=(5.0, 10.0, 15.0)) -> XDict:
    """PCK@px over both hands (the EPIC-HandKps sweep's summary statistic):
    fraction of valid joints within each pixel threshold."""
    is_valid = targets["is_valid"]
    rv = targets["joints_valid_r"] * (targets["right_valid"] * is_valid)[:, None]
    lv = targets["joints_valid_l"] * (targets["left_valid"] * is_valid)[:, None]
    pix_r = pixel_error(targets["mano.j2d.r"][..., :2], pred["mano.j2d.r"], rv)
    pix_l = pixel_error(targets["mano.j2d.l"][..., :2], pred["mano.j2d.l"], lv)
    pix = jnp.concatenate([pix_r, pix_l], axis=1)
    out = XDict()
    for t in thresholds:
        hit = jnp.where(jnp.isfinite(pix), (pix < t).astype(jnp.float32),
                        jnp.nan)
        out[f"pck/{t:.0f}px"] = _nanmean(hit, axis=1) * 100.0
    return out


eval_fn_dict = {
    "mpjpe.ra": eval_mpjpe_ra,
    "mpjpe.pa.ra": eval_mpjpe_pa_ra,
    "mrrpe.rl": eval_mrrpe_rl,
    "pix_err": eval_pix_err,
    "pck": eval_pck,
}


def evaluate_metrics(pred, targets, meta_info, specs) -> XDict:
    out = XDict()
    for key in specs:
        out.merge(eval_fn_dict[key](pred, targets, meta_info))
    return out
