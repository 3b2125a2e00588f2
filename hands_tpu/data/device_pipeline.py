"""The fused on-device batch preprocessor.

Replaces the reference's 16-worker cv2 ``__getitem__`` hot loop (SURVEY §3.3)
with one jitted XLA program per batch: full-image patch warp + augmentation,
GT keypoint transforms, per-hand square crops, KPE angle computation,
intrinsics update and ImageNet normalisation all run on the TPU. The host
only decodes images and stacks records.

Flow per batch (mirrors ``hands_light_dataset.__getitem__``):
  1. augmentation draws (rot/scale/noise/flip) from one PRNG key
  2. full-image patch: blur -> rotated crop(side = sc*scale*200) -> noise
  3. GT j2d of both hands -> patch space (normalised)
  4. hand bboxes from GT joints (or provided boxes) + train-time jitter
  5. per-hand square crops (max-side x1.5) from the patch
  6. crop-adjusted intrinsics + KPE center/corner(/dense) angles
  7. pose aug (global-orient rotation), ImageNet normalise
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from hands_tpu.config import Config
from hands_tpu.core import camera as camlib
from hands_tpu.core.xdict import XDict
from hands_tpu.data.records import LOSS_FLAGS, Record
from hands_tpu.ops import preprocess as pp


def stack_records(records: List[Record]) -> dict:
    """Host-side: stack records into one dict of numpy arrays (+ names)."""
    def st(fn):
        return np.stack([np.asarray(fn(r), np.float32) for r in records])

    def det_boxes(fn):
        boxes = [fn(r) for r in records]
        ok = np.asarray([b is not None for b in boxes], np.float32)
        vals = np.stack([
            np.asarray(b, np.float32) if b is not None
            else np.zeros(4, np.float32) for b in boxes])
        return vals, ok

    def st_u8(fn):
        # ship pixels as uint8: 4x less host->device transfer than the
        # float32 stack (the device program casts on-chip anyway)
        arrs = []
        for r in records:
            a = np.asarray(fn(r))
            if a.dtype != np.uint8:
                a = np.clip(a, 0, 255).astype(np.uint8)
            arrs.append(a)
        return np.stack(arrs)

    r_det, r_ok = det_boxes(lambda r: r.r_bbox)
    l_det, l_ok = det_boxes(lambda r: r.l_bbox)
    out = {
        "image": st_u8(lambda r: r.image),
        "K": st(lambda r: r.K),
        "is_egocam": np.asarray([r.is_egocam for r in records], np.float32),
        # -1 sentinels: fall back to the config-level camera policy on device
        "use_gt_k": np.asarray(
            [-1.0 if r.use_gt_k is None else float(r.use_gt_k)
             for r in records], np.float32),
        "wp_focal": np.asarray(
            [-1.0 if r.wp_focal is None else float(r.wp_focal)
             for r in records], np.float32),
        "bbox_mode": np.asarray([r.bbox_mode for r in records], np.float32),
        "r_bbox_det": r_det, "r_bbox_ok": r_ok,
        "l_bbox_det": l_det, "l_bbox_ok": l_ok,
        "j2d_r": st(lambda r: r.j2d_r),
        "j2d_l": st(lambda r: r.j2d_l),
        "j3d_r": st(lambda r: r.j3d_r),
        "j3d_l": st(lambda r: r.j3d_l),
        "pose_r": st(lambda r: r.pose_r),
        "pose_l": st(lambda r: r.pose_l),
        "beta_r": st(lambda r: r.beta_r),
        "beta_l": st(lambda r: r.beta_l),
        "bbox": st(lambda r: r.bbox),
        "grasp_r": np.asarray([r.grasp_r for r in records], np.int32),
        "grasp_l": np.asarray([r.grasp_l for r in records], np.int32),
        "right_valid": st(lambda r: r.right_valid),
        "left_valid": st(lambda r: r.left_valid),
        "is_valid": st(lambda r: r.is_valid),
        "joints_valid_r": st(lambda r: r.joints_valid_r),
        "joints_valid_l": st(lambda r: r.joints_valid_l),
        "grasp_valid_r": st(lambda r: r.grasp_valid_r),
        "grasp_valid_l": st(lambda r: r.grasp_valid_l),
        "mask_valid_r": st(lambda r: r.mask_valid_r),
        "mask_valid_l": st(lambda r: r.mask_valid_l),
    }
    for flag in LOSS_FLAGS:
        out[flag] = np.asarray(
            [r.loss_flags.get(flag, 0.0) for r in records], np.float32
        )
    if records[0].joints3d_valid_r is not None:
        out["joints3d_valid_r"] = st(lambda r: r.joints3d_valid_r)
        out["joints3d_valid_l"] = st(lambda r: r.joints3d_valid_l)
    if records[0].mask is not None:
        out["mask"] = st_u8(lambda r: r.mask)
    if records[0].depth is not None:
        out["depth"] = st(lambda r: r.depth)
    out["_imgnames"] = [r.imgname for r in records]
    out["_dataset"] = [r.dataset for r in records]
    # host-side passthrough: egocam distortion coeffs (NaN for non-ego,
    # reference meta_info["dist"]) — kept out of the jitted program so
    # --debug NaN guards stay meaningful
    out["_dist"] = st(lambda r: r.dist)
    return out


class DevicePreprocessor:
    """Jitted record-batch -> (inputs, targets, meta_info) transform."""

    def __init__(self, cfg: Config, is_train: bool):
        self.cfg = cfg
        self.is_train = is_train
        self._fn = jax.jit(functools.partial(self._process))

    def _process(self, batch: dict, key: jax.Array):
        # GT geometry (crop transforms, K adjustment, j2d/j3d rotation)
        # must be exact — pin f32 matmuls; TPU's bf16 MXU default would
        # round GT joints/coordinates at the ~1e-3 level
        with jax.default_matmul_precision("float32"):
            return self._process_inner(batch, key)

    def _process_inner(self, batch: dict, key: jax.Array):
        cfg = self.cfg
        B = batch["image"].shape[0]
        res = cfg.img_res
        k_aug, k_jit_r, k_jit_l = jax.random.split(key, 3)

        augm = pp.augm_params(
            k_aug, B, self.is_train, cfg.flip_prob, cfg.noise_factor,
            cfg.rot_factor, cfg.scale_factor,
        )
        # "no scaling for egocam to make intrinsics consistent"
        # (hands_light_dataset.py:113-116 and every in-the-wild dataset)
        augm = dict(augm)
        augm["sc"] = jnp.where(batch["is_egocam"] > 0, 1.0, augm["sc"])

        # ---- 2. full-image patch
        center = batch["bbox"][:, :2]
        bbox_dim = batch["bbox"][:, 2]
        img = pp.rgb_crop_augment(
            batch["image"], center, bbox_dim, augm, res,
            antialias=self.is_train, method="bilinear",
            apply_rot=self.is_train,
        )

        # ---- 3. GT keypoints into (normalised) patch space
        j2d_r = pp.j2d_crop_transform(batch["j2d_r"], center, bbox_dim, augm, res)
        j2d_l = pp.j2d_crop_transform(batch["j2d_l"], center, bbox_dim, augm, res)

        # ---- 4. hand boxes in patch pixel space.
        # GT-joint boxes (reference hands_light_dataset.py:137-151 /
        # epic_dataset.py:135-161: min/max over the *valid* joints, int16
        # floor, degenerate -> full image) with train-time jitter
        # (jitter then re-check degeneracy, L:156-163); or the provided
        # detected boxes mapped through the patch transform by their corner
        # endpoints (epic_dataset.py:165-195, *_grasp/seg/depth).
        resm1 = res - 1.0

        def joints_tight(j2d_norm, jvalid):
            px = (j2d_norm[..., :2] + 1.0) * 0.5 * resm1  # (B, 21, 2)
            v = (jvalid > 0)[..., None]
            lo = jnp.clip(jnp.min(jnp.where(v, px, jnp.inf), axis=1), 0, resm1)
            hi = jnp.clip(jnp.max(jnp.where(v, px, -jnp.inf), axis=1), 0, resm1)
            none_valid = ~jnp.any(v[:, :, 0], axis=1)
            lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
            hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
            xywh = jnp.floor(jnp.concatenate([lo, hi - lo], axis=-1))
            degenerate = none_valid | (xywh[:, 2] <= 0) | (xywh[:, 3] <= 0)
            return xywh, degenerate

        def provided_tight(det_xyxy, ok):
            # map the two corner endpoints through the same patch transform
            # as the keypoints (epic_dataset.py:185-191)
            pts = det_xyxy.reshape(B, 2, 2)
            pts = jnp.concatenate([pts, jnp.ones((B, 2, 1))], axis=-1)
            tp = pp.j2d_crop_transform(pts, center, bbox_dim, augm, res)
            px = jnp.clip((tp[..., :2] + 1.0) * 0.5 * res, 0, resm1)
            xywh = jnp.concatenate(
                [px[:, 0], px[:, 1] - px[:, 0]], axis=-1)
            xywh = jnp.floor(xywh)
            degenerate = (ok <= 0) | (xywh[:, 2] <= 0) | (xywh[:, 3] <= 0)
            return xywh, degenerate

        def jitter_recheck(xywh, degen, jkey):
            if not self.is_train:
                return xywh, degen
            j = jnp.floor(pp.jitter_bbox(jkey, xywh))
            x0 = jnp.clip(j[:, 0], 0, resm1)
            y0 = jnp.clip(j[:, 1], 0, resm1)
            x1 = jnp.clip(j[:, 0] + j[:, 2], 0, resm1)
            y1 = jnp.clip(j[:, 1] + j[:, 3], 0, resm1)
            new = jnp.stack([x0, y0, x1 - x0, y1 - y0], axis=-1)
            return new, degen | (new[:, 2] <= 0) | (new[:, 3] <= 0)

        mode = batch["bbox_mode"] > 0  # (B,) provided-box records

        def hand_boxes(j2d_norm, jvalid, det, det_ok, jkey):
            gt_xywh, gt_degen = joints_tight(j2d_norm, jvalid)
            og = jnp.where(
                gt_degen[:, None],
                jnp.asarray([0.0, 0.0, resm1, resm1]), gt_xywh)
            gt_xywh, gt_degen = jitter_recheck(gt_xywh, gt_degen, jkey)
            pr_xywh, pr_degen = provided_tight(det, det_ok)
            pr_og = jnp.where(
                pr_degen[:, None],
                jnp.asarray([0.0, 0.0, resm1, resm1]), pr_xywh)
            xywh = jnp.where(mode[:, None], pr_xywh, gt_xywh)
            degen = jnp.where(mode, pr_degen, gt_degen)
            og = jnp.where(mode[:, None], pr_og, og)
            return xywh, degen, og

        r_xywh, r_full, r_bbox_og = hand_boxes(
            j2d_r, batch["joints_valid_r"], batch["r_bbox_det"],
            batch["r_bbox_ok"], k_jit_r)
        l_xywh, l_full, l_bbox_og = hand_boxes(
            j2d_l, batch["joints_valid_l"], batch["l_bbox_det"],
            batch["l_bbox_ok"], k_jit_l)

        # square max-side crop geometry (reference crop_and_pad,
        # data_utils.py:495-509: centre/size from the *unclipped* tight box,
        # returned box clipped; a degenerate box -> full-image resize)
        def crop_geom(xywh, full):
            x0, y0, w, h = (xywh[:, i] for i in range(4))
            xm = jnp.floor((2.0 * x0 + w) / 2.0)
            ym = jnp.floor((2.0 * y0 + h) / 2.0)
            size = jnp.maximum(w, h) * cfg.bbox_scale
            xm = jnp.where(full, res / 2.0, xm)
            ym = jnp.where(full, res / 2.0, ym)
            size = jnp.where(full, float(res), size)
            half = size // 2
            box = jnp.stack(
                [xm - half, ym - half, xm + half, ym + half], axis=-1)
            box = jnp.clip(box, 0, resm1)
            box = jnp.where(full[:, None],
                            jnp.asarray([0.0, 0.0, resm1, resm1]), box)
            return box, xm, ym, size

        r_bbox, r_cx, r_cy, r_size = crop_geom(r_xywh, r_full)
        l_bbox, l_cx, l_cy, l_size = crop_geom(l_xywh, l_full)

        # ---- 5. intrinsics in patch space (needed for PCL crops too).
        # Per-sample camera policy: crop-adjusted GT K for egocam/GT-K
        # records, weak-perspective K (per-record focal) otherwise; -1
        # sentinels defer to the config.
        K_gt = camlib.crop_adjusted_intrinsics(
            batch["K"], center[:, 0], center[:, 1], augm["sc"] * bbox_dim, res
        )
        wp_f = jnp.where(batch["wp_focal"] > 0, batch["wp_focal"],
                         cfg.focal_length)
        c0 = jnp.full((B,), float(res // 2))
        zeros = jnp.zeros((B,))
        ones = jnp.ones((B,))
        K_wp = jnp.stack([
            jnp.stack([wp_f, zeros, c0], -1),
            jnp.stack([zeros, wp_f, c0], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ], axis=1)
        use_k = jnp.where(batch["use_gt_k"] < 0,
                          1.0 if cfg.use_gt_k else 0.0, batch["use_gt_k"])
        K_patch = jnp.where(use_k[:, None, None] > 0, K_gt, K_wp)

        # ---- 6. per-hand crops from the augmented patch
        r_rot = l_rot = None
        if cfg.pos_enc == "pcl":
            r_img, r_rot = pp.pcl_crop(img, r_bbox, K_patch, cfg.img_res_ds)
            l_img, l_rot = pp.pcl_crop(img, l_bbox, K_patch, cfg.img_res_ds)
        else:
            r_img = jnp.clip(pp.crop_resize_separable(
                img, r_cx, r_cy, r_size, cfg.img_res_ds, method="bilinear"),
                0.0, 1.0)
            l_img = jnp.clip(pp.crop_resize_separable(
                img, l_cx, l_cy, l_size, cfg.img_res_ds, method="bilinear"),
                0.0, 1.0)

        # ---- horizontal flip (augm): mirror pixels; bboxes mirror AND swap
        # sides (reference hands_light_dataset.py:190-197 — the model's
        # flip-swap then un-mirrors the predictions). GT targets stay.
        flip = augm["flip"].reshape(B, 1, 1, 1)

        def flip_img(x):
            return jnp.where(flip > 0, x[:, :, ::-1, :], x)

        img = flip_img(img)
        r_img = flip_img(r_img)
        l_img = flip_img(l_img)

        def mirror_bbox(bb):
            x0, y0, x1, y1 = (bb[:, i] for i in range(4))
            return jnp.stack([res - 1 - x1, y0, res - 1 - x0, y1], axis=-1)

        fb = augm["flip"].reshape(B, 1)
        r_bbox_noflip, l_bbox_noflip = r_bbox, l_bbox
        r_bbox, l_bbox = (
            jnp.where(fb > 0, mirror_bbox(l_bbox), r_bbox),
            jnp.where(fb > 0, mirror_bbox(r_bbox), l_bbox),
        )

        inputs = XDict({
            "img": pp.normalize_imagenet(img, cfg.img_norm_mean, cfg.img_norm_std),
            "r_img": pp.normalize_imagenet(r_img, cfg.img_norm_mean, cfg.img_norm_std),
            "l_img": pp.normalize_imagenet(l_img, cfg.img_norm_mean, cfg.img_norm_std),
            "r_bbox": r_bbox,
            "l_bbox": l_bbox,
            # pre-expansion boxes, xywh int16 semantics (reference
            # inputs['r_bbox_og'] — frankmocap-style eval consumers)
            "r_bbox_og": r_bbox_og,
            "l_bbox_og": l_bbox_og,
        })
        if r_rot is not None:
            inputs["r_rot"] = r_rot
            inputs["l_rot"] = l_rot
        if cfg.pos_enc is not None:
            if cfg.pos_enc == "sinusoidal_cc":
                # normalised crop coords, NOT intrinsics rays
                # (hands_light_dataset.py:335-352)
                inputs["r_center_angle"] = pp.kpe_center_coords(r_bbox, res)
                inputs["l_center_angle"] = pp.kpe_center_coords(l_bbox, res)
                inputs["r_corner_angle"] = pp.kpe_corner_coords(r_bbox, res)
                inputs["l_corner_angle"] = pp.kpe_corner_coords(l_bbox, res)
            else:
                inputs["r_center_angle"] = pp.kpe_center_angles(r_bbox, K_patch)
                inputs["l_center_angle"] = pp.kpe_center_angles(l_bbox, K_patch)
                inputs["r_corner_angle"] = pp.kpe_corner_angles(r_bbox, K_patch)
                inputs["l_corner_angle"] = pp.kpe_corner_angles(l_bbox, K_patch)
            if "cam_conv" in (cfg.pos_enc or ""):
                # 6-channel dense: rays + pixel offsets + centred coords
                # (hands_light_dataset.py:302-333)
                ra, rm = pp.kpe_camconv_dense(r_bbox, K_patch, res)
                la, lm = pp.kpe_camconv_dense(l_bbox, K_patch, res)
                inputs["r_dense_angle"], inputs["r_dense_mask"] = ra, rm
                inputs["l_dense_angle"], inputs["l_dense_mask"] = la, lm
            elif "dense" in (cfg.pos_enc or ""):
                ra, rm = pp.kpe_dense_angles(r_bbox, K_patch, res)
                la, lm = pp.kpe_dense_angles(l_bbox, K_patch, res)
                inputs["r_dense_angle"], inputs["r_dense_mask"] = ra, rm
                inputs["l_dense_angle"], inputs["l_dense_mask"] = la, lm

        # ---- 7. pose augmentation; rotate GT 3D joints to match the
        # in-plane patch rotation so 2D/3D stay consistent
        pose_r = pp.pose_aug_rotate(batch["pose_r"], augm["rot"])
        pose_l = pp.pose_aug_rotate(batch["pose_l"], augm["rot"])

        from hands_tpu.core import rot as rotlib

        rad = -augm["rot"] * jnp.pi / 180.0
        c, s = jnp.cos(rad), jnp.sin(rad)
        zero, one = jnp.zeros_like(c), jnp.ones_like(c)
        Rz = jnp.stack([c, -s, zero, s, c, zero, zero, zero, one], -1).reshape(
            B, 3, 3)
        j3d_r = jnp.einsum("bij,bnj->bni", Rz, batch["j3d_r"])
        j3d_l = jnp.einsum("bij,bnj->bni", Rz, batch["j3d_l"])

        targets = XDict({
            "mano.pose.r": pose_r,
            "mano.pose.l": pose_l,
            "mano.beta.r": batch["beta_r"],
            "mano.beta.l": batch["beta_l"],
            "mano.j3d.full.r": j3d_r,
            "mano.j3d.full.l": j3d_l,
            "mano.j2d.norm.r": j2d_r,
            "mano.j2d.norm.l": j2d_l,
            "is_valid": batch["is_valid"],
            "right_valid": batch["right_valid"],
            "left_valid": batch["left_valid"],
            "joints_valid_r": batch["joints_valid_r"],
            "joints_valid_l": batch["joints_valid_l"],
        })
        if cfg.pos_enc is not None:
            # GT for the optional center/corner regression heads — the
            # reference mirrors the input encodings into targets
            # (hands_light_dataset.py:268, 280, 341-352)
            targets["center.r"] = inputs["r_center_angle"]
            targets["center.l"] = inputs["l_center_angle"]
            targets["corner.r"] = inputs["r_corner_angle"]
            targets["corner.l"] = inputs["l_corner_angle"]
        if "joints3d_valid_r" in batch:
            targets["joints3d_valid_r"] = batch["joints3d_valid_r"]
            targets["joints3d_valid_l"] = batch["joints3d_valid_l"]
        if self.cfg.use_grasp_loss:
            targets["grasp.r"] = batch["grasp_r"]
            targets["grasp.l"] = batch["grasp_l"]
            targets["grasp_valid_r"] = batch["grasp_valid_r"]
            targets["grasp_valid_l"] = batch["grasp_valid_l"]
        if self.cfg.use_render_seg_loss:
            if "mask" in batch:
                m = pp.mask_crop(batch["mask"], center, bbox_dim, augm, res,
                                 apply_rot=self.is_train)
                m = m[..., 0]
                # mask coding: R=255, L=127 (epic_seg_dataset.py:134-135)
                targets["render.r"] = (jnp.abs(m - 255.0) < 32).astype(jnp.float32)
                targets["render.l"] = (jnp.abs(m - 127.0) < 32).astype(jnp.float32)
            else:
                targets["render.r"] = jnp.zeros((B, res, res))
                targets["render.l"] = jnp.zeros((B, res, res))
            targets["render_valid_r"] = batch["mask_valid_r"]
            targets["render_valid_l"] = batch["mask_valid_l"]
        if self.cfg.use_depth_loss:
            if "depth" in batch:
                d = pp.mask_crop(batch["depth"], center, bbox_dim, augm, res,
                                 apply_rot=self.is_train)[..., 0]
                # per-hand depth = patch depth clipped to the hand's crop box
                # (epic_depth_dataset.py:181-190)
                xs = jnp.arange(res, dtype=jnp.float32)

                def region(box):
                    in_x = ((xs[None, None, :] >= box[:, 0, None, None])
                            & (xs[None, None, :] < box[:, 2, None, None]))
                    in_y = ((xs[None, :, None] >= box[:, 1, None, None])
                            & (xs[None, :, None] < box[:, 3, None, None]))
                    return (in_x & in_y).astype(d.dtype)

                targets["depth.r"] = d * region(r_bbox_noflip)
                targets["depth.l"] = d * region(l_bbox_noflip)
            else:
                targets["depth.r"] = jnp.zeros((B, res, res))
                targets["depth.l"] = jnp.zeros((B, res, res))

        meta_info = XDict({
            "intrinsics": K_patch,
            "is_flipped": augm["flip"],
            "center": center,
            "rot_angle": augm["rot"],
        })
        for flag in LOSS_FLAGS:
            meta_info[flag] = batch[flag]
        return inputs, targets, meta_info

    def __call__(self, record_batch: dict, key: jax.Array):
        device_batch = {
            k: v for k, v in record_batch.items() if not k.startswith("_")
        }
        inputs, targets, meta_info = self._fn(device_batch, key)
        if "_dist" in record_batch:
            meta_info["dist"] = record_batch["_dist"]
        return inputs, targets, meta_info


class PrefetchLoader:
    """Background-thread prefetch: overlaps host record decode/stacking with
    device compute (the reference's num_workers analogue — one thread
    suffices since everything but decode runs on device)."""

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __getattr__(self, name):
        # delegate peek()/set_epoch()/... to the wrapped loader (Trainer
        # drives those on the production num_workers>0 path)
        return getattr(self.loader, name)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def worker():
            try:
                for item in self.loader:
                    q.put(item)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


class DeviceDataLoader:
    """Host dataset of Records -> stream of device-preprocessed batches.

    Record fetches (file read + native JPEG/PNG decode, both GIL-free) run
    on a thread pool with a bounded batch lookahead — the reference's
    16-worker DataLoader analogue (configs/generic.py:20) without process
    forking: the only host work per record is decode, everything geometric
    runs on device. Output order and augmentation draws are identical to the
    sequential path (futures are consumed in submission order).
    """

    def __init__(self, dataset, cfg: Config, batch_size: int, is_train: bool,
                 seed: int = 0, drop_last: bool = True,
                 num_workers: int = None, lookahead_batches: int = 4,
                 shard: tuple = (0, 1)):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        # multi-host: (process_id, num_processes). batch_size stays the
        # GLOBAL batch; each host fetches only its contiguous row range of
        # every batch (the DistributedSampler analogue — every host derives
        # the same (seed, epoch) permutation and slices it)
        self.shard = shard
        if shard[1] > 1 and batch_size % shard[1]:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"num_processes {shard[1]}")
        self.is_train = is_train
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = (cfg.num_workers if num_workers is None
                            else num_workers)
        self.lookahead_batches = lookahead_batches
        self.pre = DevicePreprocessor(cfg, is_train)
        # epoch counter: advances once per full iteration so every epoch
        # reshuffles and draws fresh augmentations (the reference's torch
        # DataLoader reshuffles per epoch and its numpy augm RNG advances
        # globally); (seed, epoch) -> stream stays run-level deterministic
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch index (mirrors DistributedSampler.set_epoch)."""
        self._epoch = int(epoch)

    def peek(self):
        """First batch of the upcoming epoch WITHOUT advancing the epoch
        counter — for model init, so the first training epoch still sees
        every batch exactly once (the round-1 loop consumed + re-yielded the
        init batch, training on it twice)."""
        epoch = self._epoch
        try:
            return next(iter(self))
        finally:
            self._epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _iter_record_batches(self, order, step: int = None):
        """Yield lists of Records for each index batch, fetched by a thread
        pool with bounded lookahead (num_workers == 0 -> sequential)."""
        n = len(order)
        step = step or self.batch_size
        starts = range(0, n - (step - 1 if self.drop_last else 0), step)
        if self.num_workers <= 0:
            for s in starts:
                yield [self.dataset[int(i)] for i in order[s:s + step]]
            return
        import concurrent.futures as cf
        from collections import deque

        with cf.ThreadPoolExecutor(self.num_workers) as ex:
            pending = deque()
            it = iter(starts)

            def submit():
                s = next(it, None)
                if s is None:
                    return False
                pending.append([ex.submit(self.dataset.__getitem__, int(i))
                                for i in order[s:s + step]])
                return True

            for _ in range(self.lookahead_batches):
                if not submit():
                    break
            while pending:
                futs = pending.popleft()
                submit()
                yield [f.result() for f in futs]

    def _iter_stacked_batches(self, order, step: int = None):
        """Packed fast path: the dataset materialises whole stacked batches
        (one mmap gather per field — no per-record Python, no decode; see
        data/packed.py). Yields (stacked, n_real)."""
        n = len(order)
        step = step or self.batch_size
        starts = range(0, n - (step - 1 if self.drop_last else 0), step)
        for s in starts:
            idxs = order[s:s + step]
            stacked = self.dataset.stacked_batch(idxs)
            n_real = len(idxs)
            n_pad = step - n_real
            if n_pad > 0:
                for key, val in stacked.items():
                    if isinstance(val, list):
                        stacked[key] = val + [val[-1]] * n_pad
                    else:
                        stacked[key] = np.concatenate(
                            [val, np.repeat(val[-1:], n_pad, axis=0)])
                for key in ("is_valid", "right_valid", "left_valid"):
                    v = np.array(stacked[key])
                    v[n_real:] = 0.0
                    stacked[key] = v
            yield stacked, n_real

    def _iter_batches(self, order):
        if self.shard[1] > 1:
            yield from self._iter_batches_sharded(order)
            return
        if hasattr(self.dataset, "stacked_batch"):
            yield from self._iter_stacked_batches(order)
            return
        for records in self._iter_record_batches(order):
            n_real = len(records)
            n_pad = self.batch_size - n_real
            if n_pad > 0:
                # pad the tail batch to the fixed shape (one compiled program
                # for the whole sweep); padded samples are invalidated so
                # NaN-masked metrics ignore them
                import copy as _copy

                for _ in range(n_pad):
                    pad = _copy.copy(records[-1])
                    pad.is_valid = 0.0
                    pad.right_valid = 0.0
                    pad.left_valid = 0.0
                    records.append(pad)
            yield stack_records(records), n_real

    def _iter_batches_sharded(self, order):
        """Multi-host path: every host derives the same global ``order`` and
        fetches ONLY rows [pid*bl, (pid+1)*bl) of each global batch — its
        devices' slice of the batch-sharded global array
        (``parallel.distributed.shard_batch_global``). Global tail batches
        are padded with repeats of the last index so every host always sees
        a full local slice; pad rows are invalidated for the NaN-masked
        metrics (same contract as the single-host tail padding above)."""
        pid, nprocs = self.shard
        B = self.batch_size
        bl = B // nprocs
        n = len(order)
        nb = n // B if self.drop_last else -(-n // B)
        g = order[:nb * B]
        if nb * B > n:
            g = np.concatenate([order, np.repeat(order[-1:], nb * B - n)])
        local = g.reshape(nb, B)[:, pid * bl:(pid + 1) * bl].reshape(-1)
        if hasattr(self.dataset, "stacked_batch"):
            batches = self._iter_stacked_batches(local, step=bl)
        else:
            batches = ((stack_records(recs), len(recs)) for recs in
                       self._iter_record_batches(local, step=bl))
        for bi, (stacked, _) in enumerate(batches):
            n_valid_g = min(n - bi * B, B)
            n_real = int(np.clip(n_valid_g - pid * bl, 0, bl))
            if n_real < bl:
                for key in ("is_valid", "right_valid", "left_valid"):
                    v = np.array(stacked[key])
                    v[n_real:] = 0.0
                    stacked[key] = v
            yield stacked, n_real

    def __iter__(self):
        n = len(self.dataset)
        epoch = self._epoch
        self._epoch += 1
        order = np.arange(n)
        if self.is_train:
            np.random.RandomState(self.seed * 100003 + epoch).shuffle(order)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch)
        if self.shard[1] > 1:
            # decorrelate augmentation draws across hosts (each host
            # preprocesses a different row range of the global batch)
            key = jax.random.fold_in(key, self.shard[0])
        for stacked, n_real in self._iter_batches(order):
            key, sub = jax.random.split(key)
            inputs, targets, meta = self.pre(stacked, sub)
            meta = XDict(meta)
            meta["imgname"] = stacked["_imgnames"][:n_real]
            meta["num_valid"] = n_real
            yield inputs, targets, meta
