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

    out = {
        "image": st(lambda r: r.image),
        "K": st(lambda r: r.K),
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
        out["mask"] = st(lambda r: r.mask)
    if records[0].depth is not None:
        out["depth"] = st(lambda r: r.depth)
    out["_imgnames"] = [r.imgname for r in records]
    out["_dataset"] = [r.dataset for r in records]
    return out


class DevicePreprocessor:
    """Jitted record-batch -> (inputs, targets, meta_info) transform."""

    def __init__(self, cfg: Config, is_train: bool):
        self.cfg = cfg
        self.is_train = is_train
        self._fn = jax.jit(functools.partial(self._process))

    def _process(self, batch: dict, key: jax.Array):
        cfg = self.cfg
        B = batch["image"].shape[0]
        res = cfg.img_res
        k_aug, k_jit_r, k_jit_l = jax.random.split(key, 3)

        augm = pp.augm_params(
            k_aug, B, self.is_train, cfg.flip_prob, cfg.noise_factor,
            cfg.rot_factor, cfg.scale_factor,
        )

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

        # ---- 4. hand bboxes from GT joints (patch pixel space) + jitter
        def joints_bbox(j2d_norm, jkey):
            px = (j2d_norm[..., :2] + 1.0) * 0.5 * res  # (B, 21, 2)
            conf = j2d_norm[..., 2:]
            big = jnp.where(conf > 0, px, jnp.inf)
            small = jnp.where(conf > 0, px, -jnp.inf)
            lo = jnp.clip(jnp.min(big, axis=1), 0, res - 1)
            hi = jnp.clip(jnp.max(small, axis=1), 0, res - 1)
            lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
            hi = jnp.where(jnp.isfinite(hi), hi, res - 1.0)
            xywh = jnp.concatenate([lo, hi - lo], axis=-1)
            if self.is_train:
                xywh = pp.jitter_bbox(jkey, xywh)
            x0y0 = xywh[:, :2]
            return jnp.concatenate([x0y0, x0y0 + xywh[:, 2:]], axis=-1)

        r_bbox = pp.crop_and_pad_bbox(joints_bbox(j2d_r, k_jit_r), res)
        l_bbox = pp.crop_and_pad_bbox(joints_bbox(j2d_l, k_jit_l), res)

        # ---- 5. intrinsics in patch space (needed for PCL crops too)
        K_patch = camlib.crop_adjusted_intrinsics(
            batch["K"], center[:, 0], center[:, 1], augm["sc"] * bbox_dim, res
        )
        if not cfg.use_gt_k:
            K_patch = jnp.broadcast_to(
                camlib.weak_perspective_intrinsics(cfg.focal_length, res),
                (B, 3, 3),
            )

        # ---- 6. per-hand crops from the augmented patch
        r_rot = l_rot = None
        if cfg.pos_enc == "pcl":
            r_img, r_rot = pp.pcl_crop(img, r_bbox, K_patch, cfg.img_res_ds)
            l_img, l_rot = pp.pcl_crop(img, l_bbox, K_patch, cfg.img_res_ds)
        else:
            r_img = pp.crop_and_pad_images(img, r_bbox, cfg.img_res_ds,
                                           scale=1.0, method="bilinear")
            l_img = pp.crop_and_pad_images(img, l_bbox, cfg.img_res_ds,
                                           scale=1.0, method="bilinear")

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
        })
        if r_rot is not None:
            inputs["r_rot"] = r_rot
            inputs["l_rot"] = l_rot
        if cfg.pos_enc is not None:
            inputs["r_center_angle"] = pp.kpe_center_angles(r_bbox, K_patch)
            inputs["l_center_angle"] = pp.kpe_center_angles(l_bbox, K_patch)
            inputs["r_corner_angle"] = pp.kpe_corner_angles(r_bbox, K_patch)
            inputs["l_corner_angle"] = pp.kpe_corner_angles(l_bbox, K_patch)
            if "dense" in (cfg.pos_enc or "") or "cam_conv" in (cfg.pos_enc or ""):
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
                                 apply_rot=self.is_train)
                targets["depth.r"] = d[..., 0]
                targets["depth.l"] = d[..., 0]
            else:
                targets["depth.r"] = jnp.zeros((B, res, res))
                targets["depth.l"] = jnp.zeros((B, res, res))

        meta_info = XDict({
            "intrinsics": K_patch,
            "is_flipped": augm["flip"],
        })
        for flag in LOSS_FLAGS:
            meta_info[flag] = batch[flag]
        return inputs, targets, meta_info

    def __call__(self, record_batch: dict, key: jax.Array):
        device_batch = {
            k: v for k, v in record_batch.items() if not k.startswith("_")
        }
        inputs, targets, meta_info = self._fn(device_batch, key)
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
    """Host dataset of Records -> stream of device-preprocessed batches."""

    def __init__(self, dataset, cfg: Config, batch_size: int, is_train: bool,
                 seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.is_train = is_train
        self.seed = seed
        self.drop_last = drop_last
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

    def __iter__(self):
        n = len(self.dataset)
        epoch = self._epoch
        self._epoch += 1
        order = np.arange(n)
        if self.is_train:
            np.random.RandomState(self.seed * 100003 + epoch).shuffle(order)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch)
        for start in range(0, n - (self.batch_size - 1 if self.drop_last else 0),
                           self.batch_size):
            idx = order[start:start + self.batch_size]
            records = [self.dataset[int(i)] for i in idx]
            n_pad = self.batch_size - len(records)
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
            stacked = stack_records(records)
            key, sub = jax.random.split(key)
            inputs, targets, meta = self.pre(stacked, sub)
            meta = XDict(meta)
            meta["imgname"] = stacked["_imgnames"][: self.batch_size - n_pad]
            meta["num_valid"] = self.batch_size - n_pad
            yield inputs, targets, meta
