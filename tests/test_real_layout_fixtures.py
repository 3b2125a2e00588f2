"""Real-file-layout fixture trees for every dataset family.

Each test builds a miniature on-disk tree in the *reference's* exact layout
(`/root/reference/src/datasets/*.py` — split npys, misc.json, COCO jsons,
pkls, txt trees, npz masks, 16-bit pngs, real encoded images), then walks
Dataset -> DeviceDataLoader -> one preprocessed batch, asserting the
label-parsing semantics (joint reordering, validity rules, camera policy,
provided-box routing) — not just the DataNotFoundError path.
"""

import json
import os
import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")
cv2 = pytest.importorskip("cv2")

from hands_tpu.config import default_config
from hands_tpu.data import datasets as D
from hands_tpu.data.device_pipeline import DeviceDataLoader

IMG_W, IMG_H = 128, 96


def _img(seed=0, w=IMG_W, h=IMG_H):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def _write_jpg(path, img):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    assert cv2.imwrite(path, img[:, :, ::-1])


def _one_batch(ds, cfg, bs=2, is_train=False):
    dl = DeviceDataLoader(ds, cfg, batch_size=bs, is_train=is_train,
                          seed=0, drop_last=False)
    return next(iter(dl))


# ------------------------------------------------------------------- ARCTIC
def _build_arctic_tree(root, n_frames=4, ego_scale=0.3):
    """Miniature ARCTIC tree: split npy (data_dict keyed sid/seq, arrays
    [vidx, view]), misc.json, cropped_images for the speedup ego path."""
    base = os.path.join(root, "arctic/data/arctic_data/data")
    full_w, full_h = 400, 300
    ioi = 10
    rng = np.random.RandomState(0)
    K_ego = np.asarray(
        [[300.0, 0, full_w / 2], [0, 300.0, full_h / 2], [0, 0, 1]])

    n_views = 9  # view 0 = ego
    j3d = rng.rand(n_frames, n_views, 21, 3) * 0.2 + [[-0.1, -0.1, 0.5]]
    j3d_l = j3d + 0.01
    j2d = np.einsum("fvjk,lk->fvjl", j3d, K_ego)
    j2d = j2d[..., :2] / j2d[..., 2:]
    j2d_l2 = np.einsum("fvjk,lk->fvjl", j3d_l, K_ego)
    j2d_l2 = j2d_l2[..., :2] / j2d_l2[..., 2:]

    data_dict = {
        "s01/box_grab_01": {
            "cam_coord": {
                "joints.right": j3d.astype(np.float32),
                "joints.left": j3d_l.astype(np.float32),
                "rot_r_cam": rng.randn(n_frames, n_views, 3).astype(np.float32) * 0.1,
                "rot_l_cam": rng.randn(n_frames, n_views, 3).astype(np.float32) * 0.1,
                "is_valid": np.ones((n_frames, n_views), np.float32),
                "right_valid": np.ones((n_frames, n_views), np.float32),
                "left_valid": np.ones((n_frames, n_views), np.float32),
            },
            "2d": {
                "joints.right": j2d.astype(np.float32),
                "joints.left": j2d_l2.astype(np.float32),
            },
            "bbox": np.tile(
                np.asarray([full_w / 2, full_h / 2, max(full_w, full_h) / 200.0],
                           np.float32), (n_frames, n_views, 1)),
            "params": {
                "pose_r": rng.randn(n_frames, 45).astype(np.float32) * 0.1,
                "pose_l": rng.randn(n_frames, 45).astype(np.float32) * 0.1,
                "shape_r": rng.randn(n_frames, 10).astype(np.float32) * 0.1,
                "shape_l": rng.randn(n_frames, 10).astype(np.float32) * 0.1,
                "K_ego": np.tile(K_ego.astype(np.float32), (n_frames, 1, 1)),
                "dist": rng.randn(n_frames, 8).astype(np.float32) * 0.01,
            },
        }
    }
    imgnames = [
        f"./arctic_data/data/images/s01/box_grab_01/0/{ioi + f:05d}.jpg"
        for f in range(n_frames)
    ]
    os.makedirs(os.path.join(base, "splits"), exist_ok=True)
    np.save(os.path.join(base, "splits/p2a_val.npy"),
            {"data_dict": data_dict, "imgnames": imgnames},
            allow_pickle=True)
    misc = {"s01": {
        "intris_mat": [K_ego.tolist()] * 8,
        "image_size": [[full_w, full_h]] * 9,
        "ioi_offset": ioi,
        "world2cam": [np.eye(4).tolist()] * 8,
    }}
    os.makedirs(os.path.join(base, "meta"), exist_ok=True)
    json.dump(misc, open(os.path.join(base, "meta/misc.json"), "w"))

    full = _img(1, full_w, full_h)
    small = cv2.resize(full, None, fx=ego_scale, fy=ego_scale,
                       interpolation=cv2.INTER_AREA)
    for f in range(n_frames):
        _write_jpg(os.path.join(
            base, f"cropped_images/s01/box_grab_01/0/{ioi + f:05d}.jpg"), small)
        _write_jpg(os.path.join(
            base, f"images/s01/box_grab_01/0/{ioi + f:05d}.jpg"), full)
    return K_ego, full_w, full_h


def test_arctic_real_layout_speedup(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    K_ego, full_w, full_h = _build_arctic_tree(str(tmp_path))
    cfg = default_config("hands_light", use_render_seg_loss=False,
                         use_grasp_loss=False)
    assert cfg.speedup and cfg.ego_image_scale == 0.3
    ds = D.HandsLightDataset(cfg, "val")
    assert len(ds) == 4
    rec = ds[0]
    # ego record: downscaled image + scaled K + speedup-remapped labels
    s = cfg.ego_image_scale
    assert rec.is_egocam == 1.0 and rec.use_gt_k == 1.0
    np.testing.assert_allclose(rec.K[0, 0], K_ego[0, 0] * s, rtol=1e-6)
    assert rec.image.shape[0] == round(full_h * s)
    assert np.isfinite(rec.dist).all()
    assert rec.pose_r.shape == (48,)

    inputs, targets, meta = _one_batch(ds, cfg)
    # the device K must equal the reference get_aug_intrix result: ego ->
    # sc=1, GT K crop-adjusted for the centred max-side box
    dim = max(full_w, full_h) * s  # sc=1 forced for ego
    k_scale = cfg.img_res / dim
    exp_fx = K_ego[0, 0] * s * k_scale
    exp_cx = (K_ego[0, 2] * s - (full_w * s / 2 - dim / 2)) * k_scale
    K_dev = np.asarray(meta["intrinsics"])[0]
    np.testing.assert_allclose(K_dev[0, 0], exp_fx, rtol=1e-5)
    np.testing.assert_allclose(K_dev[0, 2], exp_cx, rtol=1e-5)
    # GT j2d visible -> normalised patch coords in [-1, 1]
    j2 = np.asarray(targets["mano.j2d.norm.r"])
    assert (np.abs(j2[..., :2]) <= 1.0 + 1e-5).mean() > 0.9
    assert np.asarray(meta["dist"]).shape == (2, 8)
    assert np.isfinite(np.asarray(meta["dist"])).all()


def test_arctic_no_speedup_uses_full_images(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    K_ego, full_w, full_h = _build_arctic_tree(str(tmp_path))
    cfg = default_config("hands_light", use_render_seg_loss=False,
                         use_grasp_loss=False).replace(speedup=False)
    rec = D.HandsLightDataset(cfg, "val")[0]
    assert rec.image.shape[:2] == (full_h, full_w)
    np.testing.assert_allclose(rec.K, K_ego, rtol=1e-6)


def test_arctic_mini_split_strips_prefix(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    _build_arctic_tree(str(tmp_path))
    cfg = default_config("hands_light")
    ds = D.HandsLightDataset(cfg, "minival")  # reads p2_val.npy
    assert len(ds) == 4  # min(80, 4)


# --------------------------------------------------------------------- EPIC
def _build_epic_tree(root, with_det_boxes=False):
    base = os.path.join(root, "epic_hands")
    os.makedirs(base, exist_ok=True)
    rng = np.random.RandomState(2)
    ann = {}
    for i in range(3):
        key = f"epic_frames/frame_{i}.jpg"
        _write_jpg(os.path.join(root, key), _img(10 + i))
        joints = rng.rand(21, 2) * [IMG_W, IMG_H]
        jv = np.ones(21)
        jv[:5] = 0.0  # 16 valid > 3
        entry = {"right": {"bbox": None, "joints": list(joints),
                           "joints_valid": list(jv)}}
        # no left hand on frame 0 -> dummy side
        if i > 0:
            entry["left"] = {"bbox": None,
                             "joints": list(rng.rand(21, 2) * [IMG_W, IMG_H]),
                             "joints_valid": list(np.ones(21))}
        ann[key] = entry
    with open(os.path.join(base, "hands_250.pkl"), "wb") as f:
        pickle.dump(ann, f)
    with open(os.path.join(base, "hands_5000.pkl"), "wb") as f:
        pickle.dump(ann, f)
    if with_det_boxes:
        det = {k: {"right_bbox": [10.0, 10.0, 60.0, 50.0], "left_bbox": None}
               for k in ann}
        with open(os.path.join(base, "grasp_visor_val.pkl"), "wb") as f:
            pickle.dump(det, f)
    return ann


def test_epic_real_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    ann = _build_epic_tree(str(tmp_path))
    cfg = default_config("hands_light", use_render_seg_loss=False,
                         use_grasp_loss=False)
    ds = D.EPICDataset(cfg, "val")
    rec = ds[0]
    key = ds.samples[0]["key"]
    # assembly->MANO reindexing (epic_dataset.py:57): output joint j comes
    # from annotation row _ASSEMBLY_TO_MANO[j]
    raw = np.asarray(ann[key]["right"]["joints"], np.float32)
    np.testing.assert_allclose(rec.j2d_r[:, :2],
                               raw[D._ASSEMBLY_TO_MANO], rtol=1e-6)
    assert rec.right_valid == 1.0  # 16 valid joints > 3
    assert rec.use_gt_k == 0.0 and rec.is_egocam == 1.0
    # wp focal scaled by img_res / max(1920, 1080)
    np.testing.assert_allclose(
        rec.wp_focal, cfg.focal_length * cfg.img_res / 1920.0, rtol=1e-6)
    assert (rec.beta_r == D.MEAN_BETA_R).all()

    inputs, targets, meta = _one_batch(ds, cfg)
    K = np.asarray(meta["intrinsics"])[0]
    np.testing.assert_allclose(K[0, 0], rec.wp_focal, rtol=1e-5)
    np.testing.assert_allclose(K[0, 2], cfg.img_res // 2, rtol=1e-5)


def test_epic_detected_boxes_on_test_split(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    _build_epic_tree(str(tmp_path), with_det_boxes=True)
    cfg = default_config("hands_light", use_render_seg_loss=False,
                         use_grasp_loss=False).replace(use_gt_bbox=False)
    ds = D.EPICDataset(cfg, "test")
    rec = ds[0]
    assert rec.bbox_mode == 1.0
    np.testing.assert_allclose(rec.r_bbox, [10, 10, 60, 50])
    assert rec.l_bbox is None

    inputs, _, _ = _one_batch(ds, cfg)
    # left hand has no detection -> full-image crop box
    res = cfg.img_res
    np.testing.assert_allclose(np.asarray(inputs["l_bbox"])[0],
                               [0, 0, res - 1, res - 1])
    np.testing.assert_allclose(np.asarray(inputs["l_bbox_og"])[0],
                               [0, 0, res - 1, res - 1])
    # right detection maps into the patch: distinct from the full box
    r_box = np.asarray(inputs["r_bbox"])[0]
    assert r_box[2] - r_box[0] < res - 1

    # with GT boxes the same split must ignore detections
    cfg_gt = cfg.replace(use_gt_bbox=True)
    ds_gt = D.EPICDataset(cfg_gt, "test")
    assert ds_gt[0].bbox_mode == 0.0


# -------------------------------------------------------------------- grasp
def _build_grasp_tree(root, subdir, pklname):
    base = os.path.join(root, subdir)
    os.makedirs(base, exist_ok=True)
    ann = {}
    for i, (rg, lg) in enumerate([("Pow-Pris", None), (None, "Later")]):
        key = f"grasp_frames/frame_{i}.jpg"
        _write_jpg(os.path.join(root, key), _img(20 + i))
        ann[key] = {
            "right_grasp": rg, "left_grasp": lg,
            "right_bbox": [8.0, 8.0, 70.0, 60.0] if rg else None,
            "left_bbox": [30.0, 20.0, 90.0, 80.0] if lg else None,
        }
    with open(os.path.join(base, pklname), "wb") as f:
        pickle.dump(ann, f)
    return ann


def test_epic_grasp_real_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    _build_grasp_tree(str(tmp_path), "epic_hands", "grasp_visor_train.pkl")
    cfg = default_config("hands_light", use_render_seg_loss=False)
    ds = D.EPICGraspDataset(cfg, "train")
    recs = {ds[i].imgname: ds[i] for i in range(len(ds))}
    r0 = recs["grasp_frames/frame_0.jpg"]
    assert r0.grasp_r == 2 and r0.grasp_l == 8  # Pow-Pris / no grasp
    assert r0.grasp_valid_r == 1.0 and r0.grasp_valid_l == 0.0
    assert r0.bbox_mode == 1.0
    r1 = recs["grasp_frames/frame_1.jpg"]
    assert r1.grasp_l == 6 and r1.grasp_r == 8  # Later

    inputs, targets, meta = _one_batch(ds, cfg, is_train=True)
    assert "grasp.r" in targets


def test_ego4d_grasp_real_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    _build_grasp_tree(str(tmp_path), "ego4d_hands", "grasp_ego.pkl")
    cfg = default_config("hands_light", use_render_seg_loss=False)
    ds = D.Ego4DGraspDataset(cfg, "train")
    rec = ds[0]
    # ego4d reads the true frame size (ego_grasp_dataset.py:73)
    np.testing.assert_allclose(
        rec.wp_focal, cfg.focal_length * cfg.img_res / IMG_W, rtol=1e-6)


# ---------------------------------------------------------------------- seg
def test_epic_seg_real_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    root = str(tmp_path)
    base = os.path.join(root, "epic_hands")
    os.makedirs(base, exist_ok=True)
    key = "seg_frames/frame_0.jpg"
    _write_jpg(os.path.join(root, key), _img(30))
    mask = np.zeros((IMG_H, IMG_W), np.uint8)
    mask[10:40, 20:60] = 255  # right hand blob
    mask[50:80, 70:110] = 127  # left hand blob
    np.savez(os.path.join(base, "visor_pred_masks_train.npz"),
             **{key: np.stack([mask] * 3, -1)})
    with open(os.path.join(base, "modal_amodal_annot.pkl"), "wb") as f:
        pickle.dump({key: {"right": 1, "left": 0}}, f)
    with open(os.path.join(base, "grasp_visor_train.pkl"), "wb") as f:
        pickle.dump({key: {"right_bbox": [15.0, 5.0, 65.0, 45.0],
                           "left_bbox": [65.0, 45.0, 115.0, 85.0],
                           "right_grasp": None, "left_grasp": None}}, f)

    cfg = default_config("hands_light", use_grasp_loss=False)
    ds = D.EPICSegDataset(cfg, "train")
    rec = ds[0]
    assert rec.mask_valid_r == 1.0  # modal==1 and box present
    assert rec.mask_valid_l == 0.0  # modal==0
    # mask clipped to the detected box region
    assert (rec.mask == 255).sum() > 0
    ys, xs = np.where(rec.mask == 255)
    assert xs.min() >= 15 and xs.max() < 65 and ys.max() < 45

    inputs, targets, meta = _one_batch(ds, cfg, is_train=True)
    assert float(np.asarray(targets["render.r"]).sum()) > 0


# -------------------------------------------------------------------- depth
def test_epic_depth_real_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "epic_hands"), exist_ok=True)
    os.makedirs(os.path.join(root, "visor_depth"), exist_ok=True)
    key = "depth_frames/frame_7.jpg"
    _write_jpg(os.path.join(root, key), _img(40))
    depth_mm = (np.ones((IMG_H, IMG_W)) * 1500).astype(np.uint16)
    assert cv2.imwrite(os.path.join(root, "visor_depth/frame_7.png"), depth_mm)
    with open(os.path.join(root, "epic_hands/grasp_visor_train.pkl"),
              "wb") as f:
        pickle.dump({key: {"right_bbox": [10.0, 10.0, 60.0, 50.0],
                           "left_bbox": None,
                           "right_grasp": None, "left_grasp": None}}, f)

    cfg = default_config("hands_light", use_grasp_loss=False,
                         use_render_seg_loss=False, use_depth_loss=True)
    ds = D.EPICDepthDataset(cfg, "train")
    rec = ds[0]
    np.testing.assert_allclose(rec.depth, 1.5)  # mm -> m
    assert rec.right_valid == 1.0 and rec.left_valid == 0.0

    inputs, targets, meta = _one_batch(ds, cfg, is_train=True)
    d_r = np.asarray(targets["depth.r"])[0]
    d_l = np.asarray(targets["depth.l"])[0]
    # right depth clipped to the box region; left box missing -> full patch
    assert 0 < (d_r > 0).mean() < 1.0
    assert (d_l > 0).mean() > (d_r > 0).mean()


# ---------------------------------------------------------------------- H2O
def test_h2o_real_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    root = str(tmp_path)
    seq = "subject1/h1/0/cam4"
    seq_dir = os.path.join(root, "h2o", seq)
    for sub in ("rgb", "hand_pose", "hand_pose_mano"):
        os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)
    img = _img(50)
    assert cv2.imwrite(os.path.join(seq_dir, "rgb/000000.png"),
                       img[:, :, ::-1])
    fx, fy, cx, cy = 120.0, 121.0, IMG_W / 2, IMG_H / 2
    np.savetxt(os.path.join(seq_dir, "cam_intrinsics.txt"),
               [fx, fy, cx, cy, IMG_W, IMG_H])
    rng = np.random.RandomState(5)
    jl = rng.rand(21, 3) * 0.1 + [0, 0, 0.4]
    jr = rng.rand(21, 3) * 0.1 + [0, 0, 0.4]
    hand_pose = np.concatenate([[1.0], jl.ravel(), [1.0], jr.ravel()])
    np.savetxt(os.path.join(seq_dir, "hand_pose/000000.txt"), hand_pose)
    mano = np.concatenate([
        [1.0], rng.randn(3), rng.randn(48) * 0.1, rng.randn(10) * 0.1,
        [1.0], rng.randn(3), rng.randn(48) * 0.1, rng.randn(10) * 0.1])
    np.savetxt(os.path.join(seq_dir, "hand_pose_mano/000000.txt"), mano)
    with open(os.path.join(root, "h2o/local_val.txt"), "w") as f:
        f.write(f"{root}/h2o/{seq}/rgb/000000.png\n")

    cfg = default_config("hands_light", use_render_seg_loss=False,
                         use_grasp_loss=False)
    ds = D.H2ODataset(cfg, "val")
    assert len(ds) == 1
    rec = ds[0]
    # rows are left-first; joints reordered into MANO convention
    np.testing.assert_allclose(rec.j3d_l, jl[D._H2O_TO_MANO], rtol=1e-5)
    np.testing.assert_allclose(rec.j3d_r, jr[D._H2O_TO_MANO], rtol=1e-5)
    np.testing.assert_allclose(rec.pose_r, mano[62 + 4:62 + 52], atol=1e-6)
    np.testing.assert_allclose(rec.K[0, 0], fx)
    assert rec.use_gt_k == 1.0 and rec.is_egocam == 1.0

    inputs, targets, meta = _one_batch(ds, cfg)
    assert np.isfinite(np.asarray(targets["mano.j2d.norm.r"])).all()


# ------------------------------------------------------------------- EgoExo
def test_egoexo_real_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "ego4d_hands"), exist_ok=True)
    full_w, full_h = 512, 384
    crop_h, crop_w = IMG_H, IMG_W  # uniform downscale of the full res
    K_full = np.asarray([[400.0, 0, full_w / 2], [0, 400.0, full_h / 2],
                         [0, 0, 1]])
    joints = ["wrist"] + [f"{f}_{i}" for f in
                          ("index", "middle", "pinky", "ring") for i in
                          (1, 2, 3)] + [f"thumb_{i}" for i in (1, 2, 3, 4)] + \
        ["index_4", "middle_4", "ring_4", "pinky_4"]
    rng = np.random.RandomState(7)
    j3d = {}
    j2d = {}
    # right hand: annotate all but middle_2 (index 5)
    for name in joints:
        if name == "middle_2":
            continue
        p = rng.rand(3) * 0.1 + [0, 0, 0.5]
        j3d[f"right_{name}"] = {"x": p[0], "y": p[1], "z": p[2]}
        q = K_full @ p
        j2d[f"right_{name}"] = {"x": q[0] / q[2], "y": q[1] / q[2]}
    ann = {"frame_0": {
        "img": _img(60, crop_w, crop_h),
        "crop_size": (crop_h, crop_w),
        "image_size": (full_w, full_h),
        "intrx": K_full,
        "j3d": j3d, "j2d": j2d,
    }}
    with open(os.path.join(
            root, "ego4d_hands/joint_annotations_egoexo_val.pkl"),
            "wb") as f:
        pickle.dump(ann, f)

    cfg = default_config("hands_light", use_render_seg_loss=False,
                         use_grasp_loss=False)
    ds = D.EgoExoDataset(cfg, "test")
    rec = ds[0]
    # named-joint ordering: middle_2 is MANO index 5 and must be invalid
    assert rec.joints3d_valid_r[5] == 0.0
    assert rec.joints3d_valid_r.sum() == 20.0
    assert rec.left_valid == 0.0 and rec.right_valid == 1.0
    # K scaled from full-res into the crop pixel space
    np.testing.assert_allclose(
        rec.K[0, 0], K_full[0, 0] * max(crop_w, crop_h) / max(full_w, full_h),
        rtol=1e-6)

    inputs, targets, meta = _one_batch(ds, cfg)
    assert "joints3d_valid_r" in targets
    v = np.asarray(targets["joints3d_valid_r"])[0]
    assert v[5] == 0.0 and v.sum() == 20.0


# ----------------------------------------------------------------- Assembly
def test_assembly_real_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    root = str(tmp_path)
    ann_dir = os.path.join(root, "assembly/annotations/val")
    os.makedirs(ann_dir, exist_ok=True)
    seq, cam, frame = "nusar-2021_action_both", "HMC_21176875", 10
    fname = f"{seq}/{cam}/{frame:06d}.jpg"
    _write_jpg(os.path.join(root, "assembly/images", fname), _img(70))
    K = np.asarray([[150.0, 0, IMG_W / 2], [0, 150.0, IMG_H / 2], [0, 0, 1]])
    Rt = np.hstack([np.eye(3), np.zeros((3, 1))])
    rng = np.random.RandomState(9)
    jw = (rng.rand(42, 3) * 100 + [[0, 0, 400]])  # mm, in front of camera
    jv = np.ones(42)
    jv[0] = 0.0
    data = {
        "images": [{"id": 1, "seq_name": seq, "camera": cam,
                    "frame_idx": frame, "file_name": fname,
                    "width": IMG_W, "height": IMG_H}],
        "annotations": [{"id": 11, "image_id": 1,
                         "joint_valid": jv.tolist(),
                         "bbox": {"right": [5, 5, 60, 50],
                                  "left": None}}],
    }
    json.dump(data, open(os.path.join(
        ann_dir, "assemblyhands_val_ego_data_v1-1.json"), "w"))
    json.dump({"calibration": {seq: {
        "intrinsics": {cam + "_mono10bit": K.tolist()},
        "extrinsics": {f"{frame:06d}": {cam + "_mono10bit": Rt.tolist()}},
    }}}, open(os.path.join(
        ann_dir, "assemblyhands_val_ego_calib_v1-1.json"), "w"))
    json.dump({"annotations": {seq: {f"{frame:06d}": {
        "world_coord": jw.tolist()}}}}, open(os.path.join(
            ann_dir, "assemblyhands_val_joint_3d_v1-1.json"), "w"))

    cfg = default_config("handoccnet_light")
    ds = D.AssemblyDataset(cfg, "val")
    rec = ds[0]
    # identity extrinsics: cam coords == world coords, mm -> m, reindexed
    np.testing.assert_allclose(
        rec.j3d_r, jw[D.AssemblyDataset.JOINT_TYPE_R] / 1000.0, rtol=1e-5)
    np.testing.assert_allclose(
        rec.j3d_l, jw[D.AssemblyDataset.JOINT_TYPE_L] / 1000.0, rtol=1e-5)
    # assembly joint 0 (invalid) lands at MANO index 16 of the right hand
    assert rec.joints_valid_r[16] == 0.0
    assert rec.right_valid == 1.0 and rec.left_valid == 0.0
    assert rec.use_gt_k == 1.0
    assert (rec.beta_r == D.MEAN_BETA_R).all()

    inputs, targets, meta = _one_batch(ds, cfg)
    K_dev = np.asarray(meta["intrinsics"])[0]
    # centred max-side box, sc=1 (ego): k = res / max(W, H)
    np.testing.assert_allclose(K_dev[0, 0],
                               K[0, 0] * cfg.img_res / IMG_W, rtol=1e-5)


# ---------------------------------------------------- mini split of the pkls
def test_downsample_applies_to_real_layouts(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    _build_epic_tree(str(tmp_path))
    cfg = default_config("hands_light")
    full = D.EPICDataset(cfg, "val")
    mini = D.EPICDataset(cfg, "minival")
    assert len(mini) == min(80, len(full)) == 3


def test_arctic_exo_view_intrinsics_and_speedup(tmp_path, monkeypatch):
    """Exo views (view_idx >= 1): K from misc intris_mat[view-1], no egocam
    overrides, NaN dist, and the static-cam speedup remap
    (transform_kp2d_to_crop: labels into the fixed 1000px crop frame)."""
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    K_ego, full_w, full_h = _build_arctic_tree(str(tmp_path))
    base = os.path.join(str(tmp_path), "arctic/data/arctic_data/data")
    # extend the split with an exo-view imgname (view 2) + its crop image
    p = os.path.join(base, "splits/p2a_val.npy")
    data = np.load(p, allow_pickle=True).item()
    exo_name = "./arctic_data/data/images/s01/box_grab_01/2/00010.jpg"
    data["imgnames"] = [exo_name]
    np.save(p, data, allow_pickle=True)
    _write_jpg(os.path.join(
        base, "cropped_images/s01/box_grab_01/2/00010.jpg"),
        _img(3, 1000, 1000))

    from hands_tpu.data import dataset_utils as du

    cfg = default_config("hands_light", use_render_seg_loss=False,
                         use_grasp_loss=False)
    ds = D.HandsLightDataset(cfg, "val")
    rec = ds[0]
    assert rec.is_egocam == 0.0
    assert rec.use_gt_k is None  # exo follows cfg.use_gt_k
    assert np.isnan(rec.dist).all()  # dist is egocam-only
    # K selected from intris_mat[view-1] (not K_ego, not scaled)
    np.testing.assert_allclose(rec.K, K_ego, rtol=1e-6)
    # static-cam speedup: bbox pinned to the 1000px crop frame
    np.testing.assert_allclose(rec.bbox, [500.0, 500.0, 1000.0 / 300.0])
    # and the 2D labels remapped by transform_kp2d_to_crop of the raw kps
    raw = np.asarray(
        data["data_dict"]["s01/box_grab_01"]["2d"]["joints.right"][0, 2])
    expect = du.transform_kp2d_to_crop(
        du.pad_jts2d(raw),
        np.asarray([full_w / 2, full_h / 2, max(full_w, full_h) / 200.0]))
    np.testing.assert_allclose(rec.j2d_r[:, :2], expect[:, :2], rtol=1e-5)


def test_egoexo_eval_epoch_uses_masked_procrustes(tmp_path, monkeypatch):
    """Full eval epoch over the real-layout EgoExo fixture: loader ->
    eval_step -> per-image aggregation, with the per-joint 3D validity
    driving the masked weighted-Procrustes path (eval_modules.py:231-317).
    The invalid joint must not corrupt the finite metrics."""
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    import pickle

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "ego4d_hands"), exist_ok=True)
    full_w, full_h = 512, 384
    K_full = np.asarray([[400.0, 0, full_w / 2], [0, 400.0, full_h / 2],
                         [0, 0, 1]])
    joints = list(D.EgoExoDataset.INDEX2JOINTS.values())
    rng = np.random.RandomState(11)
    ann = {}
    for fi in range(3):
        j3d, j2d = {}, {}
        for side in ("right", "left"):
            for name in joints:
                if side == "right" and name == "middle_2":
                    continue  # one missing joint -> per-joint mask
                p = rng.rand(3) * 0.1 + [0, 0, 0.5]
                j3d[f"{side}_{name}"] = {"x": p[0], "y": p[1], "z": p[2]}
                q = K_full @ p
                j2d[f"{side}_{name}"] = {"x": q[0] / q[2], "y": q[1] / q[2]}
        ann[f"frame_{fi}"] = {
            "img": _img(80 + fi), "crop_size": (IMG_H, IMG_W),
            "image_size": (full_w, full_h), "intrx": K_full,
            "j3d": j3d, "j2d": j2d,
        }
    with open(os.path.join(
            root, "ego4d_hands/joint_annotations_egoexo_val.pkl"), "wb") as f:
        pickle.dump(ann, f)

    from hands_tpu.models.registry import fetch_model
    from hands_tpu.train.state import create_train_state
    from hands_tpu.train.trainer import Trainer
    from hands_tpu.utils.experiment import Experiment

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        use_glb_feat=False, use_grasp_loss=False, use_render_seg_loss=False,
        val_dataset="egoexo", valsplit="minival", test_batch_size=2,
        num_workers=0, exp_key="egoexo_eval_test", mute=True, no_vis=True,
        logger="none",
    )
    from hands_tpu.data.factory import fetch_dataloader

    loader = fetch_dataloader(cfg, "val")
    model = fetch_model(cfg)
    inputs, _, meta = next(iter(loader))
    from hands_tpu.core.xdict import device_view

    variables = model.init(jax.random.PRNGKey(0), inputs, device_view(meta))
    state = create_train_state(cfg, variables)
    trainer = Trainer(cfg, model, Experiment(cfg))
    metrics = trainer.validate(state, loader)
    pa_keys = [k for k in metrics if "mpjpe/pa" in k or "mpjpe.pa" in k]
    assert pa_keys, metrics.keys()
    for k in pa_keys:
        assert np.isfinite(metrics[k]), (k, metrics[k])

