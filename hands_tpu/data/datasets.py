"""Dataset registry: the ten dataset families of the reference, emitting
:class:`~hands_tpu.data.records.Record`s for the device pipeline.

Each class mirrors the label-parsing semantics of its reference counterpart
(``/root/reference/src/datasets/*.py``) — file layouts, supervision-flag
sets, joint conventions — while deferring all geometry to the on-device
preprocessor. Real label files are read from ``$DATA_DIR`` using the same
relative paths as the reference; constructing a dataset whose files are
absent raises ``DataNotFoundError`` with the expected path.

Supervision-flag routing (SURVEY §2.2):

| dataset      | j2d | j3d | pose | beta | cam | grasp | mask | depth |
|--------------|-----|-----|------|------|-----|-------|------|-------|
| hands/arctic |  1  |  1  |  1   |  1   |  1  |   0   |  0   |   0   |
| h2o          |  1  |  1  |  1   |  1   |  1  |   0   |  0   |   0   |
| assembly     |  1  |  1  |  0   |  0   |  0  |   0   |  0   |   0   |
| epic (eval)  |  1  |  0  |  0   |  0   |  0  |   0   |  0   |   0   |
| egoexo       |  1  |  1  |  0   |  0   |  0  |   0   |  0   |   0   |
| *_grasp      |  0  |  0  |  0   |  0   |  0  |   1   |  0   |   0   |
| *_seg        |  0  |  0  |  0   |  0   |  0  |   0   |  1   |   0   |
| epic_depth   |  0  |  0  |  0   |  0   |  0  |   0   |  0   |   1   |
"""

from __future__ import annotations

import json
import os
import pickle
from typing import List

import numpy as np

from hands_tpu.config import Config
from hands_tpu.data import dataset_utils as du
from hands_tpu.data.records import Record, default_flags


class DataNotFoundError(FileNotFoundError):
    pass


def _data_dir() -> str:
    return os.environ.get("DATA_DIR", "./data")


def _require(path: str, what: str) -> str:
    if not os.path.exists(path):
        raise DataNotFoundError(
            f"{what} not found at '{path}' — set $DATA_DIR to a tree with the "
            f"reference layout (see hands_tpu/data/datasets.py docstrings)"
        )
    return path


def _read_image(path: str, dummy_shape=(600, 840, 3)):
    """Robust image read: zero image + False on failure
    (reference ``read_img``, data_utils.py:332 — corrupt files must not kill
    multi-day runs). Uses the native libjpeg/libpng decoder
    (``native/hands_host.cpp``) when built; cv2 otherwise.
    """
    try:
        from hands_tpu.utils import native

        if native.available():
            img = native.read_image(path)
            if img is not None:
                return img, True
            raise IOError(path)
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise IOError(path)
        return img[:, :, ::-1].copy(), True  # BGR -> RGB
    except Exception:
        return np.zeros(dummy_shape, np.uint8), False


class RecordDataset:
    """Base: a list of per-sample dicts -> Record on demand."""

    name = "base"

    def __init__(self, cfg: Config, split: str):
        self.cfg = cfg
        self.split = split
        self.samples = du.downsample(self._load_samples(), split)

    def _load_samples(self) -> List[dict]:
        raise NotImplementedError

    def _to_record(self, sample: dict) -> Record:
        raise NotImplementedError

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Record:
        return self._to_record(self.samples[idx])


# ------------------------------------------------------------------- ARCTIC
class HandsLightDataset(RecordDataset):
    """ARCTIC egocentric with full MANO GT
    (reference ``hands_light_dataset.py``: split npy
    ``arctic/data/arctic_data/data/splits/{setup}_{split}.npy``, intrinsics
    from ``meta/misc.json``, speedup cropped-image path)."""

    name = "hands"
    _FLAGS = default_flags(j2d=1, j3d=1, pose=1, beta=1, cam=1)

    def _load_samples(self) -> List[dict]:
        base = os.path.join(_data_dir(), "arctic/data/arctic_data/data")
        split_p = _require(
            os.path.join(base, f"splits/{self.cfg.setup}_{self.split}.npy"),
            "ARCTIC split file",
        )
        data = np.load(split_p, allow_pickle=True).item()
        misc = json.load(open(os.path.join(base, "meta/misc.json")))
        samples = []
        imgnames = data["imgnames"] if isinstance(data, dict) else data
        for i, imgname in enumerate(imgnames):
            samples.append({"imgname": imgname, "idx": i, "data": data,
                            "misc": misc, "base": base})
        return samples

    def _to_record(self, s: dict) -> Record:
        data = s["data"]
        i = s["idx"]
        sid = s["imgname"].split("/")[-4] if "/" in s["imgname"] else "s01"
        K = np.asarray(
            s["misc"][sid]["intris_mat"][0]
            if sid in s["misc"] else np.eye(3), np.float32,
        )
        img, ok = _read_image(os.path.join(s["base"], "images", s["imgname"]))
        d2, d3 = data.get("2d", {}), data.get("cam_coord", {})
        rec = Record(
            imgname=s["imgname"],
            image=img,
            K=K,
            j2d_r=du.pad_jts2d(np.asarray(d2["joints.right"][i], np.float32))
            if "joints.right" in d2 else None,
            j2d_l=du.pad_jts2d(np.asarray(d2["joints.left"][i], np.float32))
            if "joints.left" in d2 else None,
            j3d_r=np.asarray(d3["joints.right"][i], np.float32)
            if "joints.right" in d3 else None,
            j3d_l=np.asarray(d3["joints.left"][i], np.float32)
            if "joints.left" in d3 else None,
            pose_r=np.asarray(data["params"]["pose_r"][i], np.float32)
            if "params" in data else None,
            pose_l=np.asarray(data["params"]["pose_l"][i], np.float32)
            if "params" in data else None,
            beta_r=np.asarray(data["params"]["shape_r"][i], np.float32)
            if "params" in data else None,
            beta_l=np.asarray(data["params"]["shape_l"][i], np.float32)
            if "params" in data else None,
            is_valid=float(ok),
            loss_flags=dict(self._FLAGS),
            dataset=self.name,
        )
        return rec


class ArcticDataset(HandsLightDataset):
    name = "arctic"


class SampleDataset(RecordDataset):
    """Documented data-format template (reference ``sample_dataset.py`` +
    ``scripts_method/sample_data.py``): loads ``sample_data/samples.pkl`` —
    a pickled list of dicts with the Record fields. Use this as the I/O spec
    when adding a new dataset."""

    name = "sample"
    _FLAGS = default_flags(j2d=1, j3d=1, pose=1, beta=1, cam=1)

    def _load_samples(self) -> List[dict]:
        p = _require(
            os.path.join(_data_dir(), "sample_data/samples.pkl"),
            "sample dataset pickle",
        )
        with open(p, "rb") as f:
            return pickle.load(f)

    def _to_record(self, s: dict) -> Record:
        img, ok = _read_image(os.path.join(_data_dir(), "sample_data",
                                           s["imgname"]))
        return Record(
            imgname=s["imgname"], image=img, K=np.asarray(s["K"], np.float32),
            j2d_r=s.get("j2d_r"), j2d_l=s.get("j2d_l"),
            j3d_r=s.get("j3d_r"), j3d_l=s.get("j3d_l"),
            pose_r=s.get("pose_r"), pose_l=s.get("pose_l"),
            beta_r=s.get("beta_r"), beta_l=s.get("beta_l"),
            is_valid=float(ok), loss_flags=dict(self._FLAGS), dataset=self.name,
        )


# ----------------------------------------------------------------- Assembly
class AssemblyDataset(RecordDataset):
    """AssemblyHands with COCO-format annotations, v1-1
    (reference ``assembly_dataset.py:178-196``): 2D/3D joints only —
    j2d=j3d=1, no MANO params (beta=pose=cam=0)."""

    name = "assembly"
    ANNOT_VERSION = "v1-1"
    _FLAGS = default_flags(j2d=1, j3d=1)

    def _load_samples(self) -> List[dict]:
        base = os.path.join(_data_dir(), "assemblyhands")
        ann_dir = _require(
            os.path.join(base, f"annotations/{self.split}"),
            "AssemblyHands annotations",
        )
        samples = []
        data_f = os.path.join(
            ann_dir,
            f"assemblyhands_{self.split}_ego_data_{self.ANNOT_VERSION}.json")
        calib_f = os.path.join(
            ann_dir,
            f"assemblyhands_{self.split}_ego_calib_{self.ANNOT_VERSION}.json")
        joint_f = os.path.join(
            ann_dir,
            f"assemblyhands_{self.split}_joint_3d_{self.ANNOT_VERSION}.json")
        data = json.load(open(_require(data_f, "assembly data json")))
        calib = json.load(open(calib_f))
        joints = json.load(open(joint_f))
        for img_id, info in data["images"].items():
            samples.append({"info": info, "calib": calib, "joints": joints,
                            "base": base})
        return samples

    def _to_record(self, s: dict) -> Record:
        info = s["info"]
        seq, cam = info["seq_name"], info["camera"]
        fname = info["file_name"]
        calib = s["calib"]["calibration"][seq]["intrinsics"][cam]
        K = np.asarray(calib, np.float32)[:3, :3]
        world2cam = np.asarray(
            s["calib"]["calibration"][seq]["extrinsics"][info["frame_idx"]][cam],
            np.float32,
        )
        jw = np.asarray(
            s["joints"]["annotations"][seq]["joints_3d"][info["frame_idx"]],
            np.float32,
        ).reshape(42, 3) / 1000.0  # mm -> m
        R, t = world2cam[:3, :3], world2cam[:3, 3:]
        jc = (jw @ R.T + t.T / 1000.0)
        j2 = jc @ K.T
        j2 = j2[:, :2] / np.maximum(j2[:, 2:], 1e-9)
        img, ok = _read_image(os.path.join(s["base"], "images", fname))
        return Record(
            imgname=fname, image=img, K=K,
            j2d_r=du.pad_jts2d(j2[:21].astype(np.float32)),
            j2d_l=du.pad_jts2d(j2[21:].astype(np.float32)),
            j3d_r=jc[:21].astype(np.float32),
            j3d_l=jc[21:].astype(np.float32),
            is_valid=float(ok), loss_flags=dict(self._FLAGS), dataset=self.name,
        )


# --------------------------------------------------------------------- EPIC
# Assembly-order -> MANO-order joint reindex (epic_dataset.py:57,88-91)
_ASSEMBLY_TO_MANO = np.asarray(
    [0, 5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15, 1, 2, 3, 4, 8, 12, 20, 16]
)


class EPICDataset(RecordDataset):
    """EPIC-HandKps evaluation set (reference ``epic_dataset.py``):
    ``hands_5000.pkl`` (eval) / ``hands_250.pkl`` (val); only 2D supervision;
    dummy MANO params with mean betas; sample valid iff >=3 joints visible."""

    name = "epic"
    _FLAGS = default_flags(j2d=1)

    def _pkl_name(self):
        return "hands_250.pkl" if "val" in self.split else "hands_5000.pkl"

    def _load_samples(self) -> List[dict]:
        p = _require(
            os.path.join(_data_dir(), "epic_handkps", self._pkl_name()),
            "EPIC-HandKps pickle",
        )
        with open(p, "rb") as f:
            data = pickle.load(f)
        return [{"key": k, "ann": v} for k, v in data.items()]

    def _to_record(self, s: dict) -> Record:
        ann = s["ann"]
        img, ok = _read_image(
            os.path.join(_data_dir(), "epic_handkps/images", s["key"]))
        H, W = img.shape[:2]

        def hand(side):
            kp = ann.get(side)
            if kp is None:
                return None, np.zeros(21, np.float32), 0.0
            kp = np.asarray(kp, np.float32).reshape(21, 2)
            kp = kp[_ASSEMBLY_TO_MANO]
            vis, valid = du.get_valid(kp, W, H)
            return du.pad_jts2d(kp), vis, valid

        j2d_r, vis_r, val_r = hand("right")
        j2d_l, vis_l, val_l = hand("left")
        return Record(
            imgname=s["key"], image=img,
            K=np.asarray([[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]],
                         np.float32),
            j2d_r=j2d_r, j2d_l=j2d_l,
            right_valid=val_r, left_valid=val_l,
            joints_valid_r=vis_r * val_r, joints_valid_l=vis_l * val_l,
            is_valid=float(ok) * float(max(val_r, val_l)),
            loss_flags=dict(self._FLAGS), dataset=self.name,
        )


class EPICGraspDataset(RecordDataset):
    """VISOR grasp-taxonomy crops (reference ``epic_grasp_dataset.py``):
    ``grasp_visor_train.pkl``; 8 grasp classes + 'no grasp'=8; grasp loss
    only."""

    name = "epic_grasp"
    _FLAGS = default_flags(grasp=1)
    GRASP_LABELS = {
        "power": 0, "precision": 1, "lateral": 2, "palmar": 3, "tripod": 4,
        "hook": 5, "spherical": 6, "other": 7, "no grasp": 8,
    }

    def _pkl_path(self):
        return os.path.join(_data_dir(), "epic_grasp/grasp_visor_train.pkl")

    def _load_samples(self) -> List[dict]:
        p = _require(self._pkl_path(), f"{self.name} pickle")
        with open(p, "rb") as f:
            data = pickle.load(f)
        return [{"key": k, "ann": v} for k, v in data.items()]

    def _to_record(self, s: dict) -> Record:
        ann = s["ann"]
        img, ok = _read_image(
            os.path.join(_data_dir(), "epic_grasp/images", s["key"]))

        def label(side):
            g = ann.get(side)
            if g is None:
                return 8, 0.0
            if isinstance(g, str):
                return self.GRASP_LABELS.get(g, 7), 1.0
            return int(g), 1.0

        g_r, gv_r = label("right")
        g_l, gv_l = label("left")
        H, W = img.shape[:2]
        return Record(
            imgname=s["key"], image=img,
            K=np.asarray([[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]],
                         np.float32),
            grasp_r=g_r, grasp_l=g_l, grasp_valid_r=gv_r, grasp_valid_l=gv_l,
            right_valid=gv_r, left_valid=gv_l, is_valid=float(ok),
            loss_flags=dict(self._FLAGS), dataset=self.name,
        )


class Ego4DGraspDataset(EPICGraspDataset):
    """Ego4D grasp labels (reference ``ego_grasp_dataset.py``:
    ``ego4d_hands/grasp_ego.pkl``)."""

    name = "ego_grasp"

    def _pkl_path(self):
        return os.path.join(_data_dir(), "ego4d_hands/grasp_ego.pkl")


class EPICSegDataset(RecordDataset):
    """VISOR hand masks (reference ``epic_seg_dataset.py``): npz masks with
    R=255 / L=127 coding; mask loss only."""

    name = "epic_seg"
    _FLAGS = default_flags(mask=1)
    _subdir = "epic_seg"

    def _load_samples(self) -> List[dict]:
        d = _require(os.path.join(_data_dir(), self._subdir, "masks"),
                     f"{self.name} masks dir")
        return [{"mask_file": f} for f in sorted(os.listdir(d))]

    def _to_record(self, s: dict) -> Record:
        mask_p = os.path.join(_data_dir(), self._subdir, "masks", s["mask_file"])
        m = np.load(mask_p)
        mask = m[m.files[0]] if hasattr(m, "files") else m
        img_name = os.path.splitext(s["mask_file"])[0] + ".jpg"
        img, ok = _read_image(
            os.path.join(_data_dir(), self._subdir, "images", img_name))
        has_r = float((np.abs(mask.astype(np.int32) - 255) < 32).any())
        has_l = float((np.abs(mask.astype(np.int32) - 127) < 32).any())
        H, W = img.shape[:2]
        return Record(
            imgname=img_name, image=img,
            K=np.asarray([[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]],
                         np.float32),
            mask=mask.astype(np.float32),
            mask_valid_r=has_r, mask_valid_l=has_l,
            right_valid=has_r, left_valid=has_l, is_valid=float(ok),
            loss_flags=dict(self._FLAGS), dataset=self.name,
        )


class Ego4DSegDataset(EPICSegDataset):
    name = "ego_seg"
    _subdir = "ego4d_seg"


class EPICDepthDataset(RecordDataset):
    """ZoeDepth pseudo-GT (reference ``epic_depth_dataset.py``): 16-bit pngs,
    mm -> m; depth loss only."""

    name = "epic_depth"
    _FLAGS = default_flags(depth=1)

    def _load_samples(self) -> List[dict]:
        d = _require(os.path.join(_data_dir(), "epic_depth/depth"),
                     "epic_depth depth dir")
        return [{"depth_file": f} for f in sorted(os.listdir(d))]

    def _to_record(self, s: dict) -> Record:
        import cv2

        dp = os.path.join(_data_dir(), "epic_depth/depth", s["depth_file"])
        depth = cv2.imread(dp, cv2.IMREAD_ANYDEPTH)
        depth = (depth.astype(np.float32) / 1000.0) if depth is not None else None
        img_name = os.path.splitext(s["depth_file"])[0] + ".jpg"
        img, ok = _read_image(
            os.path.join(_data_dir(), "epic_depth/images", img_name))
        H, W = img.shape[:2]
        return Record(
            imgname=img_name, image=img,
            K=np.asarray([[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]],
                         np.float32),
            depth=depth, is_valid=float(ok and depth is not None),
            loss_flags=dict(self._FLAGS), dataset=self.name,
        )


# ---------------------------------------------------------------------- H2O
class H2ODataset(RecordDataset):
    """H2O with full MANO GT (reference ``h2o_dataset.py``): all five core
    supervision flags on."""

    name = "h2o"
    _FLAGS = default_flags(j2d=1, j3d=1, pose=1, beta=1, cam=1)

    def _load_samples(self) -> List[dict]:
        base = _require(os.path.join(_data_dir(), "h2o"), "H2O root")
        split_f = _require(
            os.path.join(base, f"label_split/pose_{self.split}.txt"),
            "H2O split file",
        )
        with open(split_f) as f:
            return [{"path": line.strip(), "base": base} for line in f if
                    line.strip()]

    def _to_record(self, s: dict) -> Record:
        base, rel = s["base"], s["path"]
        img, ok = _read_image(os.path.join(base, rel))
        stem = rel.replace("/rgb/", "/{}/").replace(".png", ".txt")
        try:
            K_vals = np.loadtxt(
                os.path.join(base, os.path.dirname(os.path.dirname(rel)),
                             "cam_intrinsics.txt"))
            K = np.asarray(
                [[K_vals[0], 0, K_vals[2]], [0, K_vals[1], K_vals[3]],
                 [0, 0, 1]], np.float32)
            hp = np.loadtxt(os.path.join(base, stem.format("hand_pose")))
        except Exception:
            raise DataNotFoundError(f"H2O labels for {rel}")
        # H2O hand_pose rows: [valid, 21x3 joints] per hand
        l_valid, l_jts = hp[0], hp[1:64].reshape(21, 3)
        r_valid, r_jts = hp[64], hp[65:128].reshape(21, 3)

        def proj(j):
            p = j @ K.T
            return du.pad_jts2d((p[:, :2] / np.maximum(p[:, 2:], 1e-9))
                                .astype(np.float32))

        return Record(
            imgname=rel, image=img, K=K,
            j2d_r=proj(r_jts), j2d_l=proj(l_jts),
            j3d_r=r_jts.astype(np.float32), j3d_l=l_jts.astype(np.float32),
            right_valid=float(r_valid), left_valid=float(l_valid),
            is_valid=float(ok), loss_flags=dict(self._FLAGS), dataset=self.name,
        )


# ------------------------------------------------------------------- EgoExo
class EgoExoDataset(RecordDataset):
    """Ego-Exo4D hand annotations (reference ``ego_exo_dataset.py``:
    ``joint_annotations_egoexo_val.pkl``); j2d=j3d=1 with **per-joint** 3D
    validity (drives the per-joint PA-MPJPE eval path)."""

    name = "egoexo"
    _FLAGS = default_flags(j2d=1, j3d=1)

    def _load_samples(self) -> List[dict]:
        p = _require(
            os.path.join(_data_dir(),
                         "egoexo/joint_annotations_egoexo_val.pkl"),
            "EgoExo annotations",
        )
        with open(p, "rb") as f:
            data = pickle.load(f)
        return [{"key": k, "ann": v} for k, v in data.items()]

    def _to_record(self, s: dict) -> Record:
        ann = s["ann"]
        img, ok = _read_image(
            os.path.join(_data_dir(), "egoexo/images", s["key"]))
        H, W = img.shape[:2]
        K = np.asarray(ann.get("K", [[1000, 0, W / 2], [0, 1000, H / 2],
                                     [0, 0, 1]]), np.float32)

        def hand(side):
            j3 = ann.get(f"j3d_{side}")
            if j3 is None:
                return None, None, np.zeros(21, np.float32), 0.0
            j3 = np.asarray(j3, np.float32).reshape(21, 3)
            jv = np.isfinite(j3).all(axis=1).astype(np.float32)
            j3 = np.nan_to_num(j3)
            p = j3 @ K.T
            j2 = du.pad_jts2d(
                (p[:, :2] / np.maximum(p[:, 2:], 1e-9)).astype(np.float32))
            return j2, j3, jv, float(jv.sum() >= 3)

        j2r, j3r, jvr, vr = hand("right")
        j2l, j3l, jvl, vl = hand("left")
        return Record(
            imgname=s["key"], image=img, K=K,
            j2d_r=j2r, j2d_l=j2l, j3d_r=j3r, j3d_l=j3l,
            joints_valid_r=jvr, joints_valid_l=jvl,
            joints3d_valid_r=jvr, joints3d_valid_l=jvl,
            right_valid=vr, left_valid=vl, is_valid=float(ok),
            loss_flags=dict(self._FLAGS), dataset=self.name,
        )


# -------------------------------------------------------------- synthetic
class SyntheticRecordDataset(RecordDataset):
    """Schema-complete synthetic records with consistent MANO geometry — the
    no-download stand-in for tests / debug runs (--debug), mirroring the
    mini-split mechanism (SURVEY §4)."""

    name = "synthetic"
    _FLAGS = default_flags(j2d=1, j3d=1, pose=1, beta=1, cam=1, grasp=1,
                           mask=1)

    _SPLIT_LEN = {"minitrain": 12, "tinytrain": 4, "smalltrain": 32,
                  "minival": 6, "tinyval": 4, "smallval": 16}

    def __init__(self, cfg: Config, split: str = "train", length: int = None,
                 img_hw=(320, 427)):
        self.length = length or self._SPLIT_LEN.get(split, 64)
        self.img_hw = img_hw
        super().__init__(cfg, split)

    def _load_samples(self) -> List[dict]:
        # batch-generate all labels with ONE MANO forward per hand — per-
        # record device dispatches through the remote tunnel cost ~1 s each
        from hands_tpu.ops import mano as manolib
        import jax.numpy as jnp

        n = self.length
        rngs = [np.random.RandomState(1000 + i) for i in range(n)]
        H, W = self.img_hw
        K = np.asarray(
            [[800.0, 0, W / 2], [0, 800.0, H / 2], [0, 0, 1]], np.float32)

        self._labels = {}
        for side, is_r, x_off in (("r", True, 0.06), ("l", False, -0.06)):
            pose = np.stack([
                (r.randn(48) * 0.2).astype(np.float32) for r in rngs])
            beta = np.stack([
                (r.randn(10) * 0.3).astype(np.float32) for r in rngs])
            out = manolib.mano_forward(
                manolib.load_mano(is_r), jnp.asarray(beta),
                jnp.asarray(pose[:, 3:]), jnp.asarray(pose[:, :3]))
            j = np.asarray(out.joints)
            cam_t = np.asarray([x_off, 0.0, 0.55], np.float32)
            j3d = (j + cam_t).astype(np.float32)
            p = j3d @ K.T
            j2d = p[..., :2] / np.maximum(p[..., 2:], 1e-9)
            self._labels[side] = dict(pose=pose, beta=beta, j3d=j3d,
                                      j2d=j2d.astype(np.float32))
        self._K = K
        return [{"idx": i} for i in range(n)]

    def _to_record(self, s: dict) -> Record:
        i = s["idx"]
        rng = np.random.RandomState(1000 + i)
        # consume the same draws as label generation for deterministic images
        rng.randn(48), rng.randn(10)
        H, W = self.img_hw
        K = self._K
        lr, ll = self._labels["r"], self._labels["l"]
        pose_r, beta_r, j3d_r = lr["pose"][i], lr["beta"][i], lr["j3d"][i]
        pose_l, beta_l, j3d_l = ll["pose"][i], ll["beta"][i], ll["j3d"][i]
        j2d_r = du.pad_jts2d(lr["j2d"][i])
        j2d_l = du.pad_jts2d(ll["j2d"][i])

        img = (rng.rand(H, W, 3) * 60).astype(np.uint8)
        for j2 in (j2d_r, j2d_l):
            for x, y, _ in j2[::4]:
                xi, yi = int(x), int(y)
                if 1 <= xi < W - 1 and 1 <= yi < H - 1:
                    img[yi - 1:yi + 2, xi - 1:xi + 2] = 255

        return Record(
            imgname=f"synthetic/{i:06d}.jpg", image=img, K=K,
            j2d_r=j2d_r, j2d_l=j2d_l, j3d_r=j3d_r, j3d_l=j3d_l,
            pose_r=pose_r, pose_l=pose_l, beta_r=beta_r, beta_l=beta_l,
            grasp_r=int(rng.randint(0, 9)), grasp_l=int(rng.randint(0, 9)),
            grasp_valid_r=1.0, grasp_valid_l=1.0,
            loss_flags=dict(self._FLAGS), dataset=self.name,
        )


# -------------------------------------------------------------------- concat
class ConcatDataset:
    """'a+b+c' mixed-dataset training (reference ``factory.py:37-73``)."""

    def __init__(self, datasets):
        self.datasets = datasets
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx):
        d = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[d][idx - int(self._offsets[d])]


DATASET_REGISTRY = {
    "hands": HandsLightDataset,
    "arctic": ArcticDataset,
    "sample": SampleDataset,
    "assembly": AssemblyDataset,
    "epic": EPICDataset,
    "epic_grasp": EPICGraspDataset,
    "epic_seg": EPICSegDataset,
    "epic_depth": EPICDepthDataset,
    "ego_grasp": Ego4DGraspDataset,
    "ego_seg": Ego4DSegDataset,
    "h2o": H2ODataset,
    "egoexo": EgoExoDataset,
    "synthetic": SyntheticRecordDataset,
}


def fetch_dataset(cfg: Config, names: str, split: str):
    """Resolve 'a+b+c' into a (Concat)Dataset (reference
    ``fetch_dataset_devel``, factory.py:19)."""
    parts = names.split("+")
    built = [DATASET_REGISTRY[p](cfg, split) for p in parts]
    if len(built) == 1:
        return built[0]
    return ConcatDataset(built)
