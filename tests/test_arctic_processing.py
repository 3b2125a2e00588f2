"""ARCTIC offline GT build on synthetic raw sequences."""

import json
import os

import jax.numpy as jnp
import numpy as np

from hands_tpu.data import arctic_processing as ap


def _fake_seq(tmp_path, T=6):
    """Write a raw ARCTIC-layout sequence + meta to tmp_path."""
    rng = np.random.RandomState(0)
    raw = tmp_path / "raw_seqs" / "s01"
    seq = raw / "box_grab_01"
    os.makedirs(seq)
    mano = {
        side: {
            "rot": rng.randn(T, 3).astype(np.float32) * 0.2,
            "pose": rng.randn(T, 45).astype(np.float32) * 0.1,
            "trans": (rng.randn(T, 3) * 0.05 + [0, 0, 0.5]).astype(np.float32),
            "shape": rng.randn(10).astype(np.float32) * 0.3,
        }
        for side in ("right", "left")
    }
    np.save(seq / "mano.npy", mano)
    obj = np.concatenate(
        [rng.rand(T, 1) * 0.5, rng.randn(T, 3) * 0.2,
         rng.randn(T, 3) * 50 + [0, 0, 500]], axis=1).astype(np.float32)
    np.save(seq / "obj.npy", obj)

    meta_dir = tmp_path / "raw_seqs" / "meta"
    os.makedirs(meta_dir)
    V = 3
    w2c = np.tile(np.eye(4), (V, 1, 1))
    w2c[:, 2, 3] = 0.2
    K = np.tile(
        np.asarray([[1000.0, 0, 1400], [0, 1000.0, 1000], [0, 0, 1]]), (V, 1, 1))
    misc = {"s01": {
        "world2cam": w2c.tolist(),
        "intris_mat": K.tolist(),
        "dist8": np.zeros(8).tolist(),
        "image_size": [[2800, 2000]] * V,
    }}
    with open(meta_dir / "misc.json", "w") as f:
        json.dump(misc, f)
    return str(seq)


def _add_smplx(seq_dir, T=6):
    rng = np.random.RandomState(4)
    f = lambda n: rng.randn(T, n).astype(np.float32) * 0.1
    smplx = {
        "transl": f(3), "global_orient": f(3), "body_pose": f(63),
        "jaw_pose": f(3), "leye_pose": f(3), "reye_pose": f(3),
        "left_hand_pose": f(45), "right_hand_pose": f(45),
    }
    np.save(os.path.join(seq_dir, "smplx.npy"), smplx)


def test_process_seq_with_smplx_body(tmp_path):
    """With smplx.npy present the GT build runs the SMPL-X body FK too and
    the npy carries the full reference key set (processing.py:173-235:
    MANO + SMPL-X + object)."""
    seq_dir = _fake_seq(tmp_path)
    _add_smplx(seq_dir)
    out_p = ap.process_seq(seq_dir, str(tmp_path / "processed"))
    data = np.load(out_p, allow_pickle=True).item()
    T, V = 6, 3
    from hands_tpu.ops import smplx_body as sb
    assert data["2d"]["joints.smplx"].shape == (T, V, sb.NUM_JOINTS, 2)
    assert data["cam_coord"]["joints.smplx"].shape == (T, V, sb.NUM_JOINTS, 3)
    assert np.isfinite(data["2d"]["joints.smplx"]).all()
    # verts.smplx excluded from the 2d export unless export_verts
    assert "verts.smplx" not in data["2d"]


def test_process_seq_and_split(tmp_path):
    seq_dir = _fake_seq(tmp_path)
    out_p = ap.process_seq(seq_dir, str(tmp_path / "processed"))
    data = np.load(out_p, allow_pickle=True).item()
    T, V = 6, 3
    assert data["2d"]["joints.right"].shape == (T, V, 21, 2)
    assert data["bbox"].shape == (T, V, 3)
    assert data["joints_valid_r"].shape == (T, V, 21)
    # ego bbox is the fixed full-frame crop
    np.testing.assert_allclose(data["bbox"][:, 0],
                               [[1400.0, 1000.0, 14.0]] * T)
    # static-cam boxes respect the 600px floor
    assert (data["bbox"][:, 1:, 2] >= 3.0 - 1e-6).all()
    assert np.isfinite(data["2d"]["joints.right"]).all()

    split_p = ap.build_split(str(tmp_path / "processed"),
                             ["s01_box_grab_01"], "p2", "train",
                             str(tmp_path / "splits"))
    merged = np.load(split_p, allow_pickle=True).item()
    assert merged["2d"]["joints.left"].shape[0] == T


def test_world2cam_identity_roundtrip():
    T = 2
    pts = {"joints.right": jnp.asarray(np.random.RandomState(0).randn(T, 21, 3),
                                       jnp.float32)}
    w2c = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    views = ap.forward_world2cam(pts, w2c)
    np.testing.assert_allclose(np.asarray(views[0]["joints.right"]),
                               np.asarray(pts["joints.right"]), atol=1e-6)


def test_bbox_from_kp2d():
    kp = jnp.asarray([[[[0.0, 0.0], [100.0, 200.0]]]])  # (1, 1, 2, 2)
    bbox = np.asarray(ap.compute_bbox_from_kp2d(kp, obj_scale=0.0))[0, 0]
    np.testing.assert_allclose(bbox, [50.0, 100.0, 1.0])  # dim=200 -> scale 1
