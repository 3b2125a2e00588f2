"""Object tensors, kNN, interaction/sequence metrics, tree utils, decimator."""

import jax
import jax.numpy as jnp
import numpy as np

from hands_tpu.core import tree_utils as tu
from hands_tpu.core.object_tensors import (
    OBJECTS, build_object_tensors, object_forward_7d, object_names_to_idx,
)
from hands_tpu.core.xdict import XDict
from hands_tpu.ops import knn as knnlib
from hands_tpu.ops import mano as manolib
from hands_tpu.train import metrics_object as mo


# ---------------------------------------------------------------------- knn
def test_knn_exact(rng):
    q = jnp.asarray(rng.randn(2, 10, 3), jnp.float32)
    p = jnp.asarray(rng.randn(2, 50, 3), jnp.float32)
    d, i = knnlib.knn(q, p, k=1)
    # brute force in numpy
    d_np = np.linalg.norm(
        np.asarray(q)[:, :, None] - np.asarray(p)[:, None], axis=-1)
    np.testing.assert_allclose(np.asarray(d[:, :, 0]), d_np.min(-1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i[:, :, 0]), d_np.argmin(-1))


def test_knn_respects_lengths(rng):
    q = jnp.zeros((1, 1, 3))
    p = jnp.asarray([[[5.0, 0, 0], [1.0, 0, 0], [0.1, 0, 0]]])
    # with length 2, the closest valid point is index 1 (not the padded 2)
    d, i = knnlib.knn(q, p, points_len=jnp.asarray([2]), k=1)
    assert int(i[0, 0, 0]) == 1
    np.testing.assert_allclose(float(d[0, 0, 0]), 1.0, atol=1e-5)


# ------------------------------------------------------------ object model
def test_object_forward_shapes():
    tensors = build_object_tensors()
    B = 3
    idx = jnp.asarray(object_names_to_idx(["box", "laptop", "phone"]))
    out = object_forward_7d(
        tensors,
        angles=jnp.zeros((B, 1)),
        global_orient=jnp.zeros((B, 3)),
        transl=jnp.zeros((B, 3)),
        obj_idx=idx,
    )
    assert out["v"].shape[0] == B and out["v"].shape[2] == 3
    assert out["kp3d"].shape == (B, 32, 3)
    assert out["bbox3d"].shape == (B, 16, 3)
    assert np.isfinite(np.asarray(out["v"])).all()


def test_object_articulation_moves_top_only():
    tensors = build_object_tensors()
    idx = jnp.asarray(object_names_to_idx(["box"]))
    base = object_forward_7d(
        tensors, jnp.zeros((1, 1)), jnp.zeros((1, 3)), None, idx)
    arti = object_forward_7d(
        tensors, jnp.full((1, 1), 0.7), jnp.zeros((1, 3)), None, idx)
    parts = np.asarray(base["parts_ids"])[0]
    mask = np.asarray(base["mask"])[0] > 0
    moved = np.linalg.norm(
        np.asarray(arti["v"])[0] - np.asarray(base["v"])[0], axis=1)
    top = (parts == 1) & mask
    bottom = (parts == 2) & mask
    assert moved[bottom].max() < 1e-4
    assert moved[top].mean() > 1e-2  # mm scale


def test_object_global_rotation_rigid():
    from hands_tpu.core import rot as rotlib

    tensors = build_object_tensors()
    idx = jnp.asarray(object_names_to_idx(["mixer"]))
    aa = jnp.asarray([[0.3, -0.1, 0.8]])
    base = object_forward_7d(tensors, jnp.zeros((1, 1)), jnp.zeros((1, 3)),
                             None, idx)
    rot = object_forward_7d(tensors, jnp.zeros((1, 1)), aa, None, idx)
    R = np.asarray(rotlib.axis_angle_to_matrix(aa))[0]
    expect = np.asarray(base["v"])[0] @ R.T
    np.testing.assert_allclose(np.asarray(rot["v"])[0], expect, atol=1e-2)


# ----------------------------------------------------------- object metrics
def test_eval_degree():
    pred = XDict({"object.radian": jnp.asarray([0.0, jnp.pi / 2])})
    tgt = XDict({"object.radian": jnp.asarray([0.0, 0.0]),
                 "is_valid": jnp.asarray([1.0, 1.0])})
    out = mo.eval_degree(pred, tgt, XDict())
    np.testing.assert_allclose(np.asarray(out["aae"]), [0.0, 90.0], atol=1e-4)


def test_success_rate():
    B, V = 2, 10
    v_gt = jnp.asarray(np.random.RandomState(0).randn(B, V, 3), jnp.float32)
    meta = XDict({
        "object.v.mask": jnp.ones((B, V)),
        "part_ids": jnp.full((B, V), 2),
        "diameter": jnp.full((B,), 1.0),
    })
    tgt = XDict({"object.v.cam": v_gt, "is_valid": jnp.ones(B)})
    pred = XDict({"object.v.cam": v_gt})  # perfect
    out = mo.eval_v2v_success(pred, tgt, meta)
    np.testing.assert_allclose(np.asarray(out["success_rate/0.05"]), 100.0)


def test_contact_deviation_zero_when_touching():
    B, Vh, Vo = 1, 5, 7
    vh = jnp.zeros((B, Vh, 3))
    vo = jnp.zeros((B, Vo, 3))
    dist = jnp.zeros((B, Vh))  # all in contact
    idx = jnp.zeros((B, Vh), jnp.int32)
    cd = mo.contact_deviation(vo, vh, dist, idx, jnp.ones(B), jnp.ones(B))
    np.testing.assert_allclose(np.asarray(cd), 0.0, atol=1e-7)


def test_accel_error_zero_for_identical():
    T = 10
    j = jnp.asarray(np.random.RandomState(0).randn(T, 21, 3), jnp.float32)
    err = mo.compute_error_accel(j, j)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-3)


def test_mdev_windows_and_value():
    T, V = 30, 778
    dist = np.full((T, V), 1.0, np.float32)
    dist[5:25, 3] = 0.0  # vertex 3 in contact frames 5..24
    dist_idx = np.zeros((T, V), np.int64)
    vo = np.zeros((10, 3), np.float32)
    w = mo.find_contact_windows(dist, dist_idx, vo, contact_thres=1e-3,
                                window_thres=11)
    assert w.shape == (1, 4)
    assert w[0][0] == 5 and w[0][1] == 24 and w[0][2] == 3

    # hand and object moving together -> mdev 0
    vh_seq = np.cumsum(np.ones((T, V, 3), np.float32) * 0.01, axis=0)
    vo_seq = np.cumsum(np.ones((T, 10, 3), np.float32) * 0.01, axis=0)
    assert mo.compute_mdev(vh_seq, vo_seq, w) < 1e-5
    # object static while hand moves -> nonzero
    assert mo.compute_mdev(vh_seq, np.zeros((T, 10, 3), np.float32), w) > 1.0


# ------------------------------------------------------------- tree utils
def test_tree_utils():
    ld = [{"a": 1, "b": 2}, {"a": 3, "b": 4}]
    dl = tu.ld2dl(ld)
    assert dl == {"a": [1, 3], "b": [2, 4]}
    assert tu.dl2ld(dl) == ld
    assert tu.unsort(["x", "y", "z"], [2, 0, 1]) == ["y", "z", "x"]
    # n = chunk COUNT (reference semantics): 5 items into 2 chunks of 3
    assert tu.chunks_by_len([1, 2, 3, 4, 5], 2) == [[1, 2, 3], [4, 5]]
    assert tu.chunks_by_size([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]
    comb = np.asarray(tu.all_comb(jnp.asarray([0, 1]), jnp.asarray([5, 6])))
    assert comb.shape == (4, 2)
    padded, lens = tu.pad_tensor_list(
        [np.ones((2, 3)), np.ones((4, 3))])
    assert padded.shape == (2, 4, 3)
    rag = tu.unpad_vtensor(padded, lens)
    assert rag[0].shape == (2, 3)
    nm = tu.nanmean(jnp.asarray([1.0, jnp.nan, 3.0]))
    np.testing.assert_allclose(float(nm), 2.0)


def test_decimator():
    model = manolib.load_mano(True)
    out = manolib.mano_forward(
        model, jnp.zeros((2, 10)), jnp.zeros((2, 45)), jnp.zeros((2, 3)))
    sub = manolib.decimate_verts(out.vertices, True)
    assert sub.shape == (2, 195, 3)
    # synthetic decimator = subset selection -> rows must be actual vertices
    v = np.asarray(out.vertices[0])
    s = np.asarray(sub[0])
    d = np.linalg.norm(s[:, None] - v[None], axis=-1).min(axis=1)
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_masked_procrustes_ignores_invalid_joints(rng):
    from hands_tpu.ops.procrustes import similarity_align_masked

    S1 = jnp.asarray(rng.randn(2, 21, 3), jnp.float32)
    # S2 = rigid transform of S1, but corrupt joints 18..20
    from hands_tpu.core import rot as rotlib

    R = rotlib.axis_angle_to_matrix(jnp.asarray(rng.randn(2, 3), jnp.float32))
    S2 = jnp.einsum("bij,bnj->bni", R, S1) + 0.3
    S2_bad = S2.at[:, 18:].set(100.0)
    valid = jnp.ones((2, 21)).at[:, 18:].set(0.0)
    S1_hat = similarity_align_masked(S1, S2_bad, valid)
    np.testing.assert_allclose(
        np.asarray(S1_hat[:, :18]), np.asarray(S2[:, :18]), atol=1e-3)


def test_prepare_templates_and_interfield():
    from hands_tpu.core.object_tensors import build_object_tensors
    from hands_tpu.train.process_object import (
        prepare_interfield, prepare_mano_template, prepare_object_template,
    )

    model = manolib.load_mano(True)
    ref, ref_full = prepare_mano_template(2, model, True)
    assert ref.shape == (2, 21 + 195, 3)
    assert ref_full.shape == (2, 21 + 778, 3)
    # root-normalised: wrist at origin
    np.testing.assert_allclose(np.asarray(ref[0, 0]), 0.0, atol=1e-5)

    tensors = build_object_tensors()
    v_sub, pidx, v_full, mask = prepare_object_template(
        2, tensors, jnp.asarray([0, 3]))
    assert v_sub.shape[0] == 2 and v_sub.shape[2] == 3
    np.testing.assert_allclose(np.asarray(v_sub.mean(axis=1)), 0.0, atol=1e-4)

    # interfield: hand touching object -> zero distances at contact verts
    B, Vo = 2, 50
    rng_ = np.random.RandomState(0)
    v_o = jnp.asarray(rng_.randn(B, Vo, 3).astype(np.float32))
    targets = XDict({
        "object.v.cam": v_o,
        "object.v_len": jnp.full((B,), Vo, jnp.int32),
        "mano.v3d.cam.r": v_o[:, :40][:, np.linspace(0, 39, 778).astype(int)],
        "mano.v3d.cam.l": jnp.asarray(rng_.randn(B, 778, 3), jnp.float32) + 5,
    })
    out = prepare_interfield(targets)
    # matmul-form |a-b|^2 has ~sqrt(eps)*scale cancellation error (~1e-3 at
    # unit scale) — far below the 3mm contact threshold the fields feed
    np.testing.assert_allclose(np.asarray(out["dist.ro"]), 0.0, atol=2e-3)
    assert float(out["dist.lo"].min()) >= 0.09  # clamped far distances
    assert out["idx.or"].shape == (B, Vo)
