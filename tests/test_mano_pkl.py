"""The real-asset MANO pkl branch (``ops/mano.py:_from_mano_pkl``), tested
against a field-faithful synthetic ``MANO_{RIGHT,LEFT}.pkl``.

The fixture reproduces how the MPI files actually pickle (reference loads
them via smplx+chumpy, common/body_models.py:90-92): v_template / shapedirs /
posedirs / hands_mean are chumpy ``Ch`` objects (attribute dict with the
numpy array under ``'x'``), ``J_regressor`` is a scipy-sparse csc matrix,
plus the full real field set (f/kintree_table/J/weights/hands_components/
hands_coeffs/bs_style/bs_type). The pickle is created with a throwaway stub
``chumpy`` module that is REMOVED before loading, proving the loader needs
no chumpy install. What remains unverifiable offline is only the numeric
content of the licensed files themselves (documented in TODO.md)."""

import os
import pickle
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp


def _write_mano_pkl(path, src, rng):
    """Pickle a MANO-format dict whose learnable fields come from the repo's
    synthetic model ``src`` (so kinematics stay sensible)."""
    stub = types.ModuleType("chumpy")
    stub_ch = types.ModuleType("chumpy.ch")

    class Ch:
        pass

    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    stub_ch.Ch = Ch
    stub.ch = stub_ch
    sys.modules["chumpy"] = stub
    sys.modules["chumpy.ch"] = stub_ch
    try:
        def ch(arr):
            o = Ch()
            # chumpy state dict: backing array under 'x' + bookkeeping keys
            o.__dict__.update({"x": np.asarray(arr, np.float64),
                               "_dirty_vars": set()})
            return o

        from scipy import sparse

        V, J = 778, 16
        posedirs = np.asarray(src.posedirs).T.reshape(V, 3, 135)
        hands_mean = rng.randn(45) * 0.1
        data = {
            "v_template": ch(src.v_template),
            "shapedirs": ch(src.shapedirs),
            "posedirs": ch(posedirs),
            "hands_mean": ch(hands_mean),
            "J_regressor": sparse.csc_matrix(
                np.asarray(src.j_regressor, np.float64)),
            "weights": np.asarray(src.lbs_weights, np.float64),
            "f": np.asarray(src.faces, np.uint32),
            "J": np.asarray(src.j_regressor @ src.v_template, np.float64),
            "kintree_table": np.stack([
                np.asarray([4294967295] + [0] * (J - 1), np.uint32),
                np.arange(J, dtype=np.uint32)]),
            "hands_components": rng.randn(45, 45),
            "hands_coeffs": rng.randn(1554, 45),
            "bs_style": "lbs",
            "bs_type": "lrotmin",
        }
        with open(path, "wb") as f:
            pickle.dump(data, f, protocol=2)
        return hands_mean
    finally:
        del sys.modules["chumpy"]
        del sys.modules["chumpy.ch"]


@pytest.fixture()
def mano_dir(tmp_path):
    from hands_tpu.ops import mano as manolib

    rng = np.random.RandomState(7)
    src_r = manolib._synthetic_model(True)
    src_l = manolib._synthetic_model(False)
    mean_r = _write_mano_pkl(tmp_path / "MANO_RIGHT.pkl", src_r, rng)
    mean_l = _write_mano_pkl(tmp_path / "MANO_LEFT.pkl", src_l, rng)
    old = os.environ.get("MANO_DIR")
    os.environ["MANO_DIR"] = str(tmp_path)
    manolib.load_mano.cache_clear()
    yield {"dir": tmp_path, "src_r": src_r, "src_l": src_l,
           "mean_r": mean_r, "mean_l": mean_l}
    if old is None:
        os.environ.pop("MANO_DIR", None)
    else:
        os.environ["MANO_DIR"] = old
    manolib.load_mano.cache_clear()


def test_pkl_loader_roundtrip_right(mano_dir):
    assert "chumpy" not in sys.modules
    from hands_tpu.ops import mano as manolib

    m = manolib.load_mano(True)
    src = mano_dir["src_r"]
    np.testing.assert_allclose(m.v_template, src.v_template, atol=1e-6)
    np.testing.assert_allclose(m.shapedirs, src.shapedirs, atol=1e-6)
    np.testing.assert_allclose(m.posedirs, src.posedirs, atol=1e-6)
    np.testing.assert_allclose(m.j_regressor, src.j_regressor, atol=1e-6)
    np.testing.assert_allclose(m.lbs_weights, src.lbs_weights, atol=1e-6)
    np.testing.assert_allclose(m.hand_mean, mano_dir["mean_r"], atol=1e-6)
    np.testing.assert_array_equal(m.faces, src.faces)


def test_pkl_loader_left_mirroring(mano_dir):
    from hands_tpu.ops import mano as manolib

    m = manolib.load_mano(False)
    src = mano_dir["src_l"]
    # the upstream left asset carries mirrored shapedirs; loader applies the
    # same x-sign fix smplx does (ops/mano.py docstring cite)
    expect = np.asarray(src.shapedirs) * np.array([-1.0, 1, 1]).reshape(1, 3, 1)
    np.testing.assert_allclose(m.shapedirs, expect, atol=1e-6)
    np.testing.assert_allclose(m.v_template, src.v_template, atol=1e-6)


def test_pkl_model_forward_and_flat_mean(mano_dir):
    from hands_tpu.ops import mano as manolib

    m = manolib.load_mano(True)
    B = 3
    rng = np.random.RandomState(0)
    betas = jnp.asarray(rng.randn(B, 10) * 0.3, jnp.float32)
    pose = jnp.asarray(rng.randn(B, 45) * 0.2, jnp.float32)
    orient = jnp.asarray(rng.randn(B, 3) * 0.2, jnp.float32)
    out = manolib.mano_forward(m, betas, pose, orient)
    verts, joints = out.vertices, out.joints
    assert verts.shape == (B, 778, 3) and joints.shape[0] == B
    assert np.isfinite(np.asarray(verts)).all()
    assert np.isfinite(np.asarray(joints)).all()

    flat = manolib.load_mano(True, flat_hand_mean=True)
    np.testing.assert_array_equal(np.asarray(flat.hand_mean), 0.0)
    out_flat = manolib.mano_forward(flat, betas, pose, orient)
    # hand_mean offsets the pose: outputs must differ
    assert not np.allclose(np.asarray(out_flat.vertices), np.asarray(verts))


def test_chumpy_shim_reduce_call_form():
    """Some chumpy pickles reduce to a call with the array as argument."""
    from hands_tpu.ops.mano import _ChumpyShim

    arr = np.arange(6.0).reshape(2, 3)
    s = _ChumpyShim(arr)
    np.testing.assert_array_equal(s.r, arr)
    s2 = _ChumpyShim()
    s2.__setstate__(arr)
    np.testing.assert_array_equal(s2.r, arr)
    with pytest.raises(ValueError):
        _ChumpyShim().r
