"""MANO-JAX layer tests: shapes, FK semantics, differentiability, jit."""

import jax
import jax.numpy as jnp
import numpy as np

from hands_tpu.ops import mano


def _fwd(is_rhand=True, B=4, rng=None):
    rng = rng or np.random.RandomState(0)
    model = mano.load_mano(is_rhand)
    betas = jnp.asarray(rng.randn(B, 10) * 0.5, jnp.float32)
    pose = jnp.asarray(rng.randn(B, 45) * 0.2, jnp.float32)
    orient = jnp.asarray(rng.randn(B, 3) * 0.3, jnp.float32)
    return model, mano.mano_forward(model, betas, pose, orient)


def test_output_shapes():
    _, out = _fwd(B=4)
    assert out.vertices.shape == (4, 778, 3)
    assert out.joints.shape == (4, 21, 3)


def test_zero_pose_joints_match_rest():
    """With zero pose/betas (and flat mean), joints == regressed rest joints."""
    model = mano.load_mano(True, flat_hand_mean=True)
    B = 2
    zeros = jnp.zeros((B, 10))
    out = mano.mano_forward(model, zeros, jnp.zeros((B, 45)), jnp.zeros((B, 3)))
    j_rest = np.einsum(
        "jv,vc->jc", np.asarray(model.j_regressor), np.asarray(model.v_template)
    )
    np.testing.assert_allclose(np.asarray(out.joints[0, :16]), j_rest, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.vertices[0]), np.asarray(model.v_template), atol=1e-5
    )


def test_global_orient_rotates_rigidly():
    """A pure global rotation must rotate joints about the wrist rigidly."""
    from hands_tpu.core import rot as rotlib

    model = mano.load_mano(True, flat_hand_mean=True)
    B = 1
    aa = jnp.asarray([[0.3, -0.2, 0.5]], jnp.float32)
    out0 = mano.mano_forward(model, jnp.zeros((B, 10)), jnp.zeros((B, 45)), jnp.zeros((B, 3)))
    out1 = mano.mano_forward(model, jnp.zeros((B, 10)), jnp.zeros((B, 45)), aa)
    R = np.asarray(rotlib.axis_angle_to_matrix(aa))[0]
    root = np.asarray(out0.joints[0, 0])
    expect = (np.asarray(out0.joints[0]) - root) @ R.T + np.asarray(out1.joints[0, 0])
    np.testing.assert_allclose(np.asarray(out1.joints[0]), expect, atol=1e-5)


def test_transl_shifts():
    model = mano.load_mano(True)
    B = 2
    t = jnp.asarray([[0.1, 0.2, 0.3], [-0.1, 0.0, 1.0]], jnp.float32)
    out0 = mano.mano_forward(model, jnp.zeros((B, 10)), jnp.zeros((B, 45)), jnp.zeros((B, 3)))
    out1 = mano.mano_forward(
        model, jnp.zeros((B, 10)), jnp.zeros((B, 45)), jnp.zeros((B, 3)), transl=t
    )
    np.testing.assert_allclose(
        np.asarray(out1.joints - out0.joints),
        np.broadcast_to(np.asarray(t)[:, None, :], (B, 21, 3)),
        atol=1e-6,
    )


def test_differentiable():
    model = mano.load_mano(True)

    def loss(pose):
        out = mano.mano_forward(
            model, jnp.zeros((1, 10)), pose, jnp.zeros((1, 3))
        )
        return jnp.sum(out.joints**2)

    g = jax.grad(loss)(jnp.ones((1, 45)) * 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_jit_and_vmap_consistent():
    model, out = _fwd(B=3)
    jitted = jax.jit(lambda b, p, o: mano.mano_forward(model, b, p, o))
    rng = np.random.RandomState(0)
    betas = jnp.asarray(rng.randn(3, 10) * 0.5, jnp.float32)
    pose = jnp.asarray(rng.randn(3, 45) * 0.2, jnp.float32)
    orient = jnp.asarray(rng.randn(3, 3) * 0.3, jnp.float32)
    out_j = jitted(betas, pose, orient)
    np.testing.assert_allclose(
        np.asarray(out_j.joints), np.asarray(out.joints), atol=1e-5
    )


def test_left_right_distinct():
    _, out_r = _fwd(True)
    _, out_l = _fwd(False)
    assert not np.allclose(np.asarray(out_r.vertices), np.asarray(out_l.vertices))


def test_seal_mano_mesh():
    model = mano.load_mano(True)
    out = mano.mano_forward(
        model, jnp.zeros((2, 10)), jnp.zeros((2, 45)), jnp.zeros((2, 3))
    )
    v, f = mano.seal_mano_mesh(out.vertices, model.faces, is_rhand=True)
    assert v.shape == (2, 779, 3)
    assert f.shape == (1554, 3)
    # sealing vertex = mean of wrist ring
    ring = np.asarray(out.vertices[0, mano.SEAL_CIRCLE_V_ID]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(v[0, -1]), ring, atol=1e-6)


def test_model_tensor_invariants():
    """Structural invariants every MANO model (real or synthetic) must hold."""
    for is_r in (True, False):
        m = mano.load_mano(is_r)
        W = np.asarray(m.lbs_weights)
        np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-5)
        assert (W >= 0).all()
        JR = np.asarray(m.j_regressor)
        np.testing.assert_allclose(JR.sum(axis=1), 1.0, atol=1e-4)
        assert m.shapedirs.shape == (778, 3, 10)
        assert m.posedirs.shape == (135, 778 * 3)
        f = np.asarray(m.faces)
        assert f.min() >= 0 and f.max() < 778


def test_beta_changes_shape_not_pose():
    """Betas deform the rest shape; with zero pose the joints move smoothly
    and remain finite."""
    model = mano.load_mano(True, flat_hand_mean=True)
    z = jnp.zeros((1, 45))
    o = jnp.zeros((1, 3))
    out0 = mano.mano_forward(model, jnp.zeros((1, 10)), z, o)
    out1 = mano.mano_forward(model, jnp.ones((1, 10)), z, o)
    d = np.abs(np.asarray(out1.vertices - out0.vertices))
    assert d.max() > 1e-4  # betas have an effect
    assert d.max() < 0.1  # but a bounded one


def test_pose_blendshapes_active():
    """Articulation must engage the pose-blend correction (verts differ from
    pure rigid skinning of the rest shape)."""
    model = mano.load_mano(True, flat_hand_mean=True)
    pose = jnp.zeros((1, 45)).at[0, 0].set(0.8)
    out = mano.mano_forward(model, jnp.zeros((1, 10)), pose, jnp.zeros((1, 3)))
    # disable pose blend by zeroing posedirs
    model0 = model._replace(posedirs=jnp.zeros_like(model.posedirs))
    out0 = mano.mano_forward(model0, jnp.zeros((1, 10)), pose, jnp.zeros((1, 3)))
    assert float(jnp.abs(out.vertices - out0.vertices).max()) > 1e-5
