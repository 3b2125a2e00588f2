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
