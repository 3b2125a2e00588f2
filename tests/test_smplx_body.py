"""SMPL-X body FK (`ops/smplx_body.py`) — synthetic-model validation, the
same way MANO is validated (VERDICT r2 #5). The reference's own SMPL-X call
path is unrunnable as shipped (processing.py:438 references an undefined
``build_subject_smplx``), so the contract is validated structurally:
kinematic identities + the real npz field layout."""

import numpy as np
import pytest

import jax.numpy as jnp

from hands_tpu.core import rot as rotlib
from hands_tpu.ops import smplx_body as sb


@pytest.fixture(scope="module")
def model():
    return sb._synthetic_body_model(num_verts=600)


def _zero_pose(B):
    z = lambda n: jnp.zeros((B, n), jnp.float32)
    return dict(global_orient=z(3), body_pose=z(63), jaw_pose=z(3),
                leye_pose=z(3), reye_pose=z(3), left_hand_pose=z(45),
                right_hand_pose=z(45))


def test_rest_pose_is_template(model):
    out = sb.body_forward(model, **_zero_pose(2))
    np.testing.assert_allclose(
        np.asarray(out.vertices),
        np.broadcast_to(np.asarray(model.v_template), (2, 600, 3)),
        atol=1e-6)
    j_rest = np.asarray(model.j_regressor) @ np.asarray(model.v_template)
    np.testing.assert_allclose(np.asarray(out.joints)[0], j_rest, atol=1e-6)
    assert out.joints.shape == (2, sb.NUM_JOINTS, 3)


def test_global_orient_is_rigid_rotation_about_pelvis(model):
    B = 2
    rng = np.random.RandomState(0)
    aa = jnp.asarray(rng.randn(B, 3) * 0.5, jnp.float32)
    transl = jnp.asarray(rng.randn(B, 3), jnp.float32)
    rest = sb.body_forward(model, **_zero_pose(B))
    kw = _zero_pose(B)
    kw["global_orient"] = aa
    out = sb.body_forward(model, transl=transl, **kw)
    R = np.asarray(rotlib.axis_angle_to_matrix(aa))
    pelvis = np.asarray(rest.joints)[:, :1]
    expect = np.einsum("bij,bvj->bvi",
                       R, np.asarray(rest.vertices) - pelvis) + pelvis \
        + np.asarray(transl)[:, None]
    np.testing.assert_allclose(np.asarray(out.vertices), expect, atol=1e-5)


def test_wrist_rotation_moves_only_that_subtree(model):
    """Rotating the left wrist (body joint 20, body_pose index 19) must move
    the left-finger joints (25-39) and leave the right arm untouched."""
    B = 1
    kw = _zero_pose(B)
    body = np.zeros((B, 63), np.float32)
    body[:, 19 * 3:19 * 3 + 3] = [0.0, 0.0, 1.2]  # left wrist
    kw["body_pose"] = jnp.asarray(body)
    rest = sb.body_forward(model, **_zero_pose(B))
    out = sb.body_forward(model, **kw)
    dj = np.linalg.norm(np.asarray(out.joints - rest.joints)[0], axis=1)
    assert dj[25:40].max() > 1e-3  # left fingers moved
    assert dj[40:55].max() < 1e-6  # right fingers untouched
    assert dj[:20].max() < 1e-6  # torso untouched


def test_betas_shape_blend(model):
    B = 2
    rng = np.random.RandomState(1)
    betas = jnp.asarray(rng.randn(B, 10), jnp.float32)
    out = sb.body_forward(model, betas=betas, **_zero_pose(B))
    expect = np.asarray(model.v_template) + np.einsum(
        "vcs,bs->bvc", np.asarray(model.shapedirs), np.asarray(betas))
    # zero pose => pure shape blend, but LBS still runs; joints regress from
    # v_shaped so the skinning transforms carry the blended rest pose exactly
    np.testing.assert_allclose(np.asarray(out.vertices), expect, atol=1e-5)


def test_hand_pca_components_mapping(model):
    """With a PCA basis, hand_pose inputs are coefficients:
    aa = mean + coeffs @ components (smplx use_pca contract)."""
    rng = np.random.RandomState(2)
    comp = rng.randn(45, 45).astype(np.float32) * 0.1
    mean = rng.randn(45).astype(np.float32) * 0.05
    pca_model = model._replace(
        hands_components_l=jnp.asarray(comp),
        hands_mean_l=jnp.asarray(mean))
    coeffs = jnp.asarray(rng.randn(1, 45).astype(np.float32))
    out_pca = sb.body_forward(pca_model, **{**_zero_pose(1),
                                            "left_hand_pose": coeffs})
    aa = jnp.asarray(mean[None] + np.asarray(coeffs) @ comp)
    out_aa = sb.body_forward(model, **{**_zero_pose(1),
                                       "left_hand_pose": aa})
    np.testing.assert_allclose(np.asarray(out_pca.vertices),
                               np.asarray(out_aa.vertices), atol=1e-5)


def test_npz_loader_real_field_layout(tmp_path, monkeypatch):
    """load_body_model reads the MPI SMPLX_*.npz field set (v_template /
    shapedirs / posedirs (V,3,486) / J_regressor / weights / f /
    hands_components{l,r} / hands_mean{l,r})."""
    rng = np.random.RandomState(3)
    V, J = 400, sb.NUM_JOINTS
    posedirs_npz = rng.randn(V, 3, (J - 1) * 9).astype(np.float64)
    fields = dict(
        v_template=rng.randn(V, 3),
        shapedirs=rng.randn(V, 3, 400),  # 300 shape + 100 expression
        posedirs=posedirs_npz,
        J_regressor=rng.rand(J, V),
        weights=rng.rand(V, J),
        f=rng.randint(0, V, size=(700, 3)).astype(np.uint32),
        kintree_table=np.stack([np.asarray(sb.PARENTS, np.int64),
                                np.arange(J)]),
        hands_componentsl=rng.randn(45, 45),
        hands_componentsr=rng.randn(45, 45),
        hands_meanl=rng.randn(45),
        hands_meanr=rng.randn(45),
    )
    np.savez(tmp_path / "SMPLX_NEUTRAL.npz", **fields)
    monkeypatch.setenv("SMPLX_DIR", str(tmp_path))
    sb.load_body_model.cache_clear()
    try:
        m = sb.load_body_model(use_pca=True, flat_hand_mean=False)
        np.testing.assert_allclose(m.v_template, fields["v_template"],
                                   atol=1e-6)
        assert m.shapedirs.shape == (V, 3, sb.NUM_BETAS)
        np.testing.assert_allclose(
            m.posedirs, posedirs_npz.reshape(V * 3, -1).T, atol=1e-6)
        np.testing.assert_allclose(m.hands_mean_r, fields["hands_meanr"],
                                   atol=1e-6)
        np.testing.assert_allclose(m.hands_components_l,
                                   fields["hands_componentsl"], atol=1e-6)
        # flat + no-pca variant zeroes means and uses identity basis
        sb.load_body_model.cache_clear()
        m2 = sb.load_body_model(use_pca=False, flat_hand_mean=True)
        np.testing.assert_array_equal(np.asarray(m2.hands_mean_l), 0.0)
        np.testing.assert_allclose(m2.hands_components_r, np.eye(45),
                                   atol=1e-6)
    finally:
        sb.load_body_model.cache_clear()
