"""Offline proof of the first-contact harness itself (VERDICT r4 #5).

The asset-gated checks in ``hands_tpu.cli.verify_setup`` have only ever
SKIPped in this environment, so a bug in the *check code* (argument
plumbing, camera-convention glue, joint-count truncation, tolerance math)
would surface only on first contact with real assets. These tests install
minimal fake ``smplx`` / ``pytorch3d`` modules whose forward passes wrap
**our own** FK / rasterizer:

* with a faithful fake, every check must PASS (the plumbing round-trips
  tensors, honors the constructor flags, and truncates joint counts);
* with a deliberately perturbed fake (1 mm vertex offset, dropped
  camera-convention flip, shifted principal point), the same check must
  FAIL with the right message.

What remains irreducibly gated is only the numeric content of the
licensed files and the true pytorch3d conventions — the harness logic is
now exercised offline.  Reference contracts under test:
``/root/reference/common/body_models.py:90-97`` (MANO construction args),
``src/models/hands_light/renderer.py:157-208`` (soft-silhouette shader).
"""

import sys
import types

import numpy as np
import pytest

from hands_tpu.cli import verify_setup as vs


# --------------------------------------------------------------- fixtures
@pytest.fixture()
def mano_assets(tmp_path, monkeypatch):
    """Synthetic-but-format-faithful MANO pkls + MANO_DIR (reuses the
    pkl writer proven in test_mano_pkl.py)."""
    from test_mano_pkl import _write_mano_pkl

    from hands_tpu.ops import mano as manolib

    rng = np.random.RandomState(7)
    _write_mano_pkl(tmp_path / "MANO_RIGHT.pkl",
                    manolib._synthetic_model(True), rng)
    _write_mano_pkl(tmp_path / "MANO_LEFT.pkl",
                    manolib._synthetic_model(False), rng)
    monkeypatch.setenv("MANO_DIR", str(tmp_path))
    manolib.load_mano.cache_clear()
    yield tmp_path
    manolib.load_mano.cache_clear()


@pytest.fixture()
def smplx_assets(tmp_path, monkeypatch):
    """Synthetic SMPLX_NEUTRAL.npz in the MPI field layout + SMPLX_DIR."""
    from hands_tpu.ops import smplx_body as sb

    rng = np.random.RandomState(3)
    V, J = 400, sb.NUM_JOINTS
    np.savez(
        tmp_path / "SMPLX_NEUTRAL.npz",
        v_template=rng.randn(V, 3) * 0.2,
        shapedirs=rng.randn(V, 3, 400) * 0.01,
        posedirs=rng.randn(V, 3, (J - 1) * 9) * 0.001,
        J_regressor=rng.rand(J, V) / V,
        weights=rng.dirichlet(np.ones(J), size=V),
        f=rng.randint(0, V, size=(700, 3)).astype(np.uint32),
        kintree_table=np.stack([np.asarray(sb.PARENTS, np.int64),
                                np.arange(J)]),
        hands_componentsl=rng.randn(45, 45),
        hands_componentsr=rng.randn(45, 45),
        hands_meanl=rng.randn(45) * 0.1,
        hands_meanr=rng.randn(45) * 0.1,
    )
    monkeypatch.setenv("SMPLX_DIR", str(tmp_path))
    sb.load_body_model.cache_clear()
    yield tmp_path
    sb.load_body_model.cache_clear()


# ------------------------------------------------------------ fake smplx
def _install_fake_smplx(monkeypatch, vert_offset=0.0, mano_joints=16,
                        smplx_extra_joints=72):
    """A ``smplx`` stand-in whose MANO/SMPLX wrap our own FK.

    ``mano_joints``/``smplx_extra_joints`` emulate the real package's
    joint counts (smplx.MANO returns 16 FK joints, smplx.SMPLX returns
    55 FK + 72 landmark rows) so the check's min-truncation actually
    executes. ``vert_offset`` (meters) simulates a numeric mismatch.
    """
    import jax.numpy as jnp
    import torch

    from hands_tpu.ops import mano as manolib
    from hands_tpu.ops import smplx_body as sb

    mod = types.ModuleType("smplx")

    class _Out:
        def __init__(self, v, j):
            self.vertices = torch.from_numpy(
                np.asarray(v, np.float32) + np.float32(vert_offset))
            self.joints = torch.from_numpy(np.asarray(j, np.float32))

    class MANO:
        def __init__(self, model_path, is_rhand=True, use_pca=False,
                     flat_hand_mean=False, batch_size=1, **kw):
            assert use_pca is False, "check must request use_pca=False"
            self.model = manolib.load_mano(is_rhand,
                                           flat_hand_mean=flat_hand_mean)

        def __call__(self, betas=None, hand_pose=None, global_orient=None,
                     **kw):
            out = manolib.mano_forward(
                self.model, jnp.asarray(betas.numpy()),
                jnp.asarray(hand_pose.numpy()),
                jnp.asarray(global_orient.numpy()))
            return _Out(out.vertices,
                        np.asarray(out.joints)[:, :mano_joints])

    class SMPLX:
        def __init__(self, model_path, gender="neutral", use_pca=False,
                     flat_hand_mean=True, batch_size=1, **kw):
            self.model = sb.load_body_model(gender, use_pca,
                                            flat_hand_mean)

        def __call__(self, **kw):
            out = sb.body_forward(
                self.model,
                **{k: jnp.asarray(v.numpy()) for k, v in kw.items()})
            j = np.asarray(out.joints, np.float32)
            pad = np.full((j.shape[0], smplx_extra_joints, 3), 7.0,
                          np.float32)  # landmark rows past the FK 55
            return _Out(out.vertices, np.concatenate([j, pad], axis=1))

    mod.MANO, mod.SMPLX = MANO, SMPLX
    monkeypatch.setitem(sys.modules, "smplx", mod)
    return mod


# -------------------------------------------------------- fake pytorch3d
def _install_fake_pytorch3d(monkeypatch, flip_convention=True,
                            principal_shift_px=0.0):
    """A ``pytorch3d`` stand-in backed by our own soft rasterizer.

    ``flip_convention=True`` models the real package's +x-left/+y-up
    camera frame (which check_rasterizer compensates for by pre-flipping
    the verts, verify_setup.py:207-210); passing ``False`` simulates a
    convention mismatch — the check must catch it. ``principal_shift_px``
    simulates a principal-point bug.
    """
    import jax.numpy as jnp
    import torch

    from hands_tpu.ops.rasterizer import render_silhouette

    pkg = types.ModuleType("pytorch3d")
    rend = types.ModuleType("pytorch3d.renderer")
    struct = types.ModuleType("pytorch3d.structures")
    pkg.renderer, pkg.structures = rend, struct

    class BlendParams:
        def __init__(self, sigma=1e-4, **kw):
            self.sigma = sigma

    class RasterizationSettings:
        def __init__(self, image_size=64, blur_radius=0.0,
                     faces_per_pixel=1, **kw):
            self.image_size = image_size

    class PerspectiveCameras:
        def __init__(self, focal_length=None, principal_point=None,
                     in_ndc=True, image_size=None):
            assert in_ndc is False, (
                "check must build screen-space (in_ndc=False) cameras")
            self.focal = focal_length
            self.principal = principal_point

    class MeshRasterizer:
        def __init__(self, cameras=None, raster_settings=None):
            self.cameras = cameras
            self.raster_settings = raster_settings

    class SoftSilhouetteShader:
        def __init__(self, blend_params=None):
            self.blend_params = blend_params

    class Meshes:
        def __init__(self, verts=None, faces=None):
            self._verts, self._faces = list(verts), list(faces)

    class MeshRenderer:
        def __init__(self, rasterizer=None, shader=None):
            self.rasterizer, self.shader = rasterizer, shader

        def __call__(self, meshes):
            verts = torch.stack(meshes._verts).numpy().astype(np.float32)
            faces = meshes._faces[0].numpy().astype(np.int32)
            res = self.rasterizer.raster_settings.image_size
            f = self.rasterizer.cameras.focal.numpy()
            p = self.rasterizer.cameras.principal.numpy()
            B = verts.shape[0]
            K = np.zeros((B, 3, 3), np.float32)
            K[:, 0, 0], K[:, 1, 1] = f[:, 0], f[:, 1]
            K[:, 0, 2] = p[:, 0] + principal_shift_px
            K[:, 1, 2] = p[:, 1]
            K[:, 2, 2] = 1.0
            if flip_convention:
                # the real package looks down +z with +x left / +y up:
                # undo the pre-flip the check applied
                verts = verts * np.asarray([-1, -1, 1], np.float32)
            sil = np.asarray(render_silhouette(
                jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(K),
                res))
            out = np.zeros((B, res, res, 4), np.float32)
            out[..., 3] = sil
            return torch.from_numpy(out)

    for name, obj in [("BlendParams", BlendParams),
                      ("MeshRasterizer", MeshRasterizer),
                      ("MeshRenderer", MeshRenderer),
                      ("PerspectiveCameras", PerspectiveCameras),
                      ("RasterizationSettings", RasterizationSettings),
                      ("SoftSilhouetteShader", SoftSilhouetteShader)]:
        setattr(rend, name, obj)
    struct.Meshes = Meshes
    monkeypatch.setitem(sys.modules, "pytorch3d", pkg)
    monkeypatch.setitem(sys.modules, "pytorch3d.renderer", rend)
    monkeypatch.setitem(sys.modules, "pytorch3d.structures", struct)
    return pkg


# ------------------------------------------------------------- the tests
def test_mano_fk_harness_pass(mano_assets, monkeypatch):
    _install_fake_smplx(monkeypatch)
    status, detail = vs.check_mano_fk()
    assert status == vs.PASS, detail
    assert "joints" not in detail or "16" not in detail  # detail is PASS-form


def test_mano_fk_harness_fails_on_vertex_mismatch(mano_assets, monkeypatch):
    _install_fake_smplx(monkeypatch, vert_offset=1e-3)  # 1 mm >> 1e-5 tol
    status, detail = vs.check_mano_fk()
    assert status == vs.FAIL
    assert "verts" in detail and "right" in detail  # fails on first hand


def test_mano_fk_truncates_to_smplx_joint_count(mano_assets, monkeypatch):
    # our FK emits 21 joints, smplx.MANO emits 16: if the check compared
    # ragged arrays instead of truncating it would crash, not PASS
    _install_fake_smplx(monkeypatch, mano_joints=16)
    status, detail = vs.check_mano_fk()
    assert status == vs.PASS, detail


def test_smplx_body_harness_pass(smplx_assets, monkeypatch):
    # the fake pads 72 garbage landmark rows past the 55 FK joints (as
    # the real package does); truncation must keep the check green
    _install_fake_smplx(monkeypatch)
    status, detail = vs.check_smplx_body_fk()
    assert status == vs.PASS, detail
    assert "55" in detail  # truncated to our FK joint count


def test_smplx_body_harness_fails_on_vertex_mismatch(smplx_assets,
                                                     monkeypatch):
    _install_fake_smplx(monkeypatch, vert_offset=1e-3)
    status, detail = vs.check_smplx_body_fk()
    assert status == vs.FAIL
    assert "verts" in detail


def test_rasterizer_harness_pass(monkeypatch):
    monkeypatch.delenv("MANO_DIR", raising=False)
    from hands_tpu.ops import mano as manolib

    manolib.load_mano.cache_clear()
    _install_fake_pytorch3d(monkeypatch)
    status, detail = vs.check_rasterizer()
    assert status == vs.PASS, detail
    assert "IoU" in detail


def test_rasterizer_harness_fails_on_convention_flip(monkeypatch):
    """A renderer that does NOT use the +x-left/+y-up convention produces
    a 180-degree-rotated silhouette; the IoU gate must catch it —
    otherwise the check could never detect the exact class of bug
    (camera-frame mismatch) it exists to guard."""
    monkeypatch.delenv("MANO_DIR", raising=False)
    from hands_tpu.ops import mano as manolib

    manolib.load_mano.cache_clear()
    _install_fake_pytorch3d(monkeypatch, flip_convention=False)
    status, detail = vs.check_rasterizer()
    assert status == vs.FAIL
    assert "IoU" in detail


def test_rasterizer_harness_fails_on_principal_shift(monkeypatch):
    monkeypatch.delenv("MANO_DIR", raising=False)
    from hands_tpu.ops import mano as manolib

    manolib.load_mano.cache_clear()
    _install_fake_pytorch3d(monkeypatch, principal_shift_px=12.0)
    status, detail = vs.check_rasterizer()
    assert status == vs.FAIL


def test_run_all_and_exit_code_with_fakes(mano_assets, monkeypatch):
    """main() plumbing: FAIL anywhere -> exit 1; dataset checks SKIP
    without DATA_DIR."""
    monkeypatch.delenv("DATA_DIR", raising=False)
    monkeypatch.delenv("SMPLX_DIR", raising=False)
    from hands_tpu.ops import smplx_body as sb

    sb.load_body_model.cache_clear()
    _install_fake_smplx(monkeypatch, vert_offset=1e-3)
    _install_fake_pytorch3d(monkeypatch)
    results = vs.run_all(datasets=("arctic",), verbose=False)
    assert results["mano_fk"][0] == vs.FAIL
    assert results["smplx_body_fk"][0] == vs.SKIP  # no SMPLX_DIR
    assert results["rasterizer"][0] == vs.PASS
    assert results["dataset:arctic"][0] == vs.SKIP
    assert vs.main(["--datasets", "arctic"]) == 1
