"""Golden parity: the iterative HMR regression head vs the reference's own
``src/nets/hand_heads/hand_hmr.py`` + ``src/nets/hmr_layer.py``.

pytorch3d is absent; its ``rotation_conversions`` usage in hand_hmr is two
well-defined public functions (row-major 6D <-> matrix), stubbed here in
torch. Random torch weights are converted into the Flax head and the eval
forwards must match <1e-5.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests import ref_compat
from hands_tpu.models.heads.hmr import HandHMR

pytestmark = pytest.mark.heavy


def _stub_pytorch3d():
    """pytorch3d.transforms.rotation_conversions: the public row-major 6D
    representation (Zhou et al.) exactly as pytorch3d defines it."""
    if "pytorch3d.transforms.rotation_conversions" in sys.modules:
        return

    import torch.nn.functional as F

    def axis_angle_to_matrix(aa):
        angle = torch.norm(aa, dim=-1, keepdim=True)
        axis = aa / torch.clamp(angle, min=1e-9)
        x, y, z = axis.unbind(-1)
        c = torch.cos(angle)[..., 0]
        s = torch.sin(angle)[..., 0]
        C = 1 - c
        R = torch.stack([
            c + x * x * C, x * y * C - z * s, x * z * C + y * s,
            y * x * C + z * s, c + y * y * C, y * z * C - x * s,
            z * x * C - y * s, z * y * C + x * s, c + z * z * C,
        ], dim=-1).reshape(aa.shape[:-1] + (3, 3))
        eye = torch.eye(3).expand(R.shape)
        small = (angle[..., 0] < 1e-8)[..., None, None]
        return torch.where(small, eye, R)

    def matrix_to_rotation_6d(matrix):
        return matrix[..., :2, :].clone().reshape(*matrix.shape[:-2], 6)

    def rotation_6d_to_matrix(d6):
        a1, a2 = d6[..., :3], d6[..., 3:]
        b1 = F.normalize(a1, dim=-1)
        b2 = a2 - (b1 * a2).sum(-1, keepdim=True) * b1
        b2 = F.normalize(b2, dim=-1)
        b3 = torch.cross(b1, b2, dim=-1)
        return torch.stack((b1, b2, b3), dim=-2)

    def matrix_to_axis_angle(R):
        tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
        cos = torch.clamp((tr - 1) / 2, -1.0, 1.0)
        angle = torch.acos(cos)
        axis = torch.stack([
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ], dim=-1)
        s = torch.clamp(2 * torch.sin(angle), min=1e-9)
        return axis / s[..., None] * angle[..., None]

    def _axis_rot(axis, angle):
        c, s = torch.cos(angle), torch.sin(angle)
        one, zero = torch.ones_like(angle), torch.zeros_like(angle)
        if axis == "X":
            flat = (one, zero, zero, zero, c, -s, zero, s, c)
        elif axis == "Y":
            flat = (c, zero, s, zero, one, zero, -s, zero, c)
        else:
            flat = (c, -s, zero, s, c, zero, zero, zero, one)
        return torch.stack(flat, -1).reshape(angle.shape + (3, 3))

    def euler_angles_to_matrix(euler_angles, convention):
        mats = [_axis_rot(c, e) for c, e in
                zip(convention, torch.unbind(euler_angles, -1))]
        return torch.matmul(torch.matmul(mats[0], mats[1]), mats[2])

    mod = types.ModuleType("pytorch3d.transforms.rotation_conversions")
    mod.axis_angle_to_matrix = axis_angle_to_matrix
    mod.matrix_to_rotation_6d = matrix_to_rotation_6d
    mod.rotation_6d_to_matrix = rotation_6d_to_matrix
    mod.matrix_to_axis_angle = matrix_to_axis_angle
    mod.euler_angles_to_matrix = euler_angles_to_matrix
    pkg = types.ModuleType("pytorch3d")
    tfm = types.ModuleType("pytorch3d.transforms")
    tfm.rotation_conversions = mod
    pkg.transforms = tfm
    sys.modules["pytorch3d"] = pkg
    sys.modules["pytorch3d.transforms"] = tfm
    sys.modules["pytorch3d.transforms.rotation_conversions"] = mod


def _lin(sd, k):
    return np.asarray(sd[f"{k}.weight"].T), np.asarray(sd[f"{k}.bias"])


def _convert_hand_hmr(sd):
    """torch HandHMR state_dict -> Flax HandHMR params."""
    p = {}
    for i, src in enumerate(("cam_init.0", "cam_init.2", "cam_init.4")):
        w, b = _lin(sd, src)
        p[f"Dense_{i}"] = {"kernel": w, "bias": b}
    hl = {}
    for dst, src in (("refine0", "hmr_layer.refine.0"),
                     ("refine1", "hmr_layer.refine.3")):
        w, b = _lin(sd, src)
        hl[dst] = {"kernel": w, "bias": b}
    for key, src in (("dec_pose_6d", "hmr_layer.decoders.pose_6d"),
                     ("dec_cam_t_wp", "hmr_layer.decoders.cam_t/wp"),
                     ("dec_shape", "hmr_layer.decoders.shape")):
        w, b = _lin(sd, src)
        hl[key] = {"kernel": w, "bias": b}
    p["hmr_layer"] = hl
    return {"params": p}


def test_hand_hmr_forward_matches_reference():
    _stub_pytorch3d()
    ref_mod = ref_compat.load("src.nets.hand_heads.hand_hmr")
    torch.manual_seed(0)
    feat_dim = 64
    tm = ref_mod.HandHMR(feat_dim, is_rhand=True, n_iter=3)
    tm.eval()
    sd = tm.state_dict()

    rng = np.random.RandomState(1)
    feat = rng.randn(4, feat_dim).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(feat), use_pool=False)
    ref_pose = ref_out["pose"].numpy()            # (B, 16, 3, 3)
    ref_shape = ref_out["shape"].numpy()
    ref_cam = ref_out["cam_t.wp"].numpy()
    ref_cam_init = ref_out["cam_t.wp.init"].numpy()

    fm = HandHMR(feat_dim=feat_dim, n_iter=3)
    variables = _convert_hand_hmr(sd)
    out = fm.apply(variables, jnp.asarray(feat), train=False)

    np.testing.assert_allclose(np.asarray(out["cam_t.wp.init"]),
                               ref_cam_init, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["cam_t.wp"]), ref_cam,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["shape"]), ref_shape,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pose"]), ref_pose, atol=1e-5)
