"""Golden parity: HandOccNet's FIT/SET gated-attention transformer and the
CBAM SpatialGate vs the reference's own modules
(``src/models/handoccnet_light/{transformer,cbam}.py`` — torch + einops,
runnable as-is). Random torch weights are converted into the Flax blocks
and eval forwards must match <1e-4."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("einops")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests import ref_compat
from hands_tpu.models.handoccnet_light import InjectionTransformer, SpatialGate

pytestmark = pytest.mark.heavy


def _conv(w):
    return np.asarray(w.detach().numpy()).transpose(2, 3, 1, 0)  # OIHW->HWIO


def _lin(w):
    return np.asarray(w.detach().numpy()).T


def _t(x):
    return np.asarray(x.detach().numpy())


def _convert_transformer(sd, depth, injection):
    from hands_tpu.utils import torch_import as ti

    return ti.import_handoccnet_transformer(sd, depth=depth,
                                            injection=injection)


@pytest.mark.parametrize("injection", [True, False])
def test_fit_set_transformer_matches_reference(injection):
    ref_mod = ref_compat.load("src.models.handoccnet_light.transformer")
    torch.manual_seed(0)
    tm = ref_mod.Transformer(inp_res=32, dim=256, depth=2, num_heads=4,
                             mlp_ratio=4.0, injection=injection)
    tm.eval()
    rng = np.random.RandomState(1)
    q = rng.randn(2, 256, 32, 32).astype(np.float32)
    k = rng.randn(2, 256, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(q), torch.from_numpy(k)).numpy()
    ref_out = ref_out.transpose(0, 2, 3, 1)

    fm = InjectionTransformer(depth=2, injection=injection)
    variables = _convert_transformer(tm.state_dict(), 2, injection)
    out = np.asarray(fm.apply(
        variables, jnp.asarray(q.transpose(0, 2, 3, 1)),
        jnp.asarray(k.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


def test_spatial_gate_matches_reference():
    ref_mod = ref_compat.load("src.models.handoccnet_light.cbam")
    torch.manual_seed(2)
    tm = ref_mod.SpatialGate()
    tm.eval()
    # randomise the BN running stats so the test exercises them
    with torch.no_grad():
        tm.spatial.bn.running_mean.normal_(0, 0.5)
        tm.spatial.bn.running_var.uniform_(0.5, 2.0)
    sd = tm.state_dict()
    variables = {
        "params": {
            "spatial_conv": {"kernel": _conv(sd["spatial.conv.weight"])},
            "spatial_bn": {"scale": _t(sd["spatial.bn.weight"]),
                           "bias": _t(sd["spatial.bn.bias"])},
        },
        "batch_stats": {
            "spatial_bn": {"mean": _t(sd["spatial.bn.running_mean"]),
                           "var": _t(sd["spatial.bn.running_var"])},
        },
    }
    rng = np.random.RandomState(3)
    x = rng.randn(2, 64, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_a, ref_b = tm(torch.from_numpy(x))
    fm = SpatialGate()
    a, b = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    train=False)
    np.testing.assert_allclose(np.asarray(a), ref_a.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), ref_b.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def _stub_torchvision():
    import sys
    import types

    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.ops = types.ModuleType("torchvision.ops")  # imported but unused
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv.ops


def _bn(sd, k):
    return ({"scale": _t(sd[f"{k}.weight"]), "bias": _t(sd[f"{k}.bias"])},
            {"mean": _t(sd[f"{k}.running_mean"]),
             "var": _t(sd[f"{k}.running_var"])})


def _convert_fpn(sd):
    from hands_tpu.utils import torch_import as ti

    return ti.import_handoccnet_fpn(sd)


def test_fpn_matches_reference():
    """The full FPN (leaky ResNet-50 bottom-up + top-down laterals + smooths
    + avg-pool + SpatialGate split) vs the reference backbone.py."""
    _stub_torchvision()
    ref_mod = ref_compat.load("src.models.handoccnet_light.backbone")
    torch.manual_seed(0)
    tm = ref_mod.FPN(pretrained=False)
    tm.eval()
    # randomise BN running stats (fresh init is mean 0 var 1 — too easy)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    sd = tm.state_dict()

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        ref_p, ref_s = tm(torch.from_numpy(x))

    from hands_tpu.models.handoccnet_light import FPN

    fm = FPN()
    variables = _convert_fpn(sd)
    p, s = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    train=False)
    np.testing.assert_allclose(
        np.asarray(p), ref_p.numpy().transpose(0, 2, 3, 1), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(s), ref_s.numpy().transpose(0, 2, 3, 1), atol=2e-3)


def test_regressor_matches_reference():
    """The full regressor chain (hourglass hand_regHead + spatial softmax +
    hand_Encoder + mano_regHead 6D decode) vs the reference's own
    ``regressor.py`` with converted random weights."""
    ref_mod = ref_compat.load("src.models.handoccnet_light.regressor")
    torch.manual_seed(0)
    tm = ref_mod.Regressor()
    tm.eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
        tm.hand_regHead.betas.mul_(
            torch.linspace(0.5, 2.0, 21).unsqueeze(-1))

    rng = np.random.RandomState(1)
    x = rng.randn(2, 256, 32, 32).astype(np.float32)
    xt = torch.from_numpy(x)
    with torch.no_grad():
        ref_out = tm(xt)
        _, _, ref_preds = tm.hand_regHead(xt)

    from hands_tpu.models.handoccnet_light import Regressor
    from hands_tpu.utils.torch_import import import_handoccnet_regressor

    fm = Regressor()
    variables = import_handoccnet_regressor(tm.state_dict())
    out = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                   train=False)

    np.testing.assert_allclose(
        np.asarray(out["joints2d_hm"]), ref_preds[-1].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["shape"]), ref_out["mano_shape"].numpy(), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["cam_t.wp"]), ref_out["cam"].numpy(), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["pose"]), ref_out["mano_pose"].numpy(), atol=2e-3)


def test_handoccnet_full_model_matches_reference():
    """End-to-end: the reference HandOccNet (model.py:17 — 256-resize, batch
    concat of r/l crops, KPE feat_mlp, FPN + FIT + SET + kpe residual,
    regressor split, grasp classifier) with random converted weights vs
    HandOccNetNet. MANO heads are stubbed to leak their pre-decode inputs."""
    from tests.test_ref_goldens_hands_trunk import Args, _stub_blocked_modules

    _stub_torchvision()
    _stub_blocked_modules()
    ref_model_mod = ref_compat.load("src.models.handoccnet_light.model")
    real_fpn = ref_model_mod.FPN
    args = Args(pos_enc="center+corner_latent", n_freq_pos_enc=4,
                method="handoccnet_light", use_grasp_loss=True,
                use_render_seg_loss=False)
    torch.manual_seed(0)
    ref_model_mod.FPN = lambda pretrained=True: real_fpn(pretrained=False)
    try:
        tm = ref_model_mod.HandOccNet(1000.0, 224, args)
    finally:
        ref_model_mod.FPN = real_fpn
    tm.eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    rng = np.random.RandomState(1)
    B = 2
    inputs_np = {
        "r_img": rng.randn(B, 3, 224, 224).astype(np.float32),
        "l_img": rng.randn(B, 3, 224, 224).astype(np.float32),
        "r_center_angle": rng.randn(B, 2).astype(np.float32) * 0.2,
        "l_center_angle": rng.randn(B, 2).astype(np.float32) * 0.2,
        "r_corner_angle": rng.randn(B, 8).astype(np.float32) * 0.2,
        "l_corner_angle": rng.randn(B, 8).astype(np.float32) * 0.2,
    }
    inputs_t = {k: torch.from_numpy(v) for k, v in inputs_np.items()}
    K = torch.from_numpy(np.tile(
        np.asarray([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]],
                   np.float32), (B, 1, 1)))
    with torch.no_grad():
        ref_out = tm(inputs_t, {"intrinsics": K})

    from hands_tpu.config import default_config
    from hands_tpu.models.handoccnet_light import HandOccNetNet
    from hands_tpu.utils import torch_import as ti

    cfg = default_config("handoccnet_light", compute_dtype="float32")
    assert cfg.pos_enc == "center+corner_latent" and cfg.use_grasp_loss
    net = HandOccNetNet(cfg)
    variables = ti.import_handoccnet(tm.state_dict())
    inputs_j = {
        k: jnp.asarray(v.transpose(0, 2, 3, 1) if v.ndim == 4 else v)
        for k, v in inputs_np.items()
    }
    out = net.apply(variables, inputs_j, train=False)

    for side in ("r", "l"):
        h = out[f"hmr_{side}"]
        np.testing.assert_allclose(
            np.asarray(h["shape"]),
            ref_out[f"mano.shape_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(h["cam_t.wp"]),
            ref_out[f"mano.cam_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(h["pose"]),
            ref_out[f"mano.pose_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"grasp_{side}"]),
            ref_out[f"grasp.{side}"].numpy(), atol=2e-2)
