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


def _conv(w):
    return np.asarray(w.detach().numpy()).transpose(2, 3, 1, 0)  # OIHW->HWIO


def _lin(w):
    return np.asarray(w.detach().numpy()).T


def _t(x):
    return np.asarray(x.detach().numpy())


def _convert_transformer(sd, depth, injection):
    p = {}
    for i in range(depth):
        pre = f"layers.{i}"
        blk = {
            "q_embedding": _t(sd[f"{pre}.q_embedding"]).transpose(0, 2, 3, 1),
            "k_embedding": _t(sd[f"{pre}.k_embedding"]).transpose(0, 2, 3, 1),
            "norm2": {"scale": _t(sd[f"{pre}.norm2.weight"]),
                      "bias": _t(sd[f"{pre}.norm2.bias"])},
            "Dense_0": {"kernel": _lin(sd[f"{pre}.mlp.fc1.weight"]),
                        "bias": _t(sd[f"{pre}.mlp.fc1.bias"])},
            "Dense_1": {"kernel": _lin(sd[f"{pre}.mlp.fc2.weight"]),
                        "bias": _t(sd[f"{pre}.mlp.fc2.bias"])},
        }
        names = ["encode_value", "encode_query", "encode_key"]
        if injection:
            names += ["encode_query2", "encode_key2"]
        for n in names:
            blk[n] = {"kernel": _conv(sd[f"{pre}.{n}.weight"]),
                      "bias": _t(sd[f"{pre}.{n}.bias"])}
        p[f"block{i}"] = blk
    if injection:
        p["conv1a"] = {"kernel": _conv(sd["conv1.0.weight"]),
                       "bias": _t(sd["conv1.0.bias"])}
        p["conv1b"] = {"kernel": _conv(sd["conv1.2.weight"]),
                       "bias": _t(sd["conv1.2.bias"])}
        p["conv2"] = {"kernel": _conv(sd["conv2.0.weight"]),
                      "bias": _t(sd["conv2.0.bias"])}
    return {"params": p}


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
    """Reference FPN state_dict -> Flax handoccnet FPN variables."""
    params = {}
    stats = {}
    params["conv_stem"] = {"kernel": _conv(sd["layer0.0.weight"])}
    p, s = _bn(sd, "layer0.1")
    params["bn_stem"], stats["bn_stem"] = p, s
    stage_sizes = {1: 3, 2: 4, 3: 6, 4: 3}
    for i, blocks in stage_sizes.items():
        for j in range(blocks):
            src = f"layer{i}.0.{j}"
            bp, bs = {}, {}
            for ci in range(3):
                bp[f"Conv_{ci}"] = {
                    "kernel": _conv(sd[f"{src}.conv{ci + 1}.weight"])}
                p, s = _bn(sd, f"{src}.bn{ci + 1}")
                bp[f"bn{ci + 1}"], bs[f"bn{ci + 1}"] = p, s
            if f"{src}.downsample.0.weight" in sd:
                bp["Conv_3"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])}
                p, s = _bn(sd, f"{src}.downsample.1")
                bp["bn_skip"], bs["bn_skip"] = p, s
            params[f"layer{i}_b{j}"] = bp
            stats[f"layer{i}_b{j}"] = bs
    for name in ("toplayer", "latlayer1", "latlayer2", "latlayer3",
                 "smooth2", "smooth3"):
        params[name] = {"kernel": _conv(sd[f"{name}.weight"]),
                        "bias": _t(sd[f"{name}.bias"])}
    params["gate"] = {
        "spatial_conv": {"kernel": _conv(sd["attention_module.spatial.conv.weight"])},
        "spatial_bn": {"scale": _t(sd["attention_module.spatial.bn.weight"]),
                       "bias": _t(sd["attention_module.spatial.bn.bias"])},
    }
    stats["gate"] = {
        "spatial_bn": {"mean": _t(sd["attention_module.spatial.bn.running_mean"]),
                       "var": _t(sd["attention_module.spatial.bn.running_var"])},
    }
    return {"params": params, "batch_stats": stats}


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
