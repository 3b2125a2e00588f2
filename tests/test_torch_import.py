"""Torch->Flax weight import: build a torch model, convert, check outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_resnet18_state_dict(rng):
    """Random weights in torchvision resnet18 layout (no torchvision dep)."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = torch.from_numpy(
            rng.randn(cout, cin, k, k).astype(np.float32) * 0.05)

    def bn(name, c):
        sd[name + ".weight"] = torch.from_numpy(
            rng.rand(c).astype(np.float32) + 0.5)
        sd[name + ".bias"] = torch.from_numpy(
            rng.randn(c).astype(np.float32) * 0.1)
        sd[name + ".running_mean"] = torch.from_numpy(
            rng.randn(c).astype(np.float32) * 0.1)
        sd[name + ".running_var"] = torch.from_numpy(
            rng.rand(c).astype(np.float32) + 0.5)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 64, 128, 256, 512]
    for s in range(4):
        cin, cout = chans[s], chans[s + 1]
        for b in range(2):
            pre = f"layer{s + 1}.{b}"
            conv(pre + ".conv1", cout, cin if b == 0 else cout, 3)
            bn(pre + ".bn1", cout)
            conv(pre + ".conv2", cout, cout, 3)
            bn(pre + ".bn2", cout)
            if b == 0 and cin != cout:
                conv(pre + ".downsample.0", cout, cin, 1)
                bn(pre + ".downsample.1", cout)
    return sd


def test_resnet18_import_stem_parity_and_structure():
    rng = np.random.RandomState(0)
    sd = _torch_resnet18_state_dict(rng)

    from hands_tpu.models.backbones.resnet import resnet18
    from hands_tpu.utils.torch_import import import_resnet

    variables = import_resnet(sd, stage_sizes=(2, 2, 2, 2))
    fmodel = resnet18()

    # full forward runs with converted params (structure matches exactly)
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    out = fmodel.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    assert out.shape == (1, 2, 2, 512)
    assert np.isfinite(np.asarray(out)).all()

    # stem parity vs torch functional conv+bn (validates OIHW->HWIO)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t = torch.nn.functional.conv2d(t, sd["conv1.weight"], stride=2,
                                       padding=3)
        t = torch.nn.functional.batch_norm(
            t, sd["bn1.running_mean"], sd["bn1.running_var"],
            sd["bn1.weight"], sd["bn1.bias"], training=False)
        ref = t.numpy().transpose(0, 2, 3, 1)

    import flax.linen as fnn

    stem = fnn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False)
    y = stem.apply({"params": variables["params"]["conv_stem"]},
                   jnp.asarray(x))
    p = variables["params"]["bn_stem"]
    s = variables["batch_stats"]["bn_stem"]
    y = (y - s["mean"]) / np.sqrt(s["var"] + 1e-5) * p["scale"] + p["bias"]
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4, rtol=1e-3)


def test_vit_import_matches_torch_block():
    """One transformer block with identical weights produces identical
    outputs (validates qkv/proj/mlp/norm layout conversion)."""
    C, H, N = 64, 4, 12
    torch.manual_seed(0)

    class TBlock(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(C)
            self.norm2 = torch.nn.LayerNorm(C)

            class A(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.qkv = torch.nn.Linear(C, 3 * C)
                    self.proj = torch.nn.Linear(C, C)

                def forward(self, x):
                    B, n, c = x.shape
                    qkv = self.qkv(x).reshape(B, n, 3, H, c // H)
                    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                    q = q.permute(0, 2, 1, 3); k = k.permute(0, 2, 1, 3)
                    v = v.permute(0, 2, 1, 3)
                    att = (q @ k.transpose(-2, -1)) * (c // H) ** -0.5
                    att = att.softmax(-1)
                    out = (att @ v).permute(0, 2, 1, 3).reshape(B, n, c)
                    return self.proj(out)

            class M(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.fc1 = torch.nn.Linear(C, 2 * C)
                    self.fc2 = torch.nn.Linear(2 * C, C)

                def forward(self, x):
                    return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

            self.attn = A()
            self.mlp = M()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            x = x + self.mlp(self.norm2(x))
            return x

    tb = TBlock().eval()
    sd = {f"blocks.0.{k}": v for k, v in tb.state_dict().items()}

    from hands_tpu.models.backbones.vit import Block
    from hands_tpu.utils.torch_import import import_vit

    # reuse the block converter via import_vit internals
    conv = import_vit(
        {**sd,
         "patch_embed.proj.weight": torch.zeros(C, 3, 16, 16),
         "patch_embed.proj.bias": torch.zeros(C),
         "pos_embed": torch.zeros(1, N, C),
         "last_norm.weight": torch.ones(C),
         "last_norm.bias": torch.zeros(C)},
        depth=1, scan=False)
    block_params = conv["params"]["block0"]

    x = np.random.RandomState(1).randn(2, N, C).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x)).numpy()
    fb = Block(num_heads=H, mlp_ratio=2.0)
    out = fb.apply({"params": block_params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_vit_pos_embed_grid_resize():
    """Checkpoint grid != target grid -> bicubic resize (get_abs_pos path)."""
    import numpy as np

    from hands_tpu.utils.torch_import import import_vit

    C = 32
    sd = {
        "patch_embed.proj.weight": torch.zeros(C, 3, 16, 16),
        "patch_embed.proj.bias": torch.zeros(C),
        "pos_embed": torch.arange(1 * 14 * 14 * C, dtype=torch.float32)
        .reshape(1, 14 * 14, C) / 1000,
        "last_norm.weight": torch.ones(C),
        "last_norm.bias": torch.zeros(C),
    }
    out = import_vit(sd, depth=0, scan=False, target_grid=(16, 12),
                     src_grid=(14, 14))
    assert out["params"]["pos_embed"].shape == (1, 16 * 12, C)
    assert np.isfinite(out["params"]["pos_embed"]).all()
