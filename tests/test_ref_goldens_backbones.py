"""Golden-parity: converted torch backbone weights reproduce the reference's
own forward pass.

The reference's backbones are torch modules on disk
(``src/nets/backbone/resnet.py``, ``src/models/hamer_light/vit.py``); we
instantiate them with random weights, convert the state_dict with
``utils/torch_import.py``, and assert our Flax forward matches the torch
forward <1e-4 — the end-to-end proof that ``cli/convert_ckpt.py`` output is
usable for the reference's pretrained warm-start workflow
(``hamer_light/model.py:34-44``).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402

from tests import ref_compat  # noqa: E402
from hands_tpu.utils import torch_import as ti  # noqa: E402

pytestmark = pytest.mark.heavy


def _stub_timm():
    """Minimal timm.models.layers shims (drop_path/to_2tuple/trunc_normal_)
    so the reference ViT imports without timm; eval mode never exercises
    drop_path."""
    if "timm.models.layers" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def drop_path(x, drop_prob=0.0, training=False):
        return x

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    layers.drop_path = drop_path
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


@pytest.mark.parametrize("arch,stages", [("resnet18", (2, 2, 2, 2)),
                                         ("resnet50", (3, 4, 6, 3))])
def test_resnet_forward_matches_reference_torch(arch, stages):
    ref_resnet = ref_compat.load("src.nets.backbone.resnet")
    torch.manual_seed(0)
    tm = getattr(ref_resnet, arch)(pretrained=False).eval()
    sd = tm.state_dict()

    converted = ti.import_resnet(sd, stage_sizes=stages)

    from hands_tpu.models.backbones import resnet as frn

    fm = getattr(frn, arch)()
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    out = fm.apply({"params": converted["params"],
                    "batch_stats": converted["batch_stats"]}, jnp.asarray(x),
                   train=False)
    out = np.asarray(out)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


def test_vit_forward_matches_reference_torch():
    _stub_timm()
    ref_vit = ref_compat.load("src.models.hamer_light.vit")
    torch.manual_seed(0)
    # "tiny" config of our VIT_CONFIGS: embed 128, depth 2, heads 2, mlp x2
    tm = ref_vit.ViT(
        img_size=(64, 48), patch_size=16, embed_dim=128, depth=2,
        num_heads=2, mlp_ratio=2.0, qkv_bias=True, ratio=1,
        drop_path_rate=0.0,
    )
    tm.eval()  # reference ViT.train() override returns None (vit.py:348)
    # randomise the zero-init pos embed so the test is not trivially passing
    with torch.no_grad():
        tm.pos_embed.normal_(0, 0.02)
    sd = tm.state_dict()
    assert sd["pos_embed"].shape[1] == 4 * 3 + 1  # grid + cls token

    converted = ti.import_vit(sd, depth=2, scan=True)

    from hands_tpu.models.backbones.vit import ViTBackbone

    fm = ViTBackbone(variant="tiny")
    x = np.random.RandomState(1).rand(2, 64, 48, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)  # (B, Hp, Wp, C)

    out = np.asarray(fm.apply(converted, jnp.asarray(x), train=False))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


def test_vit_kpe_emb_matches_reference_torch():
    _stub_timm()
    ref_vit = ref_compat.load("src.models.hamer_light.vit")
    torch.manual_seed(3)
    tm = ref_vit.ViT(img_size=(64, 48), patch_size=16, embed_dim=128,
                     depth=2, num_heads=2, mlp_ratio=2.0, qkv_bias=True,
                     ratio=1, drop_path_rate=0.0)
    tm.eval()
    with torch.no_grad():
        tm.pos_embed.normal_(0, 0.02)
    converted = ti.import_vit(tm.state_dict(), depth=2, scan=True)

    from hands_tpu.models.backbones.vit import ViTBackbone

    rng = np.random.RandomState(2)
    x = rng.rand(1, 64, 48, 3).astype(np.float32)
    kpe = rng.randn(1, 12, 128).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     kpe_emb=torch.from_numpy(kpe))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)
    out = np.asarray(ViTBackbone(variant="tiny").apply(
        converted, jnp.asarray(x), kpe_emb=jnp.asarray(kpe), train=False))
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-4)


def test_convert_ckpt_cli_roundtrip(tmp_path):
    """CLI: torch file -> orbax dir -> restored tree matches the direct
    conversion (resnet18 + a ViT with pos-grid resize)."""
    ref_resnet = ref_compat.load("src.nets.backbone.resnet")
    torch.manual_seed(1)
    tm = ref_resnet.resnet18(pretrained=False)
    src = tmp_path / "resnet18.pth"
    torch.save(tm.state_dict(), src)

    from hands_tpu.cli import convert_ckpt

    out = tmp_path / "resnet18_orbax"
    convert_ckpt.main(["--src", str(src), "--arch", "resnet18",
                       "--out", str(out)])
    restored = convert_ckpt.load_orbax(str(out))
    direct = ti.import_resnet(tm.state_dict(), stage_sizes=(2, 2, 2, 2))
    for (ka, va), (kb, vb) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(restored),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(direct),
                   key=lambda t: str(t[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_convert_ckpt_vit_grid_resize(tmp_path):
    """ViTPose-format ckpt with a (4,3) grid converted to a (6,4) target:
    pos-embed bicubic-resized exactly like the reference's get_abs_pos."""
    _stub_timm()
    ref_vit = ref_compat.load("src.models.hamer_light.vit")
    torch.manual_seed(2)
    tm = ref_vit.ViT(img_size=(64, 48), patch_size=16, embed_dim=128,
                     depth=2, num_heads=2, mlp_ratio=2.0, qkv_bias=True,
                     ratio=1, drop_path_rate=0.0)
    with torch.no_grad():
        tm.pos_embed.normal_(0, 0.02)
    sd = tm.state_dict()
    converted = ti.import_vit(sd, depth=2, scan=True,
                              target_grid=(6, 4), src_grid=(4, 3))
    assert converted["params"]["pos_embed"].shape == (1, 24, 128)
    # resized grid feeds a (96, 64) input without shape errors
    from hands_tpu.models.backbones.vit import ViTBackbone

    x = jnp.zeros((1, 96, 64, 3))
    out = ViTBackbone(variant="tiny").apply(converted, x, train=False)
    assert out.shape == (1, 6, 4, 128)


def test_graft_backbone_into_models(tmp_path):
    """convert_ckpt output warm-starts real models: a reference torch
    resnet18 lands in BOTH WildHands backbones (hand + glb), a reference ViT
    in HaMeR's; grafted leaves match the conversion exactly and the model
    forward runs."""
    import numpy as np

    from hands_tpu.cli import convert_ckpt
    from hands_tpu.config import default_config
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.train.checkpoint import graft_backbone_variables

    ref_resnet = ref_compat.load("src.nets.backbone.resnet")
    torch.manual_seed(4)
    tm = ref_resnet.resnet18(pretrained=False)
    src = tmp_path / "r18.pth"
    torch.save(tm.state_dict(), src)
    out = tmp_path / "r18_orbax"
    convert_ckpt.main(["--src", str(src), "--arch", "resnet18",
                       "--out", str(out)])
    tree = convert_ckpt.load_orbax(str(out))

    from hands_tpu.models.hands_light import HandsLightModel

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        use_glb_feat=True, use_grasp_loss=False, use_render_seg_loss=False,
    )
    inputs, targets, meta = make_batch(cfg, 1, seed=0)
    model = HandsLightModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    grafted = graft_backbone_variables(variables, tree)
    for scope in ("hand_backbone", "glb_backbone"):
        np.testing.assert_array_equal(
            np.asarray(grafted["params"][scope]["conv_stem"]["kernel"]),
            np.asarray(tree["params"]["conv_stem"]["kernel"]), scope)
    pred = model(grafted, inputs, meta, train=False)
    assert np.isfinite(np.asarray(pred["mano.j3d.cam.r"])).all()

    # mismatched arch must refuse loudly
    cfg50 = cfg.replace(backbone="resnet50")
    m50 = HandsLightModel(cfg50)
    v50 = m50.init(jax.random.PRNGKey(0), inputs, meta)
    with pytest.raises(ValueError):
        graft_backbone_variables(v50, tree)
