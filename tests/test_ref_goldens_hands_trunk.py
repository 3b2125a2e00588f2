"""Golden parity: the full WildHands perception trunk vs the reference's
own ``src/models/hands_light/model.py``.

The two blocked third-party imports are stubbed (a fake MANOHead that leaks
its pre-decode inputs side-suffixed, a dummy MANORenderer, pytorch3d's
public 6D functions), everything else — both backbones, the sinusoidal KPE
encodings, the latent concat with the global-feature ADD, feature_conv,
both HandHMR heads, the grasp classifier — runs the reference code with
random torch weights converted into the Flax net; forwards match <1e-3
(bf16-free f32 path, tolerance dominated by the resnet BN chain)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests import ref_compat
from tests.test_ref_goldens_hmr_head import _stub_pytorch3d, _convert_hand_hmr
from hands_tpu.config import default_config
from hands_tpu.utils import torch_import as ti

pytestmark = pytest.mark.heavy


class Args(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def get(self, k, d=None):
        return dict.get(self, k, d)


def _stub_blocked_modules():
    _stub_pytorch3d()
    ref_compat._ensure_path()
    # no egress: force pretrained=False in the reference resnet factories
    resnet_mod = ref_compat.load("src.nets.backbone.resnet")
    if not getattr(resnet_mod, "_offline_patched", False):
        for name in ("resnet18", "resnet50"):
            orig = getattr(resnet_mod, name)

            def make(fn):
                def wrapper(pretrained=False, progress=True, **kw):
                    return fn(pretrained=False, progress=progress, **kw)
                return wrapper

            setattr(resnet_mod, name, make(orig))
        resnet_mod._offline_patched = True
    if "src.nets.hand_heads.mano_head" not in sys.modules:
        import torch.nn as tnn

        mod = types.ModuleType("src.nets.hand_heads.mano_head")

        class MANOHead(tnn.Module):
            def __init__(self, is_rhand, focal_length, img_res):
                super().__init__()
                self.side = "r" if is_rhand else "l"

            def forward(self, rotmat, shape, K, cam):
                xdict = ref_compat.load("common.xdict").xdict
                s = self.side
                return xdict({f"pose_raw.{s}": rotmat, f"shape_raw.{s}": shape,
                              f"cam_raw.{s}": cam})

        mod.MANOHead = MANOHead
        sys.modules["src.nets.hand_heads.mano_head"] = mod
    if "src.models.hands_light.renderer" not in sys.modules:
        mod = types.ModuleType("src.models.hands_light.renderer")

        class MANORenderer:
            def __init__(self, *a, **k):
                pass

        mod.MANORenderer = MANORenderer
        sys.modules["src.models.hands_light.renderer"] = mod


def _lin(sd, k):
    return {"kernel": np.asarray(sd[f"{k}.weight"].detach().numpy().T),
            "bias": np.asarray(sd[f"{k}.bias"].detach().numpy())}


def _convert_trunk(sd):
    return ti.import_hands_trunk(sd, backbone="resnet18")


@pytest.mark.parametrize("glb_w_grasp", [True, False])
def test_hands_trunk_matches_reference(glb_w_grasp):
    _stub_blocked_modules()
    ref_model_mod = ref_compat.load("src.models.hands_light.model")
    args = Args(
        backbone="resnet18", pos_enc="center+corner_latent",
        n_freq_pos_enc=4, separate_hands=False, tf_decoder=False,
        use_glb_feat=True, use_grasp_loss=True,
        use_glb_feat_w_grasp=glb_w_grasp, use_render_seg_loss=False,
        use_depth_loss=False, no_crops=False, regress_center_corner=False,
        img_res=224, focal_length=1000.0,
    )
    torch.manual_seed(0)
    tm = ref_model_mod.HandsLight("resnet18", 1000.0, 224, args)
    tm.eval()
    sd = tm.state_dict()

    rng = np.random.RandomState(1)
    B = 2
    inputs_t = {
        "img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "l_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "l_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "r_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
        "l_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
    }
    K = torch.from_numpy(
        np.tile(np.asarray([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]],
                           np.float32), (B, 1, 1)))
    meta_t = {"intrinsics": K, "is_flipped": torch.zeros(B)}
    with torch.no_grad():
        ref_out = tm(inputs_t, meta_t)

    from hands_tpu.models.hands_light import HandsLightNet

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        use_glb_feat=True, use_grasp_loss=True,
        use_glb_feat_w_grasp=glb_w_grasp,
        use_render_seg_loss=False, use_depth_loss=False,
    )
    net = HandsLightNet(cfg)
    variables = _convert_trunk(sd)
    inputs_j = {
        "img": jnp.asarray(inputs_t["img"].numpy().transpose(0, 2, 3, 1)),
        "r_img": jnp.asarray(inputs_t["r_img"].numpy().transpose(0, 2, 3, 1)),
        "l_img": jnp.asarray(inputs_t["l_img"].numpy().transpose(0, 2, 3, 1)),
        "r_center_angle": jnp.asarray(inputs_t["r_center_angle"].numpy()),
        "l_center_angle": jnp.asarray(inputs_t["l_center_angle"].numpy()),
        "r_corner_angle": jnp.asarray(inputs_t["r_corner_angle"].numpy()),
        "l_corner_angle": jnp.asarray(inputs_t["l_corner_angle"].numpy()),
    }
    out = net.apply(variables, inputs_j, train=False)

    # tolerance: the trunk is 2x resnet18 (38 BN+conv layers) + 3-iter
    # refinement; XLA-vs-torch conv/BN accumulation differences compound to
    # ~1e-4 at the features and ~2e-3 after the Gram-Schmidt pose decode
    for side in ("r", "l"):
        np.testing.assert_allclose(
            np.asarray(out[f"hmr_{side}"]["pose"]),
            ref_out[f"mano.pose_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"hmr_{side}"]["shape"]),
            ref_out[f"mano.shape_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"hmr_{side}"]["cam_t.wp"]),
            ref_out[f"mano.cam_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"grasp_{side}"]),
            ref_out[f"grasp.{side}"].numpy(), atol=5e-3)


def test_hands_trunk_tf_decoder_matches_reference():
    """The tf_decoder trunk variant: spatial features + KPE skip
    feature_conv and feed the transformer refinement heads directly with
    use_pool=False (model.py:312-321); import_hands_trunk auto-detects the
    tf head weights."""
    _stub_blocked_modules()
    ref_model_mod = ref_compat.load("src.models.hands_light.model")
    args = Args(
        backbone="resnet18", pos_enc="center+corner_latent",
        n_freq_pos_enc=4, separate_hands=False, tf_decoder=True,
        use_glb_feat=True, use_grasp_loss=True,
        use_glb_feat_w_grasp=False, use_render_seg_loss=False,
        use_depth_loss=False, no_crops=False, regress_center_corner=False,
        img_res=224, focal_length=1000.0,
    )
    torch.manual_seed(3)
    tm = ref_model_mod.HandsLight("resnet18", 1000.0, 224, args)
    tm.eval()

    rng = np.random.RandomState(4)
    B = 2
    inputs_t = {
        "img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "l_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "l_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "r_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
        "l_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
    }
    K = torch.from_numpy(
        np.tile(np.asarray([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]],
                           np.float32), (B, 1, 1)))
    with torch.no_grad():
        ref_out = tm(inputs_t, {"intrinsics": K, "is_flipped": torch.zeros(B)})

    from hands_tpu.models.hands_light import HandsLightNet

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        tf_decoder=True, use_glb_feat=True, use_grasp_loss=True,
        use_glb_feat_w_grasp=False, use_render_seg_loss=False,
        use_depth_loss=False,
    )
    net = HandsLightNet(cfg)
    variables = ti.import_hands_trunk(tm.state_dict(), backbone="resnet18")
    inputs_j = {
        k: jnp.asarray(v.numpy().transpose(0, 2, 3, 1)
                       if v.ndim == 4 else v.numpy())
        for k, v in inputs_t.items()
    }
    out = net.apply(variables, inputs_j, train=False)

    for side in ("r", "l"):
        np.testing.assert_allclose(
            np.asarray(out[f"hmr_{side}"]["pose"]),
            ref_out[f"mano.pose_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"hmr_{side}"]["shape"]),
            ref_out[f"mano.shape_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"hmr_{side}"]["cam_t.wp"]),
            ref_out[f"mano.cam_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"grasp_{side}"]),
            ref_out[f"grasp.{side}"].numpy(), atol=5e-3)


@pytest.mark.parametrize("pos_enc", [
    "center", "corner", "center+corner", "dense",
    "sinusoidal_cc", "dense_latent", "cam_conv",
])
def test_hands_trunk_pos_enc_modes_match_reference(pos_enc):
    """Every other KPE mode vs the reference: input-concat variants rebuild
    conv1 with extra encoding channels (model.py:60-78), latent variants
    concat at the feature map (model.py:240-307) — incl. the dim-3
    sin/cos interleave of dense encodings (model.py:444-453) and the
    align_corners=True double resize (model.py:240-246, 481)."""
    _stub_blocked_modules()
    ref_model_mod = ref_compat.load("src.models.hands_light.model")
    args = Args(
        backbone="resnet18", pos_enc=pos_enc, n_freq_pos_enc=4,
        separate_hands=False, tf_decoder=False, use_glb_feat=True,
        use_grasp_loss=False, use_glb_feat_w_grasp=False,
        use_render_seg_loss=False, use_depth_loss=False, no_crops=False,
        regress_center_corner=False, img_res=224, img_res_ds=224,
        focal_length=1000.0,
    )
    torch.manual_seed(5)
    tm = ref_model_mod.HandsLight("resnet18", 1000.0, 224, args)
    tm.eval()

    rng = np.random.RandomState(6)
    B = 2
    dense_c = 6 if pos_enc == "cam_conv" else 2
    inputs_t = {
        "img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "l_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "l_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "r_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
        "l_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
        "r_dense_angle": torch.from_numpy(
            rng.randn(B, dense_c, 28, 28).astype(np.float32) * 0.2),
        "l_dense_angle": torch.from_numpy(
            rng.randn(B, dense_c, 28, 28).astype(np.float32) * 0.2),
        "r_dense_mask": torch.from_numpy(
            (rng.rand(B, 28, 28) > 0.2).astype(np.float32)),
        "l_dense_mask": torch.from_numpy(
            (rng.rand(B, 28, 28) > 0.2).astype(np.float32)),
    }
    K = torch.from_numpy(
        np.tile(np.asarray([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]],
                           np.float32), (B, 1, 1)))
    with torch.no_grad():
        ref_out = tm(inputs_t, {"intrinsics": K, "is_flipped": torch.zeros(B)})

    from hands_tpu.models.hands_light import HandsLightNet

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        pos_enc=pos_enc, img_res_ds=224, use_glb_feat=True,
        use_grasp_loss=False, use_glb_feat_w_grasp=False,
        use_render_seg_loss=False, use_depth_loss=False,
    )
    net = HandsLightNet(cfg)
    variables = ti.import_hands_trunk(tm.state_dict(), backbone="resnet18")

    def to_j(v):
        a = v.numpy()
        if a.ndim == 4:
            a = a.transpose(0, 2, 3, 1)
        return jnp.asarray(a)

    inputs_j = {k: to_j(v) for k, v in inputs_t.items()}
    out = net.apply(variables, inputs_j, train=False)

    for side in ("r", "l"):
        for key, ref_key in (("pose", "pose_raw"), ("shape", "shape_raw"),
                             ("cam_t.wp", "cam_raw")):
            np.testing.assert_allclose(
                np.asarray(out[f"hmr_{side}"][key]),
                ref_out[f"mano.{ref_key}.{side}"].numpy(), atol=5e-3,
                err_msg=f"{pos_enc} {side} {key}")


def test_hands_trunk_aux_heads_match_reference():
    """Depth decoder (coord-grid broadcast + align_corners upsamples,
    model.py:132-154/436-442) and center/corner regression heads
    (model.py:161-175) vs the reference, converted via import_hands_trunk."""
    _stub_blocked_modules()
    ref_model_mod = ref_compat.load("src.models.hands_light.model")
    args = Args(
        backbone="resnet18", pos_enc="center+corner_latent",
        n_freq_pos_enc=4, separate_hands=False, tf_decoder=False,
        use_glb_feat=True, use_grasp_loss=False, use_glb_feat_w_grasp=False,
        use_render_seg_loss=False, use_depth_loss=True, no_crops=False,
        regress_center_corner=True, img_res=224, focal_length=1000.0,
    )
    torch.manual_seed(7)
    tm = ref_model_mod.HandsLight("resnet18", 1000.0, 224, args)
    tm.eval()

    rng = np.random.RandomState(8)
    B = 2
    inputs_t = {
        "img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "l_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "l_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "r_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
        "l_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
    }
    K = torch.from_numpy(
        np.tile(np.asarray([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]],
                           np.float32), (B, 1, 1)))
    with torch.no_grad():
        ref_out = tm(inputs_t, {"intrinsics": K, "is_flipped": torch.zeros(B)})

    from hands_tpu.models.hands_light import HandsLightNet

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        use_glb_feat=True, use_grasp_loss=False, use_glb_feat_w_grasp=False,
        use_render_seg_loss=False, use_depth_loss=True,
        regress_center_corner=True,
    )
    net = HandsLightNet(cfg)
    variables = ti.import_hands_trunk(tm.state_dict(), backbone="resnet18")
    inputs_j = {
        k: jnp.asarray(v.numpy().transpose(0, 2, 3, 1)
                       if v.ndim == 4 else v.numpy())
        for k, v in inputs_t.items()
    }
    out = net.apply(variables, inputs_j, train=False)

    for side in ("r", "l"):
        np.testing.assert_allclose(
            np.asarray(out[f"depth_{side}"]),
            ref_out[f"depth.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"center_{side}"]),
            ref_out[f"center.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"corner_{side}"]),
            ref_out[f"corner.{side}"].numpy(), atol=5e-3)


def test_hands_trunk_separate_hands_matches_reference():
    """separate_hands=True: per-side crop backbones (model.py:69-78),
    auto-detected by import_hands_trunk."""
    _stub_blocked_modules()
    ref_model_mod = ref_compat.load("src.models.hands_light.model")
    args = Args(
        backbone="resnet18", pos_enc="center+corner_latent",
        n_freq_pos_enc=4, separate_hands=True, tf_decoder=False,
        use_glb_feat=True, use_grasp_loss=False, use_glb_feat_w_grasp=False,
        use_render_seg_loss=False, use_depth_loss=False, no_crops=False,
        regress_center_corner=False, img_res=224, focal_length=1000.0,
    )
    torch.manual_seed(9)
    tm = ref_model_mod.HandsLight("resnet18", 1000.0, 224, args)
    tm.eval()

    rng = np.random.RandomState(10)
    B = 2
    inputs_t = {
        "img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "l_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "l_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "r_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
        "l_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
    }
    K = torch.from_numpy(
        np.tile(np.asarray([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]],
                           np.float32), (B, 1, 1)))
    with torch.no_grad():
        ref_out = tm(inputs_t, {"intrinsics": K, "is_flipped": torch.zeros(B)})

    from hands_tpu.models.hands_light import HandsLightNet

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        separate_hands=True, use_glb_feat=True, use_grasp_loss=False,
        use_glb_feat_w_grasp=False, use_render_seg_loss=False,
        use_depth_loss=False,
    )
    net = HandsLightNet(cfg)
    variables = ti.import_hands_trunk(tm.state_dict(), backbone="resnet18")
    inputs_j = {
        k: jnp.asarray(v.numpy().transpose(0, 2, 3, 1)
                       if v.ndim == 4 else v.numpy())
        for k, v in inputs_t.items()
    }
    out = net.apply(variables, inputs_j, train=False)
    for side in ("r", "l"):
        np.testing.assert_allclose(
            np.asarray(out[f"hmr_{side}"]["pose"]),
            ref_out[f"mano.pose_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"hmr_{side}"]["cam_t.wp"]),
            ref_out[f"mano.cam_raw.{side}"].numpy(), atol=5e-3)


def test_hands_trunk_no_crops_matches_reference():
    """no_crops=True (the arctic_sf_light shape): heads consume the
    avg-pooled GLOBAL features, use_pool=True (model.py:199-201, 316-318)."""
    _stub_blocked_modules()
    ref_model_mod = ref_compat.load("src.models.hands_light.model")
    args = Args(
        backbone="resnet18", pos_enc=None, n_freq_pos_enc=4,
        separate_hands=False, tf_decoder=False, use_glb_feat=True,
        use_grasp_loss=True, use_glb_feat_w_grasp=False,
        use_render_seg_loss=False, use_depth_loss=False, no_crops=True,
        regress_center_corner=False, img_res=224, focal_length=1000.0,
    )
    torch.manual_seed(11)
    tm = ref_model_mod.HandsLight("resnet18", 1000.0, 224, args)
    tm.eval()

    rng = np.random.RandomState(12)
    B = 2
    inputs_t = {
        "img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
    }
    K = torch.from_numpy(
        np.tile(np.asarray([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]],
                           np.float32), (B, 1, 1)))
    with torch.no_grad():
        ref_out = tm(inputs_t, {"intrinsics": K, "is_flipped": torch.zeros(B)})

    from hands_tpu.models.hands_light import HandsLightNet

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        pos_enc=None, no_crops=True, use_glb_feat=True, use_grasp_loss=True,
        use_glb_feat_w_grasp=False, use_render_seg_loss=False,
        use_depth_loss=False,
    )
    net = HandsLightNet(cfg)
    variables = ti.import_hands_trunk(tm.state_dict(), backbone="resnet18")
    inputs_j = {"img": jnp.asarray(
        inputs_t["img"].numpy().transpose(0, 2, 3, 1))}
    out = net.apply(variables, inputs_j, train=False)

    for side in ("r", "l"):
        np.testing.assert_allclose(
            np.asarray(out[f"hmr_{side}"]["pose"]),
            ref_out[f"mano.pose_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"hmr_{side}"]["cam_t.wp"]),
            ref_out[f"mano.cam_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"grasp_{side}"]),
            ref_out[f"grasp.{side}"].numpy(), atol=5e-3)


@pytest.mark.parametrize("pos_enc", [None, "pcl", "perspective_correction"])
def test_hands_trunk_postprocess_flip_matches_reference(pos_enc):
    """The post-head fixes in the reference's exact order (model.py:330-376):
    pcl virtual-camera rot fix, the axis-angle flip swap (is_flipped mixed
    across the batch), then the perspective-correction global-orient
    rotation on the POST-flip poses."""
    _stub_blocked_modules()
    ref_model_mod = ref_compat.load("src.models.hands_light.model")
    args = Args(
        backbone="resnet18", pos_enc=pos_enc, n_freq_pos_enc=4,
        separate_hands=False, tf_decoder=False, use_glb_feat=False,
        use_grasp_loss=False, use_glb_feat_w_grasp=False,
        use_render_seg_loss=False, use_depth_loss=False, no_crops=False,
        regress_center_corner=False, img_res=224, focal_length=1000.0,
    )
    torch.manual_seed(13)
    tm = ref_model_mod.HandsLight("resnet18", 1000.0, 224, args)
    tm.eval()

    rng = np.random.RandomState(14)
    B = 2
    from hands_tpu.core import rot as rotlib

    rots_r = np.asarray(rotlib.axis_angle_to_matrix(
        jnp.asarray(rng.randn(B, 3) * 0.3)))
    rots_l = np.asarray(rotlib.axis_angle_to_matrix(
        jnp.asarray(rng.randn(B, 3) * 0.3)))
    inputs_t = {
        "img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "l_img": torch.from_numpy(rng.randn(B, 3, 224, 224).astype(np.float32)),
        "r_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "l_center_angle": torch.from_numpy(rng.randn(B, 2).astype(np.float32) * 0.2),
        "r_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
        "l_corner_angle": torch.from_numpy(rng.randn(B, 8).astype(np.float32) * 0.2),
        "r_rot": torch.from_numpy(rots_r.astype(np.float32)),
        "l_rot": torch.from_numpy(rots_l.astype(np.float32)),
    }
    K = torch.from_numpy(
        np.tile(np.asarray([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]],
                           np.float32), (B, 1, 1)))
    is_flipped = torch.tensor([1.0, 0.0])
    with torch.no_grad():
        ref_out = tm(inputs_t, {"intrinsics": K, "is_flipped": is_flipped})

    from hands_tpu.models.hands_light import HandsLightNet, postprocess_hmr

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        pos_enc=pos_enc, use_glb_feat=False, use_grasp_loss=False,
        use_glb_feat_w_grasp=False, use_render_seg_loss=False,
        use_depth_loss=False,
    )
    net = HandsLightNet(cfg)
    variables = ti.import_hands_trunk(tm.state_dict(), backbone="resnet18")

    def to_j(v):
        a = v.numpy()
        return jnp.asarray(a.transpose(0, 2, 3, 1) if a.ndim == 4 else a)

    inputs_j = {k: to_j(v) for k, v in inputs_t.items()}
    meta_j = {"is_flipped": jnp.asarray([1.0, 0.0])}
    out = net.apply(variables, inputs_j, train=False)
    hmr_r, hmr_l = postprocess_hmr(
        cfg, inputs_j, meta_j, out["hmr_r"], out["hmr_l"])

    for side, hmr in (("r", hmr_r), ("l", hmr_l)):
        np.testing.assert_allclose(
            np.asarray(hmr["pose"]),
            ref_out[f"mano.pose_raw.{side}"].numpy(), atol=5e-3,
            err_msg=f"{pos_enc} {side} pose")
        np.testing.assert_allclose(
            np.asarray(hmr["cam_t.wp"]),
            ref_out[f"mano.cam_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(hmr["shape"]),
            ref_out[f"mano.shape_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(hmr["cam_t.wp.init"]),
            ref_out[f"mano.cam_t.wp.init.{side}"].numpy(), atol=5e-3)
