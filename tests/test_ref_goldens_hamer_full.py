"""Golden parity: the FULL HaMeR model (ViT-H backbone at full depth-32 /
1280-dim scale + KPE feat_mlp + double kpe-add + transformer-decoder MANO
head + grasp classifier, reference ``src/models/hamer_light/model.py:19``)
vs HamerNet with converted random weights.

Heavy (~0.5 TFLOP forward on 1 CPU core, ~631M-param conversion): gated
behind ``HT_HEAVY=1`` so the default suite stays fast. Run manually:

    HT_HEAVY=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python -m pytest tests/test_ref_goldens_hamer_full.py -x -q
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("einops")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests import ref_compat
from hands_tpu.config import default_config
from hands_tpu.utils import torch_import as ti

pytestmark = [pytest.mark.heavy, pytest.mark.skipif(
    os.environ.get("HT_HEAVY") != "1",
    reason="full-size ViT-H golden; set HT_HEAVY=1 to run")]


def _lin(sd, k):
    return {"kernel": np.asarray(sd[f"{k}.weight"].detach().numpy().T),
            "bias": np.asarray(sd[f"{k}.bias"].detach().numpy())}


def test_hamer_full_model_matches_reference(tmp_path, monkeypatch):
    from tests.test_ref_goldens_backbones import _stub_timm
    from tests.test_ref_goldens_hands_trunk import Args, _stub_blocked_modules

    _stub_timm()
    _stub_blocked_modules()
    # MANO mean params consumed by the reference head ctor (mano_head.py:197)
    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "hamer/_DATA/data", exist_ok=True)
    np.savez(tmp_path / "hamer/_DATA/data/mano_mean_params.npz",
             pose=(rng.randn(96).astype(np.float32) * 0.1
                   + np.tile([1, 0, 0, 0, 1, 0], 16).astype(np.float32)),
             shape=rng.randn(10).astype(np.float32) * 0.1,
             cam=np.asarray([0.9, 0.0, 0.0], np.float32))
    monkeypatch.setenv("DATA_DIR", str(tmp_path))

    ref_model_mod = ref_compat.load("src.models.hamer_light.model")
    args = Args(pos_enc="center+corner_latent", n_freq_pos_enc=4,
                method="hamer_light", pretrained="none",
                use_grasp_loss=True, use_render_seg_loss=False)
    torch.manual_seed(0)
    tm = ref_model_mod.HAMER(args, 1000.0, 224)
    tm.eval()

    B = 1
    inputs_np = {
        "r_img": rng.randn(B, 3, 224, 224).astype(np.float32),
        "l_img": rng.randn(B, 3, 224, 224).astype(np.float32),
        "r_center_angle": rng.randn(B, 2).astype(np.float32) * 0.2,
        "l_center_angle": rng.randn(B, 2).astype(np.float32) * 0.2,
        "r_corner_angle": rng.randn(B, 8).astype(np.float32) * 0.2,
        "l_corner_angle": rng.randn(B, 8).astype(np.float32) * 0.2,
    }
    K = torch.from_numpy(np.tile(
        np.asarray([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]],
                   np.float32), (B, 1, 1)))
    with torch.no_grad():
        ref_out = tm({k: torch.from_numpy(v) for k, v in inputs_np.items()},
                     {"intrinsics": K})
    # the stub MANOHead leaks its rotmat input: already
    # cat([global_orient, hand_pose]) per model.py:112
    ref_pose = {s: ref_out[f"mano.pose_raw.{s}"].numpy() for s in ("r", "l")}

    params = {
        "backbone": ti.import_vit(
            tm.backbone.state_dict(), depth=32, scan=True)["params"],
        "mano_head": ti.import_hamer_head(
            tm.mano_head.state_dict())["params"],
        "kpe": {"Dense_0": _lin(tm.kpe.state_dict(), "feat_mlp.0"),
                "Dense_1": _lin(tm.kpe.state_dict(), "feat_mlp.2")},
        "grasp_classifier": {
            f"Dense_{i}": _lin(tm.grasp_classifier.state_dict(), str(j))
            for i, j in enumerate((0, 2, 4, 6))
        },
    }

    from hands_tpu.models.hamer_light import HamerNet

    cfg = default_config("hamer_light", compute_dtype="float32")
    assert cfg.pos_enc == "center+corner_latent" and cfg.use_grasp_loss
    net = HamerNet(cfg, vit_variant="h")
    inputs_j = {
        k: jnp.asarray(v.transpose(0, 2, 3, 1) if v.ndim == 4 else v)
        for k, v in inputs_np.items()
    }
    out = net.apply({"params": params}, inputs_j, train=False)

    for side in ("r", "l"):
        h = out[f"hmr_{side}"]
        np.testing.assert_allclose(
            np.asarray(h["shape"]),
            ref_out[f"mano.shape_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(h["cam_t.wp"]),
            ref_out[f"mano.cam_raw.{side}"].numpy(), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(h["pose"]), ref_pose[side], atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out[f"grasp_{side}"]),
            ref_out[f"grasp.{side}"].numpy(), atol=2e-2)
