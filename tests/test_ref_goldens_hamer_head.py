"""Golden parity: the HaMeR cross-attention MANO decoder head vs the
reference's own ``src/models/hamer_light/mano_head.py`` +
``pose_transformer.py`` (torch + einops, runnable as-is). Random torch
weights are converted via ``torch_import.import_hamer_head`` and the eval
forwards must match <1e-5 — incl. the HaMeR-specific 6D decode
(geometry.py:47: contiguous halves -> matrix columns)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("einops")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests import ref_compat
from hands_tpu.models.heads.hamer_head import ManoTransformerDecoderHead
from hands_tpu.utils import torch_import as ti

pytestmark = pytest.mark.heavy


class _Cfg(dict):
    pass


def _build_reference_head(tmp_path, monkeypatch, mean_pose, mean_shape,
                          mean_cam):
    np.savez(tmp_path / "mano_mean_params.npz", pose=mean_pose,
             shape=mean_shape, cam=mean_cam)
    import os

    os.makedirs(tmp_path / "hamer/_DATA/data", exist_ok=True)
    np.savez(tmp_path / "hamer/_DATA/data/mano_mean_params.npz",
             pose=mean_pose, shape=mean_shape, cam=mean_cam)
    monkeypatch.setenv("DATA_DIR", str(tmp_path))
    ref_mod = ref_compat.load("src.models.hamer_light.mano_head")
    torch.manual_seed(0)
    tm = ref_mod.MANOTransformerDecoderHead(_Cfg())
    tm.eval()
    return tm


def test_hamer_decoder_head_matches_reference(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    mean_pose = rng.randn(96).astype(np.float32) * 0.1 \
        + np.tile([1, 0, 0, 0, 1, 0], 16).astype(np.float32)
    mean_shape = rng.randn(10).astype(np.float32) * 0.1
    mean_cam = np.asarray([0.9, 0.0, 0.0], np.float32)
    tm = _build_reference_head(tmp_path, monkeypatch, mean_pose, mean_shape,
                               mean_cam)

    feat = rng.randn(2, 1280, 16, 12).astype(np.float32)  # NCHW, ViT-H map
    with torch.no_grad():
        pred_mano, pred_cam, _ = tm(torch.from_numpy(feat))
    ref_pose = torch.cat(
        [pred_mano["global_orient"], pred_mano["hand_pose"]], dim=1).numpy()
    ref_betas = pred_mano["betas"].numpy()
    ref_cam = pred_cam.numpy()

    variables = ti.import_hamer_head(tm.state_dict())
    fm = ManoTransformerDecoderHead()
    feat_nhwc = jnp.asarray(feat.transpose(0, 2, 3, 1))
    out = fm.apply(variables, feat_nhwc, train=False)

    np.testing.assert_allclose(np.asarray(out["cam_t.wp"]), ref_cam,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["shape"]), ref_betas,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pose"]), ref_pose, atol=1e-5)


def test_import_hamer_checkpoint_includes_head(tmp_path, monkeypatch):
    """A released-format HaMeR .ckpt (backbone.* + mano_head.*) converts
    into both the ViT backbone and the decoder head trees."""
    rng = np.random.RandomState(1)
    mean = np.tile([1, 0, 0, 0, 1, 0], 16).astype(np.float32)
    tm = _build_reference_head(tmp_path, monkeypatch, mean,
                               np.zeros(10, np.float32),
                               np.asarray([0.9, 0, 0], np.float32))
    head_sd = {f"mano_head.{k}": v for k, v in tm.state_dict().items()}
    converted = ti.import_hamer_head(
        {k.replace("mano_head.", ""): v for k, v in head_sd.items()})
    assert "layer5" in converted["params"]
    assert converted["params"]["pos_embedding"].shape == (1, 1, 1024)


def test_kpe_token_embedding_matches_reference(tmp_path, monkeypatch):
    """The KPE token embedding (center+corner_latent) vs the reference's own
    PositionalEncoding module (pos_emb.py:6): sinusoidal encodings + 2-layer
    MLP, broadcast over the 16x12 token grid."""
    ref_mod = ref_compat.load("src.models.hamer_light.pos_emb")

    class Args(dict):
        def __getattr__(self, k):
            return self[k]

        def get(self, k, d=None):
            return dict.get(self, k, d)

    args = Args(pos_enc="center+corner_latent", n_freq_pos_enc=4,
                method="hamer_light")
    torch.manual_seed(5)
    tm = ref_mod.PositionalEncoding(args, feat_dim=128, patch_size=(16, 12))
    tm.eval()
    sd = tm.state_dict()

    rng = np.random.RandomState(6)
    inputs = {
        "r_center_angle": rng.randn(2, 2).astype(np.float32) * 0.2,
        "r_corner_angle": rng.randn(2, 8).astype(np.float32) * 0.2,
    }
    with torch.no_grad():
        ref_out = tm({k: torch.from_numpy(v) for k, v in inputs.items()},
                     prefix="r_").numpy()

    from hands_tpu.models.hamer_light import KpeTokenEmbed

    variables = {"params": {
        "Dense_0": {"kernel": np.asarray(sd["feat_mlp.0.weight"].numpy().T),
                    "bias": np.asarray(sd["feat_mlp.0.bias"].numpy())},
        "Dense_1": {"kernel": np.asarray(sd["feat_mlp.2.weight"].numpy().T),
                    "bias": np.asarray(sd["feat_mlp.2.bias"].numpy())},
    }}
    mod = KpeTokenEmbed(feat_dim=128, n_freq=4, n_tokens=16 * 12,
                        token_hw=(16, 12), mode="center+corner_latent")
    out = np.asarray(mod.apply(
        variables, center_angle=jnp.asarray(inputs["r_center_angle"]),
        corner_angle=jnp.asarray(inputs["r_corner_angle"])))
    np.testing.assert_allclose(out, ref_out, atol=1e-5)
