"""Golden parity: the tf_decoder HMR refinement vs the reference's own
``hand_hmr.py`` + the vendored no_norm transformer fork
(``src/models/hands_light/transformer.py``). Random torch weights convert
into the Flax head; eval forwards must match <1e-4."""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests import ref_compat
from tests.test_ref_goldens_hmr_head import _stub_pytorch3d
from hands_tpu.models.heads.hmr import HandHMR

pytestmark = pytest.mark.heavy


def _lin(sd, k):
    return np.asarray(sd[f"{k}.weight"].detach().numpy().T), \
        np.asarray(sd[f"{k}.bias"].detach().numpy())


def _mha(sd, pre):
    return {
        "in_proj_kernel": np.asarray(
            sd[f"{pre}.in_proj_weight"].detach().numpy().T),
        "in_proj_bias": np.asarray(
            sd[f"{pre}.in_proj_bias"].detach().numpy()),
        "out_proj": {
            "kernel": np.asarray(
                sd[f"{pre}.out_proj.weight"].detach().numpy().T),
            "bias": np.asarray(
                sd[f"{pre}.out_proj.bias"].detach().numpy()),
        },
    }


def _convert_tf_hand_hmr(sd):
    p = {}
    for i, src in enumerate(("cam_init.0", "cam_init.2", "cam_init.4")):
        w, b = _lin(sd, src)
        p[f"Dense_{i}"] = {"kernel": w, "bias": b}
    w, b = _lin(sd, "cam_init_precursor.0")
    p["Dense_3"] = {"kernel": w, "bias": b}
    hl = {}
    for dst, src in (("vector_mlp_dense", "hmr_layer.vector_mlp.0"),
                     ("feat_mlp_dense", "hmr_layer.feat_mlp.0"),
                     ("dec_linear1", "hmr_layer.refine_decoder.layers.0.linear1"),
                     ("dec_linear2", "hmr_layer.refine_decoder.layers.0.linear2"),
                     ("enc_linear1", "hmr_layer.self_attn.layers.0.linear1"),
                     ("enc_linear2", "hmr_layer.self_attn.layers.0.linear2")):
        w, b = _lin(sd, src)
        hl[dst] = {"kernel": w, "bias": b}
    hl["dec_self_attn"] = _mha(sd, "hmr_layer.refine_decoder.layers.0.self_attn")
    hl["dec_cross_attn"] = _mha(sd, "hmr_layer.refine_decoder.layers.0.multihead_attn")
    hl["enc_self_attn"] = _mha(sd, "hmr_layer.self_attn.layers.0.self_attn")
    for key, src in (("dec_pose_6d", "hmr_layer.decoders.pose_6d"),
                     ("dec_cam_t_wp", "hmr_layer.decoders.cam_t/wp"),
                     ("dec_shape", "hmr_layer.decoders.shape")):
        w, b = _lin(sd, src)
        hl[key] = {"kernel": w, "bias": b}
    p["tf_hmr_layer"] = hl
    return {"params": p}


def test_tf_decoder_hand_hmr_matches_reference():
    _stub_pytorch3d()
    ref_mod = ref_compat.load("src.nets.hand_heads.hand_hmr")
    torch.manual_seed(0)
    feat_dim = 64
    args = types.SimpleNamespace(pos_enc=None, n_freq_pos_enc=4)
    tm = ref_mod.HandHMR(feat_dim, is_rhand=True, n_iter=3, tf_decoder=True,
                         args=args)
    tm.eval()
    sd = tm.state_dict()

    rng = np.random.RandomState(1)
    feat = rng.randn(2, feat_dim, 7, 7).astype(np.float32)  # NCHW spatial
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(feat), use_pool=False)

    fm = HandHMR(feat_dim=feat_dim, n_iter=3, tf_decoder=True)
    variables = _convert_tf_hand_hmr(sd)
    feat_nhwc = jnp.asarray(feat.transpose(0, 2, 3, 1))
    out = fm.apply(variables, feat_nhwc, train=False)

    np.testing.assert_allclose(np.asarray(out["cam_t.wp.init"]),
                               ref_out["cam_t.wp.init"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["cam_t.wp"]),
                               ref_out["cam_t.wp"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["shape"]),
                               ref_out["shape"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pose"]),
                               ref_out["pose"].numpy(), atol=1e-4)
