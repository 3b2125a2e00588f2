"""On-chip golden-hunt re-run (VERDICT r2 #10): converted-checkpoint
numerics + end-to-end learning check on the real TPU.

Three legs, each printed as one line:

1. **HandOccNet converted e2e** — the reference's own torch HandOccNet
   (``src/models/handoccnet_light/model.py:17``) with random weights,
   converted via ``torch_import.import_handoccnet``, forward ON THE CHIP
   under ``jax.default_matmul_precision("float32")`` vs the torch CPU
   forward. Expect max-abs diff in the 1e-6..1e-5 class (BENCH_NOTES
   "Converted-checkpoint numerics on TPU": 2.3e-6 for the regressor).
2. **HaMeR decoder head converted** — reference
   ``src/models/hamer_light/mano_head.py`` vs
   ``ManoTransformerDecoderHead`` on chip, f32-pinned.
3. **Learning check** — 16 synthetic samples, 300 steps, bs16, bf16,
   lr 3e-4 through the full device pipeline -> model -> flag-gated losses
   -> Adam chain; total loss must drop by >10x and pix_err must be finite.

Run from the repo root (TPU by default): ``python
scripts/chip_numerics_check.py [--steps 300]``.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def check_handoccnet():
    import torch

    from tests import ref_compat
    from tests.test_ref_goldens_handoccnet import _stub_torchvision
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
    net = HandOccNetNet(cfg)
    variables = ti.import_handoccnet(tm.state_dict())
    variables = jax.device_put(variables)
    inputs_j = jax.device_put({
        k: jnp.asarray(v.transpose(0, 2, 3, 1) if v.ndim == 4 else v)
        for k, v in inputs_np.items()
    })
    with jax.default_matmul_precision("float32"):
        out = jax.jit(lambda v, x: net.apply(v, x, train=False))(
            variables, inputs_j)
    worst = 0.0
    for side in ("r", "l"):
        h = out[f"hmr_{side}"]
        for ours, ref_key in (("shape", f"mano.shape_raw.{side}"),
                              ("cam_t.wp", f"mano.cam_raw.{side}"),
                              ("pose", f"mano.pose_raw.{side}")):
            d = float(np.abs(np.asarray(h[ours])
                             - ref_out[ref_key].numpy()).max())
            worst = max(worst, d)
    print(f"handoccnet converted e2e on chip (f32 pin): "
          f"max abs diff {worst:.2e}")
    return worst


def check_hamer_head():
    import torch

    from tests import ref_compat
    from hands_tpu.models.heads.hamer_head import ManoTransformerDecoderHead
    from hands_tpu.utils import torch_import as ti

    rng = np.random.RandomState(0)
    mean_pose = rng.randn(96).astype(np.float32) * 0.1 \
        + np.tile([1, 0, 0, 0, 1, 0], 16).astype(np.float32)
    mean_shape = rng.randn(10).astype(np.float32) * 0.1
    mean_cam = np.asarray([0.9, 0.0, 0.0], np.float32)
    tmp = tempfile.mkdtemp()
    np.savez(os.path.join(tmp, "mano_mean_params.npz"), pose=mean_pose,
             shape=mean_shape, cam=mean_cam)
    os.makedirs(os.path.join(tmp, "hamer/_DATA/data"), exist_ok=True)
    np.savez(os.path.join(tmp, "hamer/_DATA/data/mano_mean_params.npz"),
             pose=mean_pose, shape=mean_shape, cam=mean_cam)
    os.environ["DATA_DIR"] = tmp
    ref_mod = ref_compat.load("src.models.hamer_light.mano_head")
    torch.manual_seed(0)
    tm = ref_mod.MANOTransformerDecoderHead(dict())
    tm.eval()

    feat = rng.randn(2, 1280, 16, 12).astype(np.float32)
    with torch.no_grad():
        pred_mano, pred_cam, _ = tm(torch.from_numpy(feat))
    ref = {
        "pose": torch.cat([pred_mano["global_orient"],
                           pred_mano["hand_pose"]], dim=1).numpy(),
        "shape": pred_mano["betas"].numpy(),
        "cam_t.wp": pred_cam.numpy(),
    }

    variables = jax.device_put(ti.import_hamer_head(tm.state_dict()))
    fm = ManoTransformerDecoderHead()
    feat_nhwc = jax.device_put(jnp.asarray(feat.transpose(0, 2, 3, 1)))
    with jax.default_matmul_precision("float32"):
        out = jax.jit(lambda v, x: fm.apply(v, x, train=False))(
            variables, feat_nhwc)
    worst = max(float(np.abs(np.asarray(out[k]) - ref[k]).max()) for k in ref)
    print(f"hamer decoder head converted on chip (f32 pin): "
          f"max abs diff {worst:.2e}")
    return worst


def learning_check(steps: int = 300):
    from hands_tpu.config import default_config
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.models.hands_light import HandsLightModel
    from hands_tpu.train.state import create_train_state
    from hands_tpu.train.step import make_eval_step, make_train_step

    cfg = default_config(
        "hands_light", backbone="resnet18", use_render_seg_loss=False,
        use_grasp_loss=False, use_glb_feat=False, lr=3e-4)
    batch = make_batch(cfg, 16, seed=0)
    model = HandsLightModel(cfg)
    inputs, _, meta_info = batch
    variables = model.init(jax.random.PRNGKey(0), inputs, meta_info)
    state = create_train_state(cfg, variables)
    step = make_train_step(model, cfg)
    state, logs0 = step(state, batch, jax.random.PRNGKey(1))
    loss0 = float(logs0["loss"])
    t0 = time.time()
    for i in range(steps - 1):
        state, logs = step(state, batch, jax.random.PRNGKey(2 + i))
    loss1 = float(logs["loss"])
    dt = time.time() - t0
    eval_step = make_eval_step(model, cfg)
    metrics, _ = eval_step(state, batch)
    pix = float(np.nanmean(np.asarray(metrics["pix_err/h"])))
    print(f"learning check: loss {loss0:.1f} -> {loss1:.2f} in {steps} "
          f"steps bs16 ({dt:.0f}s stepping), pix_err {pix:.1f} px")
    assert np.isfinite(loss1) and loss1 < loss0 / 10, (loss0, loss1)
    return loss0, loss1, pix


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--skip", nargs="*", default=[],
                   choices=["handoccnet", "hamer", "learn"])
    a = p.parse_args()
    print("devices:", jax.devices())
    if "handoccnet" not in a.skip:
        check_handoccnet()
    if "hamer" not in a.skip:
        check_hamer_head()
    if "learn" not in a.skip:
        learning_check(a.steps)
    print("CHIP NUMERICS CHECK DONE")
