"""W8A8 int8 conv serving path (ops/quant.py + resnet quant_int8).

Functional/accuracy coverage on CPU; on-chip throughput is measured by
``scripts/conv_int8_probe.py`` / ``bench.py --model hands_light --int8``
(BENCH_NOTES.md).
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_int8_conv_close_to_f32():
    from jax import lax

    from hands_tpu.ops.quant import int8_conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 14, 14, 32) * 0.8, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 32, 64) * 0.05, jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = int8_conv(x, w, (1, 1), "SAME")
    ref, out = np.asarray(ref), np.asarray(out)
    cos = (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.999, cos
    assert np.abs(ref - out).max() < 0.05 * np.abs(ref).std() * 10


def test_int8conv_param_compatible_with_nn_conv():
    """Same param name/shape/init tree as nn.Conv so any checkpoint
    (incl. converted torchvision weights) loads into either module."""
    import flax.linen as nn

    from hands_tpu.ops.quant import Int8Conv

    x = jnp.zeros((1, 8, 8, 16))
    kw = dict(features=32, kernel_size=(3, 3), strides=(2, 2),
              padding=[(1, 1), (1, 1)], use_bias=False)
    v_ref = nn.Conv(**kw).init(jax.random.PRNGKey(0), x)
    v_q = Int8Conv(**kw).init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v_ref) == jax.tree.structure(v_q)
    assert v_ref["params"]["kernel"].shape == v_q["params"]["kernel"].shape
    # identical init stream -> identical values
    np.testing.assert_array_equal(np.asarray(v_ref["params"]["kernel"]),
                                  np.asarray(v_q["params"]["kernel"]))


def test_resnet_quant_int8_forward_and_params_match():
    """resnet50(quant_int8=True): identical variables tree (same ckpts
    load), close outputs, finite."""
    from hands_tpu.models.backbones.resnet import resnet50

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64, 3) * 0.5, jnp.float32)
    m_f = resnet50()
    m_q = resnet50(quant_int8=True)
    v = m_f.init(jax.random.PRNGKey(0), x)
    v_q = m_q.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(v_q)

    y_f = np.asarray(m_f.apply(v, x))
    y_q = np.asarray(m_q.apply(v, x))  # same weights v: drop-in serving
    assert np.all(np.isfinite(y_q)) and y_q.shape == y_f.shape
    cos = (y_f * y_q).sum() / (
        np.linalg.norm(y_f) * np.linalg.norm(y_q) + 1e-12)
    assert cos > 0.98, cos


def test_handoccnet_fpn_int8_forward():
    """HandOccNet FPN trunk under quant_int8: identical variables tree,
    close gated-feature outputs with the SAME params."""
    from hands_tpu.models.handoccnet_light import FPN

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 128, 128, 3) * 0.5, jnp.float32)
    m_f = FPN()
    m_q = FPN(quant_int8=True)
    v = m_f.init(jax.random.PRNGKey(0), x)
    assert (jax.tree.structure(v)
            == jax.tree.structure(m_q.init(jax.random.PRNGKey(0), x)))
    p_f, _ = m_f.apply(v, x)
    p_q, _ = m_q.apply(v, x)
    p_f, p_q = np.asarray(p_f), np.asarray(p_q)
    assert np.all(np.isfinite(p_q)) and p_q.shape == p_f.shape
    cos = (p_f * p_q).sum() / (
        np.linalg.norm(p_f) * np.linalg.norm(p_q) + 1e-12)
    assert cos > 0.98, cos


def test_hands_light_int8_serving_forward():
    """Full WildHands forward with Config.quant_int8: runs, finite, and
    close to the f32-conv forward with the SAME params."""
    from hands_tpu.config import default_config
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.models.hands_light import HandsLightModel

    # img_res must be 224: FeatureConv's two VALID 3x3 convs need the 7x7
    # backbone map (smaller inputs collapse it to zero spatial size)
    kw = dict(backbone="resnet18", compute_dtype="float32",
              use_render_seg_loss=False, use_grasp_loss=False)
    cfg = default_config("hands_light", **kw)
    cfg_q = default_config("hands_light", quant_int8=True, **kw)
    inputs, _, meta = make_batch(cfg, 2, seed=0)
    model = HandsLightModel(cfg)
    model_q = HandsLightModel(cfg_q)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    out = model(variables, inputs, meta, train=False)
    out_q = model_q(variables, inputs, meta, train=False)

    j = np.asarray(out["mano.j3d.cam.r"])
    jq = np.asarray(out_q["mano.j3d.cam.r"])
    assert np.all(np.isfinite(jq))
    # root-relative drift in metres: int8 serving stays at mm level even
    # on random weights (trained weights are friendlier)
    drift = np.abs((j - j[:, :1]) - (jq - jq[:, :1])).max()
    assert drift < 0.05, drift
