"""Static-calibrated int8 fused block (VERDICT r3 #1).

Covers the offline calibration machinery (sow points in
models/backbones/vit.py + ops/calibration.py) and the static W8A8 kernel
(ops/vit_block_pallas.py): pallas-interpret vs the pure-XLA twin, and
accuracy of the calibrated static path vs the bf16 block. On-chip
throughput lives in scripts/vith_int8_static_bench via BENCH_NOTES.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hands_tpu.models.backbones.vit import Block, ViTBackbone
from hands_tpu.ops import calibration as calib
from hands_tpu.ops.vit_block_pallas import (
    block_int8_static_xla, block_params_from_flax, fold_static_scales,
    vit_block_fused_int8_static)


def _mk_block(heads=2, **kw):
    return Block(num_heads=heads, mlp_ratio=2.0, dtype=jnp.bfloat16, **kw)


def _random_variables(block, x, seed=1):
    variables = block.init(jax.random.PRNGKey(0), x)
    return jax.tree.map(
        lambda p: p + jnp.asarray(
            np.random.RandomState(seed).randn(*p.shape) * 0.05, p.dtype),
        variables)


def _calibrated_scales(x, variables, heads):
    """One-batch calibration through the sow path of a single Block."""
    block = _mk_block(heads, quant_calibrate=True)
    _, mutated = block.apply(variables, x, mutable=["quant_stats"])
    qs = mutated["quant_stats"]
    amax = {
        "qkv": qs["amax_qkv"],
        "proj": qs["attn"]["amax_proj"],
        "mlp1": qs["amax_mlp1"],
        "mlp2": qs["mlp"]["amax_mlp2"],
    }
    return calib.amax_to_scales(amax)


def test_sow_amax_matches_manual_ln1():
    """The qkv-point amax must equal the per-channel max-abs of the actual
    LayerNorm-1 output (computed independently through nn.LayerNorm)."""
    rng = np.random.RandomState(0)
    B, N, C, heads = 2, 16, 128, 2
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    block = _mk_block(heads, quant_static=True)
    variables = _random_variables(block, x)

    import flax.linen as nn

    ln = nn.LayerNorm(dtype=jnp.float32)
    y = ln.apply({"params": variables["params"]["norm1"]},
                 x.astype(jnp.float32))
    manual = jnp.max(jnp.abs(y), axis=(0, 1))

    cal = _mk_block(heads, quant_calibrate=True)
    _, mutated = cal.apply(variables, x, mutable=["quant_stats"])
    sown = mutated["quant_stats"]["amax_qkv"]
    np.testing.assert_allclose(np.asarray(sown), np.asarray(manual),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("fast_gelu", [False, True])
def test_static_kernel_matches_xla_twin(fast_gelu):
    """pallas interpret vs block_int8_static_xla: same folded operands,
    same integer dots — only the bf16 attention leg can differ at
    interpreter precision."""
    rng = np.random.RandomState(0)
    B, N, C, heads = 2, 16, 128, 2
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    block = _mk_block(heads)
    variables = _random_variables(block, x)
    scales = _calibrated_scales(x, variables, heads)
    flat = block_params_from_flax(variables["params"])

    twin = block_int8_static_xla(x, flat, scales, num_heads=heads,
                                 fast_gelu=fast_gelu)
    out = vit_block_fused_int8_static(x, flat, scales, num_heads=heads,
                                      fast_gelu=fast_gelu, interpret=True)
    assert out.dtype == jnp.bfloat16
    a, b = np.asarray(twin, np.float32), np.asarray(out, np.float32)
    denom = np.maximum(np.abs(a), 1.0)
    assert np.max(np.abs(a - b) / denom) < 8e-2
    assert np.mean(np.abs(a - b)) < 1e-2


def test_static_int8_accuracy_vs_bf16_block():
    """Calibrated per-channel static scales must be at least as accurate
    as the dynamic per-token kernel on the calibration distribution
    (measured: 1.95% vs 1.91% mean error at ref scale) — and garbage
    scales must NOT be (guards against the scales being ignored)."""
    from hands_tpu.ops.vit_block_pallas import vit_block_fused_int8

    rng = np.random.RandomState(0)
    B, N, C, heads = 4, 16, 128, 2
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    block = _mk_block(heads)
    variables = _random_variables(block, x)
    ref = np.asarray(block.apply(variables, x), np.float32)

    scales = _calibrated_scales(x, variables, heads)
    flat = block_params_from_flax(variables["params"])
    out = np.asarray(
        block_int8_static_xla(x, flat, scales, num_heads=heads), np.float32)
    err_static = np.mean(np.abs(out - ref)) / np.mean(np.abs(ref))

    dyn = np.asarray(
        vit_block_fused_int8(x, flat, num_heads=heads, interpret=True),
        np.float32)
    err_dyn = np.mean(np.abs(dyn - ref)) / np.mean(np.abs(ref))
    assert err_static < 1.3 * err_dyn, (err_static, err_dyn)
    assert err_static < 0.05

    bad = {k: v * 37.0 for k, v in scales.items()}
    out_bad = np.asarray(
        block_int8_static_xla(x, flat, bad, num_heads=heads), np.float32)
    err_bad = np.mean(np.abs(out_bad - ref)) / np.mean(np.abs(ref))
    assert err_bad > 3 * err_static


def test_backbone_calibration_roundtrip():
    """Full flow on the scanned tiny backbone: calibrate() -> scales
    injected onto the stacked act_scale_* slots with the right shapes and
    strictly positive values; a second, larger-magnitude batch raises the
    running maxima (reduce_fn=max across merge_amax)."""
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)

    serve = ViTBackbone(variant="tiny", dtype=jnp.bfloat16,
                        quant_static=True)
    variables = serve.init(jax.random.PRNGKey(0), img)
    blk = variables["params"]["blocks"]["block"]
    assert blk["act_scale_qkv"].shape == (2, 128)
    assert blk["act_scale_mlp2"].shape == (2, 256)

    cal = ViTBackbone(variant="tiny", dtype=jnp.bfloat16,
                      quant_static=True, quant_calibrate=True)

    def apply_fn(v, batch):
        return cal.apply(v, batch, mutable=["quant_stats"])

    batches = [img, img * 3.0]
    params = calib.calibrate(apply_fn, variables, batches,
                             backbone_path=())
    blk = params["blocks"]["block"]
    for p, ch in (("qkv", 128), ("proj", 128), ("mlp1", 128),
                  ("mlp2", 256)):
        s = np.asarray(blk[f"act_scale_{p}"])
        assert s.shape == (2, ch)
        assert (s > 0).all()

    one = calib.calibrate(apply_fn, variables, [img], backbone_path=())
    s_one = np.asarray(one["blocks"]["block"]["act_scale_mlp2"])
    s_two = np.asarray(blk["act_scale_mlp2"])
    assert (s_two >= s_one - 1e-9).all() and (s_two > s_one).any()


def test_fold_static_scales_absorption():
    """diag(s_act) @ W absorption: dequantised static dot must equal the
    f32 matmul to int8 resolution for activations inside the calibrated
    range."""
    rng = np.random.RandomState(3)
    y = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 96).astype(np.float32) * 0.1)
    s = jnp.max(jnp.abs(y), axis=0) / 127.0 + 1e-9

    params = {
        "ln1_scale": jnp.ones(128), "ln1_bias": jnp.zeros(128),
        "wqkv": w, "bqkv": jnp.zeros(96),
        "wproj": jnp.eye(128), "bproj": jnp.zeros(128),
        "ln2_scale": jnp.ones(128), "ln2_bias": jnp.zeros(128),
        "w1": jnp.eye(128), "b1": jnp.zeros(128),
        "w2": jnp.eye(128), "b2": jnp.zeros(128),
    }
    scales = {"qkv": s, "proj": jnp.ones(128), "mlp1": jnp.ones(128),
              "mlp2": jnp.ones(128)}
    op = fold_static_scales(params, scales)
    q = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    got = jax.lax.dot_general(
        q, op["wqkv_q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * op["dqkv"]
    want = y @ w
    err = np.abs(np.asarray(got - want))
    # two symmetric-int8 roundings (act + weight): ~1% of the magnitude
    assert np.mean(err) < 0.02 * float(jnp.mean(jnp.abs(want)))
