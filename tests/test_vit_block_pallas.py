"""Fused ViT-block Pallas kernel (ops/vit_block_pallas.py) parity vs the
XLA Block at bf16 resolution (interpreter mode on CPU; the on-chip
measurement lives in scripts/vith_mfu_ablation.py + BENCH_NOTES.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from hands_tpu.models.backbones.vit import Block, ViTBackbone
from hands_tpu.ops.vit_block_pallas import (
    block_math, block_params_from_flax, vit_block_fused)


def _run_math(x, variables, heads, fast_gelu=False):
    p = {k: (v.astype(jnp.float32) if k.startswith("ln")
             else v.astype(jnp.bfloat16))
         for k, v in block_params_from_flax(variables["params"]).items()}
    return block_math(
        x, p["ln1_scale"], p["ln1_bias"], p["wqkv"], p["bqkv"],
        p["wproj"], p["bproj"], p["ln2_scale"], p["ln2_bias"],
        p["w1"], p["b1"], p["w2"], p["b2"],
        num_heads=heads, fast_gelu=fast_gelu)


def _mk_block(fused: bool, heads=2, fast_gelu=False):
    return Block(num_heads=heads, mlp_ratio=2.0, dtype=jnp.bfloat16,
                 fast_gelu=fast_gelu, fused_block=fused)


@pytest.mark.parametrize("B,N,C,heads", [(2, 16, 128, 2), (3, 24, 256, 4)])
def test_block_math_matches_xla_block_exactly(B, N, C, heads):
    """The kernel body is composed of exactly the ops/rounding points the
    Flax Block emits: zero tolerance."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    block = _mk_block(False, heads)
    variables = block.init(jax.random.PRNGKey(0), x)
    # perturb params away from init (LN scale 1 / bias 0 hides bugs)
    variables = jax.tree.map(
        lambda p: p + jnp.asarray(
            np.random.RandomState(1).randn(*p.shape) * 0.05, p.dtype),
        variables)
    ref = block.apply(variables, x)
    out = _run_math(x, variables, heads)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))


@pytest.mark.parametrize("B,N,C,heads", [(2, 16, 128, 2)])
def test_kernel_matches_xla_block(B, N, C, heads):
    """Through pallas_call in interpreter mode: validates the grid/BlockSpec
    plumbing. The interpreter evaluates dots at slightly different internal
    precision than compiled XLA, so the bound is a few bf16 ulps (the math
    itself is exact — see test_block_math_matches_xla_block_exactly)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    block = _mk_block(False, heads)
    variables = block.init(jax.random.PRNGKey(0), x)
    variables = jax.tree.map(
        lambda p: p + jnp.asarray(
            np.random.RandomState(1).randn(*p.shape) * 0.05, p.dtype),
        variables)
    ref = block.apply(variables, x)
    out = vit_block_fused(
        x, block_params_from_flax(variables["params"]), num_heads=heads,
        interpret=True)
    assert out.dtype == jnp.bfloat16
    a, b = np.asarray(ref, np.float32), np.asarray(out, np.float32)
    denom = np.maximum(np.abs(a), 1.0)
    # the interpreter accumulates bf16-output dots in bf16 (the real MXU
    # accumulates f32), so the bound here is loose; precision is pinned by
    # the exact-math test above and the on-chip run (BENCH_NOTES.md)
    assert np.max(np.abs(a - b) / denom) < 8e-2
    assert np.mean(np.abs(a - b)) < 1e-2


def test_kernel_fast_gelu_variant():
    rng = np.random.RandomState(2)
    B, N, C, heads = 2, 16, 128, 2
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    block = _mk_block(False, heads, fast_gelu=True)
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)
    out = vit_block_fused(
        x, block_params_from_flax(variables["params"]), num_heads=heads,
        fast_gelu=True, interpret=True)
    assert np.max(np.abs(np.asarray(ref, np.float32) -
                         np.asarray(out, np.float32))) < 2e-2


def test_int8_fast_gelu_combo_close_to_bf16():
    """The fastest serving combo (int8 dots + tanh GELU — bench.py
    --model hamer_vith --int8 --fast_gelu, 944 crops/s on-chip): both
    lossy knobs together stay statistically close to the bf16 kernel with
    the same knobs."""
    from hands_tpu.ops.vit_block_pallas import vit_block_fused_int8

    rng = np.random.RandomState(11)
    C, heads, N, B = 128, 2, 16, 4
    block = _mk_block(False, heads, fast_gelu=True)
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(0), x)
    params = block_params_from_flax(variables["params"])
    ref = np.asarray(vit_block_fused(
        x, params, num_heads=heads, fast_gelu=True, interpret=True),
        np.float32)
    out = np.asarray(vit_block_fused_int8(
        x, params, num_heads=heads, fast_gelu=True, interpret=True),
        np.float32)
    err = np.abs(ref - out)
    assert err.max() < 0.15 * max(ref.std(), 1e-3), (err.max(), ref.std())
    cos = (ref * out).sum() / (
        np.linalg.norm(ref) * np.linalg.norm(out) + 1e-12)
    assert cos > 0.999, cos


def test_batch_tiling_consistency():
    """Grid over batch tiles must not change results (B=4 -> TB=4; B=2 ->
    TB=2; B=1 -> TB=1)."""
    rng = np.random.RandomState(3)
    N, C, heads = 16, 128, 2
    block = _mk_block(False, heads)
    x4 = jnp.asarray(rng.randn(4, N, C) * 0.5, jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(0), x4)
    p = block_params_from_flax(variables["params"])
    full = vit_block_fused(x4, p, num_heads=heads, interpret=True)
    for b in (1, 2):
        part = vit_block_fused(x4[:b], p, num_heads=heads, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(part, np.float32), np.asarray(full[:b], np.float32))


@pytest.mark.parametrize("use_scan", [False, True])
def test_through_vit_backbone(use_scan):
    """fused_block=True through the full (tiny) backbone — incl. the
    scan-stacked path, where Block reads its params from the sliced scan
    subtree."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.bfloat16)
    kw = dict(variant="tiny", dtype=jnp.bfloat16, use_scan=use_scan)
    vit_ref = ViTBackbone(**kw)
    variables = vit_ref.init(jax.random.PRNGKey(0), x)
    ref = vit_ref.apply(variables, x)

    vit_fused = ViTBackbone(fused_block=True, **kw)
    with pltpu.force_tpu_interpret_mode():
        out = vit_fused.apply(variables, x)
    a, b = np.asarray(ref, np.float32), np.asarray(out, np.float32)
    denom = np.maximum(np.abs(a), 1.0)
    assert np.max(np.abs(a - b) / denom) < 3e-2


def test_mosaic_gelu_matches_exact():
    """_gelu_mosaic (erf via A&S 7.1.26, f32) vs jax.nn.gelu exact on bf16:
    <=1 bf16 ulp anywhere on the practical activation range."""
    from hands_tpu.ops.vit_block_pallas import _gelu_mosaic

    x = jnp.asarray(np.linspace(-8, 8, 8192), jnp.bfloat16)
    ref = jax.nn.gelu(x, approximate=False).astype(np.float32)
    out = np.asarray(_gelu_mosaic(x, fast=False), np.float32)
    ref = np.asarray(ref)
    # <=1 bf16 ulp wherever the output is non-negligible; below 1e-2 the
    # approximation error (<6e-7 absolute, A&S bound x |x|/2) is far under
    # activation noise but can exceed the ulp of a denormal-scale output
    sig = np.abs(ref) > 1e-2
    # bf16 has 7 fraction bits: ulp(v) ~ |v| * 2^-7
    ulp = np.abs(ref[sig]) * 2.0**-7
    assert np.max(np.abs(ref[sig] - out[sig]) / ulp) <= 1.0 + 1e-6
    assert np.max(np.abs(ref[~sig] - out[~sig])) < 1e-5
    # fast variant is literally the tanh gelu
    np.testing.assert_array_equal(
        np.asarray(_gelu_mosaic(x, fast=True), np.float32),
        np.asarray(jax.nn.gelu(x, approximate=True), np.float32))


def test_int8_kernel_close_to_bf16_kernel():
    """W8A8 variant (per-output-channel weight scales + per-token dynamic
    activation scales, int8 MXU dots): lossy by construction, so the bound
    is statistical — near-unit cosine and max error a small fraction of the
    activation scale. On-chip figures in BENCH_NOTES.md (1.49x/block)."""
    from hands_tpu.ops.vit_block_pallas import vit_block_fused_int8

    rng = np.random.RandomState(7)
    C, heads, hidden, N, B = 128, 2, 256, 16, 4
    params = {
        "ln1_scale": jnp.ones(C) + 0.05, "ln1_bias": jnp.zeros(C) + 0.02,
        "wqkv": jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.float32),
        "bqkv": jnp.asarray(rng.randn(3 * C) * 0.02, jnp.float32),
        "wproj": jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32),
        "bproj": jnp.asarray(rng.randn(C) * 0.02, jnp.float32),
        "ln2_scale": jnp.ones(C) - 0.03, "ln2_bias": jnp.zeros(C),
        "w1": jnp.asarray(rng.randn(C, hidden) * 0.05, jnp.float32),
        "b1": jnp.asarray(rng.randn(hidden) * 0.02, jnp.float32),
        "w2": jnp.asarray(rng.randn(hidden, C) * 0.05, jnp.float32),
        "b2": jnp.asarray(rng.randn(C) * 0.02, jnp.float32),
    }
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    ref = np.asarray(
        vit_block_fused(x, params, num_heads=heads, interpret=True),
        np.float32)
    out = np.asarray(
        vit_block_fused_int8(x, params, num_heads=heads, interpret=True),
        np.float32)
    assert out.dtype == np.float32 and out.shape == ref.shape
    err = np.abs(ref - out)
    assert err.max() < 0.12 * ref.std(), (err.max(), ref.std())
    cos = (ref * out).sum() / (
        np.linalg.norm(ref) * np.linalg.norm(out) + 1e-12)
    assert cos > 0.999, cos


def test_int8_through_vit_backbone():
    """quant_int8 + fused_block selects the W8A8 kernel through the
    scan-stacked backbone; output stays close to the fp path."""
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.bfloat16)
    kw = dict(variant="tiny", dtype=jnp.bfloat16, use_scan=True)
    vit_ref = ViTBackbone(**kw)
    variables = vit_ref.init(jax.random.PRNGKey(0), x)
    ref = vit_ref.apply(variables, x)

    vit_q = ViTBackbone(fused_block=True, quant_int8=True, **kw)
    with pltpu.force_tpu_interpret_mode():
        out = vit_q.apply(variables, x)
    a, b = np.asarray(ref, np.float32), np.asarray(out, np.float32)
    denom = np.maximum(np.abs(a), 1.0)
    # two blocks of quantisation noise on top of bf16 resolution
    assert np.max(np.abs(a - b) / denom) < 8e-2
    assert np.mean(np.abs(a - b)) < 2e-2


def test_trainable_fused_block_grads_match_xla():
    """vit_block_fused_trainable: forward = the Pallas kernel, backward =
    XLA's own gradients via the bit-identical block_math recompute. Grads
    wrt params and x must match the plain Flax Block's."""
    from hands_tpu.ops.vit_block_pallas import vit_block_fused_trainable

    rng = np.random.RandomState(9)
    B, N, C, heads = 2, 16, 128, 2
    x = jnp.asarray(rng.randn(B, N, C) * 0.5, jnp.bfloat16)
    block = _mk_block(False, heads)
    variables = block.init(jax.random.PRNGKey(0), x)
    variables = jax.tree.map(
        lambda p: p + jnp.asarray(
            np.random.RandomState(1).randn(*p.shape) * 0.05, p.dtype),
        variables)
    cot = jnp.asarray(rng.randn(B, N, C) * 0.1, jnp.float32)

    def loss_ref(v, x):
        out = block.apply(v, x).astype(jnp.float32)
        return jnp.sum(out * cot)

    def loss_fused(v, x):
        out = vit_block_fused_trainable(
            x, block_params_from_flax(v["params"]), heads, False, True
        ).astype(jnp.float32)
        return jnp.sum(out * cot)

    gref_v, gref_x = jax.grad(loss_ref, argnums=(0, 1))(variables, x)
    gfus_v, gfus_x = jax.grad(loss_fused, argnums=(0, 1))(variables, x)
    def close(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        # the two backward graphs compute the same math but XLA schedules
        # their bf16 dot accumulations differently -> a few-ulp noise floor
        # (same caveat as block_math's docstring); structure/scale bugs
        # show up orders of magnitude above this
        scale = max(np.abs(a).max(), 1e-3)
        assert np.max(np.abs(a - b)) <= 0.04 * scale, \
            (np.max(np.abs(a - b)), scale)
        assert np.mean(np.abs(a - b)) <= 4e-3 * scale

    jax.tree.map(close, gref_v, gfus_v)
    close(gref_x, gfus_x)


def test_trainable_fused_block_through_backbone_grad():
    """Grad flows through the scan-stacked backbone with fused_block on
    (the custom VJP acts as block-granular remat — no nn.remat needed)."""
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.bfloat16)
    kw = dict(variant="tiny", dtype=jnp.bfloat16, use_scan=True)
    vit_ref = ViTBackbone(**kw)
    variables = vit_ref.init(jax.random.PRNGKey(0), x)
    vit_fused = ViTBackbone(fused_block=True, **kw)

    def loss(mod, v):
        return jnp.sum(mod.apply(v, x).astype(jnp.float32) ** 2)

    gref = jax.grad(lambda v: loss(vit_ref, v))(variables)
    with pltpu.force_tpu_interpret_mode():
        gfus = jax.grad(lambda v: loss(vit_fused, v))(variables)
    # primals differ by kernel ulps -> grads differ slightly through the
    # squared loss; bound is loose but catches wiring/structure bugs
    ra = jax.tree.leaves(gref)
    rb = jax.tree.leaves(gfus)
    assert len(ra) == len(rb)
    for a, b in zip(ra, rb):
        a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
        denom = max(np.abs(a).max(), 1e-3)
        assert np.max(np.abs(a - b)) / denom < 6e-2
