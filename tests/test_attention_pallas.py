"""Parity tests for the fused MHA Pallas kernel (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hands_tpu.ops.attention_pallas import mha_fused, mha_reference


@pytest.mark.parametrize("B,N,H,D", [(2, 192, 4, 80), (1, 64, 2, 64)])
def test_mha_fused_matches_xla(B, N, H, D):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    scale = D ** -0.5
    ref = mha_reference(q, k, v, scale)
    out = mha_fused(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vit_fused_attn_flag_matches_default():
    from hands_tpu.models.backbones.vit import ViTBackbone

    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 48, 3), jnp.float32)
    fp = ViTBackbone(variant="tiny")
    params = fp.init(jax.random.PRNGKey(0), x)
    o1 = np.asarray(fp.apply(params, x))
    # interpret-mode pallas on CPU via the module flag
    import hands_tpu.ops.attention_pallas as ap

    orig = ap.mha_fused

    def interp(q, k, v, scale):
        return orig(q, k, v, scale, interpret=True)

    ap.mha_fused = interp
    try:
        o2 = np.asarray(
            ViTBackbone(variant="tiny", fused_attn=True).apply(params, x))
    finally:
        ap.mha_fused = orig
    np.testing.assert_allclose(o2, o1, atol=5e-5)
