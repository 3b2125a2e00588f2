"""Fused Pallas splat kernel vs the XLA reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hands_tpu.ops import rasterizer_pallas as rp


def _xla_reference(v2d, res, sigma):
    pix = jnp.asarray(rp._pixel_grid(res))
    p_sq = jnp.sum(pix * pix, -1)
    v_sq = jnp.sum(v2d * v2d, -1)
    cross = jnp.einsum("pc,bvc->bpv", pix, v2d)
    d2 = jnp.maximum(p_sq[None, :, None] + v_sq[:, None, :] - 2 * cross, 0.0)
    g = jnp.exp(-d2 / (2 * sigma * sigma))
    lm = jnp.sum(jnp.log1p(-jnp.clip(g, 0, 1 - 1e-6)), -1)
    return (1 - jnp.exp(lm)).reshape(v2d.shape[0], res, res)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # run the kernels in interpreter mode on CPU
    orig = jax.experimental.pallas.pallas_call
    monkeypatch.setattr(
        jax.experimental.pallas, "pallas_call",
        functools.partial(orig, interpret=True))
    # rasterizer_pallas captured pl.pallas_call at import time
    monkeypatch.setattr(rp.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def test_fused_forward_matches_xla(rng):
    res, sigma = 32, 2.0
    v2d = jnp.asarray(rng.rand(2, 50, 2) * res, jnp.float32)
    ref = _xla_reference(v2d, res, sigma)
    out = rp.splat_silhouette_fused(v2d, res, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_gradient_matches_xla(rng):
    res, sigma = 16, 2.0
    v2d = jnp.asarray(rng.rand(1, 20, 2) * res, jnp.float32)
    tgt = jnp.asarray((rng.rand(1, res, res) > 0.5).astype(np.float32))

    def loss_fused(v):
        return jnp.abs(rp.splat_silhouette_fused(v, res, sigma) - tgt).mean()

    def loss_xla(v):
        return jnp.abs(_xla_reference(v, res, sigma) - tgt).mean()

    g_fused = jax.grad(loss_fused)(v2d)
    g_xla = jax.grad(loss_xla)(v2d)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               atol=1e-6, rtol=1e-3)
