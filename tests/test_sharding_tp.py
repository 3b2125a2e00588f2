"""Tensor-parallel ViT sharding on a 2x4 (data x model) CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hands_tpu.models.backbones.vit import ViTBackbone
from hands_tpu.parallel.mesh import make_mesh
from hands_tpu.parallel.sharding import vit_tp_shardings


def test_vit_tp_matches_replicated(devices):
    mesh = make_mesh((2, 4), ("data", "model"), devices=devices)
    vit = ViTBackbone(variant="tiny", dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 64, 48, 3), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)["params"]

    ref = vit.apply({"params": params}, x)

    shardings = vit_tp_shardings(params, mesh)
    params_tp = jax.device_put(params, shardings)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))

    # confirm the qkv kernel is actually model-sharded
    qkv = params_tp["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec[-1] == "model"

    fwd = jax.jit(lambda p, x: vit.apply({"params": p}, x))
    with mesh:
        out = fwd(params_tp, x_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vit_tp_backward_matches_replicated(devices):
    """TP gradient path (VERDICT round-1 #9): 2-device ('data','model')
    mesh, full fwd+bwd through the tiny ViT with TP shardings; grads must
    match the replicated run. 2 devices = fewest collective rendezvous
    points, which the virtual CPU backend handles reliably."""
    mesh = make_mesh((1, 2), ("data", "model"), devices=devices[:2])
    vit = ViTBackbone(variant="tiny", dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 48, 3), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)["params"]

    def loss_fn(p, x):
        out = vit.apply({"params": p}, x)
        return jnp.sum(out ** 2) / out.size

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, x)

    shardings = vit_tp_shardings(params, mesh)
    params_tp = jax.device_put(params, shardings)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    grad_fn = jax.jit(jax.value_and_grad(loss_fn),
                      out_shardings=(NamedSharding(mesh, P()), shardings))
    with mesh:
        loss_tp, grads_tp = grad_fn(params_tp, x_sharded)
    np.testing.assert_allclose(float(loss_tp), float(ref_loss), rtol=1e-6)
    for (ka, ga), (kb, gb) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(ref_grads),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(grads_tp),
                   key=lambda t: str(t[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   atol=1e-5, rtol=1e-4, err_msg=str(ka))


def test_tp_shard_shapes(devices):
    """Local shard of a column-parallel kernel holds 1/4 of the features."""
    mesh = make_mesh((2, 4), ("data", "model"), devices=devices)
    vit = ViTBackbone(variant="tiny", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 48, 3))
    params = vit.init(jax.random.PRNGKey(0), x)["params"]
    shardings = vit_tp_shardings(params, mesh)
    qkv = jax.device_put(params["blocks"]["block"]["attn"]["qkv"]["kernel"],
                         shardings["blocks"]["block"]["attn"]["qkv"]["kernel"])
    full = qkv.shape[-1]
    local = qkv.addressable_shards[0].data.shape[-1]
    assert local == full // 4
