"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's Lightning DDP/NCCL stack
(``/root/reference/scripts_method/train.py:61-72``, SURVEY §5.8): a
``jax.sharding.Mesh`` over ICI with batch-sharded inputs and replicated
params; XLA inserts the gradient ``psum`` inside the jitted train step, so
the reference's ``find_unused_parameters`` workaround is unnecessary (the
flag-gated losses are dense already).

The default is a 1-D ``('data',)`` mesh; model/fsdp axes can be added via
``Config.mesh_shape``/``mesh_axis_names`` for larger backbones (ViT-H shards
its params over a ``model`` axis when configured).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = len(devices) // max(known, 1)
    # an explicit shape smaller than the device count uses a prefix of the
    # devices (e.g. Config.mesh_shape=(2,) on an 8-device host)
    dev_array = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over the data axis; rest replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays onto the mesh, batch-sharded on dim 0.

    Scalars / 0-d leaves are replicated.
    """
    bsh = batch_sharding(mesh, axis)
    rep = replicated(mesh)

    def put(x):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, rep)
        return jax.device_put(x, bsh)

    return jax.tree.map(put, batch)
