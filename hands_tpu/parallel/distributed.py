"""Multi-host (DCN) initialisation + per-host data sharding.

The TPU equivalent of Lightning's multi-node DDP launch: one process per
host, ``jax.distributed.initialize`` wires the DCN mesh, and every jitted
step already written against a ``Mesh`` runs unchanged — global batch dims
span all hosts' devices; each host feeds its addressable shard.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Wire the process group (no-op for single-process). On Cloud TPU pods
    the arguments are auto-detected from the metadata server."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def initialize_from_config(cfg):
    """CLI entry helper: wire the process group from Config flags
    (``--num_processes/--process_id/--coordinator_address``) BEFORE any
    device use, and share rank 0's experiment key so every host writes the
    same ``logs/<key>`` tree (collective orbax checkpoints require it).
    Returns the (possibly updated) cfg. No-op for single-process runs."""
    if cfg.num_processes <= 1:
        return cfg
    initialize(cfg.coordinator_address or None, cfg.num_processes,
               cfg.process_id)
    print(f"multi-host: process {jax.process_index()}/"
          f"{jax.process_count()}, {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")
    if not cfg.exp_key and not cfg.resume_ckpt:
        from jax.experimental import multihost_utils

        from hands_tpu.utils.experiment import generate_exp_key

        key = generate_exp_key() if jax.process_index() == 0 else "0" * 9
        arr = multihost_utils.broadcast_one_to_all(
            np.frombuffer(key.encode(), dtype=np.uint8))
        cfg = cfg.replace(exp_key=np.asarray(arr).tobytes().decode())
    return cfg


def host_shard_range(global_batch: int) -> tuple[int, int]:
    """[start, end) of the global batch this host must load."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return start, start + per_host


def make_global_array(host_batch: np.ndarray, mesh, pspec):
    """Assemble a globally-sharded array from this host's local shard
    (jax.make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, pspec), host_batch
    )


def shard_batch_global(batch, mesh, axis: str = "data"):
    """Per-host local batch pytree -> globally batch-sharded jax arrays.

    Each host passes ONLY its own rows (``host_shard_range`` of the global
    batch); dim 0 is sharded over ``axis``, 0-d leaves are replicated. The
    multi-host analogue of ``parallel.mesh.shard_batch`` (the reference's
    DDP per-rank batch split, scripts_method/train.py:61-72).
    """
    from jax.sharding import PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        return make_global_array(x, mesh, P() if x.ndim == 0 else P(axis))

    return jax.tree.map(put, batch)


def replicate_tree_global(tree, mesh):
    """Host-local pytree (same value on every host) -> globally-replicated
    jax arrays — DDP-style param/optimizer placement over the global mesh."""
    from jax.sharding import PartitionSpec as P

    return jax.tree.map(
        lambda x: make_global_array(np.asarray(x), mesh, P()), tree)


def gather_to_host(tree):
    """Fetch a pytree of (possibly non-addressable) global arrays to host
    numpy on EVERY process — a collective: all processes must call it.
    Used for single-writer checkpointing and metric aggregation."""
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: np.asarray(multihost_utils.process_allgather(
            x, tiled=True)) if isinstance(x, jax.Array) else x, tree)
