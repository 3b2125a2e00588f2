"""Fully-sharded data parallelism (ZeRO-3) over a mesh axis.

The reference scales via Lightning DDP only — replicated parameters with a
gradient all-reduce (``/root/reference/scripts_method/train.py:61-72``,
SURVEY §2.7). On TPU the memory-bound regime is served instead by FSDP:
every parameter (and its Adam moments) lives *sharded* over the data axis,
and XLA GSPMD inserts just-in-time per-layer all-gathers in the
forward/backward plus reduce-scatters for the gradients — collectives ride
ICI and overlap with compute. For ViT-H (672M params) this turns the
per-chip optimiser footprint from ~6.7 GB replicated f32 state (params +
Adam mu/nu) into ~6.7/N GB, which is what lets big-batch training fit
alongside activations on 16 GB v5e chips.

Everything is expressed as ``NamedSharding`` on the existing pytrees — no
model or train-step changes. The spec for a leaf is a pure function of its
shape, so the *same* rule applied to ``TrainState`` automatically gives the
Adam ``mu``/``nu`` trees the shardings of their matching params (identical
shapes), replicates scalars (``step``, Adam ``count``), and replicates
small leaves (BatchNorm stats, biases) where sharding would only add
collective latency.
"""

from __future__ import annotations

import math
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this stay replicated: gathering a 5 KB bias costs
# more in collective latency than its shard saves in HBM.
MIN_SHARD_ELEMS = 2 ** 14


def fsdp_spec(shape, mesh: Mesh, axis: str = "data",
              min_shard_elems: int = MIN_SHARD_ELEMS) -> P:
    """PartitionSpec for one array shape: shard the largest dimension that
    divides the axis size; replicate scalars/small/indivisible arrays.
    Ties prefer the trailing dimension; rank>=3 leaves avoid their leading
    (scan depth) axis when a feature axis is available.
    """
    n = mesh.shape[axis]
    if n <= 1 or not shape or math.prod(shape) < min_shard_elems:
        return P()
    divisible = [i for i in range(len(shape)) if shape[i] % n == 0]
    if len(shape) >= 3 and len(divisible) > 1 and 0 in divisible:
        # rank>=3 leaves are scan-stacked block params (leading depth axis,
        # backbones/vit.py): sharding depth would make every scan step's
        # dynamic-slice a cross-device fetch, so prefer a feature axis
        divisible.remove(0)
    if not divisible:
        return P()
    best = max(divisible, key=lambda i: (shape[i], i))
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_shardings(tree: Any, mesh: Mesh, axis: str = "data",
                   min_shard_elems: int = MIN_SHARD_ELEMS):
    """NamedSharding pytree for any state tree (params, opt_state, full
    TrainState) — shape-driven, see ``fsdp_spec``."""

    def one(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, fsdp_spec(shape, mesh, axis,
                                             min_shard_elems))

    return jax.tree.map(one, tree)


def fsdp_tp_shardings(tree: Any, mesh: Mesh, data_axis: str = "data",
                      model_axis: str = "model",
                      min_shard_elems: int = MIN_SHARD_ELEMS):
    """Hybrid ZeRO-3 x Megatron shardings over a 2-D (data, model) mesh
    (VERDICT r3 #7: the realistic big-model layout, composed).

    Per leaf: the TP rule claims its Megatron dimension first
    (``parallel/sharding.py::vit_tp_spec`` — matched by parameter path, so
    it applies identically to Adam ``mu``/``nu`` whose subtrees mirror the
    param names); then the FSDP shape rule shards the largest remaining
    dimension divisible by the data-axis size. Scalars / small leaves stay
    replicated as in ``fsdp_spec``.
    """
    from hands_tpu.parallel.sharding import _path_str, vit_tp_spec

    n = mesh.shape[data_axis]

    def spec_for(path, x):
        shape = getattr(x, "shape", ())
        spec = vit_tp_spec(_path_str(path), len(shape), model_axis)
        if n > 1 and shape and math.prod(shape) >= min_shard_elems:
            divisible = [i for i in range(len(shape))
                         if spec[i] is None and shape[i] % n == 0]
            if len(shape) >= 3 and len(divisible) > 1 and 0 in divisible:
                divisible.remove(0)  # scan depth axis, see fsdp_spec
            if divisible:
                best = max(divisible, key=lambda i: (shape[i], i))
                spec[best] = data_axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def place_sharded(tree, shardings):
    """Place a host-value pytree with the given sharding pytree. Works under
    multi-host too: each process materialises only its addressable shards
    (``make_array_from_callback``; ``device_put`` cannot target
    non-addressable devices from host values — every process must hold the
    identical full host value, which init-by-same-PRNGKey guarantees)."""
    if jax.process_count() > 1:
        import numpy as np

        def put(x, sh):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: np.asarray(x[idx]))

        return jax.tree.map(put, tree, shardings)
    return jax.device_put(tree, shardings)


def shard_train_state(state, mesh: Mesh, axis: str = "data"):
    """Place a ``TrainState`` with FSDP shardings (params + Adam moments
    sharded, scalars/batch_stats replicated)."""
    return place_sharded(state, fsdp_shardings(state, mesh, axis))


def shard_bytes(tree: Any) -> int:
    """Per-device addressable bytes of a placed pytree (diagnostics)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards") and leaf.addressable_shards:
            s = leaf.addressable_shards[0]
            total += s.data.size * leaf.dtype.itemsize
    return total
