"""Tensor-parallel sharding rules (optional ``model`` mesh axis).

The workload is batch-bound (SURVEY §2.7: DP is the scaling axis; every
model fits on one chip), but ViT-H's dense projections shard cleanly for
latency-bound serving or >1 models/chip packing. The rules below implement
Megatron-style TP for the ViT blocks: column-parallel qkv / MLP-in, row-
parallel attn-proj / MLP-out — expressed purely as ``NamedSharding`` on the
parameter pytree; XLA GSPMD inserts the all-reduces over the ``model`` axis.

Works with the scan-stacked blocks (leading depth axis on every kernel).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def vit_tp_spec(name: str, ndim: int, model_axis: str = "model"):
    """Megatron TP spec (as a mutable list) for one named leaf: column-
    parallel qkv / MLP-in, row-parallel attn-proj / MLP-out, None-filled
    elsewhere. Shared by ``vit_tp_shardings`` and the FSDPxTP hybrid rule
    (parallel/fsdp.py)."""
    spec = [None] * ndim
    if name.endswith("kernel"):
        # column-parallel: split the output features
        if "qkv" in name or "mlp/Dense_0" in name or "to_kv" in name \
                or "to_q" in name:
            spec[-1] = model_axis
        # row-parallel: split the input features (partial sums ->
        # GSPMD all-reduce after the matmul)
        elif "attn/proj" in name or "mlp/Dense_1" in name \
                or "to_out" in name:
            spec[-2] = model_axis
    elif name.endswith("bias") and (
            "qkv" in name or "mlp/Dense_0" in name):
        spec[-1] = model_axis
    return spec


def vit_tp_shardings(params: Any, mesh: Mesh, model_axis: str = "model"):
    """NamedSharding pytree for ViT params: TP on block projections,
    replication elsewhere. Handles the scan depth axis transparently (specs
    are right-aligned to the array rank)."""

    def spec_for(path, x) -> NamedSharding:
        spec = vit_tp_spec(_path_str(path), x.ndim, model_axis)
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated_tree(params: Any, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: rep, params)
