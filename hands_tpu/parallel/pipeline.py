"""Pipeline parallelism (PP): GPipe-style microbatched stage execution.

The reference has no pipeline parallelism (models fit per chip, SURVEY
§2.7); this is the TPU-native primitive for when depth outgrows one chip:
split a stack of identical blocks (e.g. the scan-stacked ViT encoder) into
``S`` contiguous stages, one per device along a ``pipe`` mesh axis, and
stream ``M`` microbatches through. Activations hop stage-to-stage with
``ppermute`` (neighbour ICI hops only); the schedule is the classic GPipe
fill-drain with bubble fraction ``(S-1)/(S+M-1)``.

Everything is a single jitted ``shard_map`` program — the scan over
``S + M - 1`` ticks is compiler-visible, no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def pipeline_apply(stage_fn, stage_params, microbatches, mesh: Mesh,
                   axis: str = "pipe"):
    """Run ``microbatches`` through ``S`` pipelined stages.

    Args:
      stage_fn: ``(params_one_stage, x) -> y`` with ``y.shape == x.shape``
        (a stage = some contiguous block group; shape-preserving as in a
        transformer trunk).
      stage_params: pytree whose leaves have a leading stage axis ``S``
        (the same layout ``nn.scan`` produces), sharded over ``axis``.
      microbatches: ``(M, mb, ...)`` array of inputs, replicated.
      mesh: mesh containing ``axis`` with size ``S``.

    Returns:
      ``(M, mb, ...)`` outputs (replicated), equal to applying the ``S``
      stages serially to each microbatch.
    """
    S = mesh.shape[axis]
    M = microbatches.shape[0]
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local(params, xs):
        # this device's stage: leading axis is 1 after sharding
        p = jax.tree.map(lambda a: jnp.squeeze(a, 0), params)
        idx = jax.lax.axis_index(axis)
        # carries become device-varying after the first ppermute/set —
        # mark them varying up front so the scan carry types are stable
        zero = jax.lax.pcast(jnp.zeros_like(xs[0]), axis, to="varying")

        def tick(carry, t):
            buf, outs = carry
            # stage 0 injects microbatch t while t < M; later stages take
            # the activation that arrived over the ring
            inj = jnp.where(t < M, xs[jnp.clip(t, 0, M - 1)], zero)
            cur = jnp.where(idx == 0, inj, buf)
            y = stage_fn(p, cur)
            # the last stage completes microbatch t - (S-1)
            out_t = t - (S - 1)
            outs_upd = outs.at[jnp.clip(out_t, 0, M - 1)].set(y)
            outs = jnp.where((idx == S - 1) & (out_t >= 0), outs_upd, outs)
            buf = jax.lax.ppermute(y, axis, perm)
            return (buf, outs), None

        outs0 = jax.lax.pcast(
            jnp.zeros((M,) + xs.shape[1:], xs.dtype), axis, to="varying")
        (_, outs), _ = jax.lax.scan(
            tick, (zero, outs0), jnp.arange(S + M - 1))
        # results live on the last stage; psum replicates them
        return jax.lax.psum(jnp.where(idx == S - 1, outs, 0.0), axis)

    in_specs = (jax.tree.map(lambda _: P(axis), stage_params)
                if not isinstance(stage_params, jnp.ndarray) else P(axis),
                P())
    return shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=P())(
        stage_params, microbatches)
