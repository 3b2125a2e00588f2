"""Worker for the 2-process multi-host proof (VERDICT r2 #3).

Run as: python multihost_worker.py <pid> <nprocs> <coord_addr> <out_json>

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent) and
joins the process group over gloo collectives — the CPU stand-in for a
multi-host TPU pod over DCN (the reference's Lightning multi-node DDP,
scripts_method/train.py:61-72). The global batch is assembled from each
host's local shard via ``make_global_array`` and one full data-parallel
train step runs over the global mesh; process 0 dumps loss/grad_norm.
"""

import json
import sys


def main():
    pid, nprocs, coord, out_json = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # persistent compile cache: repeated suite runs skip the expensive
    # train-step compile (same policy as tests/conftest.py)
    jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from hands_tpu.parallel import distributed

    distributed.initialize(coordinator_address=coord, num_processes=nprocs,
                           process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.local_device_count() == (4 if nprocs > 1 else 8)

    import numpy as np

    # establish the gloo context with a trivial collective BEFORE the heavy
    # train-step program: context init has a 30s rendezvous deadline, and on
    # a 1-core host the two processes can reach the first collective of a
    # minutes-long program more than 30s apart (observed DEADLINE_EXCEEDED);
    # the context is keyed by the participating ranks and reused afterwards
    from jax.sharding import NamedSharding, PartitionSpec as _P
    from hands_tpu.parallel.mesh import make_mesh as _mm

    _mesh = _mm((-1,), ("data",))
    _probe = jax.make_array_from_process_local_data(
        NamedSharding(_mesh, _P("data")),
        np.ones((jax.local_device_count(),), np.float32))
    assert float(jax.jit(jnp_sum_probe := (lambda t: t.sum()))(_probe)) ==         jax.device_count()

    from hands_tpu.config import default_config
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.models.hands_light import HandsLightModel
    from hands_tpu.parallel.mesh import make_mesh
    from hands_tpu.train.state import create_train_state
    from hands_tpu.train.step import make_train_step
    from jax.sharding import PartitionSpec as P

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        use_render_seg_loss=False, use_grasp_loss=False, use_glb_feat=False,
        img_res=160, img_res_ds=160, lr=1e-3)

    GLOBAL_B = 8
    # every host builds the same deterministic global batch, then feeds ONLY
    # its own shard through make_global_array (the real data-loader contract:
    # host_shard_range -> local records -> global array)
    batch = make_batch(cfg, GLOBAL_B, seed=0, np_arrays=True)
    lo, hi = distributed.host_shard_range(GLOBAL_B)
    per_host = GLOBAL_B // nprocs
    assert (lo, hi) == (pid * per_host, (pid + 1) * per_host)

    mesh = make_mesh((-1,), ("data",))
    assert mesh.devices.size == jax.device_count()

    def to_global(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] != GLOBAL_B:
            return distributed.make_global_array(x, mesh, P())
        return distributed.make_global_array(x[lo:hi], mesh, P("data"))

    gbatch = tuple({k: to_global(v) for k, v in part.items()}
                   for part in batch)

    model = HandsLightModel(cfg)
    inputs, _, meta_info = make_batch(cfg, 2, seed=0)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta_info)
    state = create_train_state(cfg, variables)
    step = make_train_step(model, cfg, donate=False)
    state, logs = step(state, gbatch, jax.random.PRNGKey(1))
    # second step proves the updated (sharding-committed) state re-enters
    state, logs2 = step(state, gbatch, jax.random.PRNGKey(2))

    # FSDP leg (VERDICT r3 #7): the same initial state ZeRO-3-sharded over
    # the multi-host global mesh (each process materialises only its
    # addressable shards via make_array_from_callback); one train step must
    # reproduce the replicated step's loss, and the per-host param bytes
    # must be a strict shard of the total.
    from hands_tpu.parallel.fsdp import shard_bytes, shard_train_state

    state_f = create_train_state(cfg, variables)
    state_f = shard_train_state(state_f, mesh)
    fsdp_param_bytes = shard_bytes(state_f.params)
    total_param_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(variables["params"]))
    state_f, logs_f = step(state_f, gbatch, jax.random.PRNGKey(1))

    # FSDP x TP composed under the process group (VERDICT r4 #8): the full
    # stack — DCN process group x ZeRO-3 x Megatron — in one step. Mesh is
    # (data=2, model=4): with 2 processes the data axis spans the hosts
    # (gradient reduce-scatter + FSDP all-gathers ride the inter-process
    # gloo link, the DCN stand-in) while the Megatron TP collectives stay
    # within each host's 4 devices (the ICI stand-in); single-process mode
    # runs the identical (2x4) mesh on 8 local devices for loss parity.
    from jax.sharding import PartitionSpec as P

    from hands_tpu.models.hamer_light import HamerLightModel
    from hands_tpu.parallel.fsdp import fsdp_tp_shardings, place_sharded

    cfg5 = default_config(
        "hamer_light", compute_dtype="float32", use_grasp_loss=False,
        use_render_seg_loss=False, batch_size=4)
    mesh5 = make_mesh((2, 4), ("data", "model"))

    # Same 30s-rendezvous guard as the 1-D probe above, but for the NEW
    # gloo contexts this 2-D mesh needs: collectives over the data axis
    # run in cross-process PAIR groups ({0,4},{1,5},...), each of which
    # initialises its own context on first use — if that first use is
    # inside the minutes-long train program, the two processes can reach
    # it >30s apart (observed: "Gloo context initialization failed:
    # GetKeyValue() timed out"). Touch the pair groups and the full group
    # with trivial psums first; contexts are keyed by ranks and reused.
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding

    ones5 = np.ones((2, 4), np.float32)
    probe5 = jax.make_array_from_callback(
        (2, 4), NamedSharding(mesh5, P("data", "model")),
        lambda idx: ones5[idx])
    pair_sum = jax.jit(shard_map(
        lambda x: jax.lax.psum(x, "data"), mesh=mesh5,
        in_specs=P("data", "model"), out_specs=P(None, "model")))
    full_sum = jax.jit(shard_map(
        lambda x: jax.lax.psum(x, ("data", "model")), mesh=mesh5,
        in_specs=P("data", "model"), out_specs=P(None, None)))
    assert float(np.asarray(pair_sum(probe5))[0, 0]) == 2.0
    assert float(np.asarray(full_sum(probe5))[0, 0]) == 8.0

    model5 = HamerLightModel(cfg5, vit_variant="tiny")
    HB = 4
    batch5 = make_batch(cfg5, HB, seed=3, np_arrays=True)
    lo5, hi5 = distributed.host_shard_range(HB)
    inputs5, _, meta5 = make_batch(cfg5, 2, seed=3)
    v5 = model5.init(jax.random.PRNGKey(0), inputs5, meta5)
    state5 = create_train_state(cfg5, v5)
    state5 = place_sharded(
        state5, fsdp_tp_shardings(state5, mesh5, min_shard_elems=1))

    def to_global5(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] != HB:
            return distributed.make_global_array(x, mesh5, P())
        return distributed.make_global_array(x[lo5:hi5], mesh5, P("data"))

    gbatch5 = tuple({k: to_global5(v) for k, v in part.items()}
                    for part in batch5)
    step5 = make_train_step(model5, cfg5, donate=False)
    with mesh5:
        state5, logs5 = step5(state5, gbatch5, jax.random.PRNGKey(5))
    qkv5 = state5.params["backbone"]["blocks"]["block"]["attn"]["qkv"][
        "kernel"]

    result = {
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "loss": float(logs["loss"]),
        "grad_norm": float(logs["grad_norm"]),
        "loss2": float(logs2["loss"]),
        "loss_fsdp": float(logs_f["loss"]),
        "fsdp_param_bytes": fsdp_param_bytes,
        "total_param_bytes": total_param_bytes,
        "loss_fsdp_tp": float(logs5["loss"]),
        "fsdp_tp_qkv_spec": [str(s) for s in qkv5.sharding.spec],
        "fsdp_tp_param_bytes": shard_bytes(state5.params),
        "fsdp_tp_total_bytes": sum(
            l.size * l.dtype.itemsize
            for l in jax.tree.leaves(v5["params"])),
    }
    if pid == 0:
        with open(out_json, "w") as f:
            json.dump(result, f)
    print(f"[worker {pid}] {result}", flush=True)


if __name__ == "__main__":
    main()
