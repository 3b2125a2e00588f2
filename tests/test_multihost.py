"""2-process multi-host execution proof (VERDICT r2 #3).

Spawns coordinator + worker subprocesses with 4 virtual CPU devices each and
gloo collectives (the offline stand-in for a 2-host TPU pod over DCN,
replacing the reference's Lightning multi-node DDP launch,
scripts_method/train.py:61-72), runs a full data-parallel train step over
the 8-device global mesh with the global batch assembled from per-host
shards, and asserts loss/grad_norm match a single-process run."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # force CPU backend
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4"
        # both workers share the 1 core: raise the in-process communicator's
        # rendezvous kill-switch (see conftest.py) so skew is slow, not fatal
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    env["JAX_NUM_CPU_DEVICES"] = "4"
    env["PYTHONPATH"] = "/root/repo" + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    return env


_MINI_WORKER = r"""
import sys
pid, nprocs, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=coord, num_processes=nprocs,
                           process_id=pid)
assert jax.process_count() == nprocs and jax.device_count() == 8
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")),
    np.arange(pid * 4, pid * 4 + 4, dtype=np.float32))
s = jax.jit(jnp.sum)(x)
assert float(s) == 28.0, float(s)
print(f"mini-worker {pid} ok", flush=True)
"""


def test_sharded_loader_matches_single():
    """Host-shard slicing: concatenating the two hosts' local batches
    row-wise reproduces the single-host batches exactly, including tail
    padding/invalidation (drop_last both ways)."""
    from hands_tpu.config import default_config
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import DeviceDataLoader

    cfg = default_config("hands_light", use_render_seg_loss=False,
                         num_workers=0)
    ds = SyntheticRecordDataset(cfg, "train", length=10, img_hw=(64, 64))
    B = 4

    def batches(shard, drop_last):
        ld = DeviceDataLoader(ds, cfg, B, is_train=False, seed=0,
                              drop_last=drop_last, num_workers=0,
                              shard=shard)
        return list(ld._iter_batches(np.arange(len(ds))))

    for drop_last in (True, False):
        full = batches((0, 1), drop_last)
        h0 = batches((0, 2), drop_last)
        h1 = batches((1, 2), drop_last)
        assert len(full) == len(h0) == len(h1) == (2 if drop_last else 3)
        for (fs, fn), (s0, n0), (s1, n1) in zip(full, h0, h1):
            assert n0 + n1 == fn
            for k, v in fs.items():
                if isinstance(v, list):
                    continue
                cat = np.concatenate([np.asarray(s0[k]), np.asarray(s1[k])])
                np.testing.assert_array_equal(
                    cat, np.asarray(v), err_msg=f"key {k}")


def test_sharded_loader_packed_matches_single(tmp_path):
    """Same shard-slicing contract on the packed mmap fast path
    (dataset.stacked_batch), including the drop_last=False padded tail."""
    from hands_tpu.config import default_config
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import DeviceDataLoader
    from hands_tpu.data.packed import PackedRecordDataset, pack_dataset

    cfg = default_config("hands_light", use_render_seg_loss=False,
                         num_workers=0)
    base = SyntheticRecordDataset(cfg, "train", length=10, img_hw=(64, 64))
    pack_dataset(base, str(tmp_path / "packed"))
    ds = PackedRecordDataset(str(tmp_path / "packed"))
    B = 4

    def batches(shard, drop_last):
        ld = DeviceDataLoader(ds, cfg, B, is_train=False, seed=0,
                              drop_last=drop_last, num_workers=0,
                              shard=shard)
        return list(ld._iter_batches(np.arange(len(ds))))

    for drop_last in (True, False):
        full = batches((0, 1), drop_last)
        h0 = batches((0, 2), drop_last)
        h1 = batches((1, 2), drop_last)
        assert len(full) == len(h0) == len(h1)
        for (fs, fn), (s0, n0), (s1, n1) in zip(full, h0, h1):
            assert n0 + n1 == fn
            for k, v in fs.items():
                if isinstance(v, list):
                    continue
                cat = np.concatenate([np.asarray(s0[k]), np.asarray(s1[k])])
                np.testing.assert_array_equal(
                    cat, np.asarray(v), err_msg=f"key {k}")


def test_loader_shard_divisibility_guard():
    from hands_tpu.config import default_config
    from hands_tpu.data.datasets import SyntheticRecordDataset
    from hands_tpu.data.device_pipeline import DeviceDataLoader

    cfg = default_config("hands_light", use_render_seg_loss=False)
    ds = SyntheticRecordDataset(cfg, "train", length=4, img_hw=(32, 32))
    with pytest.raises(ValueError, match="not divisible"):
        DeviceDataLoader(ds, cfg, 3, is_train=True, shard=(0, 2))


def test_two_process_gloo_collective(tmp_path):
    """Fast smoke: 2 processes x 4 devices, one cross-process reduction over
    gloo. Proves jax.distributed.initialize + global-array assembly end to
    end in seconds (the full train-step proof below is the heavyweight)."""
    script = tmp_path / "mini_worker.py"
    script.write_text(_MINI_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, \
            f"mini worker {pid} failed:\n{out.decode()[-3000:]}"


@pytest.mark.heavy
@pytest.mark.parametrize("mode", ["ddp", "fsdp"])
def test_two_process_cli_train(tmp_path, mode):
    """The CLI flag wiring end to end: ``cli.train --num_processes 2
    --process_id i --coordinator_address ...`` runs a full -f epoch (train
    batch + sanity val + validate + top-k/last checkpoints) across 2
    processes x 4 devices with host-sharded loading, DDP-replicated (or
    ZeRO-3 cross-host-sharded) state, and collective orbax checkpoints."""
    script = os.path.join(os.path.dirname(__file__),
                          "multihost_cli_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = _worker_env()
    out_multi = tmp_path / "multi.json"
    extra = ["fsdp"] if mode == "fsdp" else []
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", coord, str(out_multi)]
            + extra,
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1700)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            # surface the python traceback, not the coordination-spam tail
            idx = out.find("Traceback")
            snippet = out[idx:idx + 4000] if idx >= 0 else out[-4000:]
            raise AssertionError(f"cli worker {pid} failed:\n{snippet}")

    multi = json.load(open(out_multi))
    assert multi["process_count"] == 2 and multi["device_count"] == 8
    # one -f epoch over minitrain (12 samples, global bs 8, drop_last)
    assert multi["step"] == 1
    assert np.isfinite(multi["params_l2"]) and multi["params_l2"] > 0


def test_two_process_train_step_matches_single(tmp_path):
    script = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = _worker_env()
    out_multi = tmp_path / "multi.json"
    out_single = tmp_path / "single.json"

    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", coord, str(out_multi)],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1700)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    # single-process reference: same worker, 1 process, 8 local devices
    env1 = _worker_env()
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env1["JAX_NUM_CPU_DEVICES"] = "8"
    p = subprocess.run(
        [sys.executable, script, "0", "1", coord, str(out_single)],
        env=env1, cwd="/root/repo", capture_output=True, timeout=1700)
    assert p.returncode == 0, p.stdout.decode()[-4000:]

    multi = json.load(open(out_multi))
    single = json.load(open(out_single))
    assert multi["process_count"] == 2 and multi["device_count"] == 8
    assert single["process_count"] == 1 and single["device_count"] == 8
    np.testing.assert_allclose(multi["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(multi["grad_norm"], single["grad_norm"],
                               rtol=1e-5)
    # step 2 compounds the tiny cross-topology psum reduction-order
    # rounding through the Adam update; step 1 pins the strict bound
    np.testing.assert_allclose(multi["loss2"], single["loss2"], rtol=1e-4)
    # the optimiser state really advanced between the two steps
    assert multi["loss2"] != multi["loss"]
    # FSDP under multi-host (VERDICT r3 #7): identical first-step loss with
    # ZeRO-3-sharded state, and each host holds a strict param shard
    np.testing.assert_allclose(multi["loss_fsdp"], multi["loss"], rtol=1e-5)
    assert multi["fsdp_param_bytes"] < multi["total_param_bytes"]
    np.testing.assert_allclose(single["loss_fsdp"], single["loss"],
                               rtol=1e-5)
    # FSDP x TP composed under the process group (VERDICT r4 #8): the same
    # (2x4) data-x-model HaMeR step must produce the identical loss whether
    # the data axis spans the two processes (gloo/DCN) or stays local, the
    # qkv kernel must really be Megatron-sharded, and each host must hold a
    # strict shard of the hybrid-placed params
    np.testing.assert_allclose(multi["loss_fsdp_tp"],
                               single["loss_fsdp_tp"], rtol=1e-5)
    assert "model" in multi["fsdp_tp_qkv_spec"], multi["fsdp_tp_qkv_spec"]
    assert multi["fsdp_tp_param_bytes"] < multi["fsdp_tp_total_bytes"]
