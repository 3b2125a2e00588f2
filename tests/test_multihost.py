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
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
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
