"""Test config: run everything on an 8-device virtual CPU mesh.

The axon TPU plugin registers itself from ``sitecustomize`` at interpreter
startup and sets ``jax_platforms="axon,cpu"``. Tests need the virtual CPU
mesh (8 devices, float32 matmuls, no tunnel latency), so before any backend
is initialised we point the platform selection back at CPU and request 8
host devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # 1-core host: replica threads can reach a collective >40s apart, which
    # trips the in-process communicator's kill-switch (rendezvous.cc);
    # raise the watchdog so oversubscription is slow, not fatal
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated suite runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/hands_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    # three-tier suite (VERDICT r3 #9): every reference-golden module is
    # auto-marked `golden` so the inner loop can run `-m "not golden"`
    # (<10 min) while CI keeps the full ~30 min default. test_smoke.py is
    # the <1 min tier.
    for item in items:
        if "test_ref_goldens" in str(item.fspath):
            item.add_marker(pytest.mark.golden)


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs


@pytest.fixture
def rng():
    return np.random.RandomState(0)
