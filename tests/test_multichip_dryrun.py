"""Regression tests for the driver's multi-chip dryrun entry point.

Round 1 failed its external multichip check because ``dryrun_multichip``
initialized the ambient (TPU-tunnel) platform and was compile-bound at 32px
(MULTICHIP_r01.json rc=1, ~306 s even when forced onto CPUs).  These tests
pin the fix: the child environment must be CPU-only by construction, and the
full subprocess round-trip must stay green and fast.
"""

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_child_env_pins_cpu_platform():
    ambient = {
        "JAX_PLATFORMS": "axon",
        "JAX_PLATFORM_NAME": "tpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2 --xla_foo=1",
        "PALLAS_AXON_POOL_IPS": "127.0.0.1",
        "AXON_LOOPBACK_RELAY": "1",
        "TPU_SKIP_MDS_QUERY": "1",
        "PYTHONPATH": "/elsewhere",
        "HOME": "/root",
    }
    env = graft._cpu_mesh_env(8, ambient)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "--xla_force_host_platform_device_count=2" not in env["XLA_FLAGS"]
    assert "--xla_foo=1" in env["XLA_FLAGS"]  # unrelated flags survive
    assert "JAX_PLATFORM_NAME" not in env
    # TPU-tunnel trigger vars must be scrubbed so the child sitecustomize
    # never registers the PJRT plugin.
    assert not any(
        k.startswith(("PALLAS_AXON", "AXON_", "TPU_")) for k in env
    )
    assert env["PYTHONPATH"].split(os.pathsep)[0] == graft._REPO_ROOT
    assert "/elsewhere" in env["PYTHONPATH"]
    assert env["HOME"] == "/root"  # everything else passes through
    assert "PALLAS_AXON_POOL_IPS" in ambient  # input not mutated


@pytest.mark.heavy
def test_dryrun_multichip_subprocess_green_and_fast():
    t0 = time.time()
    graft.dryrun_multichip(8)  # raises on failure
    elapsed = time.time() - t0
    # Budget well under the driver's timeout; round 1 took 306 s.
    assert elapsed < 240, f"dryrun took {elapsed:.0f}s — compile-time regression"
