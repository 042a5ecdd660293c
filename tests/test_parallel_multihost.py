"""parallel/multihost.py: env parsing + 2-process jax.distributed smoke.

The real-pod path (TPU metadata auto-discovery) is inherently
untestable here; what IS testable is the explicit-env contract every
launcher script relies on, and the coordinator handshake itself on the
CPU backend (two real processes rendezvous through
jax.distributed.initialize).
"""

import os
import subprocess
import sys

import pytest

from human_dynamics_tpu.parallel.multihost import (
    ENV_COORDINATOR,
    ENV_NUM_PROCESSES,
    ENV_PROCESS_ID,
    initialize,
    process_env,
)


def test_process_env_not_configured_returns_none():
    assert process_env({}) is None
    assert process_env({ENV_NUM_PROCESSES: "1"}) is None
    # A coordinator alone (num_processes defaulting to 1) is single-proc.
    assert process_env({ENV_COORDINATOR: "h:1"}) is None


def test_process_env_valid_triple():
    env = {
        ENV_COORDINATOR: "host0:9876",
        ENV_NUM_PROCESSES: "4",
        ENV_PROCESS_ID: "2",
    }
    assert process_env(env) == ("host0:9876", 4, 2)


def test_process_env_missing_coordinator_raises():
    with pytest.raises(ValueError, match="requires"):
        process_env({ENV_NUM_PROCESSES: "2"})


# "-1" also covers the unset sentinel: every process must be told its
# id explicitly.
@pytest.mark.parametrize("pid", ["-1", "2", "7"])
def test_process_env_process_id_out_of_range(pid):
    env = {
        ENV_COORDINATOR: "h:1",
        ENV_NUM_PROCESSES: "2",
        ENV_PROCESS_ID: pid,
    }
    with pytest.raises(ValueError, match="must be in"):
        process_env(env)


def test_process_env_malformed_ints_raise():
    with pytest.raises(ValueError):
        process_env({ENV_NUM_PROCESSES: "two"})
    with pytest.raises(ValueError):
        process_env({
            ENV_COORDINATOR: "h:1",
            ENV_NUM_PROCESSES: "2",
            ENV_PROCESS_ID: "zero",
        })


def test_initialize_single_process_is_identity():
    """No env config: (0, 1) without touching jax.distributed."""
    host_id, num_hosts = initialize({})
    assert (host_id, num_hosts) == (0, 1)


_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")

from human_dynamics_tpu.parallel.multihost import initialize

pid = sys.argv[1]
port = sys.argv[2]
host_id, num_hosts = initialize({
    "HD_TPU_COORDINATOR": f"127.0.0.1:{port}",
    "HD_TPU_NUM_PROCESSES": "2",
    "HD_TPU_PROCESS_ID": pid,
})
assert (host_id, num_hosts) == (int(pid), 2), (host_id, num_hosts)
assert len(jax.devices()) == 2 * len(jax.local_devices())
print(f"proc {pid}: ok {num_hosts} hosts "
      f"{len(jax.devices())} global devices", flush=True)
"""


def test_initialize_two_process_rendezvous(tmp_path):
    """Two REAL processes rendezvous through the coordinator and agree
    on process_count/global device view (the exact path a pod launcher
    takes, minus the TPU)."""
    import socket

    # An ephemeral free port (tiny close-to-bind race is acceptable;
    # a hardcoded port would collide across concurrent test runs).
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    # One virtual CPU device per process keeps the handshake cheap.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed CPU rendezvous unavailable here")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert "proc 0: ok 2 hosts 2 global devices" in outs[0]
    assert "proc 1: ok 2 hosts 2 global devices" in outs[1]
