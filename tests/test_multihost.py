"""Multi-host training path: 2 CPU processes, env axis sharded across them.

BASELINE north star is "linear scaling to 2+ hosts"; the reference has no
multi-process path at all (SURVEY.md §2.3, --horovod is dead). This test
fakes a 2-host pod: two subprocesses, 4 virtual CPU devices each, joined
via ``jax.distributed`` on a localhost coordinator, running one PPO
iteration over a global 8-device ("env",) mesh (tests/multihost_driver.py).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training_iteration():
    port = _free_port()
    driver = os.path.join(os.path.dirname(__file__), "multihost_driver.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # driver sets its own device count
        env.update(
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, driver],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, f"process {pid} output:\n{out[-4000:]}"
    # both processes must agree on the replicated metrics line tail
    tail0 = outs[0].split("MULTIHOST_OK")[1].split("value_loss")[1]
    tail1 = outs[1].split("MULTIHOST_OK")[1].split("value_loss")[1]
    assert tail0 == tail1
