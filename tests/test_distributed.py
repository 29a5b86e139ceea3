"""Multi-host execution test: 2 real processes x 4 virtual devices.

Spawns two separate Python processes that join a jax.distributed
coordination service (the same code path a real multi-host TPU pod
uses, with CPU devices standing in for chips), run sharded training
steps where each process feeds only its local batch shard, and must
print identical global checksums. This covers the DCN half of the
design that the single-process 8-device tests cannot (SURVEY.md
section 5.8: data axis over hosts, model axis within a host).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "distributed_worker.py")


def _free_port():
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_agrees():
    num_processes = 2
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for (k, v) in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    workers = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, str(num_processes), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(num_processes)
    ]
    outputs = []
    try:
        for worker in workers:
            (out, err) = worker.communicate(timeout=600)
            outputs.append((worker.returncode, out, err))
    finally:
        for worker in workers:
            if worker.poll() is None:
                worker.kill()

    checksum_lines = []
    for (rc, out, err) in outputs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"
        lines = [line for line in out.splitlines() if line.startswith("CHECKSUM")]
        assert len(lines) == 1, f"missing checksum in:\n{out}\n{err}"
        checksum_lines.append(lines[0])

    # Both processes computed the identical global training result.
    assert checksum_lines[0] == checksum_lines[1]
    checksum = float(checksum_lines[0].split()[1])
    assert checksum > 0.0
