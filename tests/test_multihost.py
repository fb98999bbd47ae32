"""Multi-node path exercised for real: a 2-process CPU cluster via
``jax.distributed.initialize`` (the reference's TCP-rendezvous multi-node
DDP, train_ddp.py:54-65 — SURVEY §2.9 multi-node row)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(worker_name: str, extra_args=()):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), worker_name)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, worker, str(rank), str(port), *extra_args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for rank in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    return outs


def test_two_process_cpu_cluster():
    outs = _run_cluster("_multihost_worker.py")
    for out in outs:
        # rows 0..3 over 4 cols → Σ = (0+1+2+3)·4 = 24, same on every host
        assert "RESULT 24.0" in out, out
    assert "primary=True" in outs[0]
    assert "primary=False" in outs[1]


def test_fsdp_checkpoint_gather(tmp_path):
    """A train state FSDP-sharded ACROSS PROCESSES (no host can address a
    whole parameter) checkpoints correctly: the gather collective runs on
    every process before the rank-0 gate, for both the sync and async
    paths, and the written file holds the assembled global arrays."""
    outs = _run_cluster("_multihost_fsdp_ckpt_worker.py",
                        extra_args=(str(tmp_path),))
    assert "CKPT_OK rank=0" in outs[0]
    assert "CKPT_OK rank=1" in outs[1]
