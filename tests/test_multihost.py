"""Multi-process jax.distributed test: the DCN-analog edge.

The reference has NO distributed backend (SURVEY.md §5); fftlab's
multi-host story is jax.distributed + shard_map collectives. This test
actually exercises it: two OS processes, each with 2 virtual CPU
devices, form one 4-device global mesh via
`fftlab.dist.multihost.ensure_initialized` and run the ppermute-halo
overlap-save filter across the process boundary — asserting parity with
the numpy oracle on every process's local shards
(tests/_multihost_worker.py).
"""

from __future__ import annotations

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


def test_two_process_overlap_save_parity():
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, addr, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=root,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "matches oracle" in out
