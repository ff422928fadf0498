"""Real 2-process DCN test: jax.distributed over a local coordinator.

Spawns two worker processes (tests/multihost_worker.py), each owning 2
virtual CPU devices, that together form a 4-device (ch, t) mesh.  Exercises
``multihost.initialize``, ``host_channel_slice``, ``make_global_input``
(per-host ingest of its own channel rows), and one channel-sharded receiver
step whose distributed outputs must equal a single-process serial run.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # workers set their own XLA_FLAGS device count; drop pytest's
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=_REPO)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n---\n".join(
            p.stdout.read() if p.stdout else "" for p in procs))

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"OK process {i}" in out, f"worker {i} output:\n{out}"
