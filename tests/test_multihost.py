"""2-process multi-host input feed (VERDICT #7): actually exercises
parallel/mesh.py's process_count > 1 branch (make_array_from_process_local_data
over the coordination service) — single-process tests can't reach it."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_feed_assembles_global_batch():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "_multihost_worker.py"),
             str(port), str(pid), "2"],
            cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"OK process {pid}" in out, out[-2000:]
