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


def _parse_train_line(out: str):
    for line in out.splitlines():
        if line.startswith("TRAIN process"):
            parts = dict(kv.split("=") for kv in line.split()[2:])
            t0, t1 = (float(x) for x in parts["trace"].split(","))
            return t0, t1, float(parts["checksum"])
    raise AssertionError(f"no TRAIN line in:\n{out[-2000:]}")


@pytest.mark.timeout(720)
def test_two_process_train_step_matches_single_process():
    """2-process data-parallel TRAINING equality: each process feeds its
    local half of the batch, the jitted train step runs over the 4-device
    global mesh (gradient all-reduce + global-batch BN statistics cross the
    process boundary), and after 2 steps the loss trace and updated-params
    checksum match a 1-process 4-device run of the identical program —
    i.e. multi-host training is exact, not just the input feed."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "_multihost_worker.py"),
             str(port), str(pid), "2", "train"],
            cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    ref = subprocess.Popen(
        [sys.executable, str(ROOT / "tests" / "_multihost_worker.py"),
         "0", "0", "1", "train"],
        cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    outs = []
    for p in procs + [ref]:
        try:
            out, _ = p.communicate(timeout=660)
        except subprocess.TimeoutExpired:
            for q in procs + [ref]:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs + [ref], outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    r0, r1, rref = (_parse_train_line(o) for o in outs)
    # the two distributed workers see the SAME replicated scalars
    assert r0 == r1, (r0, r1)
    # and they match the single-process ground truth to fp32 reassociation
    # tolerance (collective reduction order differs across process counts)
    import numpy as np

    np.testing.assert_allclose(r0[:2], rref[:2], rtol=2e-5)
    np.testing.assert_allclose(r0[2], rref[2], rtol=2e-6)
