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


@pytest.mark.timeout(600)
def test_two_process_device_cache_matches_host_feed(tmp_path):
    """Multi-host device_cache (VERDICT r3 #6): each process caches the
    raw scene stacks on its local devices, samples its loader shard with a
    process-local jit, and the stitched global batches are bit-identical
    to the host shard_batch feed — proven inside each worker, 2-process."""
    from jspsr_tpu.data.synthetic import generate_mini_dfc30

    root, _, _ = generate_mini_dfc30(
        tmp_path / "DFC30_8m", train_cities=("Brest",),
        valid_cities=("Vannes",), n_per_city=8, size=64)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "_multihost_worker.py"),
             str(port), str(pid), "2", "cache", str(root)],
            cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"CACHE process {pid} ok" in out, out[-2000:]


def _parse_train_line(out: str):
    for line in out.splitlines():
        if line.startswith("TRAIN process"):
            # only the key=value tokens (skips "TRAIN", "process", the pid)
            parts = dict(kv.split("=", 1) for kv in line.split() if "=" in kv)
            t0, t1 = (float(x) for x in parts["trace"].split(","))
            return t0, t1, float(parts["checksum"])
    raise AssertionError(f"no TRAIN line in:\n{out[-2000:]}")


@pytest.mark.timeout(720)
def test_two_process_train_step_matches_single_process(tmp_path):
    """2-process data-parallel TRAINING equality: each process feeds its
    local half of the batch, the jitted train step runs over the 4-device
    global mesh (gradient all-reduce + global-batch BN statistics cross the
    process boundary), and after 2 steps the loss trace and updated-params
    checksum match a 1-process 4-device run of the identical program —
    i.e. multi-host training is exact, not just the input feed.

    Also exercises checkpointing under a real multi-process runtime: both
    processes call save_checkpoint on a SHARED path (only proc 0 writes,
    train/checkpoint.py:50-51), then both reload and verify exact params."""
    port = _free_port()
    ckpt = str(tmp_path / "multihost_ck.npz")
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "_multihost_worker.py"),
             str(port), str(pid), "2", "train", ckpt],
            cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    ref = subprocess.Popen(
        [sys.executable, str(ROOT / "tests" / "_multihost_worker.py"),
         "0", "0", "1", "train", str(tmp_path / "ref_ck.npz")],
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
    for pid, out in enumerate(outs):
        assert f"CKPT process {pid % 2 if pid < 2 else 0} ok" in out, \
            out[-2000:]
    r0, r1, rref = (_parse_train_line(o) for o in outs)
    # the two distributed workers see the SAME replicated scalars
    assert r0 == r1, (r0, r1)
    # and they match the single-process ground truth to fp32 reassociation
    # tolerance (collective reduction order differs across process counts)
    import numpy as np

    # step-1 loss matches exactly (same params, reduction noise only);
    # step-2 loss passed through one optimizer update computed with a
    # different all-reduce order, so fp32 divergence compounds — measured
    # 3.2e-5 rel on the 2-vs-1-process run, hence the 1e-4 bound
    np.testing.assert_allclose(r0[:2], rref[:2], rtol=1e-4)
    # params checksum is an fp32 sum over every |leaf| after one divergent
    # update; measured 2.2e-6 rel across process counts -> 1e-5 bound
    np.testing.assert_allclose(r0[2], rref[2], rtol=1e-5)
