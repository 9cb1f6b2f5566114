"""2-process multi-host input feed (VERDICT #7): actually exercises
parallel/mesh.py's process_count > 1 branch (make_array_from_process_local_data
over the coordination service) — single-process tests can't reach it."""

import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(args):
    return subprocess.Popen(
        [sys.executable, str(ROOT / "tests" / "_multihost_worker.py"),
         *map(str, args)],
        cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )


def _communicate_all(procs, deadline_s):
    """Collect every worker's output under ONE shared wall-clock deadline
    (the per-proc communicate timeouts previously summed past the pytest
    mark, so a slow-but-alive hang could trip the mark before the except
    branch killed the pair, orphaning the subprocesses — advisor r4). The
    finally block always reaps stragglers, whatever raised — including the
    pytest-timeout signal."""
    t0 = time.monotonic()
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(
                timeout=max(1.0, deadline_s - (time.monotonic() - t0)))
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            if p.poll() is None:
                try:
                    p.communicate(timeout=30)
                except Exception:
                    pass
    return outs


# Subprocess timeouts are sized for the WORST case — this suite runs under
# xdist -n 4, so the worker pair competes with 3 other compile-heavy test
# processes; a round-4 full-suite run starved a healthy worker for 380 s
# before its train-step compile even started. Uncontended runs finish in
# 1-3 min; the deadline only bounds the pathological hang.
@pytest.mark.timeout(720)
def test_two_process_feed_assembles_global_batch():
    port = _free_port()
    procs = [_spawn([port, pid, 2]) for pid in range(2)]
    outs = _communicate_all(procs, 600)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-8000:]}"
        assert f"OK process {pid}" in out, out[-2000:]


@pytest.mark.timeout(1200)
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
    procs = [_spawn([port, pid, 2, "cache", root]) for pid in range(2)]
    outs = _communicate_all(procs, 1080)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-8000:]}"
        assert f"CACHE process {pid} ok" in out, out[-2000:]


def _parse_train_line(out: str):
    for line in out.splitlines():
        if line.startswith("TRAIN process"):
            # only the key=value tokens (skips "TRAIN", "process", the pid)
            parts = dict(kv.split("=", 1) for kv in line.split() if "=" in kv)
            t0, t1 = (float(x) for x in parts["trace"].split(","))
            return t0, t1, float(parts["checksum"])
    raise AssertionError(f"no TRAIN line in:\n{out[-2000:]}")


@pytest.mark.timeout(1800)
def test_two_process_train_step_matches_single_process(tmp_path):
    """2-process data-parallel TRAINING equality: each process feeds its
    local half of the batch, the jitted train step runs over the 4-device
    global mesh (gradient all-reduce + global-batch BN statistics cross the
    process boundary), and after 2 steps the loss trace and updated-params
    checksum match a 1-process 4-device run of the identical program —
    i.e. multi-host training is exact, not just the input feed.

    Also exercises checkpointing under a real multi-process runtime: both
    processes call save_checkpoint on a SHARED path (only proc 0 writes,
    train/checkpoint.py:50-51), then both reload and verify exact params —
    and the same again through the ORBAX backend (no proc-0 gate: every
    process calls save on the shared path and orbax coordinates the
    writers — the multi-host claim of train/orbax_ckpt.py, VERDICT r4 #2a)."""
    port = _free_port()
    ckpt = str(tmp_path / "multihost_ck.npz")
    orbax = str(tmp_path / "multihost_ck.orbax")
    procs = [_spawn([port, pid, 2, "train", ckpt, orbax])
             for pid in range(2)]
    outs = _communicate_all(procs, 1100)
    # run the single-process ground truth AFTER the distributed pair, not
    # concurrently: a third JAX process compiling on a 1-core host starves
    # the pair past gloo's hardcoded 30 s context-init deadline (flake
    # observed in the round-3 full-suite run)
    ref = _spawn([0, 0, 1, "train", tmp_path / "ref_ck.npz",
                  tmp_path / "ref_ck.orbax"])
    outs += _communicate_all([ref], 550)
    for p, out in zip(procs + [ref], outs):
        assert p.returncode == 0, f"worker failed:\n{out[-8000:]}"
    for pid, out in enumerate(outs):
        wid = pid % 2 if pid < 2 else 0
        assert f"CKPT process {wid} ok" in out, out[-2000:]
        assert f"ORBAX process {wid} ok" in out, out[-2000:]
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


def _parse_preempt_line(out: str, phase: str):
    for line in out.splitlines():
        if line.startswith(f"PREEMPT {phase} process"):
            parts = dict(kv.split("=", 1) for kv in line.split() if "=" in kv)
            return float(parts["e1loss"]), float(parts["checksum"])
    raise AssertionError(f"no PREEMPT {phase} line in:\n{out[-2000:]}")


@pytest.mark.timeout(2700)
def test_two_process_preemption_resume_matches_control(tmp_path):
    """Mid-epoch preemption resume under a REAL 2-process runtime
    (VERDICT r4 #2b): a 2-process pair with `save_every_steps` +
    `device_cache` crashes right after the committed periodic save at
    epoch-1 step 2; a relaunched pair in the same result_dir auto-resumes
    (shared proc-0-gated npz checkpoint, replicated-state restore, loader
    index fast-forward across BOTH process shards) and must reproduce an
    uninterrupted 2-process control bit-exactly — epoch-1 loss and params
    checksum, as printed independently by each process."""
    from jspsr_tpu.data.synthetic import generate_mini_dfc30

    root, _, _ = generate_mini_dfc30(
        tmp_path / "DFC30_8m", train_cities=("Brest",),
        valid_cities=("Vannes",), n_per_city=12, size=64)

    def run_pair(phase, result_dir, deadline):
        port = _free_port()
        procs = [_spawn([port, pid, 2, "preempt", root, result_dir, phase])
                 for pid in range(2)]
        outs = _communicate_all(procs, deadline)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, \
                f"{phase} process {pid} failed:\n{out[-8000:]}"
        return outs

    # control: straight through (the periodic saves must not perturb math)
    ctl = run_pair("control", tmp_path / "ctl", 900)
    c0, c1 = (_parse_preempt_line(o, "control") for o in ctl)
    assert c0 == c1, (c0, c1)  # both processes see the same replicated state

    # crash: same config, same seed, fresh result_dir; dies mid-epoch 1
    crash = run_pair("crash", tmp_path / "run", 700)
    for pid, out in enumerate(crash):
        assert f"PREEMPT crash process {pid} ok" in out, out[-2000:]

    # resume: relaunch the SAME pair in the SAME result_dir
    res = run_pair("resume", tmp_path / "run", 700)
    r0, r1 = (_parse_preempt_line(o, "resume") for o in res)
    assert r0 == r1, (r0, r1)
    # bit-exact vs the uninterrupted control
    assert r0 == c0, (r0, c0)


@pytest.mark.timeout(1200)
def test_cli_distributed_bootstrap(tmp_path):
    """`distributed: true` + `distributed_kwargs` in the YAML initialize
    jax.distributed BEFORE backend creation and run the normal Trainer
    flow under a real (1-process) distributed runtime — the pod-slice CLI
    entry (cli/main.py _maybe_init_distributed). Runs in a subprocess:
    initialize() must precede any backend use, and pytest's own jax
    session has already created one."""
    import yaml

    from jspsr_tpu.data.synthetic import generate_mini_dfc30

    data_root = tmp_path / "datasets"
    root, train, valid = generate_mini_dfc30(
        data_root / "DFC30_8m", train_cities=("Brest",),
        valid_cities=("Vannes",), n_per_city=2, size=64)
    cfg = {
        "name": "dist_smoke", "verbose": False, "dataset": "DFC30",
        "data_root": str(data_root),
        "train_set": train, "valid_set": valid,
        "input_data": {"COP30": 1, "image": 3},
        "resolution": 8, "workers": 1, "relative": True, "augment": False,
        "patch_size": 32, "crop_mode": "random", "patches_per_image": 1,
        "tensor_kwargs": {"log": True, "min": -80, "max": 933},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8,
                         "pretrained": False, "checkpoint": None},
        "loss": {"L1": 1},
        "optimizer": "Adam",
        "optimizer_kwargs": {"weight_decay": 0.0, "momentum": 0.9,
                             "lr": 1e-3},
        "scheduler": "StepLR",
        "scheduler_kwargs": {"step_size": 10, "gamma": 0.5},
        "train_batch_size": 2, "epochs": 1, "resume": False,
        "early_stop": {"patience": None, "monitor": "val_rmse"},
        "valid_batch_size": 1, "val_interval": 1, "val_start_epoch": 1,
        "metric": {"RMSE": {"package": "local"}},
        "best_metric": "RMSE",
        "distributed": True,
        "distributed_kwargs": {
            "coordinator_address": f"127.0.0.1:{_free_port()}",
            "num_processes": 1, "process_id": 0},
    }
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    script = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=2'\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from jspsr_tpu.cli.main import main\n"
        f"out = main(['--config', {str(cfg_path)!r},\n"
        f"            '--result-dir', {str(tmp_path / 'run')!r}])\n"
        "import numpy as np\n"
        "assert np.isfinite(out['result']['RMSE']), out\n"
        "assert jax.process_count() == 1\n"
        "print('DIST_CLI_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], cwd=ROOT,
        capture_output=True, text=True, timeout=1080,
    )
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])
    assert "DIST_CLI_OK" in proc.stdout, proc.stdout[-2000:]
    assert "[distributed] process 0/1 up" in proc.stderr, proc.stderr[-2000:]
