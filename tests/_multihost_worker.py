"""Worker for the multi-process multi-host tests (run via subprocess).

Each process owns 4//nproc virtual CPU devices of a 4-device global mesh,
driving the jax.make_array_from_process_local_data DCN-feed branch and the
cross-process gradient all-reduce that single-process tests can't reach
(parallel/mesh.py process_count > 1 paths).

argv: <coordinator_port> <process_id> <num_processes> [mode]
mode: "feed" (default) — assemble a global batch and run collectives;
      "train" — run 2 REAL flagship train steps data-parallel over the
      global mesh and print the loss trace + a params checksum, so the
      parent test can compare 2-process vs 1-process results.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
_NPROC = int(sys.argv[3])
assert _NPROC in (1, 2, 4), (
    f"nproc={_NPROC} unsupported: the 4-device global mesh needs 4 % nproc == 0"
)
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={4 // _NPROC}"
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)

import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

_T0 = time.monotonic()


def _t(msg):
    """Timestamped progress line (diagnosis for gloo-deadline flakes)."""
    print(f"[t+{time.monotonic() - _T0:7.1f}s] {msg}", flush=True)


def coordination_barrier(name: str, timeout_ms: int = 600_000):
    """Rendezvous over the coordination service (NOT a device collective).

    XLA's gloo CPU backend creates its communicator context lazily at the
    first collective, with a hardcoded 30 s key-exchange deadline — on a
    1-core host, compile-time skew between processes easily exceeds that
    (observed: 'Gloo context initialization failed: GetKeyValue() timed
    out'). Compiling ahead of time and meeting at this barrier bounds the
    skew at the first collective to milliseconds."""
    if _NPROC > 1:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(name, timeout_ms)


def feed_mode(pid):
    from jspsr_tpu.parallel.mesh import make_mesh, replicated, shard_batch

    mesh = make_mesh()  # 1-D data mesh over all 4 global devices
    global_batch = np.arange(8 * 3 * 2, dtype=np.float32).reshape(8, 3, 2)
    per = 8 // jax.process_count()
    local = global_batch[pid * per: (pid + 1) * per]  # this process's shard

    tree = {"x": local, "y": local * 2.0}
    garr = shard_batch(mesh, tree)
    assert garr["x"].shape == (8, 3, 2), garr["x"].shape  # global shape

    # pull the assembled global array back fully replicated and compare
    out = jax.jit(lambda t: t["x"] + 0.5 * t["y"],
                  out_shardings=replicated(mesh))(garr)
    np.testing.assert_allclose(np.asarray(out), global_batch * 2.0)

    # a cross-process collective over the global array agrees with the
    # single-host ground truth
    total = jax.jit(lambda t: t["x"].sum(),
                    out_shardings=replicated(mesh))(garr)
    np.testing.assert_allclose(float(total), global_batch.sum())
    print(f"OK process {pid}")


def train_mode(pid):
    """Two real data-parallel train steps (flagship JSPSR, tiny shapes) over
    the global mesh. Deterministic everywhere: PRNGKey(0) init is identical
    on every process, the global batch comes from a seeded numpy rng, BN
    batch statistics reduce over the GLOBAL batch (XLA collectives), so the
    printed loss trace and params checksum must agree — across the two
    workers AND with a 1-process 4-device run of this same function."""
    import jax.numpy as jnp
    import __graft_entry__ as g
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.losses import build_criterion
    from jspsr_tpu.parallel.mesh import (make_mesh, replicate_state,
                                         replicated, shard_batch)
    from jspsr_tpu.train.optim import build_optimizer, set_learning_rate
    from jspsr_tpu.train.state import TrainState
    from jspsr_tpu.train.step import make_train_step

    mesh = make_mesh()
    model, params, bn_state = g._flagship(num_feature=8, layers=(1, 1, 1, 1))
    criterion = build_criterion({"L1": 1, "L2": 1, "Grad": 0.1})
    p = AttrDict({"optimizer": "AdamW",
                  "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                                       "momentum": 0.9}})
    optimizer = build_optimizer(p, params)
    state = TrainState(params, bn_state, optimizer.init(params),
                       jnp.zeros((), jnp.int32))
    state = replicate_state(mesh, state)
    set_learning_rate(state.opt_state, 1e-3)

    batch = 8  # 2 tiles per device on the 4-device global mesh
    dem, img, msk = g._example_inputs(batch, 32, 32, rng_seed=1)
    gt = np.clip(np.asarray(dem) + 0.01, 0, 1)
    per = batch // jax.process_count()
    lo, hi = pid * per, (pid + 1) * per
    inputs = shard_batch(mesh, [np.asarray(dem)[lo:hi],
                                np.asarray(img)[lo:hi],
                                np.asarray(msk)[lo:hi]])
    gt = shard_batch(mesh, gt[lo:hi])

    train_step = make_train_step(model, criterion, optimizer, donate=False)
    # AOT-compile, THEN meet at the barrier: the first gloo collective must
    # start near-simultaneously on every process (see coordination_barrier).
    # This is the ONLY cross-process gloo program in this mode — everything
    # after it (checksum, checkpoint, barriers) reads local addressable data
    # or uses the coordination service, because every extra lazily-created
    # gloo context is another unaligned 30 s deadline to lose on a loaded
    # 1-core host.
    _t("lowering/compiling train step")
    train_step.lower(state, inputs, gt).compile()
    _t("compiled; entering barrier")
    coordination_barrier("train_step_compiled")
    _t("barrier passed; running step 1")
    trace = []
    for i in range(2):
        state, losses = train_step(state, inputs, gt)
        trace.append(float(losses["Total"]))
        _t(f"step {i + 1} done")

    # params checksum from this process's OWN local replica (no collective;
    # stronger proof too — each process computes it independently and the
    # parent compares the printed values, so no all-reduce can mask a
    # replica divergence)
    local_leaves = [np.asarray(x.addressable_data(0))
                    for x in jax.tree_util.tree_leaves(state.params)]
    checksum = float(jax.jit(
        lambda ls: sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in ls)
    )(local_leaves))
    print(f"TRAIN process {pid} trace={trace[0]:.9f},{trace[1]:.9f} "
          f"checksum={checksum:.6f}")

    # checkpoint leg: every process calls save_checkpoint but only process
    # 0 writes (train/checkpoint.py:50-51 — the proc-0 gate this test
    # exercises under a REAL multi-process runtime); after a global
    # barrier all processes reload the file and must see the exact
    # updated params.
    ckpt_path = sys.argv[5] if len(sys.argv) > 5 else None
    if ckpt_path:
        from jspsr_tpu.train.checkpoint import (flatten_tree,
                                                load_checkpoint,
                                                save_checkpoint)

        save_checkpoint(ckpt_path, state.params, state.bn_state,
                        opt_state=state.opt_state, epoch=1)
        # rendezvous over the coordination service, NOT
        # multihost_utils.sync_global_devices: that one is an assert_equal
        # psum whose gloo context is created lazily with the hardcoded 30 s
        # deadline — it raced the checkpoint write + compile skew and flaked
        coordination_barrier("ckpt_written")
        ck = load_checkpoint(ckpt_path)
        want = flatten_tree(jax.device_get(state.params))
        got = flatten_tree(ck["params"])
        assert set(got) == set(want), (set(got) ^ set(want))
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]), want[k])
        assert ck["epoch"] == 1, ck["epoch"]
        print(f"CKPT process {pid} ok keys={len(want)}")

    # orbax leg (VERDICT r4 #2a): EVERY process calls the orbax backend on
    # the same shared path — no proc-0 gate, orbax coordinates the shard
    # writers itself (train/orbax_ckpt.py save docstring) — then waits for
    # the async commit, rendezvouses, and reloads; the restored params
    # must be exactly the updated train state on both processes. This is
    # the multi-process proof of the "multi-host-aware" claim that
    # tests/test_orbax_ckpt.py can only exercise single-process.
    orbax_path = sys.argv[6] if len(sys.argv) > 6 else None
    if orbax_path:
        from jspsr_tpu.train.checkpoint import (flatten_tree,
                                                load_checkpoint,
                                                save_checkpoint)
        from jspsr_tpu.train.orbax_ckpt import wait_for_checkpoint

        _t("orbax save")
        save_checkpoint(orbax_path, state.params, state.bn_state,
                        opt_state=state.opt_state, epoch=2,
                        backend="orbax")
        wait_for_checkpoint()  # async commit must land before the reload
        coordination_barrier("orbax_written")
        _t("orbax committed; reloading")
        ck2 = load_checkpoint(orbax_path)
        want2 = flatten_tree(jax.device_get(state.params))
        got2 = flatten_tree(ck2["params"])
        assert set(got2) == set(want2), (set(got2) ^ set(want2))
        for k in want2:
            np.testing.assert_array_equal(np.asarray(got2[k]), want2[k])
        assert ck2["epoch"] == 2, ck2["epoch"]
        print(f"ORBAX process {pid} ok keys={len(want2)}")


def cache_mode(pid, data_root):
    """Multi-host device_cache equality: each process caches the full raw
    scene stacks on its LOCAL devices and samples its loader shard with a
    process-local jit; the stitched global batches must be bit-identical
    (to fp32 normalize tolerance) to the host shard_batch feed the trainer
    would otherwise use (data/device_cache.py multi-process path)."""
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.data.device_cache import DeviceSceneCache
    from jspsr_tpu.data.dfc30 import DFC30
    from jspsr_tpu.data.loader import DataLoader, build_batch_inputs
    from jspsr_tpu.data.normalize import make_device_normalize
    from jspsr_tpu.data.transforms import build_transforms
    from jspsr_tpu.parallel.mesh import make_mesh, replicated, shard_batch

    p = AttrDict({
        "name": "mh_cache", "dataset": "DFC30", "dataset_path": data_root,
        "resolution": 8, "train_set": ["Brest"], "valid_set": ["Vannes"],
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3},
        "relative": True, "augment": True, "patch_size": 32,
        "crop_mode": "random", "patches_per_image": 1,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929},
        "seed": 0, "verbose": False, "device_normalize": True,
    })
    mesh = make_mesh()
    train_tf, _ = build_transforms(p)
    ds = DFC30(split="train", transform=train_tf, seed=p.seed,
               **{k: v for k, v in p.items() if k != "seed"})
    cache = DeviceSceneCache(ds, p, mesh)
    loader = DataLoader(ds, 2, shuffle=True, drop_last=True, num_workers=1,
                        seed=p.seed, shard_index=pid,
                        num_shards=jax.process_count())
    epoch = 1
    loader.set_epoch(epoch)
    normalize = make_device_normalize(p)
    pull = jax.jit(lambda t: t, out_shardings=replicated(mesh))

    host_batches = []
    for batch in loader:  # the host feed the trainer uses multi-process
        inputs_np, gt_np, base, _ = build_batch_inputs(
            batch, "JSPSR", p.input_data)
        inputs = shard_batch(mesh, [np.asarray(x) for x in inputs_np])
        gt = shard_batch(mesh, np.asarray(gt_np))
        inputs, gt = normalize(inputs, gt,
                               shard_batch(mesh, np.asarray(base)))
        host_batches.append((inputs, gt))

    cache_batches = list(cache.epoch_batches(loader, epoch))
    assert len(cache_batches) == len(host_batches) > 0, (
        len(cache_batches), len(host_batches))
    for (hi, hg), (ci, cg, bs) in zip(host_batches, cache_batches):
        assert bs == 2, bs  # local loader batch size
        for a, b in zip([*hi, hg], [*ci, cg]):
            assert b.shape == a.shape, (b.shape, a.shape)
            np.testing.assert_allclose(np.asarray(pull(b)),
                                       np.asarray(pull(a)), atol=2e-6)
    print(f"CACHE process {pid} ok batches={len(cache_batches)}")


class _Preempted(Exception):
    """Simulated preemption raised after a committed periodic save."""


def preempt_mode(pid, data_root, result_dir, phase):
    """Mid-epoch preemption resume under a REAL 2-process runtime
    (VERDICT r4 #2b): `save_every_steps` checkpoints the replicated train
    state (proc-0-gated npz on a shared path) with device_cache ON, the
    pair crashes right after the committed save at epoch-1 step 2, and a
    relaunched pair auto-resumes — exercising the loader index
    fast-forward across BOTH process shards and the replicated-state
    restore (train/trainer.py:286-330). The parent compares the resumed
    epoch-1 loss and params checksum against an uninterrupted 2-process
    control.

    Drives train_one_epoch directly (no fit/eval): the train step is then
    the ONLY cross-process gloo program, which keeps the flake surface at
    one aligned context-init (see coordination_barrier); fit-level
    integration is covered by the single-process preemption test."""
    import jax.numpy as jnp
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.train.trainer import Trainer

    p = AttrDict({
        "name": "mh_preempt", "dataset": "DFC30", "dataset_path": data_root,
        "resolution": 8, "train_set": ["Brest"], "valid_set": ["Vannes"],
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3},
        "relative": True, "augment": True, "patch_size": 32,
        "crop_mode": "random", "patches_per_image": 1, "workers": 1,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8, "spn": True,
                         "pretrained": False, "checkpoint": None},
        "loss": {"L1": 1, "L2": 1},
        "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                             "momentum": 0.9},
        "scheduler": "StepLR",
        "scheduler_kwargs": {"step_size": 100, "gamma": 0.5},
        # per-process loader batch: global batch 2*nproc over the global
        # mesh; 6 scenes per shard -> 3 steps/epoch, save at step 2
        "train_batch_size": 2, "epochs": 2,
        "valid_batch_size": 1, "metric": {"RMSE": {"package": "local"}},
        "best_metric": "RMSE", "verbose": False, "seed": 0,
        "device_normalize": True, "device_cache": True,
        "save_every_steps": 2,
    })
    tr = Trainer(p, result_dir=result_dir)
    assert tr.mesh.devices.size == 4, tr.mesh.devices.shape

    # AOT-compile the train step at the first call, then rendezvous, so the
    # first cross-process collective starts aligned (gloo 30 s deadline)
    orig_step = tr.train_step
    compiled = []

    def aligned_step(state, inputs, gt):
        if not compiled:
            _t("lowering/compiling train step")
            orig_step.lower(state, inputs, gt).compile()
            _t("compiled; entering barrier")
            coordination_barrier(f"preempt_step_{phase}")
            compiled.append(1)
        return orig_step(state, inputs, gt)

    tr.train_step = aligned_step

    if phase == "crash":
        orig_save = tr._save_preempt

        def crash_after_save(epoch, steps_done, loss_sums, n_samples):
            orig_save(epoch, steps_done, loss_sums, n_samples)
            if epoch == 1 and steps_done == 2:
                raise _Preempted

        tr._save_preempt = crash_after_save
    if phase == "resume":
        assert tr.start_epoch == 1 and tr._mid_resume[1] == 2, (
            tr.start_epoch, tr._mid_resume)

    try:
        for epoch in range(tr.start_epoch, p.epochs):
            tr.train_one_epoch(epoch)
    except _Preempted:
        # the periodic save at epoch-1 step 2 must be committed (by proc 0)
        coordination_barrier("crash_committed")
        assert tr._preempt_path().exists()
        print(f"PREEMPT crash process {pid} ok")
        return

    checksum = float(jax.jit(
        lambda ls: sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in ls)
    )([np.asarray(x.addressable_data(0))
       for x in jax.tree_util.tree_leaves(tr.state.params)]))
    print(f"PREEMPT {phase} process {pid} "
          f"e1loss={tr.last_epoch_losses['Total']:.9e} "
          f"checksum={checksum:.6f}")


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), _NPROC
    mode = sys.argv[4] if len(sys.argv) > 4 else "feed"
    if nproc > 1:
        _t("initializing jax.distributed")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
        # align BEFORE backend creation: the CPU client's startup gloo
        # contexts (topology exchange) carry the same hardcoded 30 s
        # key-exchange deadline as every other gloo context, and process
        # import/setup skew on a loaded 1-core host can exceed it
        coordination_barrier("distributed_up")
    _t("creating backend")
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    coordination_barrier("backend_up")
    _t(f"backend up; mode={mode}")
    if mode == "cache":
        cache_mode(pid, sys.argv[5])
    elif mode == "train":
        train_mode(pid)
    elif mode == "preempt":
        preempt_mode(pid, sys.argv[5], sys.argv[6], sys.argv[7])
    else:
        feed_mode(pid)


if __name__ == "__main__":
    main()
