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
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={4 // _NPROC}"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


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
    trace = []
    for _ in range(2):
        state, losses = train_step(state, inputs, gt)
        trace.append(float(losses["Total"]))

    # fully-replicated pull of the updated params -> one scalar checksum
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(jax.jit(
        lambda ls: sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in ls),
        out_shardings=replicated(mesh))(leaves))
    print(f"TRAIN process {pid} trace={trace[0]:.9f},{trace[1]:.9f} "
          f"checksum={checksum:.6f}")


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), _NPROC
    mode = sys.argv[4] if len(sys.argv) > 4 else "feed"
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    (train_mode if mode == "train" else feed_mode)(pid)


if __name__ == "__main__":
    main()
