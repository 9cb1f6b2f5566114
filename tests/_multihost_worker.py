"""Worker for the 2-process multi-host feed test (run via subprocess).

Each process owns 2 virtual CPU devices and contributes its local half of a
global batch through parallel.mesh.shard_batch — driving the
jax.make_array_from_process_local_data DCN-feed branch that single-process
tests can't reach (mesh.py process_count > 1 path).

argv: <coordinator_port> <process_id> <num_processes>
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    from jspsr_tpu.parallel.mesh import make_mesh, replicated, shard_batch

    mesh = make_mesh()  # 1-D data mesh over all 4 global devices
    global_batch = np.arange(8 * 3 * 2, dtype=np.float32).reshape(8, 3, 2)
    local = global_batch[pid * 4: (pid + 1) * 4]  # this process's shard

    tree = {"x": local, "y": local * 2.0}
    garr = shard_batch(mesh, tree)
    assert garr["x"].shape == (8, 3, 2), garr["x"].shape  # global shape

    # pull the assembled global array back fully replicated and compare
    out = jax.jit(lambda t: t["x"] + 0.5 * t["y"],
                  out_shardings=replicated(mesh))(garr)
    np.testing.assert_allclose(np.asarray(out), global_batch * 2.0)

    # a cross-process collective over the global array agrees with the
    # single-host ground truth
    total = jax.jit(lambda t: t["x"].sum(), out_shardings=replicated(mesh))(garr)
    np.testing.assert_allclose(float(total), global_batch.sum())
    print(f"OK process {pid}")


if __name__ == "__main__":
    main()
