"""Orbax checkpoint backend (opt-in: ``checkpoint_backend: orbax``).

The default ``.npz`` backend (train/checkpoint.py) is transparent and
dependency-light — right for the reference's workflow (single host,
44-84 M params, synchronous save at the best epoch; reference
main.py:244-292). Orbax is the production-pod backend:

- **async saves** — ``save`` returns once the arrays are snapshotted to
  host memory and flushes to disk in a background thread, so the train
  loop never blocks on checkpoint IO;
- **multi-host-aware** — every process calls ``save`` (no proc-0 gate;
  orbax coordinates which process writes which shard) and directory
  commits are atomic;
- **scales past host RAM** — sharded arrays stream per-shard instead of
  being gathered into one ``np.savez`` buffer.

The logical contents mirror the npz format exactly — ``params`` / ``bn``
pytrees, optimizer state as an ordered leaf list (structure-free, re-typed
against a template on restore), JSON meta (epoch, best_result) — so every
Trainer semantic (best-epoch save, metrics-bearing rename, reload, resume)
is backend-independent. Equality is proven in tests/test_orbax_ckpt.py.

A checkpoint is a DIRECTORY (``*.orbax``); train/checkpoint dispatches on
that (``Path.is_dir()``) so ``Trainer.load`` accepts either format.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp

_CKPTR = None


def _checkpointer():
    """One process-wide AsyncCheckpointer (orbax requires a single live
    instance per path family; creating one per save leaks threads)."""
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())
    return _CKPTR


def save_checkpoint_orbax(path, params, bn_state, opt_state=None,
                          epoch: int = 0, best_result=None,
                          extra: dict | None = None):
    """Async directory save. Unlike the npz path there is NO proc-0 gate:
    in a multi-process runtime EVERY process must call this (orbax
    coordinates the write)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()  # orbax requires absolute paths
    state = {"params": params, "bn": bn_state}
    if opt_state is not None:
        # structure-free leaf list, like the npz format: restore re-types
        # against the caller's template so optimizer refactors degrade to
        # a fresh optimizer instead of a crash
        state["opt"] = {f"{i:04d}": leaf for i, leaf in
                        enumerate(jax.tree_util.tree_leaves(opt_state))}
    meta = {"epoch": int(epoch), "best_result": best_result,
            **(extra or {})}
    # JsonSave rejects numpy scalars (metric values arrive as np.float32);
    # same coercion the npz meta blob applies (checkpoint.py default=float)
    meta = json.loads(json.dumps(meta, default=float))
    _checkpointer().save(
        path,
        args=ocp.args.Composite(state=ocp.args.StandardSave(state),
                                meta=ocp.args.JsonSave(meta)),
        force=True,  # best-epoch saves overwrite the same tmp path
    )


def wait_for_checkpoint():
    """Block until the in-flight async save (if any) is committed. Call
    before renaming/reading a just-saved checkpoint or exiting."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def load_checkpoint_orbax(path, opt_state_template=None):
    """Restore; same return contract as checkpoint.load_checkpoint."""
    import orbax.checkpoint as ocp

    wait_for_checkpoint()  # a pending save of this path must land first
    out = _checkpointer().restore(
        Path(path).resolve(),
        args=ocp.args.Composite(state=ocp.args.StandardRestore(),
                                meta=ocp.args.JsonRestore()),
    )
    state, meta = out["state"], out["meta"]
    opt_state = None
    saved_opt = state.get("opt")
    if opt_state_template is not None and saved_opt:
        leaves = [saved_opt[k] for k in sorted(saved_opt)]
        template_leaves = jax.tree_util.tree_leaves(opt_state_template)
        if len(leaves) != len(template_leaves):
            print(f"[checkpoint] opt_state leaf count mismatch "
                  f"({len(leaves)} saved vs {len(template_leaves)} "
                  f"expected); optimizer state NOT restored")
        else:
            typed = [jnp.asarray(a, t.dtype if hasattr(t, "dtype")
                                 else None)
                     for a, t in zip(leaves, template_leaves)]
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(opt_state_template), typed)
    return {"params": state["params"], "bn_state": state["bn"],
            "opt_state": opt_state, "epoch": meta.get("epoch", 0),
            "best_result": meta.get("best_result"), "meta": meta}
