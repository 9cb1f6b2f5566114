"""Checkpoint save/restore (reference main.py:244-292, utils/utils.py:324-422).

Pytrees are flattened to path-keyed numpy arrays inside a single ``.npz``
plus a JSON meta blob (epoch, best_result, config snapshot) — transparent,
dependency-light and multi-host safe (only process 0 writes; all processes
read). Shape-filtered loading (reference load_state_dict utils.py:352-370)
is supported via ``strict=False``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

_SEP = "/"


def flatten_tree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(value)
    return root


def save_checkpoint(path, params, bn_state, opt_state=None, epoch: int = 0,
                    best_result=None, extra: dict | None = None,
                    backend: str = "npz"):
    if backend == "orbax":
        # async multi-host directory checkpoint (train/orbax_ckpt.py);
        # NOT proc-0 gated — orbax coordinates the writers itself
        from jspsr_tpu.train.orbax_ckpt import save_checkpoint_orbax

        return save_checkpoint_orbax(path, params, bn_state, opt_state,
                                     epoch=epoch, best_result=best_result,
                                     extra=extra)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if jax.process_index() != 0:
        return
    arrays = {}
    arrays.update({f"params{_SEP}{k}": v
                   for k, v in flatten_tree(params).items()})
    arrays.update({f"bn{_SEP}{k}": v
                   for k, v in flatten_tree(bn_state).items()})
    if opt_state is not None:
        leaves, _ = jax.tree_util.tree_flatten(opt_state)
        for i, leaf in enumerate(leaves):
            arrays[f"opt{_SEP}{i}"] = np.asarray(leaf)
    meta = {"epoch": int(epoch), "best_result": best_result,
            **(extra or {})}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta, default=float).encode(), dtype=np.uint8
    )
    tmp = path.with_suffix(path.suffix + ".tmp.npz")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    tmp.replace(path)


def load_checkpoint(path, opt_state_template=None):
    """Returns dict(params, bn_state, opt_state|None, epoch, best_result).

    Directories (and ``*.orbax`` paths whose async save may not have
    committed the directory yet) are orbax checkpoints (train/orbax_ckpt.py),
    files are the default .npz format — so every loader (Trainer.load,
    load_model_params, the CLI flows) accepts either backend transparently."""
    p = Path(path)
    if p.is_dir() or p.suffix == ".orbax":
        from jspsr_tpu.train.orbax_ckpt import load_checkpoint_orbax

        return load_checkpoint_orbax(path, opt_state_template)
    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays.pop("__meta__").tobytes()).decode())
    params = unflatten_tree({
        k[len(f"params{_SEP}"):]: v for k, v in arrays.items()
        if k.startswith(f"params{_SEP}")
    })
    bn = unflatten_tree({
        k[len(f"bn{_SEP}"):]: v for k, v in arrays.items()
        if k.startswith(f"bn{_SEP}")
    })
    opt_state = None
    if opt_state_template is not None:
        leaves = [
            arrays[f"opt{_SEP}{i}"]
            for i in range(len([k for k in arrays if k.startswith(f"opt{_SEP}")]))
        ]
        if leaves:
            treedef = jax.tree_util.tree_structure(opt_state_template)
            template_leaves = jax.tree_util.tree_leaves(opt_state_template)
            if len(leaves) != len(template_leaves):
                # optimizer structure changed since the checkpoint was saved
                # (e.g. a momentum buffer added/removed) — resume params and
                # epoch, start the optimizer fresh rather than crashing
                print(f"[checkpoint] opt_state leaf count mismatch "
                      f"({len(leaves)} saved vs {len(template_leaves)} "
                      f"expected); optimizer state NOT restored")
            else:
                typed = [
                    jnp.asarray(a, t.dtype if hasattr(t, "dtype") else None)
                    for a, t in zip(leaves, template_leaves)
                ]
                opt_state = jax.tree_util.tree_unflatten(treedef, typed)
    return {"params": params, "bn_state": bn, "opt_state": opt_state,
            "epoch": meta.get("epoch", 0),
            "best_result": meta.get("best_result"), "meta": meta}


def load_params_filtered(target_params, loaded_params):
    """Shape-filtered merge (reference utils/utils.py:352-370): keep loaded
    leaves whose path+shape match the target; warn-and-skip the rest."""
    flat_t = flatten_tree(target_params)
    flat_l = flatten_tree(loaded_params)
    merged, skipped = {}, []
    for k, v in flat_t.items():
        if k in flat_l and flat_l[k].shape == v.shape:
            merged[k] = flat_l[k]
        else:
            merged[k] = v
            skipped.append(k)
    if skipped:
        print(f"[checkpoint] skipped {len(skipped)} mismatched keys "
              f"(e.g. {skipped[:3]})")
    return unflatten_tree(merged)


def load_model_params(model, path, seed: int = 0):
    """(params, bn_state) for a built model from an .npz checkpoint or a
    reference torch .pt/.pth file — the dataset-free loader used by the
    CLI --infer flow."""
    if str(path).endswith((".pt", ".pth")):
        from jspsr_tpu.utils.torch_import import (
            import_torch_state_dict, load_torch_checkpoint,
        )

        sd, _ = load_torch_checkpoint(path)
        return import_torch_state_dict(model, sd)
    init_p, init_bn = model.init(jax.random.PRNGKey(seed))
    ck = load_checkpoint(path)
    params = load_params_filtered(init_p, ck["params"])
    return params, ck["bn_state"] or init_bn
