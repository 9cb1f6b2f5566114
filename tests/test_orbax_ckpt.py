"""Orbax checkpoint backend (train/orbax_ckpt.py): roundtrip equality with
the npz format, async overwrite semantics, and the Trainer flow end-to-end
with `checkpoint_backend: orbax` (best-epoch save -> metrics rename ->
reload -> final eval), incl. cross-backend loading via the CLI --export."""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp


def _tiny_state(seed=0):
    rng = np.random.default_rng(seed)
    params = {"stem": {"w": rng.normal(size=(3, 3, 2, 4)).astype(np.float32),
                       "b": np.zeros(4, np.float32)},
              "head": {"w": rng.normal(size=(1, 1, 4, 1)).astype(np.float32)}}
    bn = {"stem": {"mean": np.zeros(4, np.float32),
                   "var": np.ones(4, np.float32)}}
    import optax

    opt = optax.adam(1e-3)
    opt_state = opt.init(jax.tree_util.tree_map(jnp.asarray, params))
    return params, bn, opt_state


def _assert_tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, (ta, tb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip_matches_npz(tmp_path):
    from jspsr_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params, bn, opt_state = _tiny_state()
    best = {"RMSE": 1.25, "PSNR": 30.5}
    save_checkpoint(tmp_path / "ck.npz", params, bn, opt_state,
                    epoch=7, best_result=best)
    save_checkpoint(tmp_path / "ck.orbax", params, bn, opt_state,
                    epoch=7, best_result=best, backend="orbax")

    a = load_checkpoint(tmp_path / "ck.npz", opt_state_template=opt_state)
    b = load_checkpoint(tmp_path / "ck.orbax", opt_state_template=opt_state)
    assert (tmp_path / "ck.orbax").is_dir()
    assert a["epoch"] == b["epoch"] == 7
    assert a["best_result"] == b["best_result"] == best
    _assert_tree_equal(a["params"], b["params"])
    _assert_tree_equal(a["bn_state"], b["bn_state"])
    _assert_tree_equal(a["opt_state"], b["opt_state"])


def test_orbax_async_overwrite(tmp_path):
    """Best-epoch saves overwrite the same tmp path (force=True); a load
    right after an async save must see the LATEST save committed."""
    from jspsr_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params, bn, opt_state = _tiny_state()
    save_checkpoint(tmp_path / "ck.orbax", params, bn, epoch=1,
                    backend="orbax")
    params2 = jax.tree_util.tree_map(lambda x: np.asarray(x) + 1.0, params)
    save_checkpoint(tmp_path / "ck.orbax", params2, bn, epoch=2,
                    backend="orbax")
    ck = load_checkpoint(tmp_path / "ck.orbax")
    assert ck["epoch"] == 2
    _assert_tree_equal(ck["params"], params2)


def test_orbax_opt_template_mismatch_degrades(tmp_path):
    """A changed optimizer structure restores params but NOT opt state —
    same degradation contract as the npz backend."""
    import optax

    from jspsr_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params, bn, opt_state = _tiny_state()
    save_checkpoint(tmp_path / "ck.orbax", params, bn, opt_state,
                    backend="orbax")
    other = optax.sgd(1e-3, momentum=0.9).init(
        jax.tree_util.tree_map(jnp.asarray, params))
    ck = load_checkpoint(tmp_path / "ck.orbax", opt_state_template=other)
    assert ck["opt_state"] is None
    _assert_tree_equal(ck["params"], params)


@pytest.mark.timeout(600)
def test_trainer_orbax_backend_end_to_end(tmp_path):
    """checkpoint_backend: orbax drives the whole Trainer contract: async
    best-epoch save, finale wait + metrics-bearing DIRECTORY rename, reload
    for the final eval — then the CLI --export loads the orbax checkpoint
    through the same dispatch (cross-backend loader)."""
    from jspsr_tpu.cli.main import main
    from jspsr_tpu.data.synthetic import generate_mini_dfc30

    data_root = tmp_path / "datasets"
    generate_mini_dfc30(data_root / "DFC30_8m", train_cities=("Brest",),
                        valid_cities=("Vannes",), n_per_city=2, size=64)
    cfg = {
        "name": "orbax_smoke", "verbose": False, "dataset": "DFC30",
        "data_root": str(data_root),
        "train_set": ["Brest"], "valid_set": ["Vannes"],
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
        "checkpoint_backend": "orbax",
    }
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = main(["--config", str(cfg_path),
                "--result-dir", str(tmp_path / "run")])
    from pathlib import Path

    ck = Path(out["checkpoint"])
    assert ck.is_dir() and ck.suffix == ".orbax", ck
    assert "RMSE" in ck.name  # metrics-bearing rename happened
    assert np.isfinite(out["result"]["RMSE"])

    # cross-backend load: --export builds the model FROM the orbax dir
    cfg["model_kwargs"]["checkpoint"] = str(ck)
    cfg_path.write_text(yaml.safe_dump(cfg))
    art = main(["--config", str(cfg_path),
                "--export", str(tmp_path / "deploy"),
                "--result-dir", str(tmp_path / "exp")])
    assert art.exists() and art.stat().st_size > 1000
