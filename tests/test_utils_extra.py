"""Model summary, pair_state_dict positional re-keying, CLI smoke test."""

import numpy as np
import pytest
import yaml
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from jspsr_tpu.models.edsr import EDSR
from jspsr_tpu.utils.summary import count_parameters, model_summary
from jspsr_tpu.utils.torch_import import (
    expected_torch_keys, import_torch_state_dict, pair_state_dict,
)


def test_model_summary_and_param_count():
    model = EDSR(in_channels=4, out_channels=1, n_resblocks=2, n_features=8)
    params, state = model.init(jax.random.PRNGKey(0))
    text = model_summary(model, params, state,
                         jnp.zeros((1, 16, 16, 4)))
    assert "TOTAL" in text and "output: (1, 16, 16, 1)" in text
    assert count_parameters(params) > 0


def test_pair_state_dict_positional_rekeying():
    """A foreign checkpoint with alien names loads by position."""
    model = EDSR(in_channels=3, out_channels=3, n_resblocks=2, n_features=8)
    # oracle torch EDSR with reference naming
    from tests.reference_oracle import ref_edsr

    torch.manual_seed(0)
    tmodel = ref_edsr(in_channels=3, out_channels=3, n_resblocks=2,
                      n_features=8, scale=1, res_scale=0.1, spn=False)
    sd = tmodel.state_dict()
    foreign = {f"alien.{i}": v for i, v in enumerate(sd.values())}
    rekeyed = pair_state_dict(model, foreign)
    assert list(rekeyed) == expected_torch_keys(model)
    params, state = import_torch_state_dict(model, rekeyed)
    # equals the direct import
    params2, _ = import_torch_state_dict(model, sd)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_validate_smoke(tmp_path):
    """End-to-end CLI: temp YAML over the synthetic fixture, 1 epoch."""
    from jspsr_tpu.data.synthetic import generate_mini_dfc30
    from jspsr_tpu.cli.main import main

    data_root = tmp_path / "datasets"
    root, train, valid = generate_mini_dfc30(
        data_root / "DFC30_8m", train_cities=("Brest",),
        valid_cities=("Vannes",), n_per_city=2, size=64)
    cfg = {
        "name": "cli_smoke", "verbose": False, "dataset": "DFC30",
        "data_root": str(data_root),
        "train_set": train, "valid_set": valid,
        "input_data": {"COP30": 1, "image": 3},
        "resolution": 8, "workers": 1, "relative": True, "augment": True,
        "patch_size": 32, "crop_mode": "random",
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8,
                         "pretrained": False, "checkpoint": None},
        "loss": {"L1": 1, "L2": 1, "Grad": 0.1},
        "optimizer": "AdamW",
        "optimizer_kwargs": {"weight_decay": 1e-6, "momentum": 0.9,
                             "lr": 1e-3},
        "scheduler": "WarmupStepLR",
        "scheduler_kwargs": {"max_lr": 1e-3, "step_size": 100, "gamma": 0.5,
                             "warmup_epoch": 1},
        "train_batch_size": 2, "epochs": 1, "resume": False,
        "early_stop": {"patience": None, "monitor": "val_rmse"},
        "valid_batch_size": 1, "val_interval": 1, "val_start_epoch": 1,
        "metric": {"PSNR": {"package": "piq"},
                   "RMSE": {"package": "local"}},
        "best_metric": "RMSE", "val_border": 0.05, "patches_per_image": 1,
    }
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = main(["--config", str(cfg_path),
                "--result-dir", str(tmp_path / "run")])
    assert out["best_result"] is not None
    ckpt = out["checkpoint"]
    # validate-only path
    cfg["model_kwargs"]["checkpoint"] = ckpt
    cfg_path.write_text(yaml.safe_dump(cfg))
    res = main(["--config", str(cfg_path), "--val",
                "--result-dir", str(tmp_path / "run_val")])
    assert np.isfinite(res["RMSE"])


def test_gen_crop_subset(tmp_path):
    from jspsr_tpu.utils.geo_prep import gen_crop_subset
    from jspsr_tpu.data.raster_io import write_raster, read_raster, default_profile

    rng = np.random.default_rng(0)
    big = rng.normal(size=(64, 64, 1)).astype(np.float32)
    src = tmp_path / "big.npy"
    write_raster(src, big, default_profile(64, 64, 1, "float32", 1000.0,
                                           2000.0, 8.0))
    paths = gen_crop_subset(src, tmp_path / "crops", crop_size=32)
    assert len(paths) == 4
    tile, prof = read_raster(paths[3], with_profile=True)
    np.testing.assert_array_equal(tile, big[32:, 32:])
    assert prof["transform"][2] == 1000.0 + 8.0 * 32  # shifted origin
    assert prof["transform"][5] == 2000.0 - 8.0 * 32


def test_trainer_loads_reference_pt_checkpoint(tmp_path):
    """Reference users' .pt files load directly into the Trainer."""
    from tests.reference_oracle import ref_jspsr
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.data.synthetic import generate_mini_dfc30
    from jspsr_tpu.train.trainer import Trainer

    torch.manual_seed(3)
    tmodel = ref_jspsr(in_channels={"lr_dem": 1, "image": 3},
                       out_channels=1, num_feature=8, layers=(1, 1, 1, 1),
                       spn=True)
    ckpt = {"state_dict": tmodel.state_dict(), "optimizer": None,
            "scheduler": None, "epoch": 42, "best_result": {"RMSE": 1.5}}
    pt_path = tmp_path / "ref.pt"
    torch.save(ckpt, pt_path)

    root, train, valid = generate_mini_dfc30(
        tmp_path / "d", train_cities=("Brest",), valid_cities=("Vannes",),
        n_per_city=2, size=32)
    p = AttrDict({
        "name": "pt_load", "dataset": "DFC30", "dataset_path": str(root),
        "resolution": 8, "train_set": train, "valid_set": valid,
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3},
        "relative": True, "augment": False, "patch_size": 32,
        "crop_mode": "tile", "patches_per_image": 1, "workers": 1,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8, "spn": True,
                         "pretrained": False, "checkpoint": None},
        "loss": {"L1": 1}, "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 0, "momentum": 0.9},
        "scheduler": "ConstantLR", "scheduler_kwargs": {},
        "train_batch_size": 2, "epochs": 1,
        "metric": {"RMSE": {"package": "local", "border": 0.0,
                            "min": -80, "max": 929}},
        "best_metric": "RMSE", "verbose": False, "seed": 0,
    })
    trainer = Trainer(p, result_dir=tmp_path / "run")
    trainer.load(pt_path, resume=True)
    assert trainer.start_epoch == 43
    assert trainer.best_result == {"RMSE": 1.5}
    res = trainer.evaluate()
    assert np.isfinite(res["RMSE"])
    # imported params actually match the torch model's
    w_t = tmodel.conv_dem.conv[0].weight.detach().numpy()
    w_j = np.asarray(trainer.state.params["conv_dem"]["conv"]["w"])
    np.testing.assert_allclose(w_j.transpose(3, 2, 0, 1), w_t, rtol=1e-6)
