"""r3 protocol end-to-end: 334x334 scenes -> 9 overlapping 128 tiles ->
train 1 epoch -> eval -> tiled offline summary with mosaic merge."""

import numpy as np
import pytest
import yaml

from jspsr_tpu.data.synthetic import generate_mini_dfc30
from jspsr_tpu.cli.main import main


def test_r3_tiled_cli_end_to_end(tmp_path):
    data_root = tmp_path / "datasets"
    root, train, valid = generate_mini_dfc30(
        data_root / "DFC30_3m", train_cities=("Brest",),
        valid_cities=("Vannes",), n_per_city=1, size=334, resolution=3)
    cfg = {
        "name": "r3_smoke", "verbose": False, "dataset": "DFC30",
        "data_root": str(data_root),
        "train_set": train, "valid_set": valid,
        "input_data": {"COP30": 1, "image": 3},
        "resolution": 3, "workers": 2, "relative": True, "augment": True,
        "patch_size": 128, "crop_mode": "tile",
        "tensor_kwargs": {"log": True, "min": -80, "max": 933,
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
        "train_batch_size": 3, "epochs": 1, "resume": False,
        "early_stop": {"patience": None, "monitor": "val_rmse"},
        "valid_batch_size": 1, "val_interval": 1, "val_start_epoch": 1,
        "metric": {"PSNR": {"package": "piq"},
                   "RMSE": {"package": "local"}},
        "best_metric": "RMSE", "val_border": 0.05,
    }
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = main(["--config", str(cfg_path),
                "--result-dir", str(tmp_path / "run")])
    assert np.isfinite(out["result"]["RMSE"])

    # validate-only with prediction dump + mosaic summarise
    cfg["model_kwargs"]["checkpoint"] = out["checkpoint"]
    cfg_path.write_text(yaml.safe_dump(cfg))
    res = main(["--config", str(cfg_path), "--val",
                "--result-dir", str(tmp_path / "val")])
    assert np.isfinite(res["RMSE"])
    # 9 per-tile predictions written, mosaics merged back to full scenes
    preds = list((tmp_path / "val" / "predictions").glob("*.npy"))
    assert len(preds) == 9  # 1 valid scene x 9 tiles
    mosaics = list((tmp_path / "val" / "mosaics").glob("*.npy"))
    assert len(mosaics) == 1
    # offline summary discovered every public product next to the GT
    # (reference utils/utils.py:996-1004) and wrote the tabular + plot
    # outputs (utils/utils.py:1371-1490)
    import json

    summary = json.loads((tmp_path / "val" / "summary.json").read_text())
    for prod in ("SR", "COP30", "FABDEM", "FATHOM"):
        assert np.isfinite(summary["offline"][prod]["RMSE"]), prod
    csv_text = (tmp_path / "val" / "summary.csv").read_text()
    assert "FATHOM" in csv_text and "offline" in csv_text
    assert (tmp_path / "val" / "final_dist.png").exists()

    # the serialized config records the dataset sizes like the reference
    # (main.py:97-98 writes p.num_train_sample/num_val_sample before dump)
    dumped = json.loads((tmp_path / "run" / "config.json").read_text())
    assert dumped["num_train_sample"] == 9  # 1 train scene x 9 tiles
    assert dumped["num_val_sample"] == 9

    # `val_weight: True` in the YAML is the config-side spelling of --val
    # (reference main.py:36-44,148-160)
    cfg["val_weight"] = True
    cfg_path.write_text(yaml.safe_dump(cfg))
    res2 = main(["--config", str(cfg_path),
                 "--result-dir", str(tmp_path / "val_weight")])
    assert np.isfinite(res2["RMSE"])
