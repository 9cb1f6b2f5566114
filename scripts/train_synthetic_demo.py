"""Convergence sanity run: train a small JSPSR on the synthetic mini-DFC30
and verify the learned model beats the raw-input baseline on RMSE.

Usage: python scripts/train_synthetic_demo.py [epochs] [--cpu]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from jspsr_tpu.config.loader import AttrDict
from jspsr_tpu.data.synthetic import generate_mini_dfc30
from jspsr_tpu.train.trainer import Trainer


def main(epochs: int = 30):
    tmp = Path(tempfile.mkdtemp(prefix="jspsr_demo_"))
    root, train, valid = generate_mini_dfc30(
        tmp / "DFC30_8m", train_cities=("Brest", "Caen"),
        valid_cities=("Vannes",), n_per_city=6, size=64)
    p = AttrDict({
        "name": "synthetic_demo", "dataset": "DFC30",
        "dataset_path": str(root), "resolution": 8,
        "train_set": train, "valid_set": valid,
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3},
        "relative": True, "augment": True, "patch_size": 64,
        "crop_mode": "random", "patches_per_image": 1, "workers": 2,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 16, "spn": True,
                         "pretrained": False, "checkpoint": None},
        "loss": {"L1": 1, "L2": 1, "Grad": 0.1},
        "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                             "momentum": 0.9, "diff_lr": False},
        "scheduler": "WarmupStepLR",
        "scheduler_kwargs": {"max_lr": 1e-3, "step_size": 100, "gamma": 0.5,
                             "warmup_epoch": 2},
        "train_batch_size": 4, "epochs": epochs, "resume": False,
        "valid_batch_size": 1, "val_interval": 5, "val_start_epoch": 1,
        "metric": {
            "PSNR": {"package": "piq", "border": 0.05, "min": -80, "max": 929},
            "RMSE": {"package": "local", "border": 0.05, "min": -80, "max": 929},
        },
        "best_metric": "RMSE", "val_border": 0.05,
        "early_stop": {"patience": None, "monitor": "val_rmse"},
        "verbose": True, "seed": 0,
    })
    trainer = Trainer(p, result_dir=tmp / "run")
    initial = trainer.evaluate(compare_input=True)
    print(f"initial: SR RMSE {initial['RMSE']:.3f} m | "
          f"input RMSE {initial['input']['RMSE']:.3f} m")
    out = trainer.fit(initial_eval=False)
    final = out["result"]
    print(f"final:   SR RMSE {final['RMSE']:.3f} m | "
          f"input RMSE {final['input']['RMSE']:.3f} m | "
          f"PSNR {final['PSNR']:.2f} dB")
    improved = final["RMSE"] < initial["RMSE"]
    beats_input = final["RMSE"] < final["input"]["RMSE"]
    print(f"improved_over_init={improved} beats_raw_input={beats_input}")
    return 0 if (improved and beats_input) else 1


if __name__ == "__main__":
    epochs = next((int(a) for a in sys.argv[1:] if a.isdigit()), 30)
    raise SystemExit(main(epochs))
