"""Accuracy gate for the bf16 mixed-precision body (PERF.md).

Trains the flagship-shaped JSPSR twice on the SAME synthetic mini-DFC30
(same seed, same data) — fp32 body vs compute_dtype=bfloat16 — and compares
final validation RMSE in meters. Round 1 rejected ALL-bf16 inference
(+1.55 m RMSE) because the log-minmax elevation VALUES were quantized; the
mixed scheme keeps the DEM path and deformable sampling in fp32, so the
expectation is parity. This script is the evidence.

Usage: python scripts/soak_bf16_compare.py [epochs] [--cpu] [--r3]
       [--device-cache] [--seed N]

--seed varies BOTH the synthetic terrain and the training seed, so a
second-seed run is an independent replication of the gate (round-3
VERDICT #5: the +8.8 % offline-mosaic gap was single-seed).

--r3 runs the gate under the reference's r3 tiled protocol instead (334^2
scenes -> 9 overlapping 128^2 TileCrops, mosaic-merged offline summary):
the PASS requires bf16 RMSE parity AND the SR mosaics beating the COP30
input product in the pooled offline view (round-2 VERDICT #7).
"""

import json
import os
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from jspsr_tpu.config.loader import AttrDict
from jspsr_tpu.data.synthetic import generate_mini_dfc30
from jspsr_tpu.train.trainer import Trainer


def make_config(root, train, valid, epochs, compute_dtype, r3=False,
                device_cache=False, seed=0, sample_dtype=None):
    return AttrDict({
        "name": f"bf16_gate_{compute_dtype or 'fp32'}"
                + ("_sdt" if sample_dtype else ""),
        "dataset": "DFC30",
        "dataset_path": str(root), "resolution": 3 if r3 else 8,
        "train_set": train, "valid_set": valid,
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3, "mask": 15},
        "relative": True, "augment": True, "patch_size": 128,
        "crop_mode": "tile" if r3 else "random",
        "patches_per_image": 9 if r3 else 1, "workers": 2,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 2, "num_feature": 32, "spn": True,
                         "pretrained": False, "checkpoint": None,
                         "compute_dtype": compute_dtype,
                         "spn_sample_dtype": sample_dtype},
        "loss": {"L1": 1, "L2": 1, "Grad": 0.1},
        "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                             "momentum": 0.9, "diff_lr": False},
        "scheduler": "WarmupStepLR",
        "scheduler_kwargs": {"max_lr": 1e-3, "step_size": 100, "gamma": 0.5,
                             "warmup_epoch": 2},
        "train_batch_size": 16, "epochs": epochs, "resume": False,
        "valid_batch_size": 1, "val_interval": max(epochs // 3, 1),
        "val_start_epoch": 1,
        "metric": {
            "PSNR": {"package": "piq", "border": 0.05, "min": -80, "max": 929},
            "RMSE": {"package": "local", "border": 0.05, "min": -80, "max": 929},
        },
        "best_metric": "RMSE", "val_border": 0.05,
        "early_stop": {"patience": None, "monitor": "val_rmse"},
        "verbose": False, "seed": seed,
        # --device-cache: soak the shipped fast feed (HBM-resident scene
        # cache; device_normalize is its prerequisite raw-feed math)
        "device_normalize": device_cache, "device_cache": device_cache,
    })


def main(epochs: int = 40, r3: bool = False, device_cache: bool = False,
         seed: int = 0, sample_dtype: bool = False):
    tmp = Path(tempfile.mkdtemp(prefix="jspsr_bf16_gate_"))
    if r3:
        # r3 tiled protocol: 334^2 scenes, 9 TileCrops each, mosaic summary
        root, train, valid = generate_mini_dfc30(
            tmp / "DFC30_3m",
            train_cities=("Brest", "Caen"), valid_cities=("Vannes",),
            n_per_city=4, size=334, resolution=3, seed=seed)
    else:
        root, train, valid = generate_mini_dfc30(
            tmp / "DFC30_8m",
            train_cities=("Brest", "Caen", "Calais_Dunkerque",
                          "Clermont-Ferrand"),
            valid_cities=("Vannes",), n_per_city=12, size=128, seed=seed)
    results = {}
    arms = [("fp32", None, None), ("bf16", "bfloat16", None)]
    if sample_dtype:
        # --sample-dtype: third arm gates spn_sample_dtype=bfloat16 (bf16
        # image matmuls inside the deformable sampling kernel) against the
        # same fp32 ground truth as the body gate
        arms.append(("bf16_sdt", "bfloat16", "bfloat16"))
    for tag, cdt, sdt in arms:
        trainer = Trainer(make_config(root, train, valid, epochs, cdt,
                                      r3=r3, device_cache=device_cache,
                                      seed=seed, sample_dtype=sdt),
                          result_dir=tmp / f"run_{tag}")
        out = trainer.fit(initial_eval=False)
        final = out["result"]
        results[tag] = {"RMSE": float(final["RMSE"]),
                        "PSNR": float(final["PSNR"]),
                        "input_RMSE": float(final["input"]["RMSE"])
                        if "input" in final else None}
        if out.get("summary"):
            off = out["summary"]["offline"]
            results[tag]["offline"] = {
                name: round(stats["RMSE"], 4)
                for name, stats in off.items() if stats
            }
        print(json.dumps({"case": tag, **results[tag]}), flush=True)
    delta = results["bf16"]["RMSE"] - results["fp32"]["RMSE"]
    rel = delta / results["fp32"]["RMSE"]
    checks = [rel < 0.05]
    extra = {}
    if "bf16_sdt" in results:
        delta_s = results["bf16_sdt"]["RMSE"] - results["fp32"]["RMSE"]
        rel_s = delta_s / results["fp32"]["RMSE"]
        extra["sdt_rmse_delta_m"] = round(delta_s, 4)
        extra["sdt_rel"] = round(rel_s, 4)
        checks.append(rel_s < 0.05)
    if r3:
        # mosaic-level requirement: SR beats the COP30 input product in the
        # pooled offline view, in BOTH precisions
        for tag in ("fp32", "bf16"):
            off = results[tag].get("offline") or {}
            sr, cop = off.get("SR"), off.get("COP30")
            extra[f"{tag}_sr_vs_cop30"] = (sr, cop)
            checks.append(sr is not None and cop is not None and sr < cop)
    verdict = "PASS" if all(checks) else "FAIL"
    print(json.dumps({"case": "gate", "rmse_delta_m": round(delta, 4),
                      "rel": round(rel, 4), **extra, "verdict": verdict}),
          flush=True)
    return 0 if verdict == "PASS" else 1


if __name__ == "__main__":
    argv = sys.argv[1:]
    seed = 0
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    epochs = next((int(a) for a in argv if a.isdigit()), 40)
    raise SystemExit(main(epochs, r3="--r3" in argv,
                          device_cache="--device-cache" in argv,
                          sample_dtype="--sample-dtype" in argv,
                          seed=seed))
