"""TPU probe: END-TO-END Trainer throughput vs the resident-data step bench
(round-2 VERDICT #4).

Every prior perf number is a synthetic chained step on resident device
arrays; this runs the REAL pipeline — DataLoader threads decoding synthetic
DFC30 tiles -> build_batch_inputs -> shard_batch device_put -> jitted train
step — and reports the epoch tiles/s next to the same-process resident-data
step throughput. A ratio >= 0.9 means the host feed costs < 10%.

Both measurements run in ONE process (tunnel compiles are not shared across
processes; cross-process comparisons drift ~10%).

Usage: python scripts/bench_trainer_e2e.py [--batch 48] [--dtype bfloat16]
       [--epochs 3] [--scenes 48]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

import numpy as np


def ensure_fixture(data_root, scenes):
    """Create (once) the synthetic DFC30 fixture used by the e2e probes."""
    from jspsr_tpu.data.synthetic import generate_mini_dfc30

    data_root = Path(data_root)
    if not data_root.exists():
        t0 = time.perf_counter()
        generate_mini_dfc30(data_root, train_cities=("Brest",),
                            valid_cities=("Vannes",),
                            n_per_city=scenes, size=128)
        print(f"# fixture: {scenes} scenes/city in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    return data_root


def make_config(data_root, batch, dtype, workers=4, **overrides):
    """Trainer config for the e2e feed benchmark (flagship JSPSR shape)."""
    from jspsr_tpu.config.loader import AttrDict

    p = AttrDict({
        "name": "bench_e2e", "verbose": False, "dataset": "DFC30",
        "dataset_path": str(data_root), "resolution": 8,
        "train_set": ["Brest"], "valid_set": ["Vannes"],
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3, "mask": 10},
        "mask_channel": list(range(10)),
        "relative": True, "augment": True, "patch_size": 128,
        "crop_mode": "random", "patches_per_image": 1,
        "device_normalize": False,
        "workers": workers, "preload": True,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 2, "num_feature": 32, "spn": True,
                         "compute_dtype": dtype,
                         "pretrained": False, "checkpoint": None},
        "loss": {"L1": 1, "L2": 1, "Grad": 0.1},
        "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                             "momentum": 0.9, "diff_lr": False},
        "scheduler": "ConstantLR", "scheduler_kwargs": {},
        "train_batch_size": batch, "epochs": 3,
        "resume": False, "valid_batch_size": 1,
        "val_interval": 10**9, "val_start_epoch": 10**9,
        "metric": {"RMSE": {"package": "local", "min": -80, "max": 929}},
        "best_metric": "RMSE", "early_stop": {},
        "seed": 0,
    })
    p.update(overrides)
    return p


def run_epochs(cfg, epochs, label, result_dir=None):
    """Run ``epochs`` training epochs; return (best post-compile epoch
    tiles/s, per-epoch list). Epoch 0 pays the step/normalize compiles."""
    from jspsr_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, result_dir=result_dir
                      or f"/tmp/bench_e2e/run_{label}")
    tps_epochs = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        trainer.train_one_epoch(epoch)
        dt = time.perf_counter() - t0
        tps = trainer.last_throughput
        tps_epochs.append(tps)
        print(f"# [{label}] epoch {epoch}: {dt:.2f}s, {tps:.1f} tiles/s",
              file=sys.stderr, flush=True)
    return (max(tps_epochs[1:]) if len(tps_epochs) > 1
            else tps_epochs[0]), tps_epochs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--scenes", type=int, default=48, help="tiles per city")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--step-iters", type=int, default=10)
    ap.add_argument("--device-normalize", action="store_true",
                    help="raw uint8 feed + on-device normalization")
    ap.add_argument("--no-prefetch", action="store_true",
                    help="disable the double-buffered device_prefetch")
    ap.add_argument("--pack-mask", action="store_true",
                    help="bit-packed mask transfer (requires device norm)")
    ap.add_argument("--compare", action="store_true",
                    help="sweep feed variants in ONE process: devnorm sync, "
                         "devnorm+prefetch, devnorm+prefetch+pack")
    args = ap.parse_args()

    data_root = ensure_fixture(
        Path(os.environ.get("BENCH_DATA", "/tmp/bench_e2e")) / "DFC30_8m",
        args.scenes)
    p = make_config(data_root, args.batch, args.dtype, workers=args.workers,
                    device_normalize=args.device_normalize,
                    device_prefetch=not args.no_prefetch,
                    pack_mask=args.pack_mask)
    # model channels expect 15 mask ch in the flagship shape; the synthetic
    # mask has 15, mask_channel selects 10 like the shipped r8 img+msk cfg

    def run_variant(overrides, label):
        from jspsr_tpu.config.loader import AttrDict as AD

        cfg = AD(dict(p))
        cfg.update(overrides)
        return run_epochs(cfg, args.epochs, label)

    variants = {}
    if args.compare:
        # one process so every variant shares the step compile; the step
        # program is identical across feeds — only the tiny normalize
        # program differs (pack changes its input shape)
        for label, ov in (
            ("devnorm_sync", {"device_normalize": True,
                              "device_prefetch": False}),
            ("devnorm_prefetch_pack", {"device_normalize": True,
                                       "device_prefetch": True,
                                       "prefetch_split": False,
                                       "pack_mask": True}),
            ("devnorm_prefetch_split_pack", {"device_normalize": True,
                                             "device_prefetch": True,
                                             "prefetch_split": True,
                                             "pack_mask": True}),
            # HBM-resident scene cache: no host batches at all — per-step
            # host work is a few ints of crop/aug params + one dispatch
            ("devcache", {"device_normalize": True, "device_cache": True}),
        ):
            best, epochs_tps = run_variant(ov, label)
            variants[label] = {"best": round(best, 1),
                               "epochs": [round(t, 1) for t in epochs_tps]}
        e2e_tps = max(v["best"] for v in variants.values())
    else:
        e2e_tps, _ = run_variant({}, "single")

    # same-process resident-data step bench at the identical config
    from scripts.bench_train_probe import build

    step, state, inputs, gt = build(args.batch,
                                    compute_dtype=args.dtype)
    for _ in range(2):
        state, losses = step(state, inputs, gt)
    float(losses["Total"])
    t0 = time.perf_counter()
    for _ in range(args.step_iters):
        state, losses = step(state, inputs, gt)
    float(losses["Total"])
    step_tps = args.batch * args.step_iters / (time.perf_counter() - t0)

    ratio = e2e_tps / step_tps
    print(json.dumps({
        "e2e_trainer_tiles_per_sec": round(e2e_tps, 1),
        "resident_step_tiles_per_sec": round(step_tps, 1),
        "ratio": round(ratio, 3),
        "batch": args.batch, "dtype": args.dtype,
        "device_normalize": args.device_normalize,
        "variants": variants or None,
    }))


if __name__ == "__main__":
    main()
