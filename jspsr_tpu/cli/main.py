"""CLI entry point (reference main.py:33-44):

  python -m jspsr_tpu.cli.main --config configs/jspsr_r8_img.yml [--val]
  python -m jspsr_tpu.cli.main --config c.yml --infer <scene> [--out o.tif]

--val runs validation-only from model_kwargs.checkpoint (reference
main.py:148-159). --infer runs full-scene inference on a raster (or a
scene directory with one raster per modality) and writes the upscaled DEM
in meters — the CLI form of the reference's library-only upscale_dem
(utils/utils.py:1556-1655); --tile uses the device-resident tile-parallel
feathered path instead of whole-scene mirror-padding. A directory of
scene directories runs the pipelined batch serving loop (eval/serve.py).
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime
from pathlib import Path

from jspsr_tpu.config.loader import create_config
from jspsr_tpu.train.trainer import Trainer
from jspsr_tpu.utils.logging import Logger


def parse_args(argv=None):
    ap = argparse.ArgumentParser("jspsr-tpu")
    ap.add_argument("--config", required=True, help="experiment yaml")
    ap.add_argument("--val", action="store_true",
                    help="validate only (needs model_kwargs.checkpoint)")
    ap.add_argument("--result-dir", default=None)
    ap.add_argument("--infer", default=None, metavar="SCENE",
                    help="full-scene inference: LR-DEM raster or scene dir "
                         "(needs model_kwargs.checkpoint)")
    ap.add_argument("--out", default=None,
                    help="--infer output: raster path for a single scene, "
                         "output DIRECTORY for a batch of scenes")
    ap.add_argument("--tile", action="store_true",
                    help="--infer via the tile-parallel feathered mosaic")
    ap.add_argument("--export", default=None, metavar="PATH",
                    help="serialize the eval forward (weights baked in) as "
                         "a StableHLO deployment artifact (jax.export; "
                         "needs model_kwargs.checkpoint)")
    return ap.parse_args(argv)


def _maybe_init_distributed(p) -> int:
    """Multi-host bootstrap: every host of a pod slice runs this same CLI.

    `distributed: true` in the YAML (or JSPSR_DISTRIBUTED=1) calls
    jax.distributed.initialize() BEFORE the first backend use; with no
    kwargs it auto-discovers coordinator + ranks on TPU pods (GCE
    metadata), Slurm, and Open MPI, or reads JAX_COORDINATOR_ADDRESS.
    Manual launches pass `distributed_kwargs: {coordinator_address,
    num_processes, process_id}`. Everything downstream is already
    process-aware: the DataLoader takes shard process_index::process_count
    (train/trainer.py), shard_batch feeds global arrays from local shards
    (parallel/mesh.py), replicate_state/set_learning_rate never issue
    cross-process collectives, and only process 0 writes checkpoints
    (train/checkpoint.py). Returns the process index (0 when not
    distributed). Multi-host runs should pass --result-dir so every host
    agrees on the run directory name (the default is timestamped).
    """
    import os

    if not (p.get("distributed") or os.environ.get("JSPSR_DISTRIBUTED")):
        return 0
    import jax

    jax.distributed.initialize(**(p.get("distributed_kwargs") or {}))
    print(f"[distributed] process {jax.process_index()}/"
          f"{jax.process_count()} up, {jax.device_count()} global devices",
          file=sys.stderr)
    return jax.process_index()


def main(argv=None):
    args = parse_args(argv)
    p = create_config(args.config)
    proc = _maybe_init_distributed(p)
    stamp = datetime.now().strftime("%m%d_%H%M")
    result_dir = Path(args.result_dir or
                      Path(p.get("work_root", ".")) / "results" / f"{stamp}_{p.name}")
    result_dir.mkdir(parents=True, exist_ok=True)
    # one log file per process: hosts may share result_dir over NFS
    log_name = "train.log" if proc == 0 else f"train.proc{proc}.log"
    sys.stdout = Logger(result_dir / log_name)

    ckpt = p.model_kwargs.get("checkpoint")
    if args.export:
        # deployment artifact: jitted eval forward -> StableHLO, symbolic
        # batch dim, CPU+TPU lowering (eval/export.py)
        import numpy as np

        from jspsr_tpu.data.loader import build_batch_inputs, input_kinds
        from jspsr_tpu.eval.export import save_exported
        from jspsr_tpu.models.factory import build_model
        from jspsr_tpu.train.checkpoint import load_model_params

        if not ckpt:
            raise ValueError("--export requires model_kwargs.checkpoint")
        model = build_model(p)
        params, bn_state = load_model_params(model, ckpt,
                                             seed=p.get("seed") or 0)
        size = p.patch_size
        batch = {k: np.zeros((1, size, size, int(p.input_data[k])),
                             np.float32)
                 for k in input_kinds(p.input_data)}
        batch["hr_dem"] = np.zeros((1, size, size, 1), np.float32)
        inputs, _, _, _ = build_batch_inputs(batch, p.model_name,
                                             p.input_data)
        # export_platforms: [tpu] opts into the TPU-only fast artifact
        # that keeps the Pallas deformable custom call (see PERF.md
        # "Exported artifact vs in-process" for the measured tradeoff);
        # default stays the portable CPU+TPU mxu-pinned lowering
        platforms = tuple(p.get("export_platforms") or ("cpu", "tpu"))
        deform_impl = None if platforms == ("tpu",) else "mxu"
        out = save_exported(args.export, model, params, bn_state, inputs,
                            platforms=platforms, deform_impl=deform_impl)
        print(f"Exported inference artifact: {out} "
              f"({out.stat().st_size / 1e6:.1f} MB)")
        return out

    if args.infer:
        # scene inference needs no dataset — build only the model
        from jspsr_tpu.eval.inference import run_scene_inference
        from jspsr_tpu.models.factory import build_model
        from jspsr_tpu.train.checkpoint import load_model_params

        assert ckpt, "--infer requires model_kwargs.checkpoint"
        model = build_model(p)
        params, bn_state = load_model_params(model, ckpt,
                                             seed=p.get("seed") or 0)

        # batch mode: a directory of scene directories runs the pipelined
        # serving loop (loader/dispatch/writer threads, eval/serve.py)
        from jspsr_tpu.eval.scene import device_tiling_supported
        from jspsr_tpu.eval.serve import discover_scenes, serve_scenes

        scenes = discover_scenes(args.infer)
        if scenes:
            from jspsr_tpu.eval.serve import scene_ext

            out_dir = Path(args.out or result_dir / "predictions")
            if (args.tile and device_tiling_supported(p)
                    and p.get("infer_device_tiling", True)):
                # size-aware batch default (PERF.md serving sweeps: sb8 at
                # 334², sb2 at 1024² — over-batching large scenes measured
                # 56 % slower); infer_scene_batch overrides
                sb = int(p.get("infer_scene_batch") or 0)
                if not sb:
                    from jspsr_tpu.eval.serve import (auto_scene_batch,
                                                      probe_scene_hw)

                    try:
                        sb = auto_scene_batch(
                            probe_scene_hw(scenes[0]),
                            tile=p.get("patch_size", 128),
                            n_scenes=len(scenes))
                    except Exception as e:
                        print(f"[serve] scene probe failed ({e}); "
                              f"scene_batch=4")
                        sb = min(4, len(scenes))
                paths, t_ms, sps = serve_scenes(
                    model, params, bn_state, p, scenes, out_dir,
                    tile=p.get("patch_size", 128), scene_batch=sb,
                    loader_threads=int(p.get("infer_loader_threads") or 1))
            else:
                # whole-scene per scene (no --tile), or the sequential
                # fallback for config surfaces the device path can't cover
                import time as _t

                t0 = _t.perf_counter_ns()
                paths = [run_scene_inference(
                    model, params, bn_state, p, s,
                    out_dir / f"{s.name}_sr{scene_ext(s)}",
                    tile=args.tile)[0]
                    for s in scenes]
                t_ms = (_t.perf_counter_ns() - t0) // 1000 / 1000
                sps = len(paths) / max(t_ms, 1e-9) * 1000
            print(f"Inference: {len(paths)} scenes -> {out_dir} "
                  f"({t_ms:.1f} ms, {sps:.2f} scenes/s)")
            return paths

        out = args.out or str(result_dir / "upscaled_dem.tif")
        path, t_ms, mem = run_scene_inference(
            model, params, bn_state, p, args.infer, out, tile=args.tile)
        print(f"Inference: {path} ({t_ms:.1f} ms, peak {mem:.0f} MB)")
        return path

    trainer = Trainer(p, result_dir=result_dir)

    # `val_weight: True` in the YAML is the config-side spelling of --val
    # (reference main.py:36-44 sets configs["val_weight"]=True from the flag
    # and :148-160 branches on the key, so a config can request eval-only)
    if args.val or p.get("val_weight"):
        if not ckpt:
            # reference raises here too (main.py:160-161); ValueError (not
            # assert) so the guard survives python -O and names both spellings
            raise ValueError(
                "val_weight/--val requires model_kwargs.checkpoint")
        trainer.load(ckpt, resume=False)
        pred_dir = result_dir / "predictions"
        result = trainer.evaluate(compare_input=True, save_dir=pred_dir)
        print(f"Validation: {result}")
        # offline whole-split summary vs every discovered public product
        # (reference --val path ends in summarise_evaluation, main.py:148-159;
        # COP30/FABDEM/FATHOM auto-discovery, utils/utils.py:996-1004)
        try:
            from jspsr_tpu.eval.summarise import summarise_run

            lr_files = {sid: f for sid, f in
                        zip(trainer.valid_set.id,
                            trainer.valid_set.files["lr_dem"])}
            summary = summarise_run(p, trainer.valid_set, pred_dir,
                                    result_dir, plots=True,
                                    lr_files=lr_files)
            print(f"Summary (offline pooled): {summary['offline']}")
        except Exception as e:
            print(f"[summarise] skipped: {e}")
        return result

    if ckpt:
        trainer.load(ckpt, resume=bool(p.get("resume")))
    return trainer.fit()


if __name__ == "__main__":
    main()
