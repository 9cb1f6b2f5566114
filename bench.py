"""Throughput benchmark: DEM tiles/sec/chip on the flagship JSPSR.

Protocol (BASELINE.json): 128x128 DEM tiles at x8 SR with image+mask
guidance, single chip. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": R,
   "points": {...}, "train_step_tiles_per_sec": T, ...}

- value: best eval-mode fp32 forward throughput across the probed points
  (the headline).
- vs_baseline = value / (10 * torch-reference-CPU tiles/sec): the honest
  denominator is the ACTUAL PyTorch reference forward on host CPU
  (scripts/measure_cpu_baseline.py; cached in BASELINE_CPU.json).
  >= 1.0 means the >=10x-CPU north star is met.
- points: per-point trial table — every probed (kind, batch, dtype) with
  all trial throughputs and the spread, so chip contention or tunnel
  drift is visible in the captured artifact instead of silently eating
  the headline (round-2 VERDICT #1).
- train_step_tiles_per_sec: full fwd+bwd+AdamW update throughput at the
  best measured config (scripts/bench_train_probe.py sweep).
- train_step_bf16_tiles_per_sec: same step with the accuracy-gated
  mixed-precision bf16 body (PERF.md; RMSE parity in the soak gate).
- forward_bf16_tiles_per_sec: eval forward with the bf16 body at b16.
- e2e_trainer_tiles_per_sec: the REAL training pipeline (loader threads ->
  shard_batch -> jitted step) on synthetic DFC30 at the shipped bf16 feed
  config; e2e_vs_resident_ratio shows the host-feed cost (VERDICT r2 #4).

WORKFLOW RULE (VERDICT r4 #7): after every driver capture lands in
BENCH_r{N}.json, update README.md's Results table to cite THAT capture's
numbers and file name — every README number must trace to the newest
BENCH_r*.json or name its PERF.md section. The table header states which
capture it cites, so staleness is visible at a glance.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))
# compiles through the TPU tunnel are slow (minutes); cache them persistently
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))

TRIALS = 3


def _trial_stats(trials):
    best = max(trials)
    spread = (best - min(trials)) / abs(best) * 100 if best else 0.0
    return {"trials": [round(t, 1) for t in trials],
            "best": round(best, 1), "spread_pct": round(spread, 1)}


def measure(batch, iters=4, warmup=2, trials=TRIALS, inner=10, **model_kw):
    """Chained measurement: each forward's DEM input depends on the
    previous prediction (clip + feed back), and the final sync is a scalar
    fetch. This defeats runtimes whose block_until_ready does not actually
    wait for device completion (observed through the axon tunnel), so the
    number is a true sequential-execution throughput. ``inner`` forwards
    run inside ONE jitted lax.scan so the ~2 ms per-launch tunnel dispatch
    overhead is amortized (it would otherwise eat ~15 % of a 13 ms
    forward); the scan carry keeps every forward strictly sequential. One
    compile, ``trials`` timed repeats — best-of-N absorbs transient
    host/tunnel contention."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    import __graft_entry__ as g

    model, params, bn_state = g._flagship(**model_kw)
    dem, img, msk = g._example_inputs(batch, 128, 128)

    def chain(d):
        def body(dd, _):
            pred, _ = model(params, bn_state, [dd, img, msk], train=False)
            return jnp.clip(pred, 0.05, 0.95), None
        out, _ = lax.scan(body, d, None, length=inner)
        return out

    jfn = jax.jit(chain)
    d = dem
    for _ in range(warmup):
        d = jfn(d)
    float(d[0, 0, 0, 0])
    out = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            d = jfn(d)
        float(d[0, 0, 0, 0])  # true device sync
        out.append(batch * iters * inner / (time.perf_counter() - t0))
    return out


def measure_train(batch, remat_stages, iters=10, warmup=2, trials=TRIALS,
                  **model_kw):
    """Full train step (fwd+bwd+AdamW+BN merge), chained through TrainState."""
    from scripts.bench_train_probe import build

    step, state, inputs, gt = build(batch, remat_stages=remat_stages,
                                    **model_kw)
    for _ in range(warmup):
        state, losses = step(state, inputs, gt)
    float(losses["Total"])
    out = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = step(state, inputs, gt)
        float(losses["Total"])  # chained sync
        out.append(batch * iters / (time.perf_counter() - t0))
    return out


def measure_trainer_e2e(batch=48, dtype="bfloat16", epochs=4, scenes=480):
    """END-TO-END Trainer throughput on synthetic DFC30 at the shipped
    bf16 feed config: HBM-resident device scene cache — crop + augment +
    normalize on device, no host batch assembly (data/device_cache.py;
    0.946 of the resident step, vs 0.60 for the best host feed).
    Returns the post-compile per-epoch tiles/s (epoch 0 pays the step +
    normalize compiles) so the captured JSON carries variance evidence,
    not a single number (round-3 VERDICT #3). The step program shares
    shapes with the resident train_bf16 probe, so most of the compile is
    already cached in-process."""
    from scripts.bench_trainer_e2e import (ensure_fixture, make_config,
                                           run_epochs)

    data_root = ensure_fixture(Path("/tmp/bench_e2e_headline/DFC30_8m"),
                               scenes)
    cfg = make_config(data_root, batch, dtype,
                      device_normalize=True, device_cache=True)
    _, tps_epochs = run_epochs(cfg, epochs, "bench_headline",
                               result_dir="/tmp/bench_e2e_headline/run")
    return tps_epochs[1:] if len(tps_epochs) > 1 else tps_epochs


def measure_scene(size=1024, trials=5, **model_kw):
    """Device-tiled whole-scene latency (eval/scene.py): end-to-end
    upload+compute+download ms per scene, best-of-N (lowest; N=5 per
    round-3 VERDICT #2 — the 1024^2 point showed 12% tunnel spread at
    N=3)."""
    import __graft_entry__ as g
    from scripts.bench_infer_scene import make_p, make_scene
    from jspsr_tpu.eval.scene import tile_inference_device

    model, params, bn_state = g._flagship(**model_kw)
    p = make_p(model_kw.get("compute_dtype"))
    sample = make_scene(size)
    out = []
    for _ in range(trials + 1):  # first call compiles
        _, ms = tile_inference_device(model, params, bn_state, sample, p)
        out.append(ms)
    return out[1:]


def measure_serving(size=334, n=12, scene_batch=4, trials=TRIALS,
                    compute_dtype="bfloat16"):
    """Batch-serving throughput (eval/serve.py): scenes/s through the
    3-stage pipelined loop with scene batching, including raster IO —
    the README serving headline, captured in the driver artifact
    (round-3 VERDICT #5: the serving number was never in BENCH_r*.json).
    Round 5 captures BOTH the sb4 and sb8 arms at 334² plus the 1024² sb2
    rows, >=3 passes each — every serving claim in the README now has
    driver-reproducible variance evidence (round-4 VERDICT #1)."""
    import tempfile

    import __graft_entry__ as g
    from scripts.bench_serve_scenes import make_p, write_scenes
    from jspsr_tpu.eval.serve import serve_scenes

    model, params, bn_state = g._flagship(compute_dtype=compute_dtype)
    p = make_p(compute_dtype)
    out = []
    with tempfile.TemporaryDirectory() as td:
        scenes = write_scenes(Path(td) / "scenes", n, size)
        # warm the per-S compiled program
        serve_scenes(model, params, bn_state, p, scenes[:scene_batch],
                     Path(td) / "warm", scene_batch=scene_batch)
        for t in range(trials):
            _, _, sps = serve_scenes(model, params, bn_state, p, scenes,
                                     Path(td) / f"run{t}",
                                     scene_batch=scene_batch)
            out.append(sps)
    return out


def measure_model_family(name, kind="fwd"):
    """Per-family probes (EDSR/LRRU/CompletionFormer) so the driver JSON
    tracks every shipped model round-over-round, not just the flagship
    (round-4 VERDICT #5). Reuses the scripts/bench_models.py protocol
    (chained scan forward / full train step, fp32 b16)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from scripts.bench_models import (BATCH, CASES, INNER, chained_fwd_ms,
                                      model_inputs, train_step_ms)
    from jspsr_tpu.config.loader import AttrDict
    from jspsr_tpu.models.factory import build_model

    mk, input_data = CASES[name]
    p = AttrDict({"model_name": name, "model_kwargs": mk,
                  "input_data": input_data})
    model = build_model(p)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    inputs, rebuild = model_inputs(name, input_data, BATCH, rng)
    if kind == "train":
        gt = jnp.asarray(rng.uniform(0.3, 0.7, (BATCH, 128, 128, 1)),
                         jnp.float32)
        ms = train_step_ms(name, model, params, bn_state, inputs, gt,
                           trials=2)
    else:
        dem0 = jnp.asarray(rng.uniform(0.3, 0.7, (BATCH, 128, 128, 1)),
                           jnp.float32)
        inner = INNER.get(name, 10)
        ms = chained_fwd_ms(model, params, bn_state, dem0, rebuild,
                            iters=4 if inner == 10 else 10, inner=inner,
                            trials=2)
    return [BATCH / m * 1000 for m in ms]


def _arm_watchdog():
    """A dead axon relay makes the first jit hang forever in PJRT client
    init (connection-refused retry loop — see PERF.md measurement notes).
    Fail loudly with a diagnosis instead of hanging the capture. Returns
    the timer so the caller can DISARM it once the first probe completes:
    the hazard it guards is specifically the never-returning first jit,
    and a cold-cache full capture (many compiles + fixture generation +
    a possible CPU-baseline subprocess) can legitimately exceed any
    single static deadline."""
    import threading

    limit = float(os.environ.get("BENCH_WATCHDOG_S", "5400"))

    def fire():
        print(f"# BENCH WATCHDOG: no first measurement after {limit:.0f}s — "
              f"TPU tunnel likely down (check `curl 127.0.0.1:8083`); "
              f"no JSON emitted rather than a bogus number", file=sys.stderr,
              flush=True)
        os._exit(3)

    t = threading.Timer(limit, fire)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _arm_watchdog()
    points = {}

    def probe(name, fn, *args, **kw):
        try:
            trials = fn(*args, **kw)
        except Exception as e:  # OOM guard at large batch
            print(f"# {name} failed: {e}", file=sys.stderr)
            return None
        watchdog.cancel()  # tunnel provably up: first probe completed
        stats = _trial_stats(trials)
        points[name] = stats
        print(f"# {name}: {stats['best']} t/s "
              f"(trials {stats['trials']}, spread {stats['spread_pct']}%)",
              file=sys.stderr)
        return stats["best"]

    # fp32 forward: b16 is the measured sweet spot (PERF.md), b64 covers
    # the occupancy end; --sweep adds b32.
    batches = (16, 32, 64) if "--sweep" in sys.argv else (16, 64)
    best_tps, best_batch = 0.0, 0
    for batch in batches:
        tps = probe(f"fwd_fp32_b{batch}", measure, batch)
        if tps and tps > best_tps:
            best_tps, best_batch = tps, batch

    # train-step throughput at the best probed config (PERF.md sweep:
    # b16 plain wins; b32 fits without remat since the fused Pallas VJP)
    train_tps, train_cfg = None, None
    for batch, stages in ((16, False), (32, False)):
        train_tps = probe(f"train_fp32_b{batch}", measure_train, batch, stages)
        if train_tps:
            train_cfg = {"batch": batch, "remat_stages": stages}
            break

    # bf16-body forward (accuracy-gated; PERF.md mixed-precision section)
    fwd_bf16_tps = probe("fwd_bf16_b16", measure, 16,
                         compute_dtype="bfloat16")

    # mixed-precision bf16 body: the accuracy-gated fast training path
    # (PERF.md "Mixed-precision bf16 body"; b48 is the measured sweet spot)
    train_bf16_tps = None
    for batch in (48, 16):
        train_bf16_tps = probe(f"train_bf16_b{batch}", measure_train, batch,
                               False, compute_dtype="bfloat16")
        if train_bf16_tps:
            break

    # end-to-end Trainer (real input pipeline) at the bf16 feed config;
    # ratio vs the resident-data step shows the host-feed cost (VERDICT r2 #4)
    e2e_tps = probe("trainer_e2e_bf16_b48", measure_trainer_e2e)

    # device-tiled whole-scene inference latency at 1024^2 (eval/scene.py);
    # latency is lower-is-better so it gets its own points record rather
    # than the throughput probe() path. fp32 AND bf16, best-of-5 each
    # (round-3 VERDICT #2).
    scene_ms = {}

    def probe_scene(name, **kw):
        try:
            scene_trials = measure_scene(**kw)
        except Exception as e:
            print(f"# {name} failed: {e}", file=sys.stderr)
            return
        best = min(scene_trials)
        scene_ms[name] = best
        points[name] = {
            "ms_trials": [round(t, 1) for t in scene_trials],
            "ms_best": round(best, 1),
            "spread_pct": round((max(scene_trials) - best) / best * 100, 1),
        }
        print(f"# {name}: {best:.1f} ms "
              f"(trials {points[name]['ms_trials']})", file=sys.stderr)

    probe_scene("scene_1024_dev_tiled_fp32")
    probe_scene("scene_1024_dev_tiled_bf16", compute_dtype="bfloat16")

    # batch-serving scenes/s at the 334^2 protocol size (eval/serve.py),
    # pipelined + scene-batched. sb8 is the README headline arm; sb4 the
    # continuity point with earlier rounds; the 1024^2 sb2 rows back the
    # PERF.md large-scene recommendation (all >=3 passes — VERDICT r4 #1)
    serving_sps = probe("serve_334_bf16_sb4", measure_serving)
    serving_sb8_sps = probe("serve_334_bf16_sb8", measure_serving,
                            n=16, scene_batch=8)
    serve_1024_fp32 = probe("serve_1024_fp32_sb2", measure_serving,
                            size=1024, n=6, scene_batch=2,
                            compute_dtype=None)
    serve_1024_bf16 = probe("serve_1024_bf16_sb2", measure_serving,
                            size=1024, n=6, scene_batch=2)

    # per-family forward+train points (EDSR/LRRU/CompletionFormer) so a
    # regression in any shipped model is visible round-over-round
    family_tps = {}
    for fam in ("edsr", "lrru", "completionformer"):
        family_tps[f"fwd_{fam}"] = probe(f"fwd_{fam}_fp32_b16",
                                         measure_model_family, fam)
        family_tps[f"train_{fam}"] = probe(f"train_{fam}_fp32_b16",
                                           measure_model_family, fam,
                                           kind="train")

    try:
        cpu_tps = _cpu_baseline()
        vs = best_tps / (10.0 * cpu_tps)
    except Exception as e:
        print(f"# cpu baseline unavailable: {e}", file=sys.stderr)
        vs = None
    print(json.dumps({
        "metric": "jspsr_x8_forward_throughput",
        "value": round(best_tps, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "batch": best_batch,
        "points": points,
        "train_step_tiles_per_sec": (round(train_tps, 1)
                                     if train_tps else None),
        "train_config": train_cfg,
        "train_step_bf16_tiles_per_sec": (round(train_bf16_tps, 1)
                                          if train_bf16_tps else None),
        "forward_bf16_tiles_per_sec": (round(fwd_bf16_tps, 1)
                                       if fwd_bf16_tps else None),
        "e2e_trainer_tiles_per_sec": (round(e2e_tps, 1) if e2e_tps else None),
        "e2e_vs_resident_ratio": (round(e2e_tps / train_bf16_tps, 3)
                                  if e2e_tps and train_bf16_tps else None),
        "scene_1024_dev_tiled_ms": (
            round(scene_ms["scene_1024_dev_tiled_fp32"], 1)
            if "scene_1024_dev_tiled_fp32" in scene_ms else None),
        "scene_1024_dev_tiled_bf16_ms": (
            round(scene_ms["scene_1024_dev_tiled_bf16"], 1)
            if "scene_1024_dev_tiled_bf16" in scene_ms else None),
        "serve_334_bf16_scenes_per_sec": (round(serving_sps, 2)
                                          if serving_sps else None),
        "serve_334_bf16_sb8_scenes_per_sec": (round(serving_sb8_sps, 2)
                                              if serving_sb8_sps else None),
        "serve_1024_fp32_sb2_scenes_per_sec": (round(serve_1024_fp32, 2)
                                               if serve_1024_fp32 else None),
        "serve_1024_bf16_sb2_scenes_per_sec": (round(serve_1024_bf16, 2)
                                               if serve_1024_bf16 else None),
        "family_fwd_tiles_per_sec": {
            k[4:]: round(v, 1) for k, v in family_tps.items()
            if k.startswith("fwd_") and v},
        "family_train_tiles_per_sec": {
            k[6:]: round(v, 1) for k, v in family_tps.items()
            if k.startswith("train_") and v},
    }))


def _cpu_baseline():
    path = ROOT / "BASELINE_CPU.json"
    if not path.exists():
        subprocess.run(
            [sys.executable, str(ROOT / "scripts" / "measure_cpu_baseline.py")],
            check=True,
            timeout=1800,
        )
    blob = json.loads(path.read_text())
    # torch reference CPU when measured; legacy JAX-CPU number as fallback
    return blob.get("torch_cpu_tiles_per_sec") or blob["cpu_tiles_per_sec"]


if __name__ == "__main__":
    main()
