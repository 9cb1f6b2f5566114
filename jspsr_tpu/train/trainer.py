"""End-to-end training orchestration (reference main.py:47-315).

Flow: build everything from config -> optional resume -> initial eval with
bicubic-input baseline -> epoch loop (jitted train steps, per-epoch LR,
eval cadence, best-checkpointing, early stop after epoch 200) -> final:
rename best checkpoint with metrics embedded, reload, final eval.

TPU-first differences from the reference:
- one jitted train step (forward+loss+backward+update fused by XLA),
  buffers donated, batches device_put with a mesh sharding (DP over ICI);
- deterministic seeding (the reference draws a random seed per run,
  main.py:56-62; here seed comes from config, default 0);
- LR schedule is a closed-form epoch function (no scheduler object state).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from jspsr_tpu.data.dfc30 import DFC30
from jspsr_tpu.data.loader import DataLoader, build_batch_inputs, \
    device_prefetch, pack_mask_np
from jspsr_tpu.data.transforms import build_transforms
from jspsr_tpu.eval.loop import eval_model
from jspsr_tpu.losses import build_criterion
from jspsr_tpu.models.factory import build_model
from jspsr_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from jspsr_tpu.train.checkpoint import (
    load_checkpoint,
    load_params_filtered,
    save_checkpoint,
)
from jspsr_tpu.train.early_stop import EarlyStopper, do_eval, \
    validate_results
from jspsr_tpu.train.optim import build_lr_schedule, build_optimizer, \
    set_learning_rate
from jspsr_tpu.train.state import TrainState
from jspsr_tpu.train.step import make_eval_step, make_train_step
from jspsr_tpu.utils.logging import MetricLogger, serialize_config

_MONITOR_PREFIXES = ("grad_", "input_", "pred_")


def _is_monitor_key(k: str) -> bool:
    """Value-range monitor entries (train/step.py monitor=True) are per-step
    diagnostics, not loss terms — excluded from the epoch loss average."""
    return any(k.startswith(pre) for pre in _MONITOR_PREFIXES)


class Trainer:
    def __init__(self, p, result_dir=None, mesh=None, verbose=None):
        self.p = p
        self.verbose = p.get("verbose", True) if verbose is None else verbose
        self.result_dir = Path(
            result_dir or Path(p.get("work_root", ".")) / "results" / p.name
        )
        self.result_dir.mkdir(parents=True, exist_ok=True)
        if mesh is None:
            if jax.process_count() > 1:
                # multi-process: the mesh MUST span every global device
                # (shrinking it would select process-0's devices only);
                # the requirement is that each process's LOCAL batch shard
                # lays out over its addressable devices
                n_local = len(jax.local_devices())
                assert p.train_batch_size % n_local == 0, (
                    f"train_batch_size {p.train_batch_size} (per-process) "
                    f"must divide over {n_local} local devices")
                mesh = make_mesh()
                if self.verbose:
                    print(f"Data-parallel over {jax.device_count()} devices"
                          f" / {jax.process_count()} processes")
            else:
                # largest device count that divides the train batch
                n = jax.device_count()
                while p.train_batch_size % n:
                    n -= 1
                mesh = make_mesh(jax.devices()[:n])
                if self.verbose and n > 1:
                    print(f"Data-parallel over {n} devices")
        self.mesh = mesh
        self.seed = p.get("seed", 0)

        # model + functional state
        self.model = build_model(p)
        params, bn_state = self.model.init(jax.random.PRNGKey(self.seed))
        if p.model_kwargs.get("pretrained") or \
                p.model_kwargs.get("pvt_pretrained") or \
                p.model_kwargs.get("resnet_pretrained"):
            from jspsr_tpu.utils.pretrained import apply_pretrained

            params, bn_state = apply_pretrained(
                p, self.model, params, bn_state, verbose=self.verbose)
        if self.verbose:
            from jspsr_tpu.utils.summary import count_parameters

            print(f"Model {p.model_name}: {count_parameters(params):,} "
                  f"parameters")
        self.criterion = build_criterion(dict(p.loss))
        self.optimizer = build_optimizer(p, params)
        opt_state = self.optimizer.init(params)
        # Pre-place the initial state with the mesh-replicated sharding the
        # jitted step's OUTPUT state carries: without this, step call #1
        # (unsharded leaves) and call #2 (mesh-sharded leaves) compile two
        # distinct programs — ~50 s each through the tunnel's compile path.
        self.state = replicate_state(mesh, TrainState(
            params, bn_state, opt_state, jnp.zeros((), jnp.int32)))
        self.lr_schedule = build_lr_schedule(p)

        self.train_step = make_train_step(
            self.model, self.criterion, self.optimizer,
            remat=p.get("remat", False), rng_seed=self.seed,
            monitor=bool(p.get("monitor_value")),
            accum_steps=int(p.get("accum_steps") or 1))
        self.eval_step = make_eval_step(self.model, self.criterion)

        # data
        # device_prefetch: stage batches onto the chip ahead of the step
        # loop (default on; order-preserving, math-identical — see
        # train_one_epoch). Opt out with `device_prefetch: false`.
        self.prefetch_to_device = bool(p.get("device_prefetch", True))
        # split the prefetch into assembly + transfer pipeline threads
        # (measured on the 1-core tunneled host: hides the transfer;
        # PERF.md "end-to-end Trainer"). Opt out with `prefetch_split: false`.
        self.prefetch_split = bool(p.get("prefetch_split", True))
        self.device_normalize = bool(p.get("device_normalize"))
        # pack_mask: bit-pack the binary one-hot mask on the host (8x fewer
        # bytes over the tunnel) and unpack inside the fused device
        # normalizer. Exact for {0,1} masks (UA2012 is one-hot).
        self.pack_mask = bool(p.get("pack_mask"))
        self._mask_idx = None
        if self.pack_mask:
            assert self.device_normalize, (
                "pack_mask rides the raw device_normalize feed")
            from jspsr_tpu.data.loader import input_kinds

            kinds = input_kinds(p.input_data)
            assert "mask" in kinds, "pack_mask set but no mask input"
            self._mask_idx = kinds.index("mask")
        if self.device_normalize:
            assert p.model_name.lower() in ("jspsr", "lrru"), (
                "device_normalize supports the per-modality input models "
                "(JSPSR/LRRU); channel-stacked models mix scalings in one "
                "tensor")
            assert not p.get("normalize"), (
                "device_normalize does not cover the stats Normalize list")
            tk = p.tensor_kwargs or {}
            assert not tk.get("image_range") and not tk.get("label_range"), (
                "device_normalize covers the default [0,1] ranges only")
            from jspsr_tpu.data.normalize import make_device_normalize

            self.normalize_batch = make_device_normalize(p)
        # device_cache: the whole train split lives in HBM as raw scene
        # stacks; crop+augment+normalize run inside one jitted program per
        # step and the host ships only a few ints per sample
        # (data/device_cache.py). Rides the device_normalize math.
        self.device_cache = bool(p.get("device_cache"))
        if self.device_cache:
            assert self.device_normalize, (
                "device_cache requires device_normalize (it reuses the "
                "fused on-device normalizer)")
        train_tf, eval_tf = build_transforms(p)
        data_kwargs = {k: v for k, v in p.items() if k != "seed"}
        self.train_set = DFC30(split="train", transform=train_tf,
                               seed=self.seed, **data_kwargs)
        self.valid_set = DFC30(split="valid", transform=eval_tf,
                               seed=self.seed, **data_kwargs)
        self.train_loader = DataLoader(
            self.train_set, p.train_batch_size, shuffle=True, drop_last=True,
            num_workers=p.get("workers", 4), seed=self.seed,
            shard_index=jax.process_index(), num_shards=jax.process_count(),
        )
        self.valid_loader = DataLoader(
            self.valid_set, p.get("valid_batch_size", 1), shuffle=False,
            num_workers=1,
        )

        self.scene_cache = None
        if self.device_cache:
            from jspsr_tpu.data.device_cache import DeviceSceneCache

            try:
                self.scene_cache = DeviceSceneCache(self.train_set, p,
                                                    self.mesh)
            except (ValueError, AssertionError) as e:
                # split too big for the HBM budget / non-uniform scene
                # shapes: fall back to the host raw feed (device_normalize
                # still applies) rather than refusing to train
                print(f"[device_cache] falling back to the host feed: {e}")
            if self.scene_cache is not None and self.verbose:
                import jax.tree_util as jtu

                nbytes = sum(x.nbytes for x in
                             jtu.tree_leaves(self.scene_cache.scenes))
                print(f"Device scene cache: {self.train_set.base_len} scenes"
                      f" ({nbytes / 2**20:.0f} MiB raw) resident in HBM")

        # profile_steps: N > 0 captures a jax.profiler trace of the first N
        # train steps (first trained epoch) into <result_dir>/profile —
        # TensorBoard/Perfetto-loadable. The reference's only profiling was
        # the ad-hoc ms/peak-MB probe in utils/utils.py:1630-1636; this is
        # the TPU-idiomatic replacement (XLA op-level timeline when the
        # backend exposes device tracing; host timeline always).
        self._profile_steps = int(p.get("profile_steps") or 0)
        self._profiled = False

        self.start_epoch = 0
        self.best_result = None
        self.metrics = MetricLogger(
            self.result_dir, p.get("monitor_app") == "tensorboard"
        )
        # the reference records the dataset sizes into the config before
        # dumping it (main.py:97-98 writes p.num_train_sample/num_val_sample)
        p["num_train_sample"] = len(self.train_set)
        p["num_val_sample"] = len(self.valid_set)
        serialize_config(dict(p), self.result_dir / "config.json")

        es = p.get("early_stop") or {}
        self.early_stopper = EarlyStopper(es.get("patience"),
                                          es.get("monitor") or "val_loss")

        # Preemption-safe mid-epoch resume (SURVEY §5.3: "periodic
        # multi-host-safe checkpoint + resumable data-pipeline epoch/step
        # counters" — the TPU-idiomatic replacement for the reference's
        # crash-and-manual-resume, main.py:126-144). `save_every_steps: N`
        # checkpoints the full train state every N steps; relaunching the
        # SAME command in the same result_dir auto-resumes mid-epoch,
        # bit-exactly: the shuffle stream and every transform are pure
        # functions of (seed, epoch, index), the per-step model RNG folds
        # the restored global step, and the partial epoch loss sums travel
        # in the checkpoint. With `checkpoint_backend: orbax` the periodic
        # save is async (the step loop never blocks on checkpoint IO).
        self.save_every_steps = int(p.get("save_every_steps") or 0)
        self._mid_resume = None
        if self.save_every_steps and self._preempt_path().exists():
            self._resume_preempt()

    # ------------------------------------------------------------------
    def load(self, path, resume: bool = False):
        """Load checkpoint; resume=True also restores opt state/epoch
        (reference utils/utils.py:373-407). Accepts this framework's .npz
        checkpoints AND reference PyTorch .pt/.pth files (imported through
        the torch-weight mapper; optimizer state is not portable)."""
        if resume and self._mid_resume:
            # a committed preemption checkpoint is strictly newer than any
            # best-epoch checkpoint in the same run — keep the auto-resume
            print(f"Skipping load({path}): preemption checkpoint resumes "
                  f"epoch {self._mid_resume[0]} step {self._mid_resume[1]}")
            return
        if str(path).endswith((".pt", ".pth")):
            from jspsr_tpu.utils.torch_import import (
                import_torch_state_dict, load_torch_checkpoint,
            )

            sd, meta = load_torch_checkpoint(path)
            params, bn_state = import_torch_state_dict(self.model, sd)
            self.state = replicate_state(self.mesh, TrainState(
                params, bn_state, self.state.opt_state, self.state.step))
            if resume and meta.get("epoch") is not None:
                self.start_epoch = meta["epoch"] + 1
                self.best_result = meta.get("best_result")
            if self.verbose:
                print(f"Imported torch checkpoint {path} "
                      f"(epoch {meta.get('epoch')})")
            return
        ck = load_checkpoint(path, self.state.opt_state if resume else None)
        params = load_params_filtered(self.state.params, ck["params"])
        bn_state = ck["bn_state"] or self.state.bn_state
        opt_state = ck["opt_state"] if (resume and ck["opt_state"] is not None) \
            else self.state.opt_state
        self.state = replicate_state(self.mesh, TrainState(
            params, bn_state, opt_state, self.state.step))
        if resume:
            self.start_epoch = ck["epoch"] + 1
            self.best_result = ck["best_result"]
        if self.verbose:
            print(f"Loaded checkpoint {path} (epoch {ck['epoch']}, "
                  f"resume={resume})")

    def _ckpt_path(self):
        ext = ".orbax" if self._ckpt_backend() == "orbax" else ".npz"
        return self.result_dir / f"_tmp_{self.p.model_name}{ext}"

    def _ckpt_backend(self):
        """'npz' (default, train/checkpoint.py) or 'orbax' (async
        multi-host directory checkpoints, train/orbax_ckpt.py)."""
        return self.p.get("checkpoint_backend") or "npz"

    def _preempt_path(self):
        ext = ".orbax" if self._ckpt_backend() == "orbax" else ".npz"
        return self.result_dir / f"_preempt_{self.p.model_name}{ext}"

    def _resume_preempt(self):
        """Restore a periodic preemption checkpoint: full train state
        (params/bn/opt + the global step the per-step RNG folds), the
        mid-epoch cursor, and the partial epoch loss sums. start_epoch is
        the INTERRUPTED epoch — train_one_epoch fast-forwards the loader
        to step_in_epoch and finishes it."""
        ck = load_checkpoint(self._preempt_path(), self.state.opt_state)
        meta = ck["meta"]
        params = load_params_filtered(self.state.params, ck["params"])
        opt_state = ck["opt_state"] if ck["opt_state"] is not None \
            else self.state.opt_state
        self.state = replicate_state(self.mesh, TrainState(
            params, ck["bn_state"] or self.state.bn_state, opt_state,
            jnp.asarray(int(meta.get("global_step", 0)), jnp.int32)))
        self.start_epoch = ck["epoch"]
        self.best_result = ck["best_result"]
        self._mid_resume = (ck["epoch"], int(meta["step_in_epoch"]),
                            meta.get("loss_sums") or {},
                            int(meta.get("n_samples", 0)))
        if self.verbose:
            print(f"Preemption resume: epoch {ck['epoch']} step "
                  f"{meta['step_in_epoch']} from {self._preempt_path()}")

    def _save_preempt(self, epoch: int, steps_done: int, loss_sums,
                      n_samples: int):
        # float() syncs the lazy device loss sums — once per cadence, and
        # the state snapshot below syncs anyway
        sums = {k: float(v) for k, v in (loss_sums or {}).items()}
        save_checkpoint(
            self._preempt_path(), self.state.params, self.state.bn_state,
            self.state.opt_state, epoch=epoch, best_result=self.best_result,
            extra={"step_in_epoch": steps_done, "n_samples": n_samples,
                   "loss_sums": sums,
                   "global_step": int(self.state.step)},
            backend=self._ckpt_backend(),
        )

    # ------------------------------------------------------------------
    def train_one_epoch(self, epoch: int):
        p = self.p
        lr = self.lr_schedule(epoch)
        set_learning_rate(self.state.opt_state, lr,
                          base_lr=p.optimizer_kwargs.lr)
        n_samples = 0
        losses = None
        # Epoch loss = batch-size-weighted mean over EVERY step (reference
        # train_utils.py:216-240 averages each step into an AverageMeter).
        # Sums accumulate as lazy device scalars — the pattern of
        # metrics.meters — so there is no per-step host sync; the single
        # transfer happens at the epoch-end float().
        loss_sums = None
        start_batch = 0
        if self._mid_resume and self._mid_resume[0] == epoch:
            # finish the interrupted epoch from the checkpointed cursor;
            # restored partial sums are exact (fp32 -> float -> fp32
            # round-trips bit-identically)
            _, start_batch, sums, n_samples = self._mid_resume
            loss_sums = {k: jnp.float32(v) for k, v in sums.items()} or None
            self._mid_resume = None
            if self.verbose and start_batch:
                print(f"E{epoch:03d} resuming at step {start_batch}")
        self.train_loader.set_epoch(epoch, start_batch=start_batch)
        steps_done = start_batch
        n_run = 0  # samples stepped in THIS run (throughput denominator)
        t0 = time.perf_counter()

        # Staging (build_batch_inputs -> shard_batch device_put -> device
        # normalize dispatch) runs in a background thread, two batches ahead
        # (data/loader.device_prefetch): the host->device serialization of
        # batch i+1 overlaps the device compute of step i even on a 1-core
        # host, since the transfer releases the GIL. Math is order-identical
        # (FIFO; tests/test_trainer_e2e.py proves loss-trace equality).
        def stage_host(batch):
            inputs_np, gt_np, base_elev, _ = build_batch_inputs(
                batch, p.model_name, p.input_data
            )
            if self._mask_idx is not None:
                inputs_np = list(inputs_np)
                inputs_np[self._mask_idx] = pack_mask_np(
                    inputs_np[self._mask_idx])
            return ([np.asarray(x) for x in inputs_np], np.asarray(gt_np),
                    np.asarray(base_elev))

        def stage_transfer(staged):
            inputs_np, gt_np, base_elev = staged
            inputs = shard_batch(self.mesh, inputs_np)
            gt = shard_batch(self.mesh, gt_np)
            if self.device_normalize:
                # raw uint8/float crops in, [0,1] float batches out — one
                # fused on-device program, dispatched async like the step
                inputs, gt = self.normalize_batch(
                    inputs, gt, shard_batch(self.mesh, base_elev))
            return inputs, gt, gt_np.shape[0]

        def stage(batch):
            return stage_transfer(stage_host(batch))

        # prefetch_split runs the numpy assembly and the device transfer in
        # separate pipeline threads: the GIL-releasing tunnel write of
        # batch i overlaps the assembly of batch i+1 on a 1-core host.
        if self.scene_cache is not None:
            # crop+augment+normalize on device from the HBM scene cache —
            # no host batch assembly, no host->device data movement
            batches = self.scene_cache.epoch_batches(self.train_loader, epoch)
        elif not self.prefetch_to_device:
            batches = (stage(b) for b in self.train_loader)
        elif self.prefetch_split:
            batches = device_prefetch(iter(self.train_loader), stage_transfer,
                                      host_stage=stage_host)
        else:
            batches = device_prefetch(iter(self.train_loader), stage)
        debug_timing = os.environ.get("JSPSR_DEBUG_TIMING")
        profiling = 0  # steps left in an active profiler trace
        if self._profile_steps and not self._profiled:
            jax.profiler.start_trace(str(self.result_dir / "profile"))
            profiling = self._profile_steps
            self._profiled = True
        t_prev = time.perf_counter()
        for inputs, gt, bs in batches:
            if debug_timing:
                t_fetch = time.perf_counter() - t_prev
            self.state, losses = self.train_step(self.state, inputs, gt)
            if profiling:
                profiling -= 1
                if profiling == 0:
                    # sync so the traced window contains real device work
                    jax.block_until_ready(losses)
                    jax.profiler.stop_trace()
                    if self.verbose:
                        print(f"Profiler trace ({self._profile_steps} steps)"
                              f" -> {self.result_dir / 'profile'}")
            if debug_timing:
                t_now = time.perf_counter()
                print(f"## batch fetch {t_fetch * 1e3:.0f}ms "
                      f"dispatch {(t_now - t_prev) * 1e3 - t_fetch * 1e3:.0f}ms",
                      file=sys.stderr, flush=True)
                t_prev = t_now
            step_losses = {k: v for k, v in losses.items()
                           if not _is_monitor_key(k)}
            if loss_sums is None:
                loss_sums = {k: v * bs for k, v in step_losses.items()}
            else:
                loss_sums = {k: loss_sums[k] + v * bs
                             for k, v in step_losses.items()}
            n_samples += bs
            n_run += bs
            steps_done += 1
            if self.save_every_steps and \
                    steps_done % self.save_every_steps == 0:
                self._save_preempt(epoch, steps_done, loss_sums, n_samples)
        if profiling:  # epoch shorter than profile_steps: close the trace
            jax.profiler.stop_trace()
        t_sync0 = time.perf_counter()
        self.last_epoch_losses = (
            {k: float(v) / n_samples for k, v in loss_sums.items()}
            if loss_sums else {}
        )
        if debug_timing:
            print(f"## epoch-end sync {(time.perf_counter() - t_sync0) * 1e3:.0f}ms",
                  file=sys.stderr, flush=True)
        epoch_loss = self.last_epoch_losses.get("Total", float("nan"))
        dt = time.perf_counter() - t0
        self.last_throughput = n_run / max(dt, 1e-9)  # tiles/sec
        if self.verbose:
            extra = ""
            if losses is not None and "grad_max" in losses:
                extra = (f" grad[{float(losses['grad_min']):.4f},"
                         f"{float(losses['grad_max']):.4f}]"
                         f" pred[{float(losses['pred_min']):.4f},"
                         f"{float(losses['pred_max']):.4f}]")
            print(f"E{epoch:03d} loss {epoch_loss:.4e} lr {lr:.2e} "
                  f"({self.last_throughput:.1f} samples/s){extra}")
        return epoch_loss, lr

    def evaluate(self, compare_input: bool = False, save_dir=None,
                 visual_dir=None):
        if visual_dir is None and self.p.get("val_save_visual"):
            visual_dir = self.result_dir / "visuals"
        return eval_model(
            self.p, self.valid_loader, self.eval_step,
            self.state.params, self.state.bn_state, self.criterion,
            compare_input=compare_input, save_dir=save_dir,
            visual_dir=visual_dir, verbose=self.verbose,
            mesh=self.mesh if self.mesh.devices.size > 1 else None,
            normalize=(self.normalize_batch if self.device_normalize
                       else None),
        )

    # ------------------------------------------------------------------
    def fit(self, initial_eval: bool = True):
        p = self.p
        if self._mid_resume:
            initial_eval = False  # the preempted run already did it
        if initial_eval:
            result = self.evaluate(compare_input=True)
            if self.verbose:
                print(f"Initial eval: { {k: v for k, v in result.items() if k != 'input'} }")

        warmup = (p.get("scheduler_kwargs") or {}).get("warmup_epoch", 0)
        for epoch in range(self.start_epoch, p.epochs):
            train_loss, lr = self.train_one_epoch(epoch)
            scalars = {"lr": lr, "train_loss": train_loss,
                       "train_tiles_per_sec": getattr(self, "last_throughput",
                                                      None)}
            if do_eval(epoch, p.epochs, p.get("val_interval", 1),
                       p.get("val_start_epoch", 1), warmup):
                result = self.evaluate()
                scalars.update(
                    {f"val_{k.lower()}": v for k, v in result.items()
                     if k != "input"}
                )
                cur = {k: v for k, v in result.items() if k not in ("loss", "input")}
                if validate_results(self.best_result, cur,
                                    p.get("best_metric", "RMSE")):
                    self.best_result = cur
                    save_checkpoint(
                        self._ckpt_path(), self.state.params,
                        self.state.bn_state, self.state.opt_state,
                        epoch=epoch, best_result=self.best_result,
                        backend=self._ckpt_backend(),
                    )
                # early stop gated to late training (reference main.py:256)
                if epoch > 200:
                    metric = self.early_stopper.metric_from(
                        result["loss"], cur, train_loss
                    )
                    if self.early_stopper(metric):
                        print(f"Early stop at epoch {epoch}")
                        break
            self.metrics.log(epoch, **scalars)

        return self.finish()

    def finish(self):
        """Post-training finale (reference main.py:275-311): rename the best
        checkpoint with metrics embedded in the filename, reload it, run a
        final eval that SAVES the predictions (save_prediction=True,
        compair_input=False — the reference passes False here), then the
        whole-split offline summary against every discovered public product
        (summarise=True)."""
        p = self.p
        if self._ckpt_backend() == "orbax":
            # the best-epoch save is async: it must be committed before the
            # rename/reload below (and before the process exits)
            from jspsr_tpu.train.orbax_ckpt import wait_for_checkpoint

            wait_for_checkpoint()
        if self.save_every_steps and jax.process_index() == 0:
            # the run completed: the periodic preemption checkpoint is
            # obsolete (and would otherwise trigger a bogus auto-resume on
            # the next run in this result_dir)
            pp = self._preempt_path()
            if pp.is_dir():
                import shutil

                shutil.rmtree(pp)
            elif pp.exists():
                pp.unlink()
        tmp = self._ckpt_path()
        final_path = tmp
        if tmp.exists() and self.best_result:
            inputs_s = "_".join(
                k for k in ("image", "mask", "canopy", "coord")
                if p.input_data.get(k)
            ) or "dem"
            parts = [p.model_name, f"r{p.resolution}", inputs_s]
            for k in ("RMSE", "PSNR"):
                if k in self.best_result:
                    parts.append(f"{k}{self.best_result[k]:.4f}")
            final_path = self.result_dir / ("_".join(parts) + tmp.suffix)
            tmp.replace(final_path)
            self.load(final_path, resume=False)
        pred_dir = self.result_dir / "predictions"
        result = self.evaluate(compare_input=False, save_dir=pred_dir)
        if self.verbose:
            print(f"Final eval: { {k: v for k, v in result.items() if k != 'input'} }")
        summary = None
        try:
            from jspsr_tpu.eval.summarise import summarise_run

            lr_files = {sid: f for sid, f in
                        zip(self.valid_set.id, self.valid_set.files["lr_dem"])}
            summary = summarise_run(p, self.valid_set, pred_dir,
                                    self.result_dir, plots=True,
                                    lr_files=lr_files)
            if self.verbose:
                print(f"Offline summary: {summary['offline']}")
        except Exception as e:
            print(f"[summarise] skipped: {e}")
        return {"checkpoint": str(final_path), "result": result,
                "best_result": self.best_result, "summary": summary}
