"""Device-resident scene cache: crop + augment + normalize ON the chip.

The reference feeds training through a torch DataLoader worker pool that
crops/augments/normalizes on the host and ships full float32 batches over
PCIe every step (reference config/common_config.py:182-201,
data/data_utils.py:36-84). On this framework's raw feed the equivalent
host loop (decode -> crop -> stack -> transfer) is the e2e bottleneck on a
1-core host: ~0.6 of the resident-step throughput
(scripts/bench_trainer_e2e.py, PERF.md "end-to-end Trainer").

TPU-idiomatic alternative when the (preloaded) train split fits in HBM
(`device_cache: true`): upload each modality ONCE as a raw (N, H, W, C)
scene stack — images/masks/canopy stay uint8 — then a single jitted XLA
program per step gathers the per-sample crops (vmapped dynamic_slice =
one fused gather), applies the dihedral augmentation with per-sample
select, and runs the same fused normalization as the raw feed
(data/normalize.make_device_normalize). The host's only per-step work is
drawing crop/augmentation parameters (a few ints per sample) and one
async dispatch — the steady-state training loop needs no host->device
data movement at all.

Exactness: the parameter draws replay the HOST pipeline's RNG stream —
the same (seed, epoch, index) SeedSequence and the same per-transform
draw order (transforms' draw() methods are the single source of truth) —
so batches are bit-identical in content and order to the host path
(tests/test_device_cache.py proves equality through the train loop).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from jspsr_tpu.config.loader import AttrDict
from jspsr_tpu.data.loader import input_kinds
from jspsr_tpu.data.normalize import make_device_normalize
from jspsr_tpu.data.transforms import (
    Compose,
    RandomCrop,
    RandomFlipRotate90,
    TileCrop,
    TransformCtx,
)
from jspsr_tpu.parallel.mesh import batch_sharding, replicated


def dihedral_batch(x, angle, flip_lr, flip_ud):
    """Per-sample rot90/flip on an NHWC batch of SQUARE tiles, matching the
    host path exactly (np.rot90(angle) then fliplr then flipud,
    transforms.RandomFlipRotate90). Computes the three rotations once for
    the whole batch and selects per sample — tiny elementwise work that
    XLA fuses, vs. per-sample control flow it could not."""
    a = angle[:, None, None, None]
    x = jnp.where(
        a == 1, jnp.rot90(x, 1, axes=(1, 2)),
        jnp.where(
            a == 2, jnp.rot90(x, 2, axes=(1, 2)),
            jnp.where(a == 3, jnp.rot90(x, 3, axes=(1, 2)), x)))
    x = jnp.where(flip_lr[:, None, None, None], x[:, :, ::-1], x)
    x = jnp.where(flip_ud[:, None, None, None], x[:, ::-1], x)
    return x


class DeviceSceneCache:
    """HBM-resident raw scene stacks + a jitted crop/augment/normalize
    sampler for one DFC30 split.

    Requires: uniform scene shapes, square crops, the
    device_normalize-supported config surface (per-modality inputs, no
    stats Normalize list, default ranges). The train transform pipeline
    must be crop [+ RandomFlipRotate90] (what build_transforms emits with
    device_normalize on).
    """

    def __init__(self, dataset, p, mesh, transform=None, budget_gb=None):
        # Multi-host: each process keeps the FULL scene stacks replicated
        # over its LOCAL devices (identical per-chip HBM cost to the
        # single-host layout) and runs the crop/augment/normalize sampler
        # as a process-local jit over a local sub-mesh; the per-device
        # output buffers are then stitched into the global batch-sharded
        # array with jax.make_array_from_single_device_arrays — no host
        # round-trip, no cross-host data movement (each process's loader
        # shard indices are exactly the global rows its devices own, the
        # same contract as the host feed's make_array_from_process_local_data
        # in parallel/mesh.shard_batch).
        self.nproc = jax.process_count()
        self.global_mesh = mesh
        if self.nproc > 1:
            gsh = batch_sharding(mesh)
            ndev = int(mesh.devices.size)
            # one nominal row per device -> each addressable device's global
            # row; orders the local mesh by global position and checks this
            # process's block is contiguous (row k of the local sampler
            # output must be global row proc_offset + k)
            imap = gsh.addressable_devices_indices_map((ndev,))
            order = sorted(imap.items(), key=lambda kv: kv[1][0].start or 0)
            rows = [sl[0].start or 0 for _, sl in order]
            assert rows == list(range(rows[0], rows[0] + len(rows))), (
                f"device_cache multi-host needs this process's devices "
                f"contiguous in the mesh; got global rows {rows}")
            mesh = Mesh(np.array([d for d, _ in order]), ("data",))
        self.mesh_local = mesh
        self.seed = dataset.seed
        self.ppi = dataset.patches_per_image
        self.crop, self.aug = self._split_transform(
            transform if transform is not None else dataset.transform)

        kinds = input_kinds(p.input_data)
        self.kinds = kinds
        local_coord = (dataset.coord_mode or "local").lower() == "local"

        # ---- stack raw scenes host-side ------------------------------
        stacks: dict[str, list] = {k: [] for k in (*kinds, "hr_dem")}
        base = []
        shape = None
        for i in range(dataset.base_len):
            s = dataset.raw_scene(i)
            if shape is None:
                shape = s["lr_dem"].shape[:2]
            for k in stacks:
                arr = s[k]
                assert arr.shape[:2] == shape, (
                    f"device_cache needs uniform scene shapes: scene {i} "
                    f"{k} is {arr.shape[:2]}, expected {shape}")
                if k == "coord" and local_coord and i > 0:
                    continue  # identical for every scene: store once
                stacks[k].append(arr)
            base.append(s["meta"]["base"])
        self.H, self.W = shape
        assert self.H == self.W, "device_cache assumes square scenes"

        host = {k: np.stack(v) for k, v in stacks.items()}
        nbytes = sum(a.nbytes for a in host.values())
        budget = float(budget_gb if budget_gb is not None
                       else p.get("device_cache_budget_gb") or 8.0)
        if nbytes > budget * 2**30:
            raise ValueError(
                f"device_cache: scene stacks need {nbytes / 2**30:.2f} GiB "
                f"> budget {budget} GiB; use the host feed "
                f"(device_cache: false) or raise device_cache_budget_gb")
        self.scenes = jax.device_put(host, replicated(mesh))
        self.base_all = jax.device_put(
            np.asarray(base, np.float32), replicated(mesh))

        # crop size: full scene when the crop does not apply
        cs = getattr(self.crop, "crop_size", None) if self.crop else None
        self.S = cs if (cs and cs < self.H) else self.H

        p_norm = AttrDict(dict(p))
        p_norm["pack_mask"] = False  # mask never crosses the wire here
        normalize = make_device_normalize(p_norm)
        self._sampler = self._build_sampler(normalize, mesh)

    @staticmethod
    def _split_transform(transform):
        """Extract (crop, aug) from the train Compose; reject anything the
        device path does not replicate."""
        crop, aug = None, None
        tfs = transform.transforms if isinstance(transform, Compose) \
            else [transform] if transform is not None else []
        for t in tfs:
            if isinstance(t, (RandomCrop, TileCrop)):
                crop = t
            elif isinstance(t, RandomFlipRotate90):
                aug = t
            else:
                raise ValueError(
                    f"device_cache cannot replicate transform {t} on "
                    f"device; use the host feed")
        return crop, aug

    def _build_sampler(self, normalize, mesh):
        S, kinds, augment = self.S, self.kinds, self.aug is not None
        bsh = batch_sharding(mesh)

        def sample(scenes, base_all, img_idx, r0, c0, angle, flr, fud):
            def crop_stack(stack):
                n, _, _, c = stack.shape
                # coord (local mode) is stored once: clamp to scene 0
                idx = img_idx if n > 1 else jnp.zeros_like(img_idx)

                def one(i, r, cc):
                    return lax.dynamic_slice(
                        stack, (i, r, cc, 0), (1, S, S, c))[0]

                # vmapped dynamic_slice lowers to one batched gather
                return jax.vmap(one)(idx, r0, c0)

            crops = {k: crop_stack(scenes[k]) for k in (*kinds, "hr_dem")}
            if augment:
                crops = {k: dihedral_batch(v, angle, flr, fud)
                         for k, v in crops.items()}
            inputs = [crops[k] for k in kinds]
            return normalize(inputs, crops["hr_dem"], base_all[img_idx])

        # scene stacks replicated, index vectors + outputs batch-sharded:
        # GSPMD turns the gather into a per-device local gather, so each
        # chip materializes only its batch shard.
        return jax.jit(
            sample,
            in_shardings=(replicated(mesh), replicated(mesh),
                          bsh, bsh, bsh, bsh, bsh, bsh),
            out_shardings=bsh,
        )

    # ------------------------------------------------------------------
    def draw_batch(self, indices, epoch: int):
        """Replay the host pipeline's per-index parameter draws for a batch
        of dataset indices (the DataLoader's shuffled order)."""
        n = len(indices)
        img = np.empty(n, np.int32)
        r0 = np.zeros(n, np.int32)
        c0 = np.zeros(n, np.int32)
        ang = np.zeros(n, np.int32)
        flr = np.zeros(n, bool)
        fud = np.zeros(n, bool)
        for j, index in enumerate(indices):
            index = int(index)
            img[j] = index // self.ppi
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, index]))
            ctx = TransformCtx(rng, index % self.ppi)
            if self.crop is not None:
                drawn = self.crop.draw(ctx, self.H, self.W)
                if drawn is not None:
                    r0[j], c0[j] = drawn
            if self.aug is not None:
                drawn = self.aug.draw(ctx)
                if drawn is not None:
                    ang[j], flr[j], fud[j] = drawn
        return img, r0, c0, ang, flr, fud

    def sample_batch(self, indices, epoch: int):
        """(inputs, gt) for a batch of dataset indices — normalized, on
        device, batch-sharded; bit-identical content to the host path.

        Multi-process: ``indices`` are this process's LOCAL loader shard
        (global dataset indices, so the RNG replay is identical to the
        host pipeline); the local sampler output is stitched into the
        global batch-sharded array from the per-device buffers."""
        draws = self.draw_batch(indices, epoch)
        if self.nproc > 1:
            # jit refuses numpy + non-trivial shardings multi-process; the
            # local mesh is fully addressable so an explicit device_put is
            # legal and equivalent
            lsh = batch_sharding(self.mesh_local)
            draws = tuple(jax.device_put(v, lsh) for v in draws)
        img, r0, c0, ang, flr, fud = draws
        out = self._sampler(self.scenes, self.base_all,
                            img, r0, c0, ang, flr, fud)
        if self.nproc == 1:
            return out
        gsh = batch_sharding(self.global_mesh)
        gb = len(indices) * self.nproc

        def to_global(x):
            shards = sorted(x.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            return jax.make_array_from_single_device_arrays(
                (gb,) + x.shape[1:], gsh, [s.data for s in shards])

        return jax.tree_util.tree_map(to_global, out)

    def epoch_batches(self, loader, epoch: int):
        """Yield (inputs, gt, batch_size) in the loader's exact epoch order
        (same shuffle stream), matching train_one_epoch's staging contract.
        The caller must have run loader.set_epoch(epoch) — enforced below:
        a desynced epoch would shuffle with one epoch and seed the
        crop/augment replay with another, silently breaking the
        bit-identity with the host pipeline."""
        assert getattr(loader, "epoch", epoch) == epoch, (
            f"epoch_batches(epoch={epoch}) but loader.set_epoch set "
            f"{loader.epoch} — shuffle order and RNG replay would desync")
        for batch_idx in loader._batches():
            inputs, gt = self.sample_batch(batch_idx, epoch)
            yield inputs, gt, len(batch_idx)
