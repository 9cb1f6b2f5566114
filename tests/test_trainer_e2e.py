"""End-to-end slice: synthetic mini-DFC30 -> Trainer.fit -> checkpoint ->
validation-only reload. Exercises every layer once (SURVEY 7.3)."""

import numpy as np
import pytest

from jspsr_tpu.config.loader import AttrDict
from jspsr_tpu.train.trainer import Trainer
from jspsr_tpu.data.synthetic import generate_mini_dfc30


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("DFC30_8m")
    root, train, valid = generate_mini_dfc30(root, train_cities=("Brest",),
                                             valid_cities=("Vannes",),
                                             n_per_city=4, size=64)
    p = AttrDict({
        "name": "e2e_test",
        "dataset": "DFC30", "dataset_path": str(root), "resolution": 8,
        "train_set": train, "valid_set": valid,
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3},
        "relative": True, "augment": True, "patch_size": 32,
        "crop_mode": "random", "patches_per_image": 1, "workers": 2,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8, "spn": True,
                         "pretrained": False, "checkpoint": None},
        "loss": {"L1": 1, "L2": 1, "Grad": 0.1},
        "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                             "momentum": 0.9, "diff_lr": False},
        "scheduler": "WarmupStepLR",
        "scheduler_kwargs": {"max_lr": 1e-3, "step_size": 100, "gamma": 0.5,
                             "warmup_epoch": 1},
        "train_batch_size": 2, "epochs": 2, "resume": False,
        "valid_batch_size": 1, "val_interval": 1, "val_start_epoch": 1,
        "metric": {
            "PSNR": {"package": "piq", "border": 0.05, "min": -80, "max": 929},
            "RMSE": {"package": "local", "border": 0.05, "min": -80, "max": 929},
        },
        "best_metric": "RMSE", "val_border": 0.05,
        "early_stop": {"patience": None, "monitor": "val_rmse"},
        "verbose": False, "seed": 0,
    })
    return p


def test_fit_end_to_end(env, tmp_path):
    trainer = Trainer(env, result_dir=tmp_path / "run")
    out = trainer.fit(initial_eval=True)
    assert out["best_result"] is not None
    assert "RMSE" in out["best_result"]
    assert np.isfinite(out["result"]["RMSE"])
    # the final eval follows the reference (main.py:294-311):
    # compair_input=False — no bicubic baseline in the final result dict
    assert "input" not in out["result"]
    # metrics-bearing checkpoint name (reference main.py:275-292)
    assert "RMSE" in out["checkpoint"] and out["checkpoint"].endswith(".npz")

    # post-training finale saved predictions + the whole-split offline
    # summary on the reloaded best checkpoint (reference save_prediction=
    # True, summarise=True)
    run = tmp_path / "run"
    assert list((run / "predictions").iterdir())
    assert (run / "summary.json").exists()
    assert (run / "summary.csv").exists()
    assert out["summary"] is not None
    # product auto-discovery found every public DEM next to the GT
    for prod in ("SR", "COP30", "FABDEM", "FATHOM"):
        assert np.isfinite(out["summary"]["offline"][prod]["RMSE"]), prod

    # validate-only reload path produces consistent numbers
    t2 = Trainer(env, result_dir=tmp_path / "run2")
    t2.load(out["checkpoint"], resume=False)
    pred2 = tmp_path / "run2" / "predictions"
    r2 = t2.evaluate(save_dir=pred2)
    np.testing.assert_allclose(r2["RMSE"], out["result"]["RMSE"], rtol=1e-4)
    from jspsr_tpu.eval.summarise import summarise_run

    s2 = summarise_run(env, t2.valid_set, pred2, tmp_path / "run2",
                       plots=False)
    np.testing.assert_allclose(s2["offline"]["SR"]["RMSE"],
                               out["summary"]["offline"]["SR"]["RMSE"],
                               rtol=1e-5)

    # metrics jsonl written
    assert (tmp_path / "run" / "metrics.jsonl").exists()
    assert (tmp_path / "run" / "config.json").exists()


def test_resume_training(env, tmp_path):
    """resume=True restores optimizer state, epoch counter and best result."""
    import copy
    from jspsr_tpu.train.checkpoint import save_checkpoint

    p = AttrDict(dict(env))
    p["epochs"] = 1
    t1 = Trainer(p, result_dir=tmp_path / "a")
    out = t1.fit(initial_eval=False)
    ckpt = out["checkpoint"]

    p2 = AttrDict(dict(env))
    p2["epochs"] = 2
    p2["resume"] = True
    t2 = Trainer(p2, result_dir=tmp_path / "b")
    t2.load(ckpt, resume=True)
    assert t2.start_epoch == 1  # continues after the saved epoch
    assert t2.best_result is not None
    out2 = t2.fit(initial_eval=False)
    assert np.isfinite(out2["result"]["RMSE"])


def test_epoch_loss_is_mean_over_steps(env, tmp_path):
    """The logged epoch train loss is the batch-weighted mean of EVERY step's
    loss, not the last batch's (reference train_utils.py:216-240 semantics;
    round-1 regression flagged in VERDICT)."""
    p = AttrDict(dict(env))
    p["epochs"] = 1
    trainer = Trainer(p, result_dir=tmp_path / "loss_acct")

    recorded = []
    inner = trainer.train_step

    def recording_step(state, inputs, gt):
        state, losses = inner(state, inputs, gt)
        recorded.append((float(losses["Total"]), int(gt.shape[0])))
        return state, losses

    trainer.train_step = recording_step
    epoch_loss, _ = trainer.train_one_epoch(0)

    assert len(recorded) >= 2, "fixture must produce multiple steps"
    want = sum(v * n for v, n in recorded) / sum(n for _, n in recorded)
    np.testing.assert_allclose(epoch_loss, want, rtol=1e-6)
    # every loss term is averaged, not just Total
    assert set(trainer.last_epoch_losses) >= {"Total", "L1", "L2", "Grad"}


def test_device_prefetch_matches_sync_path(env, tmp_path):
    """device_prefetch (default) stages batches from a background thread
    (data/loader.device_prefetch). It only reorders WHEN host->device
    transfers are issued — same batches, same order, same math — so the
    loss trace must match the synchronous path exactly."""
    p_sync = AttrDict(dict(env))
    p_sync["epochs"] = 1
    p_sync["device_prefetch"] = False
    p_pre = AttrDict(dict(p_sync))
    p_pre["device_prefetch"] = True

    t_sync = Trainer(p_sync, result_dir=tmp_path / "sync")
    t_sync.train_one_epoch(0)
    t_pre = Trainer(p_pre, result_dir=tmp_path / "pre")
    t_pre.train_one_epoch(0)

    assert t_pre.last_epoch_losses.keys() == t_sync.last_epoch_losses.keys()
    for k, v in t_sync.last_epoch_losses.items():
        np.testing.assert_allclose(t_pre.last_epoch_losses[k], v,
                                   rtol=1e-7, err_msg=k)


def test_device_prefetch_propagates_worker_errors():
    """An exception inside the staging thread re-raises in the consumer."""
    from jspsr_tpu.data.loader import device_prefetch

    def boom(item):
        if item == 2:
            raise ValueError("bad batch")
        return item * 10

    out = []
    with pytest.raises(ValueError, match="bad batch"):
        for x in device_prefetch(iter(range(5)), boom):
            out.append(x)
    assert out == [0, 10]  # order preserved up to the failure


def test_pack_mask_roundtrip_unit():
    """pack_mask_np (host, np.packbits big-endian) and the device
    normalizer's unpack are exact inverses, including a channel count that
    is not a multiple of 8 (mask_channel selects 10 of 15)."""
    from jspsr_tpu.data.loader import pack_mask_np
    from jspsr_tpu.data.normalize import make_device_normalize

    rng = np.random.default_rng(0)
    mask = rng.integers(0, 2, size=(2, 8, 8, 10), dtype=np.uint8)
    packed = pack_mask_np(mask)
    assert packed.shape == (2, 8, 8, 2)

    p = AttrDict({
        "input_data": {"lr_dem": 1, "mask": 10},
        "mask_channel": list(range(10)),
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "relative": False, "pack_mask": True,
    })
    norm_packed = make_device_normalize(p)
    p2 = AttrDict(dict(p))
    p2["pack_mask"] = False
    norm_plain = make_device_normalize(p2)

    dem = rng.uniform(0, 100, size=(2, 8, 8, 1)).astype(np.float32)
    gt = rng.uniform(0, 100, size=(2, 8, 8, 1)).astype(np.float32)
    base = np.zeros((2,), np.float32)
    (got_dem, got_mask), got_gt = norm_packed([dem, packed], gt, base)
    (exp_dem, exp_mask), exp_gt = norm_plain([dem, mask], gt, base)
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(exp_mask))
    np.testing.assert_array_equal(np.asarray(got_dem), np.asarray(exp_dem))
    np.testing.assert_array_equal(np.asarray(got_gt), np.asarray(exp_gt))


def test_pack_mask_trainer_matches_unpacked(env, tmp_path):
    """pack_mask=True (bit-packed mask over the wire, unpacked on device)
    trains bit-identically to the plain raw feed."""
    p_plain = AttrDict(dict(env))
    p_plain["epochs"] = 1
    p_plain["input_data"] = {"lr_dem": 1, "COP30": 1, "image": 3, "mask": 15}
    p_plain["device_normalize"] = True
    p_pack = AttrDict(dict(p_plain))
    p_pack["pack_mask"] = True

    t_plain = Trainer(p_plain, result_dir=tmp_path / "plain")
    t_plain.train_one_epoch(0)
    t_pack = Trainer(p_pack, result_dir=tmp_path / "pack")
    t_pack.train_one_epoch(0)

    for k, v in t_plain.last_epoch_losses.items():
        np.testing.assert_allclose(t_pack.last_epoch_losses[k], v,
                                   rtol=1e-7, err_msg=k)


def test_device_normalize_matches_host_path(env, tmp_path):
    """device_normalize=True ships raw uint8/float crops and normalizes in
    one fused on-device program (data/normalize.make_device_normalize);
    the training math must be identical to the host ToArray path."""
    p_host = AttrDict(dict(env))
    p_host["epochs"] = 1
    p_dev = AttrDict(dict(p_host))
    p_dev["device_normalize"] = True

    t_host = Trainer(p_host, result_dir=tmp_path / "host")
    t_host.train_one_epoch(0)
    t_dev = Trainer(p_dev, result_dir=tmp_path / "dev")
    t_dev.train_one_epoch(0)

    # identical data order (seeded), identical math -> same epoch losses
    for k, v in t_host.last_epoch_losses.items():
        np.testing.assert_allclose(t_dev.last_epoch_losses[k], v,
                                   rtol=2e-4, err_msg=k)
    # and identical evaluation after the one epoch (same updated params).
    # device_normalize now covers eval too: the dev trainer's val loader
    # ships RAW crops and eval_model normalizes on device — scores AND the
    # bicubic input baseline must match the host ToArray path.
    r_host = t_host.evaluate(compare_input=True)
    r_dev = t_dev.evaluate(compare_input=True)
    np.testing.assert_allclose(r_dev["RMSE"], r_host["RMSE"], rtol=2e-4)
    np.testing.assert_allclose(r_dev["loss"], r_host["loss"], rtol=2e-4)
    np.testing.assert_allclose(r_dev["input"]["RMSE"],
                               r_host["input"]["RMSE"], rtol=1e-5)
    np.testing.assert_allclose(r_dev["input"]["PSNR"],
                               r_host["input"]["PSNR"], rtol=1e-5)


def test_profile_steps_writes_trace(env, tmp_path):
    """profile_steps: N captures a jax.profiler trace of the first N train
    steps into <result_dir>/profile (the TPU-idiomatic replacement for the
    reference's ad-hoc ms/MB probe, utils/utils.py:1630-1636)."""
    p = AttrDict({**env, "epochs": 1, "profile_steps": 2,
                  "val_interval": 99, "name": "profile_test"})
    tr = Trainer(p, result_dir=tmp_path / "run")
    tr.fit(initial_eval=False)
    prof = tmp_path / "run" / "profile"
    traces = list(prof.rglob("*.trace.json.gz")) + list(prof.rglob("*.pb"))
    assert traces, f"no profiler artifacts under {prof}"


class _Preempted(Exception):
    """Simulated preemption (SIGKILL stand-in) raised right after a
    periodic mid-epoch checkpoint commits."""


@pytest.mark.parametrize("save_every,batch_size,crash_step,resume_step", [
    # N=1, crash immediately after the save at epoch-1 step 1: nothing to
    # replay — pure fast-forward resume
    (1, 2, None, 1),
    # N=2, crash AFTER epoch-1 step 3 completed (one step past the last
    # periodic save at step 2): step 3's update is lost and the resume
    # replays it from the step-2 checkpoint — the common crash-between-
    # saves case, N-1 steps of replayed work (advisor r4)
    (2, 1, 7, 2),
])
def test_preemption_midepoch_resume_bitexact(env, tmp_path, save_every,
                                             batch_size, crash_step,
                                             resume_step):
    """`save_every_steps: N` + relaunch in the same result_dir resumes a
    preempted run MID-EPOCH and reproduces the uninterrupted run bit-exactly
    (SURVEY §5.3: multi-host-safe periodic checkpoint + resumable
    data-pipeline epoch/step counters — the TPU-idiomatic replacement for
    the reference's crash-and-manual-resume, reference main.py:126-144).

    Exactness mechanism under test: the shuffle stream and every transform
    are pure functions of (seed, epoch, index) so the loader fast-forward
    skips batches by index arithmetic alone; the per-step model RNG folds
    the restored global step; the partial epoch loss sums travel in the
    checkpoint and fp32->json->fp32 round-trips bit-identically. Every
    comparison below is EXACT equality (no tolerance): params bit-equal,
    epoch losses bit-equal (fp32 sums accumulate in the same order),
    final-eval RMSE bit-equal (same params through the same program)."""
    import copy

    import jax

    p = copy.deepcopy(env)
    p["name"] = "preempt_test"
    p["save_every_steps"] = save_every
    p["train_batch_size"] = batch_size

    # control: the same config run straight through (the periodic saves
    # themselves must not perturb the math)
    tA = Trainer(p, result_dir=tmp_path / "runA")
    outA = tA.fit(initial_eval=False)
    params_a = jax.device_get(tA.state.params)
    losses_a = dict(tA.last_epoch_losses)

    # interrupted run — mid-epoch 1, with epoch 0's eval/best-ckpt done
    tB = Trainer(p, result_dir=tmp_path / "runB")
    if crash_step is None:
        # crash immediately after the periodic save at epoch 1 step 1
        orig_save = tB._save_preempt

        def crash_after_save(epoch, steps_done, loss_sums, n_samples):
            orig_save(epoch, steps_done, loss_sums, n_samples)
            if epoch == 1 and steps_done == 1:
                raise _Preempted

        tB._save_preempt = crash_after_save
    else:
        # crash between saves: raise after global train_step call number
        # `crash_step` computed its update but BEFORE the trainer applied
        # it (epoch 0 runs 4 steps at bs=1, so call 7 = epoch 1 step 3)
        orig_step = tB.train_step
        calls = {"n": 0}

        def crashing_step(state, inputs, gt):
            out = orig_step(state, inputs, gt)
            calls["n"] += 1
            if calls["n"] == crash_step:
                raise _Preempted
            return out

        tB.train_step = crashing_step
    with pytest.raises(_Preempted):
        tB.fit(initial_eval=False)
    assert tB._preempt_path().exists()

    # relaunch the SAME command in the SAME result_dir: auto-resume from
    # the preemption checkpoint (initial_eval is skipped — the preempted
    # run already did it)
    tC = Trainer(p, result_dir=tmp_path / "runB")
    assert tC.start_epoch == 1 and tC._mid_resume[1] == resume_step
    outC = tC.fit(initial_eval=True)

    params_c = jax.device_get(tC.state.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           params_a, params_c)
    # restored partial loss sums + same-order fp32 accumulation make the
    # resumed epoch's loss average bit-exact
    for k, v in losses_a.items():
        assert tC.last_epoch_losses[k] == v, (k, tC.last_epoch_losses[k], v)
    # bit-equal params through the same eval program -> bit-equal metrics
    assert outC["result"]["RMSE"] == outA["result"]["RMSE"]
    # the completed run retires its preemption checkpoint (no bogus
    # auto-resume on the next launch in this result_dir)
    assert not tC._preempt_path().exists()
