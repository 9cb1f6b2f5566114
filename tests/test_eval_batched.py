"""Batched-eval fast path (VERDICT #9): identical metric AND loss values to
the reference's bs=1 protocol (evaluate_utils.py:274-357), at any
valid_batch_size, including a padded remainder batch."""

import numpy as np
import pytest

from jspsr_tpu.config.loader import AttrDict
from jspsr_tpu.data.synthetic import generate_mini_dfc30
from jspsr_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("DFC30_8m")
    # 5 valid samples: bs=2 forces a padded remainder batch
    root, train, valid = generate_mini_dfc30(root, train_cities=("Brest",),
                                             valid_cities=("Vannes",),
                                             n_per_city=5, size=64)
    return AttrDict({
        "name": "eval_batched",
        "dataset": "DFC30", "dataset_path": str(root), "resolution": 8,
        "train_set": train, "valid_set": valid,
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3},
        "relative": True, "augment": False, "patch_size": 32,
        "crop_mode": "random", "patches_per_image": 1, "workers": 2,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8, "spn": True},
        "loss": {"L1": 1, "L2": 1, "Grad": 0.1},
        "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                             "momentum": 0.9, "diff_lr": False},
        "scheduler": "WarmupStepLR",
        "scheduler_kwargs": {"max_lr": 1e-3, "step_size": 100, "gamma": 0.5,
                             "warmup_epoch": 1},
        "train_batch_size": 2, "epochs": 1, "resume": False,
        "valid_batch_size": 1, "val_interval": 1, "val_start_epoch": 1,
        "metric": {
            "PSNR": {"package": "piq", "border": 0.05, "min": -80, "max": 929},
            "SSIM": {"package": "piq", "border": 0.05, "min": -80, "max": 929},
            "RMSE": {"package": "local", "border": 0.05, "min": -80, "max": 929},
            "Median": {"package": "local", "min": -80, "max": 929},
            "LE95": {"package": "local", "min": -80, "max": 929},
        },
        "best_metric": "RMSE", "val_border": 0.05,
        "verbose": False, "seed": 0,
    })


@pytest.mark.parametrize("batch", [2, 4])
def test_batched_eval_matches_bs1(env, tmp_path, batch):
    p1 = AttrDict(dict(env))
    t1 = Trainer(p1, result_dir=tmp_path / "bs1")
    r1 = t1.evaluate(compare_input=True)

    pb = AttrDict(dict(env))
    pb["valid_batch_size"] = batch  # 5 samples -> padded remainder batch
    tb = Trainer(pb, result_dir=tmp_path / f"bs{batch}")
    rb = tb.evaluate(compare_input=True)

    # same seeded init params => same predictions; rtol covers fp32
    # vectorization differences between batch shapes (the log-minmax
    # descale's exp reorders rounding at different tile widths; observed
    # up to ~3.3e-4 depending on backend/fusion order — e.g. the committed
    # mesh placement of the params shifts XLA's fusion choices). The
    # quantile metrics (Median/LE95) get a wider band: a quantile is an
    # order statistic, so an eps-level pixel reordering can swap which
    # sample sits at the cut point and move the score by the inter-sample
    # gap (observed 7.3e-4 on Median under xdist scheduling), where the
    # mean-based metrics stay within the eps-level drift itself.
    for k in ("loss", "PSNR", "SSIM", "RMSE", "Median", "LE95"):
        rtol = 3e-3 if k in ("Median", "LE95") else 5e-4
        np.testing.assert_allclose(rb[k], r1[k], rtol=rtol, err_msg=k)
    for k, v in r1["input"].items():
        rtol = 3e-3 if k in ("Median", "LE95") else 5e-4
        np.testing.assert_allclose(rb["input"][k], v, rtol=rtol, err_msg=k)


def test_mesh_sharded_eval_matches_single_device(env, tmp_path):
    """The batched eval fast path runs batch-sharded over the full 8-device
    virtual mesh (eval/loop.py mesh=...) with scores equal to the
    single-device path — the multi-chip eval wiring from round-2 VERDICT #5."""
    import jax
    from jspsr_tpu.eval.loop import eval_model
    from jspsr_tpu.parallel.mesh import make_mesh

    pb = AttrDict(dict(env))
    pb["valid_batch_size"] = 8  # 5 samples -> one padded batch of 8
    t = Trainer(pb, result_dir=tmp_path / "mesh")
    kw = dict(criterion=t.criterion, compare_input=True)
    r_single = eval_model(pb, t.valid_loader, t.eval_step, t.state.params,
                          t.state.bn_state, mesh=None, **kw)
    mesh = make_mesh(jax.devices())
    assert mesh.devices.size == 8
    r_mesh = eval_model(pb, t.valid_loader, t.eval_step, t.state.params,
                        t.state.bn_state, mesh=mesh, **kw)
    # Median/LE95 are order statistics — discontinuous when two pixel
    # errors are nearly tied, and the sharded program's reduction order
    # can differ from the unsharded one in the last bits (more so when a
    # persistent-cache program meets a freshly compiled one), flipping
    # the selected element by one quantum. Smooth averages stay at tight
    # rtol; the order statistics get a one-quantum atol floor.
    for k in ("loss", "PSNR", "SSIM", "RMSE", "Median", "LE95"):
        atol = 1e-4 if k in ("Median", "LE95") else 0
        np.testing.assert_allclose(r_mesh[k], r_single[k], rtol=3e-4,
                                   atol=atol, err_msg=k)
    for k, v in r_single["input"].items():
        atol = 1e-4 if k in ("Median", "LE95") else 0
        np.testing.assert_allclose(r_mesh["input"][k], v, rtol=3e-4,
                                   atol=atol, err_msg=k)
