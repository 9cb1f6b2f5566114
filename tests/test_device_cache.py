"""Device-resident scene cache (data/device_cache.py): the HBM scene-stack
sampler must produce bit-identical batches — content AND order — to the
host crop/augment/normalize pipeline it replaces (reference
data/data_utils.py:9-84 semantics)."""

import numpy as np
import jax
import pytest

from jspsr_tpu.config.loader import AttrDict
from jspsr_tpu.data.dfc30 import DFC30
from jspsr_tpu.data.device_cache import DeviceSceneCache
from jspsr_tpu.data.loader import DataLoader, build_batch_inputs
from jspsr_tpu.data.synthetic import generate_mini_dfc30
from jspsr_tpu.data.transforms import build_transforms
from jspsr_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = tmp_path_factory.mktemp("DFC30_8m")
    r, train, valid = generate_mini_dfc30(r, train_cities=("Brest",),
                                          valid_cities=("Vannes",),
                                          n_per_city=3, size=64)
    return r, train, valid


def _config(root, train, valid, **over):
    p = AttrDict({
        "name": "cache_test",
        "dataset": "DFC30", "dataset_path": str(root), "resolution": 8,
        "train_set": train, "valid_set": valid,
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3, "mask": 15,
                       "canopy": 1, "coord": 1},
        "coord_mode": "local",
        "relative": True, "augment": True, "patch_size": 32,
        "crop_mode": "random", "patches_per_image": 1,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "seed": 0, "verbose": False,
    })
    for k, v in over.items():
        p[k] = v
    return p


def _host_batches(p, batch_size, epoch):
    train_tf, _ = build_transforms(p)
    ds = DFC30(split="train", transform=train_tf, seed=p.seed,
               **{k: v for k, v in p.items() if k != "seed"})
    loader = DataLoader(ds, batch_size, shuffle=True, drop_last=True,
                        num_workers=1, seed=p.seed)
    loader.set_epoch(epoch)
    out = []
    for batch in loader:
        inputs, gt, _, _ = build_batch_inputs(batch, "JSPSR", p.input_data)
        out.append((inputs, gt))
    return out


def _cache_batches(p, batch_size, epoch, n_devices=1):
    p = AttrDict(dict(p))
    p["device_normalize"] = True
    train_tf, _ = build_transforms(p)
    ds = DFC30(split="train", transform=train_tf, seed=p.seed,
               **{k: v for k, v in p.items() if k != "seed"})
    mesh = make_mesh(jax.devices()[:n_devices])
    cache = DeviceSceneCache(ds, p, mesh)
    loader = DataLoader(ds, batch_size, shuffle=True, drop_last=True,
                        num_workers=1, seed=p.seed)
    loader.set_epoch(epoch)
    return list(cache.epoch_batches(loader, epoch))


def _assert_equal(host, cache):
    assert len(cache) == len(host)
    for (hi, hg), (di, dg, bs) in zip(host, cache):
        assert bs == hg.shape[0]
        for k, (a, b) in enumerate(zip(hi, di)):
            np.testing.assert_allclose(np.asarray(b), a, atol=2e-6,
                                       err_msg=f"input {k}")
        np.testing.assert_allclose(np.asarray(dg), hg, atol=2e-6,
                                   err_msg="gt")


def test_random_crop_augment_matches_host(root):
    """RandomCrop + RandomFlipRotate90 + relative log scaling, every
    modality, two shuffled epochs, on a 2-device mesh."""
    p = _config(*root)
    for epoch in (0, 1):
        host = _host_batches(p, 2, epoch)
        cache = _cache_batches(p, 2, epoch, n_devices=2)
        _assert_equal(host, cache)


def test_tile_crop_matches_host(root):
    """Deterministic TileCrop tiling (9 tiles per 64px scene), no
    augmentation — the r3-protocol shape."""
    p = _config(*root, crop_mode="tile", patches_per_image=9, augment=False)
    host = _host_batches(p, 3, 0)
    cache = _cache_batches(p, 3, 0)
    _assert_equal(host, cache)


def test_full_scene_no_crop(root):
    """patch_size == scene size: the crop no-ops and full scenes flow
    through (draw returns None on both paths)."""
    p = _config(*root, patch_size=64)
    host = _host_batches(p, 2, 0)
    cache = _cache_batches(p, 2, 0)
    _assert_equal(host, cache)


def test_rejects_unsupported_transform(root):
    """A transform the device path cannot replicate is refused loudly."""
    from jspsr_tpu.data.transforms import Compose, RandomCrop, RGB2YCbCr

    p = _config(*root)
    p["device_normalize"] = True
    ds = DFC30(split="train", transform=None, seed=0,
               **{k: v for k, v in p.items() if k != "seed"})
    mesh = make_mesh(jax.devices()[:1])
    with pytest.raises(ValueError, match="cannot replicate"):
        DeviceSceneCache(ds, p, mesh,
                         transform=Compose([RandomCrop(32), RGB2YCbCr()]))


def test_budget_guard(root):
    """Stacks larger than the HBM budget fail fast with a clear message."""
    p = _config(*root)
    p["device_normalize"] = True
    train_tf, _ = build_transforms(p)
    ds = DFC30(split="train", transform=train_tf, seed=0,
               **{k: v for k, v in p.items() if k != "seed"})
    mesh = make_mesh(jax.devices()[:1])
    with pytest.raises(ValueError, match="budget"):
        DeviceSceneCache(ds, p, mesh, budget_gb=1e-6)


def test_trainer_budget_fallback(root, tmp_path):
    """When the split exceeds the HBM budget the Trainer warns and falls
    back to the host raw feed instead of refusing to train."""
    from jspsr_tpu.train.trainer import Trainer

    r, train, valid = root
    p = _config(r, train, valid)
    p["input_data"] = {"lr_dem": 1, "COP30": 1, "image": 3, "mask": 15}
    for k, v in {
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8, "spn": False,
                         "pretrained": False, "checkpoint": None},
        "loss": {"L1": 1},
        "optimizer": "Adam",
        "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 0,
                             "momentum": 0.9, "diff_lr": False},
        "scheduler": "ConstantLR", "scheduler_kwargs": {},
        "train_batch_size": 2, "epochs": 1, "valid_batch_size": 1,
        "val_interval": 1, "val_start_epoch": 1, "workers": 1,
        "metric": {"RMSE": {"package": "local", "border": 0.05,
                            "min": -80, "max": 929}},
        "best_metric": "RMSE", "val_border": 0.05,
        "device_normalize": True, "device_cache": True,
        "device_cache_budget_gb": 1e-6,
    }.items():
        p[k] = v
    t = Trainer(p, result_dir=tmp_path / "fallback")
    assert t.scene_cache is None  # fell back
    t.train_one_epoch(0)  # host feed still trains
    assert np.isfinite(t.last_epoch_losses["Total"])


def test_trainer_device_cache_matches_host_path(root, tmp_path):
    """Full Trainer epoch from the device cache: loss trace equals the
    host-pipeline trainer (same order, same math)."""
    from jspsr_tpu.train.trainer import Trainer

    r, train, valid = root
    p_host = _config(r, train, valid)
    p_host["input_data"] = {"lr_dem": 1, "COP30": 1, "image": 3, "mask": 15}
    # dict.update bypasses AttrDict.__setitem__ wrapping — assign per key
    for k, v in {
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8, "spn": True,
                         "pretrained": False, "checkpoint": None},
        "loss": {"L1": 1, "Grad": 0.1},
        "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 1e-3, "weight_decay": 1e-6,
                             "momentum": 0.9, "diff_lr": False},
        "scheduler": "StepLR",
        "scheduler_kwargs": {"step_size": 100, "gamma": 0.5},
        "train_batch_size": 2, "epochs": 1, "valid_batch_size": 1,
        "val_interval": 1, "val_start_epoch": 1, "workers": 1,
        "metric": {"RMSE": {"package": "local", "border": 0.05,
                            "min": -80, "max": 929}},
        "best_metric": "RMSE", "val_border": 0.05,
    }.items():
        p_host[k] = v
    p_cache = AttrDict(dict(p_host))
    p_cache["device_normalize"] = True
    p_cache["device_cache"] = True

    t_host = Trainer(p_host, result_dir=tmp_path / "host")
    t_host.train_one_epoch(0)
    t_cache = Trainer(p_cache, result_dir=tmp_path / "cache")
    assert t_cache.scene_cache is not None
    t_cache.train_one_epoch(0)

    assert t_cache.last_epoch_losses.keys() == t_host.last_epoch_losses.keys()
    for k, v in t_host.last_epoch_losses.items():
        np.testing.assert_allclose(t_cache.last_epoch_losses[k], v,
                                   rtol=2e-4, err_msg=k)


def test_epoch_desync_rejected(root):
    """epoch_batches(loader, e) without loader.set_epoch(e) would shuffle
    with one epoch and seed the crop/augment replay with another — it must
    fail loudly instead of silently breaking host-path bit-identity."""
    p = _config(*root)
    p["device_normalize"] = True
    train_tf, _ = build_transforms(p)
    ds = DFC30(split="train", transform=train_tf, seed=p.seed,
               **{k: v for k, v in p.items() if k != "seed"})
    mesh = make_mesh(jax.devices()[:1])
    cache = DeviceSceneCache(ds, p, mesh)
    loader = DataLoader(ds, 2, shuffle=True, drop_last=True,
                        num_workers=1, seed=p.seed)
    loader.set_epoch(1)
    with pytest.raises(AssertionError, match="desync"):
        next(cache.epoch_batches(loader, epoch=2))
    loader.set_epoch(2)
    next(cache.epoch_batches(loader, epoch=2))  # synced: works
