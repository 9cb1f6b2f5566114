"""Config loader + data pipeline tests (synthetic mini-DFC30 fixture)."""

import numpy as np
import pytest

from jspsr_tpu.config.loader import AttrDict, create_config, get_tile
from jspsr_tpu.data.dfc30 import DFC30
from jspsr_tpu.data.loader import DataLoader, build_batch_inputs
from jspsr_tpu.data.normalize import descale_data
from jspsr_tpu.data.synthetic import generate_mini_dfc30
from jspsr_tpu.data.transforms import (
    Compose, RandomFlipRotate90, TileCrop, ToArray, TransformCtx,
    build_transforms,
)


@pytest.fixture(scope="module")
def mini_dfc30(tmp_path_factory):
    root = tmp_path_factory.mktemp("DFC30_8m")
    return generate_mini_dfc30(root, n_per_city=2, size=128)


def _cfg(root, train, valid, mask=False):
    d = {
        "dataset": "DFC30", "dataset_path": str(root), "resolution": 8,
        "train_set": train, "valid_set": valid,
        "input_data": {"COP30": 1, "image": 3, "lr_dem": 1,
                       **({"mask": 15} if mask else {})},
        "relative": True, "augment": True, "patch_size": 128,
        "crop_mode": "tile", "patches_per_image": 1,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
    }
    return AttrDict(d)


def test_config_loader_r8():
    p = create_config("configs/jspsr_r8_img.yml")
    assert p.patch_size == 128
    assert p.patches_per_image == 1
    assert p.input_data.lr_dem == 1 and p.input_data.COP30 == 1
    assert p.model_kwargs.spn is True
    assert p.metric.RMSE.border == 0.05
    assert p.metric.PSNR["min"] == -80 and p.metric.PSNR["max"] == 929
    assert p.tensor_kwargs.log is True


def test_config_loader_r3_tiles():
    p = create_config("configs/jspsr_r3_img_msk.yml")
    assert p.patches_per_image == 9  # 334x334 -> 9 overlapping 128 tiles
    assert p.val_id_visual == 438 * 9 + 4
    assert p.tensor_kwargs.max == 933
    assert get_tile(334, 128) == (103, 9)


def test_dataset_index_and_sample(mini_dfc30):
    root, train, valid = mini_dfc30
    p = _cfg(root, train, valid, mask=True)
    train_tf, eval_tf = build_transforms(p)
    ds = DFC30(split="train", transform=eval_tf, **p)
    assert len(ds) == 4  # 2 cities x 2 samples
    s = ds[0]
    assert s["lr_dem"].shape == (128, 128, 1)
    assert s["image"].shape == (128, 128, 3)
    assert s["mask"].shape == (128, 128, 15)
    assert s["hr_dem"].shape == (128, 128, 1)
    for k in ("lr_dem", "image", "mask", "hr_dem"):
        assert s[k].dtype == np.float32
        assert 0 <= s[k].min() and s[k].max() <= 1
    # relative log-minmax round trip: descale + base == original meters
    base = s["meta"]["base"]
    back = descale_data(s["lr_dem"], -80, 929, True) + base
    assert np.isfinite(back).all()


def test_dataset_deterministic_under_shuffle(mini_dfc30):
    """Same index -> same sample, regardless of access order (fixes the
    reference's stateful TileCrop, SURVEY 5.2)."""
    root, train, valid = mini_dfc30
    p = _cfg(root, train, valid)
    train_tf, _ = build_transforms(p)
    ds = DFC30(split="train", transform=train_tf, seed=7, **p)
    a = ds[1]["lr_dem"].copy()
    _ = ds[3], ds[0], ds[2]
    b = ds[1]["lr_dem"].copy()
    np.testing.assert_array_equal(a, b)
    # different epoch -> different augmentation stream somewhere
    epoch0 = []
    ds.set_epoch(0)
    for i in range(len(ds)):
        epoch0.append(ds[i]["lr_dem"].copy())
    diffs = []
    for e in range(1, 4):
        ds.set_epoch(e)
        diffs.extend(
            not np.array_equal(ds[i]["lr_dem"], epoch0[i]) for i in range(len(ds))
        )
    assert any(diffs)


def test_tile_crop_covers_grid():
    size, k = 334, 128
    stride, n = get_tile(size, k)
    tc = TileCrop(k, n_tile=n)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(size, size, 1)).astype(np.float32)
    seen = np.zeros((size, size), bool)
    for t in range(n):
        s = {"lr_dem": img.copy(),
             "meta": {"bbox": None, "profile": {"transform": [8.0, 0, 0, 0, -8.0, 0],
                                                "width": size, "height": size}}}
        s = tc(s, TransformCtx(tile_index=t))
        assert s["lr_dem"].shape == (k, k, 1)
        x0, y0, x1, y1 = s["meta"]["bbox"]
        seen[y0:y1, x0:x1] = True
        row, col = t // 3, t % 3
        np.testing.assert_array_equal(
            s["lr_dem"][:, :, 0],
            img[stride * row:stride * row + k, stride * col:stride * col + k, 0],
        )
        # profile origin shifted by the tile offset
        assert s["meta"]["profile"]["transform"][2] == 8.0 * stride * col
    assert seen.all()


def test_flip_rotate_records_meta():
    rng = np.random.default_rng(3)  # seed chosen so augmentation triggers
    x = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    for seed in range(10):
        s = {"lr_dem": x.copy(), "meta": {"augmentation": None}}
        ctx = TransformCtx(np.random.default_rng(seed))
        s = RandomFlipRotate90()(s, ctx)
        aug = s["meta"]["augmentation"]
        if aug:
            t = np.rot90(x, aug["rot90"])
            if aug["flip_lr"]:
                t = np.fliplr(t)
            if aug["flip_ud"]:
                t = np.flipud(t)
            np.testing.assert_array_equal(s["lr_dem"], t)
            break
    else:
        pytest.fail("augmentation never triggered in 10 seeds")


def test_mask_channel_scaling():
    mask = np.ones((4, 4, 15), np.uint8)
    s = {"mask": mask, "meta": {"base": 0, "id": "x"}}
    ta = ToArray(relative=False, scale_mask=True, min=-80, max=929, log=True)
    s = ta(s, TransformCtx())
    for i in range(15):
        np.testing.assert_allclose(s["mask"][:, :, i], (i + 1) / 16.0, rtol=1e-6)


def test_loader_batches_and_inputs(mini_dfc30):
    root, train, valid = mini_dfc30
    p = _cfg(root, train, valid, mask=True)
    _, eval_tf = build_transforms(p)
    ds = DFC30(split="train", transform=eval_tf, **p)
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                    num_workers=2, seed=0)
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b["lr_dem"].shape == (2, 128, 128, 1)
    inputs, gt, base, meta = build_batch_inputs(b, "JSPSR", p.input_data)
    assert len(inputs) == 3  # dem, image, mask
    assert gt.shape == (2, 128, 128, 1)
    assert base.shape == (2,)
    # EDSR: stacked channels
    inputs_e, _, _, _ = build_batch_inputs(b, "EDSR", p.input_data)
    assert inputs_e[0].shape == (2, 128, 128, 19)


def test_loader_sharding(mini_dfc30):
    root, train, valid = mini_dfc30
    p = _cfg(root, train, valid)
    _, eval_tf = build_transforms(p)
    ds = DFC30(split="train", transform=eval_tf, **p)
    ids = []
    for shard in range(2):
        dl = DataLoader(ds, batch_size=1, shuffle=True, seed=5,
                        shard_index=shard, num_shards=2)
        dl.set_epoch(0)
        ids.extend(m["id"] for b in dl for m in b["meta"])
    assert sorted(ids) == sorted(ds.id)  # disjoint cover


def test_fabdem_source_and_aux_modalities(mini_dfc30):
    root, train, valid = mini_dfc30
    p = _cfg(root, train, valid)
    p.input_data = AttrDict({"FABDEM": 1, "lr_dem": 1, "image": 3,
                             "canopy": 1})
    _, eval_tf = build_transforms(p)
    ds = DFC30(split="valid", transform=eval_tf, **p)
    s = ds[0]
    assert s["canopy"].shape == (128, 128, 1)
    assert 0 <= s["canopy"].min() and s["canopy"].max() <= 1  # /68 scaling
    assert "FABDEM" in ds.files["lr_dem"][0]


def test_coord_channels_local_and_global(mini_dfc30):
    root, train, valid = mini_dfc30
    for mode in ("local", "global"):
        p = _cfg(root, train, valid)
        p.input_data = AttrDict({"COP30": 1, "lr_dem": 1, "image": 3,
                                 "coord": 2})
        p["coord_mode"] = mode
        _, eval_tf = build_transforms(p)
        ds = DFC30(split="valid", transform=eval_tf, **p)
        s = ds[0]
        assert s["coord"].shape == (128, 128, 2)
        assert 0 <= s["coord"].min() and s["coord"].max() <= 1


def test_r3_tiled_dataset(tmp_path):
    """334x334 scenes -> 9 deterministic overlapping 128 tiles per image."""
    from jspsr_tpu.data.synthetic import generate_mini_dfc30

    root, train, valid = generate_mini_dfc30(
        tmp_path / "DFC30_3m", train_cities=("Brest",),
        valid_cities=("Vannes",), n_per_city=1, size=334, resolution=3)
    p = _cfg(root, train, valid)
    p.resolution = 3
    p.patches_per_image = 9
    p.tensor_kwargs["max"] = 933
    _, eval_tf = build_transforms(p)
    ds = DFC30(split="valid", transform=eval_tf, **p)
    assert len(ds) == 9
    seen_bboxes = set()
    for i in range(9):
        s = ds[i]
        assert s["lr_dem"].shape == (128, 128, 1)
        assert s["meta"]["id"].endswith(f"_{i}")
        seen_bboxes.add(s["meta"]["bbox"])
    assert len(seen_bboxes) == 9  # all distinct tiles


def test_rgb2ycbcr_transform_class():
    from jspsr_tpu.data.transforms import RGB2YCbCr, rgb2ycbcr, ycbcr2rgb

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    s = {"image": img.copy(), "meta": {}}
    s = RGB2YCbCr()(s, None)
    np.testing.assert_allclose(s["image"], rgb2ycbcr(img), rtol=1e-6)
    # matlab-convention round trip
    y = rgb2ycbcr(img)
    back = ycbcr2rgb((y / 255.0).astype(np.float32))
    assert np.abs(back - img).max() < 4.0  # uint8 quantization in the conversion


def test_loader_start_batch_fast_forward(mini_dfc30):
    """set_epoch(e, start_batch=k) resumes the epoch's batch stream at
    batch k with an identical remaining order (mid-epoch preemption resume,
    trainer `save_every_steps`): skipped batches are pure index arithmetic,
    and the cursor resets on the next plain set_epoch."""
    root, train, valid = mini_dfc30
    p = _cfg(root, train, valid)
    _, eval_tf = build_transforms(p)
    ds = DFC30(split="train", transform=eval_tf, **p)

    def ids(dl):
        return [[m["id"] for m in b["meta"]] for b in dl]

    for drop_last, bs in ((True, 2), (False, 3)):  # bs=3 over 4: remainder
        dl = DataLoader(ds, batch_size=bs, shuffle=True, drop_last=drop_last,
                        num_workers=2, seed=0)
        dl.set_epoch(0)
        full = ids(dl)
        dl.set_epoch(0, start_batch=1)
        assert ids(dl) == full[1:], (drop_last, bs)
        # fast-forward past every full batch: only the remainder (or
        # nothing, under drop_last) is left
        dl.set_epoch(0, start_batch=len(ds) // bs)
        tail = ids(dl)
        assert tail == ([] if drop_last or len(ds) % bs == 0
                        else [full[-1]]), (drop_last, bs)
        # the cursor does not leak into the next epoch
        dl.set_epoch(1)
        assert len(ids(dl)) == len(full)
        # start_batch == n_full + 1: the remainder batch itself was the
        # last checkpointed step, so the resumed stream must be EMPTY —
        # the `start_batch <= n_full` guard in data/loader._batches
        # prevents the remainder from being re-yielded
        dl.set_epoch(0, start_batch=len(ds) // bs + 1)
        assert ids(dl) == [], (drop_last, bs)
