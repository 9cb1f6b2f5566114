"""Mosaic, scene-inference, summarise and visualization tests."""

import numpy as np
import pytest
import jax

from jspsr_tpu.config.loader import AttrDict, get_tile
from jspsr_tpu.eval.mosaic import edge_ramp, merge_tiles, tile_weight
from jspsr_tpu.eval.inference import (
    add_padding, cal_pad, remove_padding, tile_inference, upscale_dem,
)
from jspsr_tpu.eval.summarise import summarise_evaluation
from jspsr_tpu.data.raster_io import write_raster


def test_edge_ramps_sum_to_one():
    k, p = 116, 13
    a = edge_ramp(k, p, False, True)
    b = edge_ramp(k, p, True, False)
    # overlap of right-fading and left-fading ramps covers to exactly 1
    np.testing.assert_allclose(a[-p:] + b[:p], 1.0, rtol=1e-12)


def test_merge_tiles_reconstructs_smooth_field():
    """Feathered merge of overlapping tiles of a smooth field reproduces it."""
    full, k = 334, 128
    stride, n = get_tile(full, k)
    yy, xx = np.mgrid[0:full, 0:full].astype(np.float64)
    field = np.sin(yy / 40) + np.cos(xx / 27)
    tiles = []
    for t in range(n):
        r, c = t // 3, t % 3
        tiles.append(field[stride * r:stride * r + k,
                           stride * c:stride * c + k])
    merged = merge_tiles(tiles, full_size=full)
    np.testing.assert_allclose(merged, field, rtol=1e-5, atol=1e-5)


def test_merge_tiles_weights_partition_of_unity():
    full, k = 322, 116  # border-cropped r3 protocol (SURVEY: 334->322, 128->116)
    stride, n = get_tile(full, k)
    ones = [np.ones((k, k)) for _ in range(n)]
    merged = merge_tiles(ones, full_size=full)
    np.testing.assert_allclose(merged, 1.0, rtol=1e-6)


def test_padding_roundtrip_and_cal_pad():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(100, 100, 2)).astype(np.float32)
    p = cal_pad(img)
    assert (100 + 2 * p) == 128
    padded = add_padding(img, p)
    assert padded.shape == (128, 128, 2)
    np.testing.assert_array_equal(remove_padding(padded, p), img)
    # mirror: first padded row equals row p (reflection without edge repeat)
    np.testing.assert_array_equal(padded[p - 1], padded[p + 1])
    assert cal_pad(np.zeros((128, 128, 1))) == 0


def _tiny_jspsr(seed=0):
    from jspsr_tpu.models.jspsr import JSPSR
    import jax.numpy as jnp

    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8, layers=(1, 1, 1, 1))
    params, bn = model.init(jax.random.PRNGKey(seed))

    @jax.jit
    def forward(inputs):
        return model(params, bn, inputs, train=False)[0]

    return forward


def _p():
    return AttrDict({
        "model_name": "JSPSR", "relative": True, "normalize": False,
        "mask_channel": None,
        "input_data": {"lr_dem": 1, "image": 3},
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
    })


def test_upscale_dem_full_scene():
    rng = np.random.default_rng(1)
    sample = {
        "lr_dem": rng.uniform(10, 200, (100, 100, 1)).astype(np.float32),
        "image": rng.integers(0, 255, (100, 100, 3)).astype(np.uint8),
    }
    fwd = _tiny_jspsr()
    y, t_ms, mem = upscale_dem(fwd, sample, _p())
    assert y.shape == (100, 100, 1)
    assert t_ms > 0
    assert np.isfinite(y).all()


def test_tile_inference_shapes_and_blend():
    rng = np.random.default_rng(2)
    size = 160  # 160 -> get_tile(160, 64): stride 48, 9 tiles
    sample = {
        "lr_dem": rng.uniform(10, 200, (size, size, 1)).astype(np.float32),
        "image": rng.integers(0, 255, (size, size, 3)).astype(np.uint8),
    }
    fwd = _tiny_jspsr()
    out = tile_inference(fwd, sample, _p(), tile=64)
    assert out.shape == (size, size, 1)
    assert np.isfinite(out).all()


def test_summarise_evaluation(tmp_path):
    rng = np.random.default_rng(3)
    pred_files, gt_files, cop_files = {}, {}, {}
    for i in range(3):
        gt = rng.uniform(0, 100, (40, 40)).astype(np.float32)
        pred = gt + rng.normal(0, 1.0, gt.shape).astype(np.float32)
        cop = gt + rng.normal(0, 3.0, gt.shape).astype(np.float32)
        sid = f"s{i}"
        for name, arr, d in (("pred", pred, pred_files), ("gt", gt, gt_files),
                             ("cop", cop, cop_files)):
            path = tmp_path / f"{sid}_{name}.npy"
            write_raster(path, arr)
            d[sid] = path
    res = summarise_evaluation(pred_files, gt_files, {"COP30": cop_files},
                               elev_max=929, save_dir=tmp_path, plots=True)
    assert res["n_samples"] == 3
    # SR beats the 3m-noise baseline in both views
    assert res["online"]["SR"]["RMSE"] < res["online"]["COP30"]["RMSE"]
    assert res["offline"]["SR"]["RMSE"] < res["offline"]["COP30"]["RMSE"]
    assert abs(res["offline"]["SR"]["RMSE"] - 1.0) < 0.15
    assert (tmp_path / "summary.json").exists()


def test_visualize_panels(tmp_path):
    from jspsr_tpu.eval.visualize import display_predictions

    rng = np.random.default_rng(4)
    sample = {
        "lr_dem": rng.uniform(0.3, 0.6, (32, 32, 1)).astype(np.float32),
        "hr_dem": rng.uniform(0.3, 0.6, (32, 32, 1)).astype(np.float32),
        "image": rng.uniform(0, 1, (32, 32, 3)).astype(np.float32),
    }
    pred = rng.uniform(0.3, 0.6, (32, 32, 1)).astype(np.float32)
    fig = display_predictions(sample, pred,
                              {"min": -80, "max": 929, "log": True},
                              save_path=tmp_path / "vis.png")
    assert (tmp_path / "vis.png").exists()


def test_eval_visuals_written(tmp_path):
    """val_num_visual wiring: panels saved during eval."""
    from jspsr_tpu.data.synthetic import generate_mini_dfc30
    from jspsr_tpu.data.dfc30 import DFC30
    from jspsr_tpu.data.loader import DataLoader
    from jspsr_tpu.data.transforms import build_transforms
    from jspsr_tpu.eval.loop import eval_model, get_visual_id
    from jspsr_tpu.train.step import make_eval_step
    from jspsr_tpu.models.jspsr import JSPSR

    assert get_visual_id(2, 10) == [0, 9]
    assert get_visual_id(-1, 3) == [0, 1, 2]
    assert get_visual_id(0, 10, id_visual=4) == [4]

    root, train, valid = generate_mini_dfc30(
        tmp_path / "d", train_cities=("Brest",), valid_cities=("Vannes",),
        n_per_city=2, size=32)
    p = AttrDict({
        "model_name": "JSPSR", "dataset": "DFC30", "dataset_path": str(root),
        "resolution": 8, "train_set": train, "valid_set": valid,
        "input_data": {"lr_dem": 1, "COP30": 1, "image": 3},
        "relative": True, "augment": False, "patch_size": 32,
        "crop_mode": "tile", "patches_per_image": 1,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929},
        "metric": {"RMSE": {"package": "local", "border": 0.0,
                            "min": -80, "max": 929}},
        "val_num_visual": 1,
    })
    _, eval_tf = build_transforms(p)
    ds = DFC30(split="valid", transform=eval_tf, **p)
    dl = DataLoader(ds, 1, num_workers=1)
    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1))
    params, bn = model.init(jax.random.PRNGKey(0))
    eval_step = make_eval_step(model)
    res = eval_model(p, dl, eval_step, params, bn,
                     visual_dir=tmp_path / "vis")
    assert np.isfinite(res["RMSE"])
    assert len(list((tmp_path / "vis").glob("*.png"))) >= 1


def test_summarise_tiled_r3_protocol(tmp_path):
    """9 per-tile predictions merge into full scenes before pooled metrics."""
    from jspsr_tpu.config.loader import get_tile

    rng = np.random.default_rng(5)
    full, k = 334, 128
    stride, n = get_tile(full, k)
    pred_files, gt_files = {}, {}
    for s in range(2):
        gt = rng.uniform(0, 100, (full, full)).astype(np.float32)
        noisy = gt + rng.normal(0, 0.5, gt.shape).astype(np.float32)
        gt_path = tmp_path / f"scene{s}_gt.npy"
        write_raster(gt_path, gt)
        gt_files[f"scene{s}"] = gt_path
        for t in range(n):
            r, c = t // 3, t % 3
            tile = noisy[stride * r:stride * r + k, stride * c:stride * c + k]
            tp = tmp_path / f"scene{s}_{t}.npy"
            write_raster(tp, tile)
            pred_files[f"scene{s}_{t}"] = tp
    from jspsr_tpu.eval.summarise import summarise_evaluation

    res = summarise_evaluation(pred_files, gt_files, elev_max=929,
                               tiles_per_scene=n, full_size=full,
                               save_dir=tmp_path / "out")
    assert res["n_samples"] == 2
    assert abs(res["offline"]["SR"]["RMSE"] - 0.5) < 0.05
    assert (tmp_path / "out" / "mosaics" / "scene0.npy").exists()


def test_cli_infer_scene_dir(tmp_path):
    """--infer end-to-end: scene directory -> upscaled GeoTIFF in meters.

    Covers load_scene modality resolution (DFC30 subdir aliases),
    load_model_params (.npz), upscale_dem padding, descale-to-meters and
    raster write — the CLI form of reference utils/utils.py:1556-1655."""
    from jspsr_tpu.cli.main import main as cli_main
    from jspsr_tpu.models.jspsr import JSPSR
    from jspsr_tpu.train.checkpoint import save_checkpoint
    from jspsr_tpu.data.raster_io import read_raster
    import yaml

    rng = np.random.default_rng(3)
    scene = tmp_path / "scene"
    (scene / "COP30").mkdir(parents=True)  # DFC30-style subdir alias
    write_raster(scene / "COP30" / "dem.npy",
                 rng.uniform(10, 200, (96, 96, 1)).astype(np.float32))
    write_raster(scene / "image.npy",  # flat modality-name file
                 rng.uniform(0, 1, (96, 96, 3)).astype(np.float32))

    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1))
    params, bn = model.init(jax.random.PRNGKey(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, bn)

    cfg = {
        "name": "infer_test", "dataset": "DFC30", "resolution": 8,
        "model_name": "JSPSR", "relative": True,
        "input_data": {"COP30": 1, "image": 3},
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "model_kwargs": {"num_block": 1, "num_feature": 8,
                         "checkpoint": str(ckpt)},
        "loss": {"L1": 1}, "optimizer": "AdamW",
        "optimizer_kwargs": {"lr": 1e-3},
        "scheduler": "ConstantLR", "scheduler_kwargs": {},
        "train_batch_size": 2, "epochs": 1, "metric": {},
    }
    cfg_path = tmp_path / "c.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "out" / "up.npy"

    import sys as _sys
    real_stdout = _sys.stdout
    try:
        path = cli_main(["--config", str(cfg_path), "--infer", str(scene),
                         "--out", str(out),
                         "--result-dir", str(tmp_path / "res")])
    finally:
        _sys.stdout = real_stdout
    arr = read_raster(path)
    assert arr.shape == (96, 96, 1)
    # output is in METERS (descale applied + relative base): same order of
    # magnitude as the input DEM, not [0,1] scale space
    assert np.isfinite(arr).all() and arr.mean() > 5.0


def test_cli_infer_tile_path(tmp_path):
    """--tile: tile-parallel feathered path through the CLI driver."""
    from jspsr_tpu.eval.inference import run_scene_inference
    from jspsr_tpu.models.jspsr import JSPSR
    from jspsr_tpu.data.raster_io import read_raster

    rng = np.random.default_rng(4)
    scene = tmp_path / "scene"
    scene.mkdir()
    write_raster(scene / "lr_dem.npy",
                 rng.uniform(10, 200, (160, 160, 1)).astype(np.float32))
    write_raster(scene / "image.npy",
                 rng.uniform(0, 1, (160, 160, 3)).astype(np.float32))

    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1))
    params, bn = model.init(jax.random.PRNGKey(1))
    p = _p()
    p["patch_size"] = 64
    out, t_ms, _ = run_scene_inference(model, params, bn, p, scene,
                                       tmp_path / "up.npy", tile=True)
    arr = read_raster(out)
    assert arr.shape == (160, 160, 1) and np.isfinite(arr).all()


def test_load_scene_image_reaches_model_in_trained_range(tmp_path):
    """Regression: load_scene must deliver what ToArray expects (0-255
    images, mask_channel applied) so the normalized guidance matches the
    training distribution — a float [0,1] image raster must NOT end up
    ~255x too small after ToArray's /255."""
    from jspsr_tpu.eval.inference import _normalize_sample, load_scene

    rng = np.random.default_rng(5)
    scene = tmp_path / "scene"
    scene.mkdir()
    write_raster(scene / "lr_dem.npy",
                 rng.uniform(10, 200, (64, 64, 1)).astype(np.float32))
    write_raster(scene / "image.npy",
                 rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    write_raster(scene / "mask.npy",
                 (rng.uniform(0, 1, (64, 64, 15)) < 0.5)
                 .astype(np.float32))

    p = _p()
    p["input_data"] = {"lr_dem": 1, "image": 3, "mask": 10}
    p["mask_channel"] = list(range(10))
    sample, profile = load_scene(scene, p)
    assert sample["mask"].shape[2] == 10  # mask_channel slice (dfc30.py:198)
    s = _normalize_sample(dict(sample), p)
    # normalized image must be in the trained [0,1] range, not [0, 0.004]
    assert 0.5 < s["image"].max() <= 1.0
    # 0-255 input path normalizes identically
    write_raster(scene / "image.npy",
                 rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
    sample2, _ = load_scene(scene, p)
    s2 = _normalize_sample(dict(sample2), p)
    assert 0.5 < s2["image"].max() <= 1.0


def test_upscale_dem_non_square_scene():
    """Non-square scenes pad each dim to the encoder stride multiple (not
    the old power-of-two square — a 96x100 scene runs at 96x104, not
    128x128) and crop back exactly."""
    from jspsr_tpu.eval.inference import pad_to_multiple, pad_to_square_pow2

    rng = np.random.default_rng(6)
    sample = {
        "lr_dem": rng.uniform(10, 200, (96, 100, 1)).astype(np.float32),
        "image": rng.integers(0, 255, (96, 100, 3)).astype(np.uint8),
    }
    padded, pads = pad_to_square_pow2(sample["lr_dem"])
    assert padded.shape[:2] == (128, 128) and sum(pads) == 128 - 96 + 128 - 100
    padded8, pads8 = pad_to_multiple(sample["lr_dem"], 8)
    assert padded8.shape[:2] == (96, 104) and sum(pads8) == 4
    fwd = _tiny_jspsr()
    y, t_ms, _ = upscale_dem(fwd, sample, _p())
    assert y.shape == (96, 100, 1) and np.isfinite(y).all()


def test_infer_large_scene_512(tmp_path):
    """Whole-scene --infer at 512^2 (round-2 VERDICT #8): the scene pads to
    the stride multiple (512 is already /8), runs the full-resolution
    forward, and the deformable dispatch routes AWAY from the Pallas kernel
    (VMEM guard) — no silent overflow path at scene sizes."""
    from jspsr_tpu.eval.inference import run_scene_inference
    from jspsr_tpu.models.jspsr import JSPSR
    from jspsr_tpu.data.raster_io import read_raster
    from jspsr_tpu.ops.pallas_deform import pallas_case_supported

    # the guard itself: 512^2 single-channel deform is not Pallas-eligible
    x = np.zeros((1, 512, 512, 1), np.float32)
    off = np.zeros((1, 512, 512, 18), np.float32)
    wgt = np.zeros((3, 3, 1, 1), np.float32)
    assert not pallas_case_supported(x, off, wgt, 1, 1, 1)

    rng = np.random.default_rng(9)
    scene = tmp_path / "scene"
    scene.mkdir()
    write_raster(scene / "lr_dem.npy",
                 rng.uniform(10, 200, (512, 512, 1)).astype(np.float32))
    write_raster(scene / "image.npy",
                 rng.integers(0, 255, (512, 512, 3)).astype(np.uint8))

    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1))
    params, bn = model.init(jax.random.PRNGKey(2))
    out, t_ms, _ = run_scene_inference(model, params, bn, _p(), scene,
                                       tmp_path / "up.npy", tile=False)
    arr = read_raster(out)
    assert arr.shape == (512, 512, 1) and np.isfinite(arr).all()


def test_load_scene_float_255_raster_detected(tmp_path, capsys):
    """A float raster HOLDING 0-255 values (e.g. a resampled uint8
    orthophoto) must reach the model in the trained range too: the value
    check (max > 1.5) classifies it 0-255 and passes it through, and the
    explicit ``infer_image_range`` config overrides the heuristic."""
    from jspsr_tpu.eval.inference import _normalize_sample, load_scene

    rng = np.random.default_rng(11)
    scene = tmp_path / "scene"
    scene.mkdir()
    write_raster(scene / "lr_dem.npy",
                 rng.uniform(10, 200, (32, 32, 1)).astype(np.float32))
    write_raster(scene / "image.npy",
                 rng.uniform(0, 255, (32, 32, 3)).astype(np.float32))

    p = _p()
    sample, _ = load_scene(scene, p)
    s = _normalize_sample(dict(sample), p)
    assert 0.5 < s["image"].max() <= 1.0  # NOT rescaled to [0, 65025]
    assert "assumed 0-255" in capsys.readouterr().out  # heuristic is loud

    # explicit override wins over the value heuristic
    p2 = _p()
    p2["infer_image_range"] = "unit"
    sample2, _ = load_scene(scene, p2)
    assert sample2["image"].max() > 255.0  # unit-range rule multiplied by 255
