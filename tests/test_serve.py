"""Pipelined multi-scene serving (eval/serve.py) + CLI batch --infer."""

import numpy as np
import jax
import pytest

from jspsr_tpu.config.loader import AttrDict
from jspsr_tpu.data.raster_io import read_raster, write_raster
from jspsr_tpu.eval.serve import discover_scenes, serve_scenes


def _p(ckpt=None):
    return AttrDict({
        "model_name": "JSPSR", "relative": True, "normalize": False,
        "mask_channel": None, "patch_size": 64,
        "input_data": {"lr_dem": 1, "image": 3},
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
        "model_kwargs": {"num_feature": 8, "num_block": 1,
                         "checkpoint": ckpt},
    })


def _tiny_jspsr(seed=0):
    from jspsr_tpu.models.jspsr import JSPSR

    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1))
    params, bn = model.init(jax.random.PRNGKey(seed))
    return model, params, bn


def _make_batch_dir(tmp_path, n=3, size=96, seed=0):
    rng = np.random.default_rng(seed)
    batch = tmp_path / "batch"
    for i in range(n):
        d = batch / f"scene{i}"
        d.mkdir(parents=True)
        write_raster(d / "lr_dem.npy",
                     rng.uniform(10, 200, (size, size, 1))
                     .astype(np.float32))
        write_raster(d / "image.npy",
                     rng.integers(0, 255, (size, size, 3))
                     .astype(np.uint8))
    return batch


def test_discover_scenes(tmp_path):
    batch = _make_batch_dir(tmp_path, n=3)
    scenes = discover_scenes(batch)
    assert [s.name for s in scenes] == ["scene0", "scene1", "scene2"]
    # a single-scene dir is NOT a batch
    assert discover_scenes(batch / "scene0") == []
    # junk dirs are skipped
    (batch / "not_a_scene").mkdir()
    assert len(discover_scenes(batch)) == 3


def test_serve_matches_single_scene(tmp_path):
    """Pipelined outputs are identical to one-at-a-time device-tiled
    inference (same compiled program, same scenes)."""
    from jspsr_tpu.eval.inference import load_scene
    from jspsr_tpu.eval.scene import tile_inference_device

    model, params, bn = _tiny_jspsr()
    p = _p()
    batch = _make_batch_dir(tmp_path, n=3)
    scenes = discover_scenes(batch)

    out_paths, t_ms, sps = serve_scenes(model, params, bn, p, scenes,
                                        tmp_path / "out", tile=64)
    assert t_ms > 0 and sps > 0
    for sp, op in zip(scenes, out_paths):
        sample, _ = load_scene(sp, p)
        single, _ = tile_inference_device(model, params, bn, sample, p,
                                          tile=64)
        served = read_raster(op)
        np.testing.assert_array_equal(served, single.astype(np.float32))


def test_serve_mixed_shapes(tmp_path):
    """Scenes of different sizes each compile once and all complete."""
    rng = np.random.default_rng(5)
    batch = tmp_path / "batch"
    for i, size in enumerate((96, 130)):
        d = batch / f"s{i}"
        d.mkdir(parents=True)
        write_raster(d / "lr_dem.npy",
                     rng.uniform(10, 200, (size, size, 1))
                     .astype(np.float32))
        write_raster(d / "image.npy",
                     rng.integers(0, 255, (size, size, 3))
                     .astype(np.uint8))
    model, params, bn = _tiny_jspsr(seed=1)
    out_paths, _, _ = serve_scenes(model, params, bn, _p(),
                                   discover_scenes(batch),
                                   tmp_path / "out", tile=64)
    a, b = (read_raster(op) for op in out_paths)
    assert a.shape == (96, 96, 1) and b.shape == (130, 130, 1)
    assert np.isfinite(a).all() and np.isfinite(b).all()


def test_serve_bad_scene_raises(tmp_path):
    """A broken scene surfaces as an exception after the pipeline
    drains (no deadlock, no silent skip)."""
    model, params, bn = _tiny_jspsr(seed=2)
    batch = _make_batch_dir(tmp_path, n=2)
    (batch / "scene1" / "image.npy").unlink()  # image required by config
    with pytest.raises(AssertionError, match="missing 'image'"):
        serve_scenes(model, params, bn, _p(), discover_scenes(batch),
                     tmp_path / "out", tile=64)


def test_serve_loader_pool_matches_serial(tmp_path):
    """loader_threads=2 (concurrent decode+prepare, in-order hand-off)
    writes bit-identical rasters in the same order as the serial loader,
    composed with scene_batch grouping; a broken scene still surfaces."""
    model, params, bn = _tiny_jspsr(seed=21)
    p = _p()
    batch = _make_batch_dir(tmp_path, n=5, seed=22)
    scenes = discover_scenes(batch)
    serial, _, _ = serve_scenes(model, params, bn, p, scenes,
                                tmp_path / "o1", tile=64, scene_batch=2)
    pooled, _, sps = serve_scenes(model, params, bn, p, scenes,
                                  tmp_path / "o2", tile=64, scene_batch=2,
                                  loader_threads=2)
    assert sps > 0
    assert [q.name for q in pooled] == [q.name for q in serial]
    for a, b in zip(serial, pooled):
        np.testing.assert_array_equal(read_raster(b), read_raster(a))

    # mixed scene sizes: the pool's in-order hand-off preserves the
    # compat-key group flushes, so batching stays correct
    rng = np.random.default_rng(23)
    for i, size in enumerate((96, 130, 96)):
        d = batch / f"mix{i}"
        d.mkdir()
        write_raster(d / "lr_dem.npy",
                     rng.uniform(10, 200, (size, size, 1))
                     .astype(np.float32))
        write_raster(d / "image.npy",
                     rng.integers(0, 255, (size, size, 3))
                     .astype(np.uint8))
    mixed = [batch / f"mix{i}" for i in range(3)]
    m_serial, _, _ = serve_scenes(model, params, bn, p, mixed,
                                  tmp_path / "m1", tile=64, scene_batch=2)
    m_pooled, _, _ = serve_scenes(model, params, bn, p, mixed,
                                  tmp_path / "m2", tile=64, scene_batch=2,
                                  loader_threads=2)
    for a, b in zip(m_serial, m_pooled):
        np.testing.assert_array_equal(read_raster(b), read_raster(a))

    (batch / "scene2" / "image.npy").unlink()
    with pytest.raises(AssertionError, match="missing 'image'"):
        serve_scenes(model, params, bn, p, discover_scenes(batch),
                     tmp_path / "o3", tile=64, loader_threads=3)


def test_serve_scene_batched(tmp_path):
    """scene_batch=2 over 5 scenes (two full groups + padded tail) writes
    the same rasters as unbatched serving."""
    model, params, bn = _tiny_jspsr(seed=12)
    p = _p()
    batch = _make_batch_dir(tmp_path, n=5, seed=13)
    scenes = discover_scenes(batch)
    plain, _, _ = serve_scenes(model, params, bn, p, scenes,
                               tmp_path / "o1", tile=64)
    batched, _, sps = serve_scenes(model, params, bn, p, scenes,
                                   tmp_path / "o2", tile=64, scene_batch=2)
    assert sps > 0
    for a, b in zip(plain, batched):
        np.testing.assert_allclose(read_raster(b), read_raster(a),
                                   rtol=2e-4, atol=5e-3)


def test_serve_scene_batched_mixed_shapes(tmp_path):
    """A shape change mid-stream flushes the group; every scene still
    completes with its own shape."""
    rng = np.random.default_rng(17)
    batch = tmp_path / "batch"
    sizes = (96, 96, 130, 96)
    for i, size in enumerate(sizes):
        d = batch / f"s{i}"
        d.mkdir(parents=True)
        write_raster(d / "lr_dem.npy",
                     rng.uniform(10, 200, (size, size, 1))
                     .astype(np.float32))
        write_raster(d / "image.npy",
                     rng.integers(0, 255, (size, size, 3))
                     .astype(np.uint8))
    model, params, bn = _tiny_jspsr(seed=13)
    paths, _, _ = serve_scenes(model, params, bn, _p(),
                               discover_scenes(batch), tmp_path / "out",
                               tile=64, scene_batch=3)
    got = {op.name: read_raster(op).shape for op in paths}
    assert got == {"s0_sr.npy": (96, 96, 1), "s1_sr.npy": (96, 96, 1),
                   "s2_sr.npy": (130, 130, 1), "s3_sr.npy": (96, 96, 1)}


def test_serve_mesh_sharded(tmp_path):
    """Serving with a device mesh: tile batches shard over the data axis;
    outputs equal the unsharded serve run."""
    from jspsr_tpu.parallel.mesh import make_mesh

    model, params, bn = _tiny_jspsr(seed=9)
    p = _p()
    batch = _make_batch_dir(tmp_path, n=2, seed=11)
    scenes = discover_scenes(batch)
    plain, _, _ = serve_scenes(model, params, bn, p, scenes,
                               tmp_path / "out_plain", tile=64)
    mesh = make_mesh(jax.devices()[:8])
    sharded, _, _ = serve_scenes(model, params, bn, p, scenes,
                                 tmp_path / "out_mesh", tile=64, mesh=mesh)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(read_raster(b), read_raster(a),
                                   rtol=2e-4, atol=5e-3)


def test_cli_batch_infer(tmp_path):
    """--infer <batch dir> routes through the pipelined serving loop."""
    import yaml

    from jspsr_tpu.cli.main import main as cli_main
    from jspsr_tpu.train.checkpoint import save_checkpoint

    model, params, bn = _tiny_jspsr(seed=3)
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, bn)

    batch = _make_batch_dir(tmp_path, n=2, size=96, seed=7)
    cfg = {
        "name": "t", "dataset": "DFC30", "resolution": 8,
        "data_root": str(tmp_path),
        "train_set": ["Brest"], "valid_set": ["Vannes"],
        "input_data": {"COP30": 1, "image": 3},
        "relative": True, "patch_size": 64,
        "tensor_kwargs": {"log": True, "min": -80, "max": 929},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8,
                         "checkpoint": str(ckpt)},
        "loss": {"L1": 1}, "optimizer": "Adam",
        "optimizer_kwargs": {"lr": 1e-3},
        "metric": {"RMSE": {"package": "local"}},
    }
    cfg_path = tmp_path / "c.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    import sys as _sys
    real_stdout = _sys.stdout
    try:
        paths = cli_main(["--config", str(cfg_path), "--infer", str(batch),
                          "--tile", "--out", str(tmp_path / "preds"),
                          "--result-dir", str(tmp_path / "res")])
    finally:
        _sys.stdout = real_stdout
    assert len(paths) == 2
    for op in paths:
        arr = read_raster(op)
        assert arr.shape == (96, 96, 1) and np.isfinite(arr).all()

    # WITHOUT --tile the batch must respect the documented default: one
    # whole-scene forward per scene (sequential route), not the tiled path
    try:
        paths2 = cli_main(["--config", str(cfg_path), "--infer", str(batch),
                           "--out", str(tmp_path / "preds2"),
                           "--result-dir", str(tmp_path / "res2")])
    finally:
        _sys.stdout = real_stdout
    assert len(paths2) == 2
    for op in paths2:
        arr = read_raster(op)
        assert arr.shape == (96, 96, 1) and np.isfinite(arr).all()


def test_auto_scene_batch_selection(tmp_path):
    """Size-aware serving batch (VERDICT r4 #3): the selection reproduces
    BOTH measured sweet spots from the PERF.md serving sweeps — sb8 at the
    334^2 protocol size, sb2 at 1024^2 (where sb4 measured 56% slower) —
    and interpolates monotonically in between."""
    from jspsr_tpu.eval.serve import auto_scene_batch, probe_scene_hw

    assert auto_scene_batch((334, 334)) == 8      # 9 tiles -> batch hard
    assert auto_scene_batch((1024, 1024)) == 2    # 81 tiles -> sb2
    assert auto_scene_batch((512, 512)) == 4      # 25 tiles -> in between
    assert auto_scene_batch((2048, 2048)) == 1    # 289 tiles -> no batching
    assert auto_scene_batch((128, 128)) == 8      # single-tile scenes
    # monotone non-increasing in scene area
    sizes = [128, 334, 512, 768, 1024, 1500, 2048]
    sbs = [auto_scene_batch((s, s)) for s in sizes]
    assert sbs == sorted(sbs, reverse=True), sbs
    # capped by the number of scenes on offer
    assert auto_scene_batch((334, 334), n_scenes=3) == 3
    # rectangles use the full tile-grid product
    assert auto_scene_batch((334, 1024)) == auto_scene_batch((1024, 334))

    # probe_scene_hw reads the LR raster header of a scene dir (or a bare
    # raster path) without loading pixels
    d = tmp_path / "scene0"
    d.mkdir()
    write_raster(d / "lr_dem.npy", np.zeros((40, 56, 1), np.float32))
    assert probe_scene_hw(d) == (40, 56)
    assert probe_scene_hw(d / "lr_dem.npy") == (40, 56)
    with pytest.raises(FileNotFoundError):
        probe_scene_hw(tmp_path)
