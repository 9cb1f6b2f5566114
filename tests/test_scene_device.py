"""Device-resident tiled scene inference (eval/scene.py).

The host tiled path (eval/inference.tile_inference + mosaic.merge_tiles)
is the oracle: the device program must produce the same meters-domain
mosaic on reference grids, and its generalized grids must round-trip an
identity model exactly (weights re-normalized under triple overlap).
"""

import numpy as np
import jax
import pytest

from jspsr_tpu.config.loader import AttrDict
from jspsr_tpu.data.normalize import descale_data
from jspsr_tpu.eval.scene import (
    device_tiling_supported,
    grid_weights,
    prepare_scene,
    tile_grid,
    tile_inference_device,
)


def _p(**over):
    p = AttrDict({
        "model_name": "JSPSR", "relative": True, "normalize": False,
        "mask_channel": None,
        "input_data": {"lr_dem": 1, "image": 3},
        "tensor_kwargs": {"log": True, "min": -80, "max": 929,
                          "scale_mask": True},
    })
    p.update(over)
    return p


def _scene(h, w, seed=0, image=True):
    rng = np.random.default_rng(seed)
    s = {"lr_dem": rng.uniform(10, 200, (h, w, 1)).astype(np.float32)}
    if image:
        s["image"] = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
    return s


def _tiny_jspsr(seed=0):
    from jspsr_tpu.models.jspsr import JSPSR

    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1))
    params, bn = model.init(jax.random.PRNGKey(seed))
    return model, params, bn


class _Identity:
    """Model stub: prediction = the LR-DEM tile (normalized space)."""

    def __call__(self, params, bn_state, inputs, train=False):
        return inputs[0], bn_state


def test_tile_grid_reproduces_reference_protocol():
    # exact-division grids match config/loader.get_tile (no padding)
    assert tile_grid(334, 128) == (103, 3, 334)   # r3 protocol scene
    assert tile_grid(1024, 128) == (112, 9, 1024)
    assert tile_grid(160, 64) == (48, 3, 160)
    assert tile_grid(128, 128) == (128, 1, 128)   # single tile


def test_tile_grid_any_size():
    tile = 128
    for size in (129, 200, 241, 333, 500, 1030):
        stride, n, padded = tile_grid(size, tile)
        assert padded >= size
        assert stride * (n - 1) + tile == padded  # exact coverage
        if n > 1:
            assert tile - stride >= 1  # tiles overlap
    with pytest.raises(AssertionError):
        tile_grid(100, 128)  # scene smaller than the tile


def test_grid_weights_sum_to_one_on_reference_grid():
    stride, n, padded = tile_grid(334, 128)
    w = grid_weights(128, stride, n, stride, n)
    acc = np.zeros((padded, padded))
    for t in range(n * n):
        r, c = stride * (t // n), stride * (t % n)
        acc[r:r + 128, c:c + 128] += w[t]
    np.testing.assert_allclose(acc, 1.0, atol=1e-6)


def test_identity_round_trip_reference_grid():
    """normalize -> tile -> mosaic -> descale reconstructs the DEM."""
    p = _p()
    s = _scene(160, 160, image=False)
    out, _ = tile_inference_device(_Identity(), {}, {}, s, p, tile=64)
    np.testing.assert_allclose(out, s["lr_dem"], atol=0.05)


def test_identity_round_trip_rect_padded():
    """Generalized grid: rectangular scene, one axis through the ceil'd
    fallback grid with mirror padding — the blend must still reconstruct
    identical tile predictions exactly."""
    p = _p()
    # 257 -> fallback grid: stride 65, n 3, padded to 258
    s = _scene(257, 200, seed=3, image=False)
    stride, n, padded = tile_grid(257, 128)
    assert (stride, n, padded) == (65, 3, 258)
    out, _ = tile_inference_device(_Identity(), {}, {}, s, p, tile=128)
    assert out.shape == (257, 200, 1)
    np.testing.assert_allclose(out, s["lr_dem"], atol=0.05)


def test_no_triple_overlap_any_size():
    """Every reachable grid overlaps at most two tiles per axis: with
    n = 2 that is trivially true, and with n > 2 the stride always covers
    the overlap — so the cross-fade weights sum to exactly 1 and the
    runner's wsum renormalization is a defensive identity."""
    for tile in (64, 128):
        for size in range(tile, 33 * tile, 7):
            stride, n, _ = tile_grid(size, tile)
            if n > 2:
                assert tile - stride <= stride, (size, tile, stride)


def test_device_tiled_equals_host_path():
    """Meters-domain equality with the host tile_inference oracle on a
    reference 3x3 grid, real (tiny) JSPSR forward."""
    from jspsr_tpu.eval.inference import tile_inference
    from jspsr_tpu.train.step import make_forward

    model, params, bn = _tiny_jspsr()
    p = _p()
    s = _scene(160, 160, seed=1)

    fwd = make_forward(model)
    host = tile_inference(lambda x: fwd(params, bn, x), s, p, tile=64)
    base = float(np.min(s["lr_dem"]))
    host_m = descale_data(np.clip(host, 0, 1), -80, 929, True) + base

    dev, t_ms = tile_inference_device(model, params, bn, s, p, tile=64)
    assert t_ms > 0
    np.testing.assert_allclose(dev, host_m, atol=5e-3)


def test_chunked_forward_equals_single_batch():
    model, params, bn = _tiny_jspsr(seed=2)
    p = _p()
    s = _scene(160, 160, seed=2)
    one, _ = tile_inference_device(model, params, bn, s, p, tile=64,
                                   cap=81)
    chunked, _ = tile_inference_device(model, params, bn, s, p, tile=64,
                                       cap=4)  # 9 tiles -> 3 chunks of 3
    # different forward batch sizes change conv reduction order: fp32
    # noise only (observed max rel diff ~5e-5 on ~900 m values)
    np.testing.assert_allclose(chunked, one, rtol=2e-4, atol=5e-3)


def test_rect_scene_real_model():
    model, params, bn = _tiny_jspsr(seed=3)
    out, _ = tile_inference_device(model, params, bn,
                                   _scene(130, 96 + 64, seed=4), _p(),
                                   tile=64)
    assert out.shape == (130, 160, 1) and np.isfinite(out).all()


def test_transfer_encodings():
    from jspsr_tpu.eval.scene import transfer_encodings

    rng = np.random.default_rng(9)
    s = {
        "lr_dem": rng.uniform(10, 200, (32, 32, 1)).astype(np.float32),
        "image": rng.integers(0, 255, (32, 32, 3)).astype(np.float32),
        "mask": (rng.uniform(0, 1, (32, 32, 15)) < 0.3).astype(np.float32),
        "canopy": rng.uniform(0, 60, (32, 32, 1)).astype(np.float32),
    }
    enc = transfer_encodings(s, list(s))
    assert enc["lr_dem"] == ("f32", 1)
    assert enc["image"] == ("u8", 3)       # integer-valued raster
    assert enc["mask"] == ("bits", 15)     # binary one-hot: bit-packed
    assert enc["canopy"] == ("f32", 1)     # float-valued: no lossy cast
    s["image"] = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    assert transfer_encodings(s, ["image"])["image"] == ("f32", 3)


def test_float_image_stays_exact():
    """A non-integral float image must NOT take the uint8 transfer path;
    outputs still match the host oracle."""
    from jspsr_tpu.eval.inference import tile_inference
    from jspsr_tpu.train.step import make_forward

    model, params, bn = _tiny_jspsr(seed=5)
    p = _p()
    rng = np.random.default_rng(11)
    s = {"lr_dem": rng.uniform(10, 200, (160, 160, 1)).astype(np.float32),
         "image": rng.uniform(0, 255, (160, 160, 3)).astype(np.float32)}
    fwd = make_forward(model)
    host = tile_inference(lambda x: fwd(params, bn, x), dict(s), p, tile=64)
    base = float(np.min(s["lr_dem"]))
    host_m = descale_data(np.clip(host, 0, 1), -80, 929, True) + base
    dev, _ = tile_inference_device(model, params, bn, s, p, tile=64)
    np.testing.assert_allclose(dev, host_m, atol=5e-3)


def test_mesh_sharded_equals_single_device():
    """Tile-batch data parallelism over the 8-device CPU mesh produces
    the same mosaic as the unsharded runner."""
    from jspsr_tpu.parallel.mesh import make_mesh

    model, params, bn = _tiny_jspsr(seed=6)
    p = _p()
    s = _scene(160, 160, seed=6)
    single, _ = tile_inference_device(model, params, bn, s, p, tile=64)
    mesh = make_mesh(jax.devices()[:8])
    sharded, _ = tile_inference_device(model, params, bn, s, p, tile=64,
                                       mesh=mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=5e-3)


def test_nodata_scene_rejected_loudly():
    """A DEM with nodata pixels (or any elevation outside the configured
    range) must raise BEFORE upload with the scene range in the message —
    the device program cannot assert, and silent NaN rasters are worse
    (ToArray gives the host path the same loud failure)."""
    s = _scene(64, 64, image=False)
    s["lr_dem"][0, 0, 0] = -9999.0  # classic raster nodata
    p = _p()
    p["relative"] = False  # log(-9999 + 80) -> NaN without the guard
    with pytest.raises(ValueError, match="nodata"):
        prepare_scene(s, p, tile=64)
    # relative=True silently absorbs -9999 as the base, pushing the top
    # of the range out of [0,1] -> also rejected
    p["relative"] = True
    with pytest.raises(ValueError, match="outside"):
        prepare_scene(s, p, tile=64)


def test_prepared_scene_dispatch_path():
    """serve-style flow: prepare_scene on one thread, dispatch with the
    PreparedScene — same result as the raw-sample path."""
    model, params, bn = _tiny_jspsr(seed=8)
    p = _p()
    s = _scene(160, 160, seed=8)
    direct, _ = tile_inference_device(model, params, bn, s, p, tile=64)
    prepared = prepare_scene(s, p, tile=64)
    from jspsr_tpu.eval.scene import scene_dispatch

    via_prep = np.asarray(scene_dispatch(model, params, bn, prepared, p))
    np.testing.assert_array_equal(via_prep, direct)


def test_coord_scene_matches_host():
    """coord guidance ([0,1] float passthrough, f32 transfer) through the
    device-tiled path equals the host oracle."""
    from jspsr_tpu.eval.inference import tile_inference
    from jspsr_tpu.train.step import make_forward
    from jspsr_tpu.models.jspsr import JSPSR

    rng = np.random.default_rng(13)
    h = w = 160
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    coord = np.stack([yy / (h - 1), xx / (w - 1)], axis=-1)
    s = {"lr_dem": rng.uniform(10, 200, (h, w, 1)).astype(np.float32),
         "coord": coord}
    p = _p()
    p["input_data"] = {"lr_dem": 1, "coord": 2}

    model = JSPSR({"lr_dem": 1, "coord": 2}, num_feature=8,
                  layers=(1, 1, 1, 1))
    params, bn = model.init(jax.random.PRNGKey(7))
    fwd = make_forward(model)
    host = tile_inference(lambda x: fwd(params, bn, x), dict(s), p, tile=64)
    base = float(np.min(s["lr_dem"]))
    host_m = descale_data(np.clip(host, 0, 1), -80, 929, True) + base
    dev, _ = tile_inference_device(model, params, bn, s, p, tile=64)
    np.testing.assert_allclose(dev, host_m, atol=5e-3)


def test_edsr_stacked_assembly():
    """EDSR-family models get ONE channel-stacked input tensor (the
    _assemble else-branch); round-trips through the device-tiled path."""
    from jspsr_tpu.models.edsr import EDSR

    model = EDSR(in_channels=4, out_channels=1, n_resblocks=2,
                 n_features=8)
    params, bn = model.init(jax.random.PRNGKey(9))
    p = _p(model_name="EDSR")
    s = _scene(128, 128, seed=14)
    out, _ = tile_inference_device(model, params, bn, s, p, tile=64)
    assert out.shape == (128, 128, 1) and np.isfinite(out).all()


class _TwoInputStub:
    """CompletionFormer-style signature: [dem, stacked-guidance]."""

    def __call__(self, params, bn_state, inputs, train=False):
        dem, guide = inputs
        assert guide.shape[-1] == 3, guide.shape  # image stacked alone
        return dem, bn_state


def test_completionformer_assembly():
    p = _p(model_name="CompletionFormer")
    s = _scene(128, 128, seed=15)
    out, _ = tile_inference_device(_TwoInputStub(), {}, {}, s, p, tile=64)
    np.testing.assert_allclose(out, s["lr_dem"], atol=0.05)


def test_supported_surface_gate():
    assert device_tiling_supported(_p())
    assert not device_tiling_supported(_p(normalize=["lr_dem"]))
    p = _p()
    p["tensor_kwargs"]["image_range"] = "[-1, 1]"
    assert not device_tiling_supported(p)


def test_mask_and_base_semantics():
    """scale_mask + relative base flow through the device normalizer the
    same as ToArray (host oracle via _normalize_sample)."""
    from jspsr_tpu.eval.inference import _normalize_sample, tile_inference
    from jspsr_tpu.train.step import make_forward
    from jspsr_tpu.models.jspsr import JSPSR

    rng = np.random.default_rng(7)
    s = _scene(160, 160, seed=5)
    s["mask"] = (rng.uniform(0, 1, (160, 160, 6)) < 0.3).astype(np.float32)
    p = _p()
    p["input_data"] = {"lr_dem": 1, "image": 3, "mask": 6}
    p["mask_channel"] = list(range(6))

    model = JSPSR({"lr_dem": 1, "image": 3, "mask": 6}, num_feature=8,
                  layers=(1, 1, 1, 1))
    params, bn = model.init(jax.random.PRNGKey(4))
    fwd = make_forward(model)
    host = tile_inference(lambda x: fwd(params, bn, x), dict(s), p, tile=64)
    base = float(np.min(s["lr_dem"]))
    host_m = descale_data(np.clip(host, 0, 1), -80, 929, True) + base
    dev, _ = tile_inference_device(model, params, bn, s, p, tile=64)
    np.testing.assert_allclose(dev, host_m, atol=5e-3)
