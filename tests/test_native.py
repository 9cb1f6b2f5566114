"""Native C++ geo kernels vs the numpy reference implementations."""

import numpy as np
import pytest

from jspsr_tpu.utils import native
from jspsr_tpu.eval.mosaic import merge_tiles
from jspsr_tpu.eval.inference import add_padding
from jspsr_tpu.data.normalize import descale_data, scale_data
from jspsr_tpu.config.loader import get_tile

pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason="native build unavailable")


def test_native_merge_tiles_matches_numpy():
    rng = np.random.default_rng(0)
    full, k = 334, 128
    _, n = get_tile(full, k)
    tiles = rng.normal(size=(n, k, k, 1)).astype(np.float32)
    ref = merge_tiles([tiles[i] for i in range(n)], full_size=full)
    got = native.merge_tiles_native(tiles, full)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_native_mirror_pad_matches_numpy():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(50, 60, 3)).astype(np.float32)
    ref = add_padding(img, 7)
    got = native.mirror_pad_native(img, 7)
    np.testing.assert_array_equal(got, ref)


def test_native_scaling_roundtrip():
    rng = np.random.default_rng(2)
    data = rng.uniform(10, 500, (64, 64)).astype(np.float32)
    for log in (False, True):
        ref = scale_data(data, -80, 929, log, base_elev=5.0)
        got = native.scale_elevation_native(data, -80, 929, log, base=5.0)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
        back = native.descale_elevation_native(got, -80, 929, log)
        np.testing.assert_allclose(back, descale_data(ref, -80, 929, log),
                                   rtol=1e-5, atol=1e-4)
