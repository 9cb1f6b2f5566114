"""fp32 forward-parity gate: JAX JSPSR/EDSR vs the reference torch models.

The reference model is instantiated (random truncated-normal init), its
state_dict imported through the framework's torch importer, and both
forwards compared on identical inputs in eval mode (running BN stats).
Covers all four shipped config shapes (r3/r8 x img/img+msk map onto the
2-branch and 3-branch variants; resolution only changes data, not the net).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.reference_oracle import ref_jspsr, ref_edsr
from jspsr_tpu.models.jspsr import JSPSR
from jspsr_tpu.models.edsr import EDSR
from jspsr_tpu.utils.torch_import import import_torch_state_dict
from jspsr_tpu.nn.module import param_count


def _nhwc(a):
    return jnp.asarray(np.transpose(a, (0, 2, 3, 1)))


@pytest.mark.parametrize(
    "in_channels",
    [
        {"lr_dem": 1, "image": 3},                 # 2-branch (r8/r3 img)
        {"lr_dem": 1, "image": 3, "mask": 15},     # 3-branch (r8/r3 img+msk)
        {"lr_dem": 1, "mask": 15},                 # mask-only guidance
        {"lr_dem": 1, "image": 3, "canopy": 1},    # canopy aux
    ],
)
def test_jspsr_forward_parity(in_channels):
    torch.manual_seed(0)
    tmodel = ref_jspsr(in_channels=dict(in_channels), out_channels=1,
                       num_feature=32, layers=(2, 2, 2, 2), spn=True)
    tmodel.eval()

    model = JSPSR(in_channels=dict(in_channels), num_feature=32,
                  layers=(2, 2, 2, 2), spn=True)
    params, state = import_torch_state_dict(model, tmodel.state_dict())

    n_torch = sum(p.numel() for p in tmodel.parameters())
    assert param_count(params) == n_torch

    rng = np.random.default_rng(42)
    h = w = 32
    inputs_t = []
    key_order = {"lr_dem": in_channels["lr_dem"]}
    if "image" in in_channels:
        key_order["image"] = in_channels["image"]
    for k in ("mask", "canopy", "coord"):
        if k in in_channels:
            key_order[k] = in_channels[k]
    for k, c in key_order.items():
        arr = rng.uniform(0.05, 0.95, size=(2, c, h, w)).astype(np.float32)
        inputs_t.append(torch.from_numpy(arr))

    with torch.no_grad():
        ref = tmodel(*inputs_t).numpy()

    y, _ = model(params, state, [_nhwc(t.numpy()) for t in inputs_t], train=False)
    got = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("spn", [False, True])
def test_edsr_forward_parity(spn):
    torch.manual_seed(1)
    tmodel = ref_edsr(in_channels=4, out_channels=1, n_resblocks=4,
                      n_features=16, scale=1, res_scale=0.1, spn=spn)
    tmodel.eval()
    model = EDSR(in_channels=4, out_channels=1, n_resblocks=4, n_features=16,
                 scale=1, res_scale=0.1, spn=spn)
    params, state = import_torch_state_dict(model, tmodel.state_dict())

    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, size=(2, 4, 24, 24)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    y, _ = model(params, state, _nhwc(x), train=False)
    got = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-5)


def test_jspsr_cat_only_false_path():
    """Experimental fusion path (reference JSPSR.py:28, basics.py:129-137):
    Guide applies a conv after concat and decoder skips are additive."""
    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1), spn=True, cat_only=False)
    params, state = import_params_or_init(model)
    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.uniform(0.2, 0.8, (1, 32, 32, 1)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    y, _ = model(params, state, [dem, img], train=False)
    assert y.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(y)).all()
    # guide now owns parameters (conv fusion)
    assert "conv" in params["guide1"]


def test_jspsr_generator_leaky_and_spn_scale():
    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1), spn=True, spn_scale=0.5,
                  generator_leaky=True)
    params, state = import_params_or_init(model)
    rng = np.random.default_rng(1)
    dem = jnp.asarray(rng.uniform(0.2, 0.8, (1, 16, 16, 1)).astype(np.float32))
    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    y, _ = model(params, state, [dem, img], train=False)
    assert np.isfinite(np.asarray(y)).all()


def import_params_or_init(model):
    import jax

    return model.init(jax.random.PRNGKey(0))
