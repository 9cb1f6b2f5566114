"""fp32 forward-parity: JAX LRRU vs the reference torch model (eval mode)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_oracle import load_reference
from jspsr_tpu.models.lrru import LRRU
from jspsr_tpu.utils.torch_import import import_torch_state_dict
from jspsr_tpu.nn.module import param_count
import jax.numpy as jnp


def test_lrru_forward_parity():
    load_reference()
    from models.LRRU import Model as RefLRRU

    class Args:
        input_channels = {"lr_dem": 1, "image": 3}
        output_channels = 1
        kernel_size = 3
        bc = 16
        prob = 1.0
        dkn_residual = True

    torch.manual_seed(0)
    tmodel = RefLRRU(Args())
    tmodel.eval()

    model = LRRU({"lr_dem": 1, "image": 3}, kernel_size=3, bc=16, prob=1.0,
                 dkn_residual=True)
    params, state = import_torch_state_dict(model, tmodel.state_dict())
    assert param_count(params) == sum(p.numel() for p in tmodel.parameters())

    rng = np.random.default_rng(1)
    dem = rng.uniform(0.1, 0.9, (1, 1, 32, 32)).astype(np.float32)
    img = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(dem), torch.from_numpy(img)).numpy()
    y, _ = model(params, state,
                 [jnp.asarray(dem.transpose(0, 2, 3, 1)),
                  jnp.asarray(img.transpose(0, 2, 3, 1))], train=False)
    got = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=3e-5)
