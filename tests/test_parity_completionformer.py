"""fp32 forward-parity: JAX CompletionFormer (PVT + NLSPN) vs the reference
torch model (eval mode, random init, imported weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_oracle import load_reference
from jspsr_tpu.models.completionformer import CompletionFormer
from jspsr_tpu.utils.torch_import import import_torch_state_dict
from jspsr_tpu.nn.module import param_count
import jax.numpy as jnp


def test_completionformer_forward_parity():
    load_reference()
    from models.CompletionFormer import Model as RefCF

    class Args(dict):
        __getattr__ = dict.get

    args = Args(
        input_channels={"lr_dem": 1, "image": 3},
        output_channels=1,
        prop_time=6,
        prop_kernel=3,
        preserve_input=False,
        conf_prop=True,
        affinity="TGASS",
        affinity_gamma=0.5,
        legacy=False,
    )
    torch.manual_seed(0)
    tmodel = RefCF(args)
    tmodel.eval()

    model = CompletionFormer({"lr_dem": 1, "image": 3}, prop_time=6,
                             prop_kernel=3, conf_prop=True, affinity="TGASS",
                             affinity_gamma=0.5)
    params, state = import_torch_state_dict(model, tmodel.state_dict())
    assert param_count(params) == sum(p.numel() for p in tmodel.parameters())

    rng = np.random.default_rng(1)
    dem = rng.uniform(0.1, 0.9, (1, 1, 64, 64)).astype(np.float32)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(dem), torch.from_numpy(img)).numpy()

    y, _ = model(params, state,
                 [jnp.asarray(dem.transpose(0, 2, 3, 1)),
                  jnp.asarray(img.transpose(0, 2, 3, 1))], train=False)
    got = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
