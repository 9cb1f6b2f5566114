"""eval_grouped: horizontally-fused branch BasicBlocks (models/jspsr.py).

Exactness oracle: the separate-path forward (itself fp32-parity-pinned
against the torch reference in tests/test_parity_jspsr.py). Grouped convs
are exact re-expressions (group g sees branch g's input slice with branch
g's kernel), so outputs must match to fp reduce-order tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jspsr_tpu.models.jspsr import JSPSR


def _inputs(rng, batch, hw, chans):
    return [jnp.asarray(rng.uniform(0, 1, (batch, hw, hw, c))
                        .astype(np.float32)) for c in chans]


@pytest.mark.parametrize("in_channels,layers", [
    ({"lr_dem": 1, "image": 3, "mask": 15}, (2, 2, 2, 2)),  # flagship
    ({"lr_dem": 1, "image": 3}, (1, 1, 1, 1)),              # 2-branch
    ({"lr_dem": 1, "image": 3, "canopy": 1}, (2, 2, 2, 2)),
])
def test_grouped_eval_matches_separate(in_channels, layers):
    sep = JSPSR(in_channels, num_feature=8, layers=layers)
    grp = JSPSR(in_channels, num_feature=8, layers=layers,
                eval_grouped=True)
    params, bn = sep.init(jax.random.PRNGKey(0))
    # perturb BN running stats away from init so eval BN is non-trivial
    bn = jax.tree.map(lambda x: x + 0.05, bn)

    rng = np.random.default_rng(0)
    chans = [in_channels[k] for k in sep.input_keys()]
    inputs = _inputs(rng, 2, 64, chans)
    y_sep, _ = sep(params, bn, inputs, train=False)
    y_grp, _ = grp(params, bn, inputs, train=False)
    np.testing.assert_allclose(np.asarray(y_grp), np.asarray(y_sep),
                               rtol=1e-5, atol=1e-5)


def test_grouped_train_uses_separate_path():
    """Training must never take the grouped route (its gradients measured
    slower): train-mode outputs and BN state updates equal the separate
    path bitwise."""
    m_grp = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1), eval_grouped=True)
    m_sep = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1))
    params, bn = m_sep.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    inputs = _inputs(rng, 2, 32, [1, 3])
    y_grp, s_grp = m_grp(params, bn, inputs, train=True)
    y_sep, s_sep = m_sep(params, bn, inputs, train=True)
    np.testing.assert_array_equal(np.asarray(y_grp), np.asarray(y_sep))
    ls, lg = jax.tree.leaves(s_sep), jax.tree.leaves(s_grp)
    assert len(ls) == len(lg) and all(
        np.array_equal(a, b) for a, b in zip(ls, lg))


def test_grouped_respects_bf16_body():
    m = JSPSR({"lr_dem": 1, "image": 3, "mask": 15}, num_feature=8,
              layers=(2, 2, 2, 2), eval_grouped=True,
              compute_dtype="bfloat16")
    params, bn = m.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    y, _ = m(params, bn, _inputs(rng, 1, 64, [1, 3, 15]), train=False)
    assert y.dtype == jnp.float32  # output re-enters fp32 at the SPN head
    assert np.isfinite(np.asarray(y)).all()
