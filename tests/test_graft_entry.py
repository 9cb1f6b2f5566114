"""Driver-contract guard: entry() compiles and dryrun_multichip runs."""

import numpy as np
import jax


def test_entry_and_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 128, 128, 1)
    assert np.isfinite(np.asarray(out)).all()
    g.dryrun_multichip(4)
