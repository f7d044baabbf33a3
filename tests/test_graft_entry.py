"""Driver contract: entry() compiles single-device; dryrun_multichip runs on
the virtual 8-device mesh."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    x_hat, logits, z = jax.jit(fn)(*args)
    assert x_hat.shape == (64, 64, 64, 3)
    assert logits.shape == (64, 10)
    assert z.shape == (64, 64)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g
    g.dryrun_multichip(2)
