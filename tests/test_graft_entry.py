"""Driver-contract tests: entry() must jit-compile single-device and
dryrun_multichip() must run the sharded step over the 8-device CPU mesh."""

import numpy as np


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    vec = np.asarray(out)
    assert vec[0] > 0  # n_accept: the step accepted at least one location


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
