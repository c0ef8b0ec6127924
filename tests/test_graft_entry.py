"""Driver-contract checks: entry() compiles single-chip; dryrun_multichip runs
one sharded DP train step on the virtual 8-device mesh."""

import jax
import pytest


pytestmark = pytest.mark.slow  # excluded from the <5-min fast tier


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, (variables, images) = g.entry()
    toks = jax.jit(fn)(variables, images)
    assert toks.shape[0] == images.shape[0]


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
