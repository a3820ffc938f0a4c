"""Driver-contract tests: entry() must be jittable; dryrun_multichip must
compile + execute the sharded step on a virtual mesh."""

import jax
import pytest


def test_entry_lowers():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    # lowering proves jittability without paying CPU execution of a
    # 416x416 batch-8 forward
    jax.jit(fn).lower(*args)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
@pytest.mark.slow
def test_dryrun_multichip_4():
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)
