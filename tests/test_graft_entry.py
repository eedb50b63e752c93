"""The driver contract file must stay importable and runnable."""

import sys

import jax


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape[0] == args[0].shape[0]


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
