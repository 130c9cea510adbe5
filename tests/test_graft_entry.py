"""Protect the driver contract: entry() compiles single-device and
dryrun_multichip() runs on a virtual 8-device mesh."""
import sys

import jax
import numpy as np


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    R, t, chi2 = out
    assert np.asarray(R).shape == (3, 3)
    assert np.asarray(t).shape == (3,)
    assert np.isfinite(float(chi2))


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(2)
