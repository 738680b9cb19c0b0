"""The driver entry points compile and run on the CPU device mesh."""
import sys

import jax
import numpy as np

sys.path.insert(0, '.')

from __graft_entry__ import dryrun_multichip, entry  # noqa: E402


def test_entry_compiles():
    fn, args = entry()
    m_pred, K_pred, lml = jax.jit(fn)(*args)
    assert np.asarray(m_pred).shape == (8, 1)
    assert np.asarray(K_pred).shape == (8, 8)
    assert np.isfinite(float(np.asarray(lml)))


def test_dryrun_multichip():
    dryrun_multichip(len(jax.devices()))
