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


def test_dryrun_driver_style():
    """Run dryrun_multichip(8) the way the driver does: a fresh subprocess
    with no pytest conftest, so the function must self-provision its mesh.

    (Round-1 failure mode: the driver's process saw 1 axon TPU device and
    the old implementation asserted instead of provisioning — see
    MULTICHIP_r01.json.)
    """
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # simulate the driver: no forced host-device count in the outer process
    env.pop('JAX_PLATFORMS', None)
    flags = env.get('XLA_FLAGS', '')
    env['XLA_FLAGS'] = ' '.join(
        f for f in flags.split()
        if 'xla_force_host_platform_device_count' not in f)
    code = ("import jax\n"
            # stand-in for the driver's single-device environment (the real
            # one initializes the axon backend with 1 TPU): force 1 CPU dev
            "jax.config.update('jax_platforms', 'cpu')\n"
            "assert len(jax.devices()) < 8, 'precondition: too many devices'\n"
            "from __graft_entry__ import dryrun_multichip\n"
            "dryrun_multichip(8)\n"
            "print('driver-style dryrun OK')\n")
    proc = subprocess.run([sys.executable, '-c', code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]
    assert 'driver-style dryrun OK' in proc.stdout
