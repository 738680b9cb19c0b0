R"""Device-mesh helpers.

Defines the canonical 2D mesh for this library: a ``'batch'`` axis for
independent work (observables, curves, hyperparameter-grid points, optimizer
restarts) and a ``'model'`` axis for sharding large covariance matrices.
On a single host this also covers the CPU-device simulation used in tests
(``xla_force_host_platform_device_count``).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import _config  # noqa: F401

__all__ = ['make_mesh', 'shard_batch', 'P', 'NamedSharding']


def make_mesh(n_batch=None, n_model=1, devices=None):
    """Builds a ('batch', 'model') mesh over the available devices.

    Parameters
    ----------
    n_batch : int, optional — size of the batch axis; defaults to
        ``n_devices // n_model``.
    n_model : int — size of the model axis.
    devices : list, optional — defaults to ``jax.devices()``.
    """
    if devices is None:
        devices = jax.devices()
    if n_batch is None:
        n_batch = len(devices) // n_model
    use = n_batch * n_model
    dev_array = np.asarray(devices[:use]).reshape(n_batch, n_model)
    return Mesh(dev_array, axis_names=('batch', 'model'))


def shard_batch(mesh, *arrays):
    """Shards each array's leading axis over the mesh's 'batch' axis."""
    sharding = NamedSharding(mesh, P('batch'))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out
