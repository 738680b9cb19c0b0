R"""Pallas TPU kernel: tiled RBF covariance build.

The covariance build is the library's hottest elementwise op (every lml
evaluation starts with it, reference models.py:957-961).  This kernel
writes K = amplitude * exp(-0.5 ||x_i - x_j||^2 / ls^2) (+ noise I) tile by
tile: the full (N, d) input lives in VMEM (a few tens of KB), each grid
step computes one (TM, TN) output tile with broadcasted differences on the
VPU, and the nugget is fused onto diagonal tiles — one pass over HBM for
the output, nothing else.

Falls back transparently to the XLA implementation
(``ops.batched.rbf_covariance``) on non-TPU backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import _config  # noqa: F401

__all__ = ['rbf_covariance_pallas']


def _cov_kernel(x_ref, params_ref, o_ref, *, TM, TN, d, with_noise):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)

    inv_ls = params_ref[0, 0]
    amp = params_ref[1, 0]
    noise = params_ref[2, 0]

    xi = x_ref[pl.ds(i * TM, TM), :] * inv_ls      # (TM, d)
    xj = x_ref[pl.ds(j * TN, TN), :] * inv_ls      # (TN, d)

    acc = jnp.zeros((TM, TN), dtype=o_ref.dtype)
    for k in range(d):  # d is tiny and static
        diff = xi[:, k:k + 1] - xj[:, k:k + 1].T   # (TM, TN) via 2D broadcast
        acc += diff * diff

    out = amp * jnp.exp(-0.5 * acc)

    if with_noise:
        @pl.when(i == j)
        def _():
            rows = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
            o_ref[:, :] = out + jnp.where(rows == cols, noise, 0.0)

        @pl.when(i != j)
        def _():
            o_ref[:, :] = out
    else:
        o_ref[:, :] = out


@functools.partial(jax.jit, static_argnames=('tile',))
def _rbf_cov_pallas_single(X, params, tile=256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, d = X.shape
    TM = TN = min(tile, N)
    assert N % TM == 0, 'N must be a multiple of the tile size'

    kernel = functools.partial(_cov_kernel, TM=TM, TN=TN, d=d, with_noise=True)
    # Mosaic rejects the i64 index arithmetic that the library-wide
    # jax_enable_x64 setting produces; trace the kernel in an x64-disabled
    # scope (all data here is f32 anyway).
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, N), X.dtype),
            grid=(N // TM, N // TN),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # whole X resident
                pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars
            ],
            out_specs=pl.BlockSpec(
                (TM, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        )(X, params)


def rbf_covariance_pallas(X, length_scale, amplitude=1.0, noise=0.0, tile=256):
    R"""RBF covariance via the Pallas tiled kernel (batched over leading dims).

    Parameters mirror :func:`gsum_tpu.ops.rbf_covariance`.  Requires N to be
    a multiple of ``tile`` on TPU; any other configuration (or a non-TPU
    backend) falls back to the XLA path.
    """
    X = jnp.asarray(X)
    N = X.shape[-2]
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    if not on_tpu or N % min(tile, N) != 0:
        from .batched import rbf_covariance

        if X.ndim == 2:
            return rbf_covariance(X, length_scale, amplitude, noise)
        return jax.vmap(lambda x: rbf_covariance(x, length_scale, amplitude,
                                                 noise))(X)

    params = jnp.asarray(
        [[1.0 / length_scale], [amplitude], [noise]], dtype=X.dtype)
    if X.ndim == 2:
        return _rbf_cov_pallas_single(X, params, tile=tile)
    return jax.vmap(lambda x: _rbf_cov_pallas_single(x, params, tile=tile))(X)
