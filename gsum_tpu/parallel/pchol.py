R"""Model-parallel blocked Cholesky + MVN lml over a row-sharded matrix.

The "within one large N" parallel axis (SURVEY.md §2c, §5 long-context
row): for N large enough that one chip's HBM or FLOP budget is the limit,
the (N, N) covariance is sharded by row blocks over a mesh axis and
factorized with a right-looking panel algorithm —

  for each column block k:
    every shard gathers the k-th diagonal block (one ``all_gather`` of an
    (Nl, Nl) tile over ICI), factorizes it redundantly (replicated compute
    is cheaper than a broadcast round-trip at these tile sizes), converts
    its own rows of the panel with one GEMM against the block inverse,
    and applies the rank-Nl trailing update to its local rows with a
    second GEMM against the gathered, masked panel.

Communication: one (Nl, Nl)-tile all_gather and one (Nl, Nl) panel
all_gather per step — 2·N·Nl elements over ICI per step, N²·2 total;
compute is GEMM-dominated like the single-chip blocked path.

The companion :func:`sharded_mvn_lml` finishes the job distributedly:
blocked forward substitution over the shard sequence plus a ``psum`` of
the local log-determinant and Mahalanobis contributions.

This replaces nothing in the reference — gsum is a single-process NumPy
library (reference gsum/models.py:969 does one LAPACK potrf); the sharded
path is what makes the N=8k-16k configs of BASELINE.md first-class.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import _config  # noqa: F401

__all__ = ['sharded_cholesky', 'sharded_mvn_lml']

_LOG_2PI = float(np.log(2 * np.pi))


def _tri_inv(L):
    from ..ops.smallchol import _tri_inv_raw

    return _tri_inv_raw(L, leaf=32)


def _factor_body(K_loc, axis, D):
    """Local factorization body: K_loc is this shard's (Nl, N) row block.

    Returns (L_loc, minv_loc): the shard's rows of the factor and the
    inverse of its own diagonal block (for the solve).
    """
    Nl, N = K_loc.shape
    my = jax.lax.axis_index(axis)
    r_glob = my * Nl + jnp.arange(Nl)              # global row ids

    A = K_loc
    L = jnp.zeros_like(K_loc)
    minv_loc = jnp.zeros((Nl, Nl), K_loc.dtype)
    for k in range(D):
        cols = slice(k * Nl, (k + 1) * Nl)
        c_glob = k * Nl + jnp.arange(Nl)
        # gather the diagonal block's current rows (owner's A[:, cols])
        diag_all = jax.lax.all_gather(A[:, cols], axis)     # (D, Nl, Nl)
        Kkk = diag_all[k]
        Lkk = jnp.linalg.cholesky(Kkk)
        Minv = _tri_inv(Lkk)
        minv_loc = jnp.where(my == k, Minv, minv_loc)
        # panel: my rows of column block k (A_kk @ Minvᵀ = Lkk on the owner)
        panel = jnp.matmul(A[:, cols], Minv.T,
                           precision=jax.lax.Precision.HIGHEST)
        # keep only the lower triangle (global row >= global col)
        panel = jnp.where(r_glob[:, None] >= c_glob[None, :], panel, 0.0)
        L = L.at[:, cols].set(panel)
        if k < D - 1:
            panels = jax.lax.all_gather(panel, axis)        # (D, Nl, Nl)
            # trailing update of my remaining columns
            for c in range(k + 1, D):
                colc = slice(c * Nl, (c + 1) * Nl)
                A = A.at[:, colc].add(-jnp.matmul(
                    panel, panels[c].T,
                    precision=jax.lax.Precision.HIGHEST))
    return L, minv_loc


def sharded_cholesky(K, mesh, axis='model'):
    R"""Cholesky of a replicated-input (N, N) SPD matrix, computed with the
    rows sharded over ``mesh`` axis ``axis``.

    Returns the (N, N) factor with rows sharded over ``axis`` (device
    layout ``P(axis, None)``); materializing it on one host gives exactly
    ``jnp.linalg.cholesky(K)`` up to round-off.
    """
    D = mesh.shape[axis]
    N = K.shape[0]
    if N % D:
        raise ValueError('N=%d must divide over %d shards' % (N, D))

    fn = shard_map(
        lambda k: _factor_body(k, axis, D)[0], mesh=mesh,
        in_specs=P(axis, None), out_specs=P(axis, None))
    return fn(K)


def sharded_mvn_lml(K, y, mesh, axis='model'):
    R"""log N(y | 0, K) computed with K's rows sharded over ``axis``.

    One jitted program: sharded blocked factorization, blocked forward
    substitution over the shard sequence (the running solution is
    broadcast with ``all_gather`` as it grows), and a ``psum`` reduction
    of the log-determinant and Mahalanobis terms.

    Parameters
    ----------
    K : (N, N) SPD (replicated); y : (N,) or (N, m)

    Returns
    -------
    (m,) log-densities (replicated on every shard)
    """
    D = mesh.shape[axis]
    N = K.shape[0]
    if N % D:
        raise ValueError('N=%d must divide over %d shards' % (N, D))
    y2 = y[:, None] if y.ndim == 1 else y
    m = y2.shape[1]

    def body(K_loc, y_loc):
        Nl = K_loc.shape[0]
        my = jax.lax.axis_index(axis)
        L_loc, Minv = _factor_body(K_loc, axis, D)

        # blocked forward substitution: w_k = Minv_k (y_k − L_k,<k w_<k)
        w_all = jnp.zeros((D * Nl, m), K_loc.dtype)
        for k in range(D):
            rhs = y_loc - jnp.matmul(L_loc[:, :k * Nl], w_all[:k * Nl],
                                     precision=jax.lax.Precision.HIGHEST) \
                if k else y_loc
            w_mine = jnp.matmul(Minv, rhs,
                                precision=jax.lax.Precision.HIGHEST)
            # publish shard k's solution block to everyone
            w_k = jax.lax.all_gather(
                jnp.where(my == k, w_mine, jnp.zeros_like(w_mine)), axis)
            w_all = jax.lax.dynamic_update_slice(
                w_all, w_k[k], (jnp.int32(k * Nl), jnp.int32(0)))
        # local contributions (diagonal of my block; my rows of w)
        my32 = my.astype(jnp.int32)
        diag_mine = jnp.diagonal(
            jax.lax.dynamic_slice(L_loc, (jnp.int32(0), my32 * Nl),
                                  (Nl, Nl)))
        logdet = jax.lax.psum(2.0 * jnp.sum(jnp.log(diag_mine)), axis)
        w_mine_final = jax.lax.dynamic_slice(w_all, (my32 * Nl, jnp.int32(0)),
                                             (Nl, m))
        maha = jax.lax.psum(jnp.sum(w_mine_final ** 2, axis=0), axis)
        return -0.5 * (maha + logdet + N * _LOG_2PI)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis, None), P(axis, None)),
                   out_specs=P())
    return fn(K, y2)
