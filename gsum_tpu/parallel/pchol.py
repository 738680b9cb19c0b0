R"""Model-parallel blocked Cholesky + MVN lml over a row-sharded matrix.

The "within one large N" parallel axis (SURVEY.md §2c, §5 long-context
row): for N large enough that one chip's HBM or FLOP budget is the limit,
the (N, N) covariance is sharded by row blocks over a mesh axis and
factorized with a right-looking panel algorithm —

  for each column block k (a ``lax.fori_loop``; compile size O(1) in the
  shard count):
    every shard gathers the k-th diagonal block (one ``all_gather`` of an
    (Nl, Nl) tile over ICI), factorizes it redundantly (replicated compute
    is cheaper than a broadcast round-trip at these tile sizes), converts
    its own rows of the panel with one GEMM against the block inverse,
    and applies the rank-Nl trailing update to its remaining local column
    blocks with GEMMs against the gathered, masked panel.

Communication: one (Nl, Nl)-tile all_gather and one (Nl, Nl) panel
all_gather per step — 2·N·Nl elements over ICI per step, N²·2 total;
compute is GEMM-dominated like the single-chip blocked path.

The covariance itself is built ON-SHARD: :func:`sharded_kernel_lml` takes
(kernel value_fn, θ, X) and each device evaluates only its own (Nl, N)
row block — the (N, N) matrix is never materialized replicated on any
device or host, so the N-ceiling is set by N·Nl per shard, not N².
Per-shard peak memory ≈ 3·Nl·N floats (local K rows, local L rows, and
one gathered (N, Nl) panel stack) + O(Nl²) tiles.

The companion :func:`sharded_mvn_lml` finishes the job distributedly:
blocked forward substitution over the shard sequence plus a ``psum`` of
the local log-determinant and Mahalanobis contributions.

Validated exact-vs-dense on the 8-virtual-device CPU mesh at N=4096
(tests/test_parallel.py) and N=8192 (one-off, round 3): agreement
2.5e-10 relative at |lml| ~ 4e9 on a deliberately ill-conditioned RBF
grid — i.e. f64 accumulation-order level.  (On the 1-core CPU host the
8-shard emulation is of course slower than the dense solve — 132 s vs
18 s at N=8192; the path exists for real multi-chip meshes where each
shard has its own compute and HBM.)

This replaces nothing in the reference — gsum is a single-process NumPy
library (reference gsum/models.py:969 does one LAPACK potrf); the sharded
path is what makes the N=8k-16k configs of BASELINE.md first-class.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .. import _config  # noqa: F401

__all__ = ['sharded_cholesky', 'sharded_mvn_lml', 'sharded_kernel_lml']

_LOG_2PI = float(np.log(2 * np.pi))
_HI = jax.lax.Precision.HIGHEST


def _tri_inv(L):
    from ..ops.smallchol import _tri_inv_raw

    return _tri_inv_raw(L, leaf=32)


def _factor_body(K_loc, axis, D):
    """Local factorization body: K_loc is this shard's (Nl, N) row block.

    Returns (L_loc, minv_loc): the shard's rows of the factor and the
    inverse of its own diagonal block (for the solve).  All shard-count
    loops are ``fori_loop``s with dynamic tile indexing, so the traced
    program is O(1) in D (the round-2 version unrolled O(D²) Python
    loops — fine at D=8, not at pod scale).
    """
    Nl, N = K_loc.shape
    my = jax.lax.axis_index(axis)
    r_glob = my * Nl + jnp.arange(Nl)              # global row ids
    cols_iota = jnp.arange(Nl)
    _z = jnp.int32(0)

    def step(k, carry):
        A, L, minv_loc = carry
        k = k.astype(jnp.int32)
        s = k * jnp.int32(Nl)
        colA = jax.lax.dynamic_slice(A, (_z, s), (Nl, Nl))
        # gather the diagonal block's current rows (owner's A[:, cols_k])
        diag_all = jax.lax.all_gather(colA, axis)          # (D, Nl, Nl)
        Kkk = jax.lax.dynamic_index_in_dim(diag_all, k, keepdims=False)
        Lkk = jnp.linalg.cholesky(Kkk)
        Minv = _tri_inv(Lkk)
        minv_loc = jnp.where(my == k, Minv, minv_loc)
        # panel: my rows of column block k (A_kk @ Minvᵀ = Lkk on the owner)
        panel = jnp.matmul(colA, Minv.T, precision=_HI)
        # keep only the lower triangle (global row >= global col)
        panel = jnp.where(r_glob[:, None] >= s + cols_iota[None, :],
                          panel, 0.0)
        L = jax.lax.dynamic_update_slice(L, panel, (_z, s))
        # trailing update of my remaining column blocks
        panels = jax.lax.all_gather(panel, axis)           # (D, Nl, Nl)

        def trail(c, A):
            sc = c.astype(jnp.int32) * jnp.int32(Nl)
            Pc = jax.lax.dynamic_index_in_dim(panels, c, keepdims=False)
            Ac = jax.lax.dynamic_slice(A, (_z, sc), (Nl, Nl))
            Ac = Ac - jnp.matmul(panel, Pc.T, precision=_HI)
            return jax.lax.dynamic_update_slice(A, Ac, (_z, sc))

        A = jax.lax.fori_loop(k + 1, D, trail, A)
        return A, L, minv_loc

    # fori carries must be typed as varying over the mesh axis (they
    # become shard-dependent inside the loop): pvary the zero initials
    init = (K_loc,
            jnp.zeros_like(K_loc),  # inherits K_loc's varying type
            jax.lax.pvary(jnp.zeros((Nl, Nl), K_loc.dtype), (axis,)))
    _, L, minv_loc = jax.lax.fori_loop(0, D, step, init)
    return L, minv_loc


def _lml_body(K_loc, y_loc, axis, D):
    """Factor + blocked forward substitution + psum reduction, all local.

    K_loc: (Nl, N) local covariance rows; y_loc: (Nl, m) local rhs rows.
    Returns the (m,) log-densities (replicated on every shard).
    """
    Nl, N = K_loc.shape
    m = y_loc.shape[1]
    my = jax.lax.axis_index(axis)
    _z = jnp.int32(0)
    L_loc, Minv = _factor_body(K_loc, axis, D)

    # blocked forward substitution: w_k = Minv_k (y_k − L_k,<k w_<k).
    # Rows of w not yet solved are still zero, so the full-width GEMM
    # L_loc @ w_all only picks up the already-solved blocks — exact, no
    # masking needed (same zero-carry invariant as ops.scanchol).
    def fwd(k, w_all):
        rhs = y_loc - jnp.matmul(L_loc, w_all, precision=_HI)
        w_mine = jnp.matmul(Minv, rhs, precision=_HI)
        # publish shard k's solution block to everyone
        w_k = jax.lax.all_gather(
            jnp.where(my == k, w_mine, jnp.zeros_like(w_mine)), axis)
        w_k = jax.lax.dynamic_index_in_dim(w_k, k, keepdims=False)
        return jax.lax.dynamic_update_slice(
            w_all, w_k, (k.astype(jnp.int32) * jnp.int32(Nl), _z))

    w_all = jax.lax.fori_loop(
        0, D, fwd,
        jax.lax.pvary(jnp.zeros((N, m), K_loc.dtype), (axis,)))

    # local contributions (diagonal of my block; my rows of w)
    my32 = my.astype(jnp.int32)
    diag_mine = jnp.diagonal(
        jax.lax.dynamic_slice(L_loc, (_z, my32 * Nl), (Nl, Nl)))
    logdet = jax.lax.psum(2.0 * jnp.sum(jnp.log(diag_mine)), axis)
    w_mine_final = jax.lax.dynamic_slice(w_all, (my32 * Nl, _z), (Nl, m))
    maha = jax.lax.psum(jnp.sum(w_mine_final ** 2, axis=0), axis)
    return -0.5 * (maha + logdet + N * _LOG_2PI)


def _check_divides(N, D):
    if N % D:
        raise ValueError('N=%d must divide over %d shards' % (N, D))


def sharded_cholesky(K, mesh, axis='model'):
    R"""Cholesky of a replicated-input (N, N) SPD matrix, computed with the
    rows sharded over ``mesh`` axis ``axis``.

    Returns the (N, N) factor with rows sharded over ``axis`` (device
    layout ``P(axis, None)``); materializing it on one host gives exactly
    ``jnp.linalg.cholesky(K)`` up to round-off.
    """
    D = mesh.shape[axis]
    _check_divides(K.shape[0], D)

    fn = shard_map(
        lambda k: _factor_body(k, axis, D)[0], mesh=mesh,
        in_specs=P(axis, None), out_specs=P(axis, None))
    return fn(K)


def sharded_mvn_lml(K, y, mesh, axis='model'):
    R"""log N(y | 0, K) computed with K's rows sharded over ``axis``.

    One jitted program: sharded blocked factorization, blocked forward
    substitution over the shard sequence, and a ``psum`` reduction of the
    log-determinant and Mahalanobis terms.  For covariances that come
    from a kernel, prefer :func:`sharded_kernel_lml`, which never
    materializes the (N, N) matrix at all.

    Parameters
    ----------
    K : (N, N) SPD (replicated); y : (N,) or (N, m)

    Returns
    -------
    (m,) log-densities (replicated on every shard)
    """
    D = mesh.shape[axis]
    _check_divides(K.shape[0], D)
    y2 = y[:, None] if y.ndim == 1 else y

    fn = shard_map(
        lambda k, yl: _lml_body(k, yl, axis, D), mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)), out_specs=P())
    return fn(K, y2)


def sharded_kernel_lml(value_fn, theta, X, y, mesh, axis='model',
                       nugget=0.0):
    R"""log N(y | 0, K(X;θ) + nugget·I) with the covariance built ON-SHARD.

    Each device evaluates only its own (Nl, N) row block
    ``value_fn(theta, X_loc, X)`` — the (N, N) covariance never exists
    replicated anywhere, which is the point of the model-parallel axis:
    the largest factorizable N scales with D·(HBM / row-block), not with
    a single chip's N² budget.

    Parameters
    ----------
    value_fn : (theta, Xa, Xb) -> (len(Xa), len(Xb)) kernel matrix —
        exactly the ``Kernel.value_fn`` protocol of ``gsum_tpu.kernels``
    theta : (p,) log-hyperparameters
    X : (N, d) inputs (replicated — N·d is small even at N=16k)
    y : (N,) or (N, m) residuals (replicated)
    mesh, axis : the model-parallel mesh axis
    nugget : diagonal jitter added on-shard

    Returns
    -------
    (m,) log-densities (replicated on every shard)
    """
    D = mesh.shape[axis]
    X = jnp.atleast_2d(jnp.asarray(X))
    N = X.shape[0]
    _check_divides(N, D)
    Nl = N // D
    y2 = y[:, None] if y.ndim == 1 else y

    def body(X_rep, y_rep, theta_rep):
        my = jax.lax.axis_index(axis)
        X_loc = jax.lax.dynamic_slice(
            X_rep, (my.astype(jnp.int32) * Nl, jnp.int32(0)),
            (Nl, X_rep.shape[1]))
        K_loc = value_fn(theta_rep, X_loc, X_rep)          # (Nl, N)
        if nugget:
            r_glob = my * Nl + jnp.arange(Nl)
            K_loc = K_loc + nugget * (
                r_glob[:, None] == jnp.arange(N)[None, :]).astype(K_loc.dtype)
        y_loc = jax.lax.dynamic_slice(
            y_rep, (my.astype(jnp.int32) * Nl, jnp.int32(0)),
            (Nl, y_rep.shape[1]))
        return _lml_body(K_loc, y_loc, axis, D)

    fn = shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                   out_specs=P())
    return fn(X, y2, jnp.asarray(theta, dtype=X.dtype))
