R"""Batched covariance + Cholesky + MVN-logpdf — the benchmark kernels.

The reference's hot loop is (kernel build → Cholesky → solves → logdet) per
log-marginal-likelihood evaluation (reference: models.py:957-1039, SURVEY.md
§3.1).  On TPU the same work is batched over observables / hyperparameter
grids and executed as a few large fused XLA ops; a Pallas fused variant
lives in ``gsum_tpu.ops.fused`` once profiling justifies it.

All functions are shape-polymorphic pure functions — jit once, vmap/shard
freely.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_LOG_2PI = float(np.log(2 * np.pi))

__all__ = [
    'rbf_covariance', 'batched_cholesky', 'batched_mvn_logpdf',
    'batched_chol_logpdf',
]


def rbf_covariance(X, length_scale, amplitude=1.0, noise=0.0):
    R"""RBF covariance matrix via the MXU-friendly dot-product expansion.

    ``K = amplitude * exp(-0.5 ||x_i - x_j||^2 / ls^2) + noise * I``.

    Unlike ``gsum_tpu.kernels.RBF`` (which uses the cancellation-free
    difference form for float64 parity), this uses the
    ``x^2 + y^2 - 2xy`` expansion so the N×N×d intermediate never
    materializes and the inner product runs on the MXU.
    """
    Xs = X / length_scale
    sq = jnp.sum(Xs * Xs, axis=-1)
    # full-f32 MXU passes: the default bf16 matmul precision perturbs the
    # distance matrix enough to break positive-definiteness at large N
    gram = jnp.matmul(Xs, Xs.T, precision=jax.lax.Precision.HIGHEST)
    d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * gram
    d2 = jnp.maximum(d2, 0.0)
    K = amplitude * jnp.exp(-0.5 * d2)
    if noise is not None:
        K = K + noise * jnp.eye(X.shape[-2], dtype=K.dtype)
    return K


def batched_cholesky(K):
    """Cholesky over a batch of matrices (XLA's blocked TPU implementation)."""
    return jnp.linalg.cholesky(K)


def _logpdf_from_chol(L, diff):
    """MVN logpdf given the Cholesky factor and (..., N, m) residuals."""
    from jax.lax.linalg import triangular_solve

    N = L.shape[-1]
    w = triangular_solve(L, diff, left_side=True, lower=True)
    maha = jnp.sum(w * w, axis=-2)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * (maha + logdet[..., None] + N * _LOG_2PI)


def batched_mvn_logpdf(K, diff):
    """logpdf of residual columns under N(0, K), batched over leading dims.

    Parameters
    ----------
    K : (..., N, N)
    diff : (..., N, m) — m residual vectors per batch element

    Returns
    -------
    (..., m) log-densities
    """
    L = jnp.linalg.cholesky(K)
    return _logpdf_from_chol(L, diff)


@partial(jax.jit, static_argnames=('method', 'precision', 'diag', 'block'))
def batched_chol_logpdf(X, y, length_scale, amplitude, noise, method='auto',
                        precision=jax.lax.Precision.HIGHEST, diag='auto',
                        block=None):
    R"""Fused pipeline: covariance build → Cholesky → MVN logpdf.

    The benchmark configuration of BASELINE.json: every argument may carry
    leading batch dimensions.

    Parameters
    ----------
    X : (B, N, d)
    y : (B, N, m)
    length_scale, amplitude, noise : scalars or (B,)-broadcastable
    method : 'auto' | 'blocked' | 'fused' | 'xla' — factorization engine.
        'blocked' is the GEMM-dominated left-looking factorization
        (``ops.blockchol``), 2.15x XLA's native batched-Cholesky pipeline
        at the N=4096 headline size at equal (full-f32) accuracy; 'fused'
        is the single-kernel Pallas frontier (``ops.fusedchol``); 'auto'
        selects 'blocked' for N > 512.
    precision : MXU precision for the blocked factorization's GEMMs
    block : column-block width, or None for the selected engine's
        measured optimum (blocked: 128, fused: 256)

    Returns
    -------
    (B, m) log-densities
    """
    from .blockchol import blocked_chol_solve_logdet

    B, N, _ = X.shape
    ls = jnp.broadcast_to(jnp.asarray(length_scale), (B,))
    amp = jnp.broadcast_to(jnp.asarray(amplitude), (B,))
    ns = jnp.broadcast_to(jnp.asarray(noise), (B,))
    K = jax.vmap(rbf_covariance)(X, ls, amp, ns)

    if method == 'auto':
        method = 'blocked' if N > 512 else 'xla'
    if method == 'fused':
        # the single-kernel HBM-resident Pallas factorization; an explicit
        # block is honored, the per-engine default differs from the XLA
        # driver's (256 is the fused kernel's measured optimum)
        from .fusedchol import fused_chol_solve_logdet

        w, logdet = fused_chol_solve_logdet(K, y, block=block or 256)
        maha = jnp.sum(w * w, axis=-2)
        return -0.5 * (maha + logdet[..., None] + N * _LOG_2PI)
    if method == 'blocked':
        # batch-leading (NOT vmapped: the small-chol leaf scatters would
        # vectorize badly under vmap; these ops take the batch directly)
        w, logdet = blocked_chol_solve_logdet(K, y, block=block or 128,
                                              precision=precision,
                                              diag=diag)
        maha = jnp.sum(w * w, axis=-2)
        return -0.5 * (maha + logdet[..., None] + N * _LOG_2PI)
    L = jnp.linalg.cholesky(K)
    return _logpdf_from_chol(L, y)
