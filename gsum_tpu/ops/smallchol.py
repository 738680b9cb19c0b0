R"""Batch-vectorized Cholesky / triangular solve for small-to-medium N.

XLA's native batched Cholesky on TPU collapses to ~0.1 TFLOP/s for
N ≲ 512 (its column recursion leaves the batch dimension idle), yet the
library's dominant real workload — hyperparameter-grid log-marginal-
likelihood sweeps over thousands of θ values at the reference's notebook
sizes N ≈ 100–350 (SURVEY.md §3.3) — is exactly a large batch of small
factorizations.

These routines restructure the recursion so every primitive op runs over
the whole batch at once: recursive 2×2 blocking with MXU GEMM trailing
updates, and fully-unrolled leaf factorizations/substitutions whose (G,
leaf, leaf) element-wise steps keep the VPU saturated across the batch.
Everything is static-shape, jit/vmap/grad-safe pure JAX.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import _config  # noqa: F401

__all__ = ['batched_small_cholesky', 'batched_small_solve_triangular',
           'batched_small_tri_inv', 'batched_grid_lml']

_HI = jax.lax.Precision.HIGHEST


def _leaf_cholesky(A):
    """Unrolled right-looking Cholesky of (..., n, n) for small static n.

    Each of the n column steps is a batched elementwise op — the batch
    dimension does the vectorizing, not the matrix dimension.
    """
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        d = jnp.sqrt(A[..., j, j])
        col = A[..., :, j] / d[..., None]          # (..., n)
        # zero the above-diagonal part of the stored column
        mask = jnp.arange(n) >= j
        col = jnp.where(mask, col, 0.0)
        L = L.at[..., :, j].set(col)
        # trailing update A -= col col^T (only indices > j matter)
        A = A - col[..., :, None] * col[..., None, :]
    return L


def _leaf_solve(L, B):
    """Unrolled forward substitution: solves L X = B for small static n.

    L: (..., n, n) lower-triangular, B: (..., n, m).  n rank-1 update steps
    (not n^2/2 scalar ops) so the op chain stays short and batch-wide.
    """
    n = L.shape[-1]
    X = B
    for i in range(n):
        xi = X[..., i, :] / L[..., i, i][..., None]
        X = X.at[..., i, :].set(xi)
        if i + 1 < n:
            X = X.at[..., i + 1:, :].add(
                -L[..., i + 1:, i][..., None] * xi[..., None, :])
    return X


def _split(n):
    """Power-of-two-friendly split point."""
    half = n // 2
    # round the first block up to a multiple of 8 when possible (sublanes)
    if half % 8 and n > 16:
        half += 8 - half % 8
    return half


def batched_small_solve_triangular(L, B, leaf=16):
    """Solves ``L X = B`` (lower-triangular L) with batch-first vectorization.

    Block forward substitution: leaf solves are unrolled substitutions,
    off-diagonal updates are MXU batch-GEMMs at full f32 precision.
    """
    n = L.shape[-1]
    if n <= leaf:
        return _leaf_solve(L, B)
    n1 = _split(n)
    L11 = L[..., :n1, :n1]
    L21 = L[..., n1:, :n1]
    L22 = L[..., n1:, n1:]
    X1 = batched_small_solve_triangular(L11, B[..., :n1, :], leaf)
    B2 = B[..., n1:, :] - jnp.matmul(L21, X1, precision=_HI)
    X2 = batched_small_solve_triangular(L22, B2, leaf)
    return jnp.concatenate([X1, X2], axis=-2)


def _leaf_tri_inv(L):
    """Unrolled inverse of a small lower-triangular block: forward
    substitution against the identity, n batched row steps."""
    n = L.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
    return _leaf_solve(L, eye)


def _tri_inv_raw(L, leaf=16):
    n = L.shape[-1]
    if n <= leaf:
        return _leaf_tri_inv(L)
    n1 = _split(n)
    L11 = L[..., :n1, :n1]
    L21 = L[..., n1:, :n1]
    L22 = L[..., n1:, n1:]
    M11 = _tri_inv_raw(L11, leaf)
    M22 = _tri_inv_raw(L22, leaf)
    M21 = -jnp.matmul(M22, jnp.matmul(L21, M11, precision=_HI), precision=_HI)
    z12 = jnp.zeros_like(jnp.swapaxes(L21, -1, -2))
    top = jnp.concatenate([M11, z12], axis=-1)
    bot = jnp.concatenate([M21, M22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def batched_small_tri_inv(L, leaf=16):
    R"""Inverse of a batch of lower-triangular matrices, GEMM-recursive.

    ``inv([[L11, 0], [L21, L22]]) = [[M11, 0], [-M22 L21 M11, M22]]`` — the
    combine step is two batched matmuls, so the row-sequential work is
    confined to the leaves.  Turning solves into (precomputed-inverse ×
    rhs) GEMMs is what makes the batched grid-lml path throughput-bound
    instead of latency-bound.

    Differentiation uses the analytic adjoint ``L̄ = -Mᵀ M̄ Mᵀ`` (three
    batched GEMMs) instead of backpropagating through the recursion, whose
    scatter-heavy reverse pass is ~10x slower.
    """
    return _tri_inv_raw(L, leaf)


def _tri_inv_fwd(L, leaf):
    M = _tri_inv_raw(L, leaf)
    return M, M


def _tri_inv_bwd(leaf, M, Mbar):
    Mt = jnp.swapaxes(M, -1, -2)
    Lbar = -jnp.matmul(Mt, jnp.matmul(Mbar, Mt, precision=_HI), precision=_HI)
    return (jnp.tril(Lbar),)


batched_small_tri_inv.defvjp(_tri_inv_fwd, _tri_inv_bwd)


def _cholesky_raw(A, leaf=16):
    n = A.shape[-1]
    if n <= leaf:
        return _leaf_cholesky(A)
    n1 = _split(n)
    A11 = A[..., :n1, :n1]
    A21 = A[..., n1:, :n1]
    A22 = A[..., n1:, n1:]
    L11 = _cholesky_raw(A11, leaf)
    # L21 = A21 L11^{-T}  <=>  L11 L21^T = A21^T
    L21T = batched_small_solve_triangular(L11, jnp.swapaxes(A21, -1, -2), leaf)
    L21 = jnp.swapaxes(L21T, -1, -2)
    A22_upd = A22 - jnp.matmul(L21, L21T, precision=_HI)
    L22 = _cholesky_raw(A22_upd, leaf)
    z12 = jnp.zeros_like(jnp.swapaxes(A21, -1, -2))
    top = jnp.concatenate([L11, z12], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def batched_small_cholesky(A, leaf=16):
    """Cholesky of a batch of small SPD matrices, batch-first vectorized.

    Far faster than ``jnp.linalg.cholesky`` on TPU for (G >= ~100,
    N <= ~512) batches, where XLA's batched factorization is
    latency-bound.  Measured end-to-end impact: the grid-lml engine built
    on this runs 153-179x the vmapped-XLA path at f32 N=128-256
    (benchmarks/gridlml_tpu.py, docs/perf.md).  Identical math (same
    factor up to roundoff).
    Differentiation uses the standard analytic Cholesky adjoint
    (Murray 2016): ``Ā = 0.5 sym(M^T Φ(L^T L̄) M)`` with ``M = L^{-1}`` and
    Φ the lower-triangular half-diagonal projector — a handful of batched
    GEMMs instead of the recursion's reverse pass.
    """
    return _cholesky_raw(A, leaf)


def _cholesky_fwd(A, leaf):
    L = _cholesky_raw(A, leaf)
    return L, L


def _cholesky_bwd(leaf, L, Lbar):
    n = L.shape[-1]
    Lt = jnp.swapaxes(L, -1, -2)
    W = jnp.matmul(Lt, Lbar, precision=_HI)
    # Phi: keep lower triangle, halve the diagonal
    W = jnp.tril(W) - 0.5 * W * jnp.eye(n, dtype=L.dtype)
    M = _tri_inv_raw(L, leaf)
    Mt = jnp.swapaxes(M, -1, -2)
    Abar = jnp.matmul(Mt, jnp.matmul(W, M, precision=_HI), precision=_HI)
    return (0.5 * (Abar + jnp.swapaxes(Abar, -1, -2)),)


batched_small_cholesky.defvjp(_cholesky_fwd, _cholesky_bwd)


@partial(jax.jit, static_argnames=('leaf',))
def batched_grid_lml(Ks, y, leaf=16):
    R"""MVN log-marginal likelihood over a batch of covariance matrices.

    Parameters
    ----------
    Ks : (G, N, N) covariance matrices (e.g. one per hyperparameter-grid
        point)
    y : (N, m) or (G, N, m) residuals

    Returns
    -------
    (G,) array of Σ_curves log N(y_c | 0, K_g)
    """
    import numpy as np

    G, N, _ = Ks.shape
    L = batched_small_cholesky(Ks, leaf)
    # failed factorization (non-PD K) → -inf, matching the library-wide
    # convention (cgp_lml_grid, models._safe_sqrt_R) so optimizers reject
    # the hyperparameters instead of propagating NaN
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    ok = jnp.all(jnp.isfinite(diag) & (diag > 0), axis=-1)
    L = jnp.where(ok[:, None, None], L,
                  jnp.eye(N, dtype=L.dtype)[None])
    if y.ndim == 2:
        y = jnp.broadcast_to(y[None], (G,) + y.shape)
    w = batched_small_solve_triangular(L, y, leaf)
    quad = jnp.sum(w * w, axis=(-1, -2))
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    m = y.shape[-1]
    log_2pi = float(np.log(2 * np.pi))
    lml = -0.5 * (quad + m * (logdet + N * log_2pi))
    return jnp.where(ok, lml, -jnp.inf)

