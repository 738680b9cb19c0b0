R"""Dense linear-algebra primitives for the conjugate-process models.

TPU-native replacements for the LAPACK routines the reference reaches
through NumPy/SciPy (SURVEY.md §2b): Cholesky (``dpotrf``), pivoted
Cholesky (``dpstrf``), triangular/Cholesky solves (``dtrtrs``/``dpotrs``),
symmetric eigendecomposition (``dsyevd``), plus the whitening/Mahalanobis
helpers built on them.  Everything here is pure jax.numpy: jit-, vmap- and
grad-compatible, with static-shape control flow only.

High-performance fused/batched Pallas variants live in ``gsum_tpu.ops``;
this module is the correctness path and the API other layers program
against.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import cho_solve as _cho_solve
from jax.scipy.linalg import solve_triangular

from . import _config  # noqa: F401  (enables x64)

__all__ = [
    'stabilize', 'cholesky', 'safe_cholesky', 'cho_solve', 'solve_sqrt',
    'pivoted_cholesky', 'cholesky_errors', 'mahalanobis', 'eigh_sqrt',
    'logdet_sqrt', 'spd_solve', 'spd_inv', 'spd_logdet', 'robust_spd_solve',
    'robust_cholesky', 'robust_cho_solve', 'general_solve', 'f64_precision',
]


def f64_precision(dtype):
    """Matmul-precision scope for accuracy-critical contractions.

    On this TPU backend a float64 ``jnp.matmul``/``einsum`` at DEFAULT
    precision is only f32-accurate (measured: ~1e-6 absolute noise on
    O(10) lml quad forms, vs 1e-12 at HIGHEST — the factorizations and
    triangular solves themselves are fine; see docs/parity.md).  Every
    f64 contraction in the library therefore traces inside this scope.
    For f32 (and on CPU, where precision is ignored) it is a no-op, so
    the measured f32 performance paths keep their backend-default rates.

    Use as ``with f64_precision(x.dtype): ...`` around the contraction
    code inside a traced function body — the scope must be active when
    the ops are *traced*, so it belongs inside jitted closures, not
    around their call sites.
    """
    if jnp.dtype(dtype) == jnp.float64:
        return jax.default_matmul_precision('highest')
    from contextlib import nullcontext
    return nullcontext()


def stabilize(M, jitter=1e-5):
    """Adds diagonal jitter to a square matrix.  reference: helpers.py:202-203."""
    M = jnp.asarray(M)
    return M + jitter * jnp.eye(M.shape[-1], dtype=M.dtype)


def cholesky(M):
    """Lower Cholesky factor (XLA builtin; NaN on non-PSD input under jit)."""
    return jnp.linalg.cholesky(jnp.asarray(M))


def safe_cholesky(M):
    """Cholesky factor plus a success flag.

    Under ``jit`` a failed factorization cannot raise, mirroring the
    reference's ``LinAlgError -> -inf`` convention (models.py:967-972) the
    TPU way: callers use ``ok`` with ``jnp.where``.

    Returns
    -------
    L : array — lower Cholesky factor (NaN-filled columns on failure)
    ok : bool scalar — True if the factorization succeeded
    """
    M = jnp.asarray(M)
    L = jnp.linalg.cholesky(M)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return L, ok


def cho_solve(L, b):
    """Solves ``M x = b`` given the lower Cholesky factor of M."""
    return _cho_solve((L, True), b)


def spd_solve(M, b):
    """Solves ``M x = b`` for symmetric positive-definite M via Cholesky.

    XLA's TPU backend has no float64 LU decomposition ("Only F32 and C64
    types are implemented in LuDecomposition"), so ``jnp.linalg.solve`` is
    unusable on the x64 path there; every solve in this library is against
    an SPD matrix, where Cholesky is both supported and better conditioned.
    """
    M = jnp.asarray(M)
    L = jnp.linalg.cholesky(M)
    return _cho_solve((L, True), jnp.asarray(b))


def robust_cholesky(M, jitters=(0.0, 1e-12, 1e-9, 1e-6)):
    """``(L, ok)``: the first successful factor over an escalating
    relative-jitter ladder.

    Factorizes ``M + j * max(diag(M)) * I`` for each jitter in order and
    selects the first successful factor (all candidates are computed
    inside jit; selection is by ``where``).  With a well-conditioned M
    the j=0 factor wins — the plain Cholesky; on effectively singular
    covariances this regularizes instead of failing.  ``ok`` is False
    (and L the identity) only when every ladder step failed.  For
    callers that reuse ONE factorization across several solves — pass
    the pair to :func:`robust_cho_solve`.
    """
    M = jnp.asarray(M)
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    scale = jnp.max(jnp.diagonal(M, axis1=-2, axis2=-1))

    L_sel = None
    ok_sel = None
    for j in jitters:
        L_j = jnp.linalg.cholesky(M + (j * scale) * eye)
        ok_j = jnp.all(jnp.isfinite(jnp.diagonal(L_j, axis1=-2, axis2=-1)))
        if L_sel is None:
            L_sel, ok_sel = L_j, ok_j
        else:
            take = (~ok_sel) & ok_j
            L_sel = jnp.where(take, L_j, L_sel)
            ok_sel = ok_sel | ok_j
    # sanitize in case every ladder step failed so downstream stays finite-safe
    L_sel = jnp.where(ok_sel, L_sel, eye)
    return L_sel, ok_sel


def robust_cho_solve(Lok, b):
    """Solves with a :func:`robust_cholesky` ``(L, ok)`` pair — NaN when
    the whole ladder failed (matching :func:`robust_spd_solve`)."""
    L, ok = Lok
    x = _cho_solve((L, True), jnp.asarray(b))
    return jnp.where(ok, x, jnp.full_like(x, jnp.nan))


def robust_spd_solve(M, b, jitters=(0.0, 1e-12, 1e-9, 1e-6)):
    """SPD solve with an escalating relative-jitter ladder.

    One :func:`robust_cholesky` + solve.  With a well-conditioned M the
    j=0 factor wins and the result is the plain Cholesky solve; on
    effectively singular covariances (e.g. the un-nuggeted partial-sum
    covariance in TruncationProcess.predict, reference models.py:1449)
    this regularizes instead of returning NaN — the LAPACK-LU path the
    reference leans on does not exist for f64 on TPU.
    """
    return robust_cho_solve(robust_cholesky(M, jitters), b)


def spd_inv(M):
    """Inverse of a symmetric positive-definite matrix via Cholesky."""
    M = jnp.asarray(M)
    L = jnp.linalg.cholesky(M)
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return _cho_solve((L, True), eye)


def spd_logdet(M):
    """log|M| for symmetric positive-definite M (Cholesky; no LU on TPU f64)."""
    L = jnp.linalg.cholesky(jnp.asarray(M))
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def eigh_sqrt(M):
    """Symmetric eigendecomposition ``(eig, Q)`` — the 'eig' backend.

    reference: models.py:713-717 (``scipy.linalg.eigh``).
    """
    return jnp.linalg.eigh(jnp.asarray(M))


def general_solve(A, b):
    R"""Solves ``A x = b`` for a general (square, nonsingular) A with NO
    LU factorization — ``jnp.linalg.solve`` has no f64 LU lowering on
    this TPU (CLAUDE.md).  Uses the normal equations
    ``(AᵀA) x = Aᵀ b`` through the SPD solver: for the matrix square
    roots this library passes here (S with M = S Sᵀ), cond(AᵀA) =
    cond(S)² = cond(M) — the same conditioning every M-space operation
    already carries, so nothing is lost relative to solving M directly.
    """
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    At = jnp.swapaxes(A, -1, -2)
    AtA = jnp.matmul(At, A, precision=jax.lax.Precision.HIGHEST)
    Atb = jnp.matmul(At, b if b.ndim > 1 else b[:, None],
                     precision=jax.lax.Precision.HIGHEST)
    x = robust_spd_solve(AtA, Atb)
    return x if b.ndim > 1 else x[:, 0]


def solve_sqrt(sqrt_mat, y, decomposition):
    R"""Solves ``M x = y`` given a square root of M.

    reference: models.py:459-487.  ``decomposition`` is a static string:

    - ``'cholesky'``: ``sqrt_mat`` is lower-triangular L with M = L Lᵀ.
    - ``'eig'``: ``sqrt_mat`` is either a tuple ``(eig, Q)`` with
      M = Q diag(eig) Qᵀ, or a general square root matrix S with M = S Sᵀ.
    """
    if decomposition == 'cholesky':
        return _cho_solve((sqrt_mat, True), y)
    elif decomposition == 'eig':
        if isinstance(sqrt_mat, tuple):
            eig, Q = sqrt_mat
            return Q @ ((Q.T @ y).T / eig).T if y.ndim > 1 else Q @ ((Q.T @ y) / eig)
        # M = S Sᵀ: one SPD solve — jnp.linalg.solve has no f64 LU
        # lowering on this TPU
        M = jnp.matmul(sqrt_mat, jnp.swapaxes(sqrt_mat, -1, -2),
                       precision=jax.lax.Precision.HIGHEST)
        return robust_spd_solve(M, y)
    else:
        raise ValueError('decomposition must be either "cholesky" or "eig"')


def logdet_sqrt(sqrt_mat, decomposition):
    """log|M| from a square root of M (cholesky L or (eig, Q) tuple)."""
    if decomposition == 'cholesky':
        return 2 * jnp.sum(jnp.log(jnp.diagonal(sqrt_mat, axis1=-2, axis2=-1)), axis=-1)
    elif decomposition == 'eig':
        eig, _ = sqrt_mat
        return jnp.sum(jnp.log(eig), axis=-1)
    raise ValueError('decomposition must be either "cholesky" or "eig"')


@partial(jax.jit, static_argnames=())
def _pivoted_cholesky_impl(M):
    N = M.shape[0]
    dtype = M.dtype

    # LAPACK dpstrf stopping tolerance: N * eps * max(diag)
    eps = jnp.finfo(dtype).eps
    tol = N * eps * jnp.max(jnp.diag(M))

    idx = jnp.arange(N)

    def swap_sym(A, k, j):
        """Symmetric row+column swap of indices k and j."""
        perm = idx.at[k].set(j).at[j].set(k)
        return A[perm][:, perm]

    def body(k, carry):
        A, piv, rank = carry
        d = jnp.diagonal(A)
        d_masked = jnp.where(idx >= k, d, -jnp.inf)
        j = jnp.argmax(d_masked)
        # Once a pivot falls below tol the factorization stops (rank stops
        # advancing), so pivot_ok stays False for every later k.
        pivot_ok = (d_masked[j] > tol) & (k == rank)

        A = swap_sym(A, k, j)
        piv_k, piv_j = piv[k], piv[j]
        piv = piv.at[k].set(piv_j).at[j].set(piv_k)

        akk = jnp.sqrt(jnp.maximum(A[k, k], 0.0))
        inv_akk = jnp.where(pivot_ok & (akk > 0), 1.0 / akk, 0.0)
        # Below-diagonal part of L's column k (zero everywhere else, and zero
        # entirely when the pivot is not OK).
        col = jnp.where(idx > k, A[:, k] * inv_akk, 0.0)
        col_k = jnp.where(pivot_ok, akk, 0.0)

        # Trailing update A[k+1:, k+1:] -= col colᵀ.  The masked outer
        # product is zero outside the trailing block, so a full subtraction
        # is equivalent.
        A = A - jnp.outer(col, col)
        # Write L's column k (rows above the diagonal zeroed).
        A = A.at[:, k].set(col.at[k].set(col_k))

        rank = rank + pivot_ok.astype(rank.dtype)
        return A, piv, rank

    A, piv, rank = jax.lax.fori_loop(0, N, body, (M, idx, jnp.asarray(0)))
    L = jnp.tril(A)
    inv_perm = jnp.argsort(piv)
    return L[inv_perm], piv, rank


def pivoted_cholesky(M, return_pivots=False):
    R"""Pivoted Cholesky factorization G with ``M = G Gᵀ``.

    A fixed-trip-count (jit-compatible) reimplementation of LAPACK
    ``dpstrf`` (reference: helpers.py:185-199): at each step the largest
    remaining diagonal entry is chosen as pivot via argmax, rows/columns are
    exchanged with gathers, and a masked outer-product update is applied.
    Rows of the returned factor are restored to the original ordering,
    matching the reference (and the TFP/GPyTorch oracle values in
    reference tests/test.py:96-122).

    Parameters
    ----------
    M : (N, N) symmetric positive-semidefinite array
    return_pivots : bool, optional
        Also return the pivot order and numerical rank.
    """
    M = jnp.asarray(M)
    G, piv, rank = _pivoted_cholesky_impl(M)
    if return_pivots:
        return G, piv, rank
    return G


def cholesky_errors(y, mean, chol):
    R"""Whitened residuals ``L^{-1}(y - mean)`` (row-vectors in/out).

    reference: helpers.py:504-505.
    """
    y = jnp.asarray(y)
    return solve_triangular(chol, (y - mean).T, lower=True).T


def mahalanobis(y, mean, chol=None, inv=None, sqrt_mat=None):
    R"""Mahalanobis distance via a Cholesky factor, inverse, or general sqrt.

    reference: helpers.py:512-522.
    """
    given = sum(x is not None for x in (chol, inv, sqrt_mat))
    if given > 1:
        raise ValueError('Only one of chol, inv, or sqrt_mat can be given')
    y = jnp.asarray(y)
    if chol is not None:
        err = cholesky_errors(y, mean, chol)
        return jnp.linalg.norm(err, axis=-1)
    if sqrt_mat is not None:
        err = general_solve(sqrt_mat, (y - mean).T).T
        return jnp.linalg.norm(err, axis=-1)
    y2 = jnp.atleast_2d(y)
    diff = y2 - mean
    return jnp.squeeze(jnp.sqrt(jnp.einsum('ij,jk,ik->i', diff, inv, diff)))
