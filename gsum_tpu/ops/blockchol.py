R"""Blocked batched Cholesky for large N — the headline-pipeline factorization.

XLA's native batched Cholesky runs the B=16, N=4096 headline config at
~8 TF/s / ~45 ms on this TPU (benchmarks/micro_tpu.py, tunnel-floor
corrected) — far below the MXU GEMM rate (~46 TF/s at 3-pass f32, ~26 at
6-pass).  This module restructures the factorization so virtually all of
the N³/3 FLOPs run as large batched GEMMs:

- **left-looking column-block algorithm**: at step k the k-th column block
  is updated with ONE GEMM against all previously finished columns.
  Unlike the right-looking trailing update (a dense rem×rem SYRK per
  step, 2× the necessary work without a symmetric-rank-k primitive),
  left-looking performs exactly the counted N³/3 multiply-adds.
- **diagonal blocks** go to one Pallas launch each
  (``ops.pallas_chol.chol_inv_block``: factor + triangular inverse
  computed in VMEM, ~0.5 ms at (16, 256) vs ~2-4 ms for any XLA
  formulation, which is latency-bound at small batch);
- **panel TRSMs** become GEMMs against those precomputed diagonal-block
  inverses — the standard accelerator TRSM rewrite;
- the **logpdf solve** reuses the same inverses in a blocked forward
  substitution (N/block sequential steps instead of N).

Everything is static-shape (the per-step Python loop unrolls at trace
time), jit/vmap-safe, and differentiable via the analytic Cholesky
adjoint.

reference hot loop being replaced: gsum/models.py:957-1039 (one LAPACK
``dpotrf`` per log-marginal-likelihood evaluation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import _config  # noqa: F401
from .smallchol import _cholesky_raw, _tri_inv_raw

__all__ = ['batched_blocked_cholesky', 'blocked_chol_solve_logdet',
           'blocked_solve_lower', 'blocked_factor', 'blocked_cho_solve',
           'blocked_spd_solve_logdet']

_HI = jax.lax.Precision.HIGHEST
_LOG_2PI = float(np.log(2 * np.pi))


def _diag_engine(K, block, diag):
    if diag != 'auto':
        return diag
    # B >= 2: a degenerate (1, b, b) batch crashes this toolchain's TPU
    # compiler inside the Pallas kernel (bisected — see ops.fusedchol)
    if (jax.default_backend() == 'tpu' and K.dtype == jnp.float32
            and block % 32 == 0 and block <= 512 and K.ndim == 3
            and K.shape[0] >= 2):
        return 'pallas'
    return 'recursive'


def _factor_diag(Akk, leaf, engine, precision=_HI):
    """(L, Minv) of a (B, block, block) SPD diagonal block.

    'pallas' unrolls the kernel's serial rank-1 loops (fastest on chip);
    'pallas_fori' keeps them as fori_loops (smaller compile, for A/B);
    'hier' splits the block recursively down to 128-wide base blocks
    (see :func:`_factor_diag_hier`).
    """
    if engine == 'hier':
        return _factor_diag_hier(Akk, leaf, precision)
    if engine in ('pallas', 'pallas_fori', 'pallas_fused'):
        from .pallas_chol import chol_inv_block

        return chol_inv_block(Akk, unroll=(engine != 'pallas_fori'),
                              fuse_panel=(engine == 'pallas_fused'))
    L = _cholesky_raw(Akk, leaf)
    return L, _tri_inv_raw(L, leaf)


_HIER_SUB = 128  # the Pallas diagonal kernel's fastest width on this chip


def _factor_diag_hier(Akk, leaf, precision, sub=_HIER_SUB):
    """(L, Minv) of a (..., b, b) SPD diagonal block by recursive 2x2
    splitting down to ``sub``-wide base factorizations.

    The Pallas diagonal kernel's serial rank-1 VPU work grows with block
    width, so wide column blocks pay a diagonal tax (docs/perf.md: 10.5 ms
    at block=256 vs ~half that at 128 for the headline shape) while narrow
    ones shrink the history GEMM's output aspect below MXU efficiency.
    Splitting decouples the two: the outer column block stays wide for the
    history GEMM and each diagonal recurses — three GEMMs per split (panel
    TRSM rewrite, Schur update, inverse composition) — until the base
    kernel runs at its fastest width.  The composed triangular inverse is
    the standard 2x2 block formula  [[M1, 0], [-M2 L21 M1, M2]]  (NOT the
    nilpotent-doubling series rejected in docs/perf.md — no powers of the
    strictly-lower part appear, each sub-inverse comes exactly from the
    base kernel).
    """
    b = Akk.shape[-1]
    if b <= sub:
        return _factor_diag(Akk, leaf, _diag_engine(Akk, b, 'auto'),
                            precision)
    h = max(b // sub // 2, 1) * sub        # lower split, a sub multiple
    A11 = Akk[..., :h, :h]
    A21 = Akk[..., h:, :h]
    A22 = Akk[..., h:, h:]
    L11, M1 = _factor_diag_hier(A11, leaf, precision, sub)
    L21 = jnp.matmul(A21, jnp.swapaxes(M1, -1, -2), precision=precision)
    S22 = A22 - jnp.matmul(L21, jnp.swapaxes(L21, -1, -2),
                           precision=precision)
    L22, M2 = _factor_diag_hier(S22, leaf, precision, sub)
    z = jnp.zeros(Akk.shape[:-2] + (h, b - h), Akk.dtype)
    L = jnp.concatenate([jnp.concatenate([L11, z], -1),
                         jnp.concatenate([L21, L22], -1)], -2)
    M21 = -jnp.matmul(M2, jnp.matmul(L21, M1, precision=precision),
                      precision=precision)
    Minv = jnp.concatenate([jnp.concatenate([M1, z], -1),
                            jnp.concatenate([M21, M2], -1)], -2)
    return L, Minv


def _blocked_factor(K, block, leaf, precision, engine):
    """Left-looking blocked factorization.

    Returns (L, minvs): the factor and the list of diagonal-block
    inverses (for TRSMs / the blocked solve).  Requires N % block == 0
    (callers pad).

    L lives in ONE buffer updated in place: each step's history GEMM
    reads static slices of it (fused into the GEMM operand reads) and
    the finished column lands via an aliasable in-place slice update.
    The earlier concatenate-the-finished-columns formulation re-staged
    ~2.9 GB of cumulative copy traffic at (16, 4096) — ~17 ms of the
    41.6 ms factorization (docs/perf.md round-2 roofline).
    """
    N = K.shape[-1]
    nb = N // block

    L = jnp.zeros_like(K)
    minvs = []
    for k in range(nb):
        s = k * block
        A_col = K[..., s:, s:s + block]             # (..., N-s, b)
        if k:
            # one GEMM against all finished columns: rows s:, cols :s
            L_left = L[..., s:, :s]                  # (..., N-s, s)
            L_row = L[..., s:s + block, :s]          # (..., b, s)
            A_col = A_col - jnp.matmul(
                L_left, jnp.swapaxes(L_row, -1, -2), precision=precision)
        Lkk, Minv = _factor_diag(A_col[..., :block, :], leaf, engine,
                                 precision)
        minvs.append(Minv)
        if k < nb - 1:
            Lp = jnp.matmul(A_col[..., block:, :],
                            jnp.swapaxes(Minv, -1, -2), precision=precision)
            col = jnp.concatenate([Lkk, Lp], axis=-2)
        else:
            col = Lkk
        L = L.at[..., s:, s:s + block].set(col)
    return L, minvs


def _pad_spd(K, block):
    """Pad K to a block multiple with an identity extension."""
    B_dims = K.shape[:-2]
    N = K.shape[-1]
    nb = -(-N // block)
    pad = nb * block - N
    if not pad:
        return K, 0
    K = jnp.concatenate([
        jnp.concatenate([K, jnp.zeros(B_dims + (N, pad), K.dtype)], -1),
        jnp.concatenate([jnp.zeros(B_dims + (pad, N), K.dtype),
                         jnp.broadcast_to(jnp.eye(pad, dtype=K.dtype),
                                          B_dims + (pad, pad))], -1),
    ], -2)
    return K, pad


def _blocked_cholesky_raw(K, block, leaf, precision, diag='auto'):
    N = K.shape[-1]
    if N <= block:
        return _cholesky_raw(K, leaf)
    engine = _diag_engine(K, block, diag)
    K, pad = _pad_spd(K, block)
    L, _ = _blocked_factor(K, block, leaf, precision, engine)
    if pad:
        L = L[..., :N, :N]
    return L


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def batched_blocked_cholesky(K, block=256, leaf=32,
                             precision=jax.lax.Precision.HIGHEST,
                             diag='auto'):
    R"""Cholesky of (..., N, N) SPD matrices with GEMM-dominated blocking.

    Parameters
    ----------
    K : (..., N, N) SPD matrices (batch dims lead)
    block : column-block width
    leaf : leaf size of the recursive (non-Pallas) diagonal factorization
    precision : MXU precision of the update/panel GEMMs.  HIGHEST (6-pass
        f32) is the safe default for factorizations; HIGH (3-pass bf16)
        measures 13% faster on the headline pipeline at ~1e-3 relative
        logpdf error (docs/perf.md round 3) — acceptable for optimizer
        objectives when a nugget bounds the condition number.
    diag : 'auto' | 'pallas' | 'recursive' | 'hier' — diagonal-block
        engine ('auto': Pallas on TPU f32, recursive elsewhere; 'hier'
        splits wide blocks recursively to Pallas-128 bases — exact but
        measured slower than flat block=128, kept for block > 512 where
        the flat kernel exceeds VMEM)

    Identical math to ``jnp.linalg.cholesky`` (same factor to round-off at
    equal precision); see module docstring for why it is faster here.
    """
    return _blocked_cholesky_raw(K, block, leaf, precision, diag)


def _bbc_fwd(K, block, leaf, precision, diag):
    L = _blocked_cholesky_raw(K, block, leaf, precision, diag)
    return L, L


def _solve_upperT_blocked(L, minvs, Y, precision=_HI):
    """Solves ``Lᵀ X = Y`` (upper-triangular backward substitution) with
    nb blocked GEMM steps against precomputed diagonal-block inverses.
    Y is (..., N, m) with N already a block multiple."""
    block = minvs[0].shape[-1]
    nb = len(minvs)
    X = jnp.zeros_like(Y)
    for k in reversed(range(nb)):
        s = k * block
        rhs = Y[..., s:s + block, :]
        if k < nb - 1:
            L_below = L[..., s + block:, s:s + block]          # (..., r, b)
            rhs = rhs - jnp.matmul(jnp.swapaxes(L_below, -1, -2),
                                   X[..., s + block:, :], precision=precision)
        X = X.at[..., s:s + block, :].set(
            jnp.matmul(jnp.swapaxes(minvs[k], -1, -2), rhs,
                       precision=precision))
    return X


def _bbc_bwd(block, leaf, precision, diag, L, Lbar):
    # standard analytic Cholesky adjoint (Murray 2016):
    #   Ā = 0.5 · sym(L⁻ᵀ · Φ(Lᵀ L̄) · L⁻¹)
    # The L⁻ᵀ(...)L⁻¹ sandwich runs as TWO blocked upper-triangular
    # solves with N right-hand sides — NOT via an explicit full-N
    # recursive triangular inverse, whose unrolled HLO SIGKILLs the
    # remote TPU compile service at N=4096 under optimizer adjoints
    # (docs/perf.md).  The diagonal-block inverses are recomputed per
    # block (bounded recursion each).
    n = L.shape[-1]
    Lt = jnp.swapaxes(L, -1, -2)
    W = jnp.matmul(Lt, Lbar, precision=_HI)
    W = jnp.tril(W) - 0.5 * W * jnp.eye(n, dtype=L.dtype)
    if n <= block:
        M = _tri_inv_raw(L, leaf)
        Mt = jnp.swapaxes(M, -1, -2)
        Abar = jnp.matmul(Mt, jnp.matmul(W, M, precision=_HI), precision=_HI)
        return (0.5 * (Abar + jnp.swapaxes(Abar, -1, -2)),)

    Lp, pad = _pad_spd(L, block)   # identity-extended: still triangular
    if pad:
        W = jnp.concatenate([
            jnp.concatenate([W, jnp.zeros(W.shape[:-2] + (n, pad),
                                          W.dtype)], -1),
            jnp.zeros(W.shape[:-2] + (pad, n + pad), W.dtype)], -2)
    nb = Lp.shape[-1] // block
    minvs = [_tri_inv_raw(Lp[..., k * block:(k + 1) * block,
                             k * block:(k + 1) * block], leaf)
             for k in range(nb)]
    # T = W L⁻¹  via  Tᵀ = L⁻ᵀ Wᵀ;  then  Ā₀ = L⁻ᵀ T
    Tt = _solve_upperT_blocked(Lp, minvs, jnp.swapaxes(W, -1, -2))
    Abar = _solve_upperT_blocked(Lp, minvs, jnp.swapaxes(Tt, -1, -2))
    if pad:
        Abar = Abar[..., :n, :n]
    return (0.5 * (Abar + jnp.swapaxes(Abar, -1, -2)),)


batched_blocked_cholesky.defvjp(_bbc_fwd, _bbc_bwd)


def _blocked_lower_solve(L, minvs, Y, precision=_HI):
    """Solves ``L w = Y`` (blocked forward substitution) against the
    factorization's diagonal-block inverses.  All shapes pre-padded."""
    block = minvs[0].shape[-1]
    nb = len(minvs)
    w = jnp.zeros_like(Y)
    for k in range(nb):
        s = k * block
        rhs = Y[..., s:s + block, :]
        if k:
            rhs = rhs - jnp.matmul(L[..., s:s + block, :s], w[..., :s, :],
                                   precision=precision)
        w = w.at[..., s:s + block, :].set(
            jnp.matmul(minvs[k], rhs, precision=precision))
    return w


def _bssl_impl(K, Y, block, leaf, precision, diag):
    """Factor + solve + logdet + success flag; also returns the padded
    factor and diagonal-block inverses for the custom backward."""
    N = K.shape[-1]
    engine = _diag_engine(K, block, diag)
    Kp, pad = _pad_spd(K, block)
    Yp = Y
    if pad:
        Yp = jnp.concatenate(
            [Y, jnp.zeros(Y.shape[:-2] + (pad, Y.shape[-1]), Y.dtype)],
            axis=-2)
    L, minvs = _blocked_factor(Kp, block, leaf, precision, engine)
    d = jnp.diagonal(L, axis1=-2, axis2=-1)[..., :N]
    ok = jnp.all(jnp.isfinite(d) & (d > 0), axis=-1)
    w = _blocked_lower_solve(L, minvs, Yp, precision)
    x = _solve_upperT_blocked(L, minvs, w, precision)
    if pad:
        x = x[..., :N, :]
    logdet = 2.0 * jnp.sum(jnp.log(d), axis=-1)
    return x, logdet, ok, L, minvs


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def blocked_spd_solve_logdet(K, Y, block=128, leaf=32,
                             precision=jax.lax.Precision.HIGHEST,
                             diag='auto'):
    R"""``(K⁻¹Y, log|K|, ok)`` for batched SPD K with a hand-written
    O(N/block)-HLO adjoint — the differentiable large-N lml core.

    Why this exists: a log-marginal likelihood consumes the Cholesky
    factorization only through the solve ``K⁻¹[y, basis]`` and
    ``log|K|``, so this is the natural custom-VJP boundary.  Routing
    autodiff through the factorization internals instead (custom-VJP
    factor + custom-VJP per-block inverses + an autodiffed unrolled
    substitution) multiplies the op count until the remote TPU compile
    service is OOM-killed at N=4096 under an optimizer adjoint
    (docs/perf.md round 3).  Here the backward is four blocked GEMM
    passes reusing the forward's diagonal-block inverses:

        M = L⁻¹            (one blocked N-RHS forward substitution)
        Ȳ = K⁻¹ X̄ = Mᵀ(M X̄)
        K̄ = l̄·MᵀM − Ȳ Xᵀ   (zeroed where ``ok`` is False)

    ``ok`` (the per-matrix factorization-success flag) is an output:
    callers mask ``-inf`` themselves and need NOT re-factor a
    safe-substituted matrix — one factorization serves value, flag, and
    gradient (the failed entries' NaNs are stopped at this boundary in
    the backward pass).

    Parameters as in :func:`batched_blocked_cholesky`; K is (..., N, N),
    Y is (..., N, m).  reference analog: the potrf+potrs+slogdet
    sequence inside gsum's lml (reference models.py:957-1039).
    """
    x, logdet, ok, _, _ = _bssl_impl(K, Y, block, leaf, precision, diag)
    return x, logdet, ok


def _bssl_fwd(K, Y, block, leaf, precision, diag):
    x, logdet, ok, L, minvs = _bssl_impl(K, Y, block, leaf, precision, diag)
    return (x, logdet, ok), (x, ok, L, tuple(minvs))


def _bssl_bwd(block, leaf, precision, diag, res, cts):
    x, ok, L, minvs = res
    xbar, lbar, _ = cts            # ok is boolean — no cotangent
    N = x.shape[-2]
    Np = L.shape[-1]
    pad = Np - N

    def pad_rows(A):
        if not pad:
            return A
        return jnp.concatenate(
            [A, jnp.zeros(A.shape[:-2] + (pad, A.shape[-1]), A.dtype)],
            axis=-2)

    # M = L⁻¹ via one blocked N-RHS substitution (identity RHS); the
    # padded tail is an identity block and inverts to itself.
    eye = jnp.broadcast_to(jnp.eye(Np, dtype=L.dtype), L.shape)
    M = _blocked_lower_solve(L, list(minvs), eye, precision)
    Mt = jnp.swapaxes(M, -1, -2)

    ybar = jnp.matmul(Mt, jnp.matmul(M, pad_rows(xbar), precision=_HI),
                      precision=_HI)                       # K⁻¹ X̄
    kinv = jnp.matmul(Mt, M, precision=_HI)
    kbar = lbar[..., None, None] * kinv \
        - jnp.matmul(ybar, jnp.swapaxes(pad_rows(x), -1, -2), precision=_HI)
    if pad:
        kbar = kbar[..., :N, :N]
        ybar = ybar[..., :N, :]
    # failed factorizations carry NaN through L/M: their cotangents are
    # zero by construction (callers mask with ok), so zero the grads
    # rather than propagate 0·NaN
    okc = ok[..., None, None]
    return (jnp.where(okc, kbar, 0.0), jnp.where(okc, ybar, 0.0))


blocked_spd_solve_logdet.defvjp(_bssl_fwd, _bssl_bwd)


def blocked_chol_solve_logdet(K, Y, block=256, leaf=32,
                              precision=jax.lax.Precision.HIGHEST,
                              diag='auto'):
    R"""Factor K, solve ``L w = Y``, and return (w, logdet K) in one pass.

    The fused headline pipeline: the blocked factorization's diagonal-block
    inverses are reused for a blocked forward substitution (N/block
    sequential GEMM steps — a leaf-recursive solve would be latency-bound
    at N=4096).

    Parameters
    ----------
    K : (..., N, N) SPD;  Y : (..., N, m)

    Returns
    -------
    (w, logdet): ``w = L⁻¹ Y`` with ``K = L Lᵀ``, and log|K| (...,)
    """
    N = K.shape[-1]
    if N <= block:
        L = _cholesky_raw(K, leaf)
        from .smallchol import batched_small_solve_triangular

        w = batched_small_solve_triangular(L, Y, leaf)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        return w, logdet

    engine = _diag_engine(K, block, diag)
    Kp, pad = _pad_spd(K, block)
    if pad:
        Y = jnp.concatenate(
            [Y, jnp.zeros(Y.shape[:-2] + (pad, Y.shape[-1]), Y.dtype)],
            axis=-2)
    L, minvs = _blocked_factor(Kp, block, leaf, precision, engine)

    nb = Kp.shape[-1] // block
    w = jnp.zeros_like(Y)
    for k in range(nb):
        s = k * block
        rhs = Y[..., s:s + block, :]
        if k:
            L_row = L[..., s:s + block, :s]                # (..., b, s)
            rhs = rhs - jnp.matmul(L_row, w[..., :s, :], precision=precision)
        w = w.at[..., s:s + block, :].set(
            jnp.matmul(minvs[k], rhs, precision=precision))
    if pad:
        w = w[..., :N, :]
        L = L[..., :N, :N]
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return w, logdet


def blocked_factor(K, block=128, leaf=32,
                   precision=jax.lax.Precision.HIGHEST, diag='auto'):
    R"""Factor (..., N, N) SPD K, returning ``(L, minvs)`` for reuse.

    The forward-only companion of :func:`batched_blocked_cholesky` for
    callers that also need the diagonal-block inverses (the GEMM-based
    solves of :func:`blocked_cho_solve`).  N is padded to a block
    multiple internally; L comes back un-padded, minvs padded (their
    trailing identity blocks solve the padded rows as identity, which the
    solve slices away).  NOT differentiable when the Pallas diagonal
    engine is selected — use ``batched_blocked_cholesky`` (custom VJP)
    inside optimizer objectives.
    """
    N = K.shape[-1]
    engine = _diag_engine(K, block, diag)
    Kp, pad = _pad_spd(K, block)
    L, minvs = _blocked_factor(Kp, block, leaf, precision, engine)
    if pad:
        L = L[..., :N, :N]
    return L, minvs


def blocked_tri_inv_diag(L, block=128, leaf=32):
    R"""Differentiable diagonal-block inverses of a blocked factor.

    ``blocked_factor``'s inverses come out of the Pallas diagonal kernel,
    which has no VJP; optimizer objectives instead factor with
    :func:`batched_blocked_cholesky` (analytic custom VJP) and rebuild
    the inverses here with ``batched_small_tri_inv`` (also custom-VJP) —
    one extra inversion pass buys a fully differentiable blocked solve.

    Returns the list of (..., block, block) inverses, the trailing one
    identity-padded when N is not a block multiple (matching
    :func:`blocked_cho_solve`'s padding convention).
    """
    from .smallchol import batched_small_tri_inv

    N = L.shape[-1]
    nb = -(-N // block)
    minvs = []
    for k in range(nb):
        s = k * block
        e = min(s + block, N)
        blk = L[..., s:e, s:e]
        if e - s < block:
            pad = block - (e - s)
            blk = jnp.concatenate([
                jnp.concatenate(
                    [blk, jnp.zeros(blk.shape[:-2] + (e - s, pad),
                                    blk.dtype)], -1),
                jnp.concatenate(
                    [jnp.zeros(blk.shape[:-2] + (pad, e - s), blk.dtype),
                     jnp.broadcast_to(jnp.eye(pad, dtype=blk.dtype),
                                      blk.shape[:-2] + (pad, pad))], -1),
            ], -2)
        minvs.append(batched_small_tri_inv(blk, leaf))
    return minvs


def blocked_cho_solve(L, minvs, Y, precision=jax.lax.Precision.HIGHEST):
    R"""Solves ``(L Lᵀ) X = Y`` from :func:`blocked_factor`'s output.

    nb forward + nb backward blocked-substitution steps, each a batched
    GEMM against the precomputed diagonal-block inverses; only the lower
    triangle of L is read.
    """
    block = minvs[0].shape[-1]
    N = Y.shape[-2]
    nb = len(minvs)
    pad = nb * block - N
    if pad:
        Y = jnp.concatenate(
            [Y, jnp.zeros(Y.shape[:-2] + (pad, Y.shape[-1]), Y.dtype)],
            axis=-2)
        eye_ext = jnp.broadcast_to(jnp.eye(pad, dtype=L.dtype),
                                   L.shape[:-2] + (pad, pad))
        L = jnp.concatenate([
            jnp.concatenate(
                [L, jnp.zeros(L.shape[:-2] + (N, pad), L.dtype)], -1),
            jnp.concatenate(
                [jnp.zeros(L.shape[:-2] + (pad, N), L.dtype), eye_ext], -1),
        ], -2)

    w = jnp.zeros_like(Y)
    for k in range(nb):
        s = k * block
        rhs = Y[..., s:s + block, :]
        if k:
            rhs = rhs - jnp.matmul(L[..., s:s + block, :s], w[..., :s, :],
                                   precision=precision)
        w = w.at[..., s:s + block, :].set(
            jnp.matmul(minvs[k], rhs, precision=precision))

    x = jnp.zeros_like(Y)
    for k in reversed(range(nb)):
        s = k * block
        rhs = w[..., s:s + block, :]
        if k < nb - 1:
            L_below = L[..., s + block:, s:s + block]      # (..., r, b)
            rhs = rhs - jnp.matmul(jnp.swapaxes(L_below, -1, -2),
                                   x[..., s + block:, :], precision=precision)
        x = x.at[..., s:s + block, :].set(
            jnp.matmul(jnp.swapaxes(minvs[k], -1, -2), rhs,
                       precision=precision))
    return x[..., :N, :] if pad else x


def blocked_solve_lower(L, Y, leaf=32):
    """Solves ``L X = Y`` for lower-triangular L with batch-first blocking
    (GEMM-recursive; the leaf substitutions vectorize across the batch).
    For the fused factor-and-solve path use :func:`blocked_chol_solve_logdet`,
    which reuses the factorization's diagonal-block inverses instead."""
    from .smallchol import batched_small_solve_triangular

    return batched_small_solve_triangular(L, Y, leaf)
