R"""Fully-batched conjugate-GP log-marginal likelihood over covariance grids.

The library's dominant large-scale workload is the hyperparameter-grid
sweep (reference: correlated_EFT_publication.ipynb cell 53 — 8000 Python-
loop lml evaluations at N ≈ 100–350).  Naively ``vmap``-ing the scalar lml
is correct but slow: XLA's batched Cholesky/triangular-solve collapse at
small N, and the vmapped recursion scatters.  This module instead
evaluates the *whole* conjugacy-updated lml (reference models.py:912-1057)
as explicitly batched tensor ops — one batched factorization
(``smallchol``), batched forward/backward substitutions, and einsums for
the conjugate updates — so the grid axis stays a leading dimension of
every op.

Supports the general model: multi-curve y, arbitrary (small-p) basis,
V₀ = 0 or SPD, ν₀ finite or ∞.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import _config  # noqa: F401
from .smallchol import batched_small_cholesky, batched_small_tri_inv

__all__ = ['cgp_lml_grid', 'cgp_lml_grid2', 'csp_lml_grid',
           'csp_lml_grid2', 'batched_cho_solve']

_LOG_2PI = float(np.log(2 * np.pi))
_HI = jax.lax.Precision.HIGHEST


def batched_cho_solve(L, B, leaf=16):
    """Solves ``(L L^T) X = B`` batched via the precomputed triangular
    inverse (two batched GEMMs) — throughput-bound instead of the
    row-latency-bound substitution XLA would emit."""
    M = batched_small_tri_inv(L, leaf)
    return jnp.matmul(jnp.swapaxes(M, -1, -2), jnp.matmul(M, B, precision=_HI),
                      precision=_HI)


def _resolve_mxu_precision(p):
    """'highest' | 'high' | a jax.lax.Precision | None (-> HIGHEST)."""
    if p is None:
        return jax.lax.Precision.HIGHEST
    if isinstance(p, str):
        try:
            return {'highest': jax.lax.Precision.HIGHEST,
                    'high': jax.lax.Precision.HIGH}[p.lower()]
        except KeyError:
            raise ValueError("mxu_precision must be 'highest' or 'high', "
                             "got %r" % (p,))
    return p


def cgp_lml_grid(Rs, y, basis, center0, disp0, df0, scale0, leaf=16,
                 engine='unrolled', block=None, mxu_precision=None):
    R"""ConjugateGaussianProcess lml for a batch of correlation matrices.

    Parameters
    ----------
    Rs : (G, N, N) — nugget-included correlation matrices (one per grid
        point; factorization failures yield -inf like the reference's
        LinAlgError path)
    y : (N, m) shared training curves, or (G, N, m) per-grid-point data
        (the batched-fit path pairs each theta with its own data set)
    basis : (N, p) — mean basis (shared)
    center0, disp0, df0, scale0 : concrete prior hyperparameters

    engine : 'unrolled' | 'scan' | 'blocked' — factorization/solve engine.
        'unrolled' (ops.smallchol) is fastest but its HLO grows with N
        until compilation fails (~N=512 forward, ~N=256 under an
        optimizer adjoint); 'scan' (ops.scanchol) has O(1) compile size
        at ~6x the factorization FLOPs — the N=256-1024 grid engine;
        'blocked' (ops.blockchol — the 13.4 TF/s headline factorization,
        docs/perf.md) is the large-N batched engine, best at f32 on TPU
        for N >~ 1024; it is fully differentiable (custom-VJP
        factorization + custom-VJP diagonal-block inverses), so it also
        serves the batched-fit optimizer objective.
    block : int, optional — column-block width of the 'blocked' engine
        (default 128, the forward-sweep optimum).  The engine unrolls
        N/block factorization steps at trace time, and under an optimizer
        adjoint the compile service's memory scales with that count —
        batched_fit passes a larger block at large N to keep the
        forward+adjoint HLO compilable (docs/perf.md).
    mxu_precision : 'highest' (default) | 'high' | jax.lax.Precision —
        MXU precision of the *blocked* engine's GEMMs (ignored by the
        other engines).  'high' (bf16x3) measures 13% faster on the
        headline pipeline at ~1e-3 relative lml error (docs/perf.md
        round 3) — fine for optimizer objectives, below this library's
        accuracy contract for reported evidences.

    Returns
    -------
    (G,) log-marginal likelihoods
    """
    Rs = jnp.asarray(Rs)
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    basis = jnp.asarray(basis)
    G, N, _ = Rs.shape
    m = y.shape[-1]
    p = basis.shape[1]
    dtype = Rs.dtype
    per_point_y = y.ndim == 3

    center0 = jnp.atleast_1d(jnp.asarray(center0, dtype=dtype))
    disp0_np = np.atleast_2d(np.asarray(disp0, dtype=float))
    disp0_zero = bool(np.all(disp0_np == 0))
    df0_inf = bool(np.isinf(df0))

    # RHS for the solves: R^{-1} y and R^{-1} B for every grid point
    if per_point_y:
        yB = jnp.concatenate(
            [y, jnp.broadcast_to(basis[None], (G,) + basis.shape)], axis=-1)
    else:
        yB = jnp.broadcast_to(
            jnp.concatenate([y, basis], axis=1)[None], (G, N, m + p))

    logdet_R = None
    if engine == 'blocked':
        # ONE factorization serves value, success flag, and gradient: the
        # fused custom-VJP core's backward is four blocked GEMM passes
        # instead of autodiff through the factorization internals (whose
        # forward+adjoint HLO OOM-killed the remote compile service at
        # N=4096 — docs/perf.md round 3/4)
        from .blockchol import blocked_spd_solve_logdet

        blk = 128 if block is None else int(block)
        prec = _resolve_mxu_precision(mxu_precision)
        invR_yB, logdet_R, ok = blocked_spd_solve_logdet(
            Rs, yB, block=blk, precision=prec)
    else:
        if engine == 'scan':
            from .scanchol import scan_blocked_cholesky, scan_cho_solve

            L0, _ = scan_blocked_cholesky(Rs)
        else:
            L0 = batched_small_cholesky(Rs, leaf)
        diag = jnp.diagonal(L0, axis1=-2, axis2=-1)
        ok = jnp.all(jnp.isfinite(diag) & (diag > 0), axis=-1)      # (G,)
        eye = jnp.eye(N, dtype=dtype)
        Rs_safe = jax.lax.optimization_barrier(
            jnp.where(ok[:, None, None], Rs, eye))
        if engine == 'scan':
            L, minvs = scan_blocked_cholesky(Rs_safe)
            L = jax.lax.optimization_barrier(L)
            invR_yB = scan_cho_solve(L, minvs, yB)
        else:
            L = jax.lax.optimization_barrier(
                batched_small_cholesky(Rs_safe, leaf))
            invR_yB = batched_cho_solve(L, yB, leaf)
    invR_y = invR_yB[..., :m]                                       # (G, N, m)
    invR_B = invR_yB[..., m:]                                       # (G, N, p)

    yb = y if per_point_y else y[None]                              # (G|1, N, m)
    ybar = jnp.mean(yb, axis=-1)                                    # (G|1, N)
    invR_ybar = jnp.mean(invR_y, axis=-1)                           # (G, N)

    # --- conjugate updates (reference models.py:169-457), batched over G ---
    df = df0 + N * m
    if disp0_zero:
        center = jnp.broadcast_to(center0, (G, p))                  # (G, p)
    else:
        quad_B = jnp.einsum('np,gnq->gpq', basis, invR_B)           # B^T R^-1 B
        # host-side inverse of the concrete prior is exact (p is tiny)
        disp0_inv = jnp.asarray(np.linalg.inv(disp0_np), dtype=dtype)
        M = disp0_inv[None] + m * quad_B                            # (G, p, p)
        Lm = batched_small_cholesky(M, leaf)
        eye_p = jnp.broadcast_to(jnp.eye(p, dtype=dtype), (G, p, p))
        disp = batched_cho_solve(Lm, eye_p, leaf)                   # (G, p, p)
        factor = (disp0_inv @ center0)[None] \
            + m * jnp.einsum('np,gn->gp', basis, invR_ybar)
        center = jnp.einsum('gpq,gq->gp', disp, factor)

    if df0_inf:
        scale_sq = jnp.full((G,), float(scale0) ** 2, dtype=dtype)
    else:
        y_c = yb - ybar[..., None]                                  # (G|1, N, m)
        invR_yc = invR_y - invR_ybar[..., None]
        quad = jnp.einsum('gnm,gnm->g', jnp.broadcast_to(y_c, invR_yc.shape),
                          invR_yc)
        avg_yc = ybar - (basis @ center0)[None]                     # (G|1, N)
        invR_avg_yc = invR_ybar - jnp.einsum('gnp,p->gn', invR_B, center0)
        avg_b = jnp.broadcast_to(avg_yc, invR_avg_yc.shape)         # (G, N)
        if disp0_zero:
            quad2 = m * jnp.einsum('gn,gn->g', avg_b, invR_avg_yc)
        else:
            # Woodbury form (models.py:440-445):
            # mat = I - ny R^-1 B V B^T;  quad2 = ny avg_yc^T mat R^-1 avg_yc
            u = jnp.einsum('np,gn->gp', basis, invR_avg_yc)         # B^T R^-1 avg
            w = jnp.einsum('gpq,gq->gp', disp, u)                   # V u
            corr = m * jnp.einsum('gnp,gp->gn', invR_B, w)
            quad2 = m * jnp.einsum('gn,gn->g', avg_b, invR_avg_yc - corr)
        scale_sq = (df0 * float(scale0) ** 2 + quad + quad2) / df

    var = scale_sq if df0_inf else df * scale_sq / (df - 2)

    mean = jnp.einsum('np,gp->gn', basis, center)                   # (G, N)
    y_t = yb - mean[..., None]                                      # (G, N, m)
    # alpha = R^{-1} y_t / var; reuse invR_y and the basis solves:
    invR_mean = jnp.einsum('gnp,gp->gn', invR_B, center)
    alpha = (invR_y - invR_mean[..., None]) / var[..., None, None]
    quad_t = jnp.einsum('gnm,gnm->g', jnp.broadcast_to(y_t, alpha.shape),
                        alpha)

    if logdet_R is None:
        logdet_R = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                                 axis=-1)
    logdet_K = N * jnp.log(var) + logdet_R
    lml = -0.5 * (quad_t + m * (logdet_K + N * _LOG_2PI))
    return jnp.where(ok, lml, -jnp.inf)


def cgp_lml_grid2(Rs, Ys, basis, center0, disp0, df0, scale0, leaf=16):
    R"""CGP lml on the outer product of covariance and data grids.

    The reference's joint (Q, ls) posterior loops over both axes in Python
    (correlated_EFT_publication.ipynb cell 53: 8000 full evaluations);
    here each correlation matrix is factorized once and applied to every
    data set with batched GEMMs.

    Parameters
    ----------
    Rs : (T, N, N) — correlation matrices (one per kernel-hyperparameter
        grid point), nugget included
    Ys : (R, N, m) — data sets (one per ratio/expansion-parameter grid
        point)
    basis : (N, p); priors as in :func:`cgp_lml_grid`

    Returns
    -------
    (T, R) log-marginal likelihoods
    """
    Rs = jnp.asarray(Rs)
    Ys = jnp.asarray(Ys)
    basis = jnp.asarray(basis)
    T, N, _ = Rs.shape
    R, _, m = Ys.shape
    p = basis.shape[1]
    dtype = Rs.dtype

    center0 = jnp.atleast_1d(jnp.asarray(center0, dtype=dtype))
    disp0_np = np.atleast_2d(np.asarray(disp0, dtype=float))
    disp0_zero = bool(np.all(disp0_np == 0))
    df0_inf = bool(np.isinf(df0))
    if not disp0_zero:
        raise NotImplementedError(
            'cgp_lml_grid2 currently supports the delta-mean prior '
            '(disp0 = 0), which is what the truncation models use')

    L0 = batched_small_cholesky(Rs, leaf)
    diag = jnp.diagonal(L0, axis1=-2, axis2=-1)
    ok = jnp.all(jnp.isfinite(diag) & (diag > 0), axis=-1)          # (T,)
    eye = jnp.eye(N, dtype=dtype)
    Rs_safe = jax.lax.optimization_barrier(jnp.where(ok[:, None, None], Rs, eye))
    L = jax.lax.optimization_barrier(batched_small_cholesky(Rs_safe, leaf))
    Minv = batched_small_tri_inv(L, leaf)                           # (T, N, N)

    # R_t^{-1} y_r for all pairs, via the inverse factor (two GEMM passes)
    MY = jnp.einsum('tij,rjm->trim', Minv, Ys, precision=_HI)       # (T,R,N,m)
    invR_Y = jnp.einsum('tji,trjm->trim', Minv, MY, precision=_HI)
    MB = jnp.matmul(Minv, basis, precision=_HI)                     # (T, N, p)
    invR_B = jnp.einsum('tji,tjp->tip', Minv, MB, precision=_HI)    # (T, N, p)

    ybar = jnp.mean(Ys, axis=-1)                                    # (R, N)
    invR_ybar = jnp.mean(invR_Y, axis=-1)                           # (T, R, N)

    df = df0 + N * m
    center = center0                                                # (p,)

    if df0_inf:
        scale_sq = jnp.full((T, R), float(scale0) ** 2, dtype=dtype)
    else:
        y_c = Ys - ybar[..., None]                                  # (R, N, m)
        invR_yc = invR_Y - invR_ybar[..., None]
        quad = jnp.einsum('rnm,trnm->tr', y_c, invR_yc)
        avg_yc = ybar - (basis @ center0)[None]                     # (R, N)
        invR_avg_yc = invR_ybar - jnp.einsum('tnp,p->tn', invR_B, center0)[:, None]
        quad2 = m * jnp.einsum('rn,trn->tr', avg_yc, invR_avg_yc)
        scale_sq = (df0 * float(scale0) ** 2 + quad + quad2) / df

    var = scale_sq if df0_inf else df * scale_sq / (df - 2)

    mean = basis @ center                                           # (N,)
    invR_mean = jnp.einsum('tnp,p->tn', invR_B, center)             # (T, N)
    # quad_t = sum_m (y - mean)^T R^-1 (y - mean) / var
    ym = Ys - mean[None, :, None]
    invR_ym = invR_Y - invR_mean[:, None, :, None]
    quad_t = jnp.einsum('rnm,trnm->tr', ym, invR_ym) / var

    logdet_R = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                             axis=-1)                               # (T,)
    logdet_K = N * jnp.log(var) + logdet_R[:, None]
    lml = -0.5 * (quad_t + m * (logdet_K + N * _LOG_2PI))
    return jnp.where(ok[:, None], lml, -jnp.inf)


def csp_lml_grid(Rs, y, basis, center0, disp0, df0, scale0, leaf=16):
    R"""ConjugateStudentProcess evidence for a batch of correlation matrices.

    The marginalized (mean, variance) evidence of reference
    models.py:1184-1273 — the ratio of normal-scaled-inverse-χ² normalizers
    — evaluated batch-first over a hyperparameter grid.

    Parameters/returns as :func:`cgp_lml_grid`.
    """
    from jax.scipy.special import gammaln

    Rs = jnp.asarray(Rs)
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    basis = jnp.asarray(basis)
    G, N, _ = Rs.shape
    m = y.shape[1]
    p = basis.shape[1]
    dtype = Rs.dtype

    center0 = jnp.atleast_1d(jnp.asarray(center0, dtype=dtype))
    disp0_np = np.atleast_2d(np.asarray(disp0, dtype=float))
    disp0_zero = bool(np.all(disp0_np == 0))
    df0_inf = bool(np.isinf(df0))

    L0 = batched_small_cholesky(Rs, leaf)
    diag = jnp.diagonal(L0, axis1=-2, axis2=-1)
    ok = jnp.all(jnp.isfinite(diag) & (diag > 0), axis=-1)
    eye = jnp.eye(N, dtype=dtype)
    Rs_safe = jax.lax.optimization_barrier(jnp.where(ok[:, None, None], Rs, eye))
    L = jax.lax.optimization_barrier(batched_small_cholesky(Rs_safe, leaf))

    yB = jnp.concatenate([y, basis], axis=1)
    invR_yB = batched_cho_solve(L, jnp.broadcast_to(yB[None], (G,) + yB.shape),
                                leaf)
    invR_y = invR_yB[..., :m]
    invR_B = invR_yB[..., m:]
    ybar = jnp.mean(y, axis=1)
    invR_ybar = jnp.mean(invR_y, axis=-1)

    df = df0 + N * m

    # posterior dispersion V (reference models.py:233-278)
    if disp0_zero:
        disp = None
        logdet_disp = None
    else:
        quad_B = jnp.einsum('np,gnq->gpq', basis, invR_B)
        disp0_inv = jnp.asarray(np.linalg.inv(disp0_np), dtype=dtype)
        M = disp0_inv[None] + m * quad_B
        Lm = batched_small_cholesky(M, leaf)
        eye_p = jnp.broadcast_to(jnp.eye(p, dtype=dtype), (G, p, p))
        disp = batched_cho_solve(Lm, eye_p, leaf)
        # log|V| = -log|V0^{-1} + ny B^T R^-1 B|
        logdet_disp = -2.0 * jnp.sum(
            jnp.log(jnp.diagonal(Lm, axis1=-2, axis2=-1)), axis=-1)
        factor = (disp0_inv @ center0)[None] \
            + m * jnp.einsum('np,gn->gp', basis, invR_ybar)
        center = jnp.einsum('gpq,gq->gp', disp, factor)

    # posterior scale (Woodbury form, reference models.py:386-457)
    if df0_inf:
        scale_sq = jnp.full((G,), float(scale0) ** 2, dtype=dtype)
    else:
        y_c = y - ybar[:, None]
        invR_yc = invR_y - invR_ybar[..., None]
        quad = jnp.einsum('nm,gnm->g', y_c, invR_yc)
        avg_yc = ybar - basis @ center0
        invR_avg_yc = invR_ybar - jnp.einsum('gnp,p->gn', invR_B, center0)
        if disp0_zero:
            quad2 = m * jnp.einsum('n,gn->g', avg_yc, invR_avg_yc)
        else:
            u = jnp.einsum('np,gn->gp', basis, invR_avg_yc)
            w = jnp.einsum('gpq,gq->gp', disp, u)
            corr = m * jnp.einsum('gnp,gp->gn', invR_B, w)
            quad2 = m * jnp.einsum('n,gn->g', avg_yc, invR_avg_yc - corr)
        scale_sq = (df0 * float(scale0) ** 2 + quad + quad2) / df

    # normalizer ratio (reference models.py:1241-1258).  df is a concrete
    # Python float, so its gammaln runs on the host: a 0-d device
    # transcendental constant-folds at f32 on this TPU (see CLAUDE.md)
    from scipy.special import gammaln as _gammaln_host

    log_norm_post = float(_gammaln_host(df / 2.)) \
        - df / 2. * jnp.log(df * scale_sq / 2.)
    if not disp0_zero:
        log_norm_post = log_norm_post + 0.5 * (p * _LOG_2PI + logdet_disp)

    from scipy.special import gammaln as gammaln_host

    log_norm_prior = float(gammaln_host(df0 / 2.)
                           - df0 / 2. * np.log(df0 * float(scale0) ** 2 / 2.))
    if not disp0_zero:
        sign, ld0 = np.linalg.slogdet(2 * np.pi * disp0_np)
        log_norm_prior += 0.5 * float(ld0)

    logdet_R = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                             axis=-1)
    lml = log_norm_post - log_norm_prior - m / 2. * (N * _LOG_2PI + logdet_R)
    return jnp.where(ok, lml, -jnp.inf)


def csp_lml_grid2(Rs, Ys, basis, center0, disp0, df0, scale0, leaf=16):
    R"""Student-t evidence on the outer product of covariance and data grids.

    The TP counterpart of :func:`cgp_lml_grid2` (reference
    models.py:1184-1273 over both grid axes).  Delta-mean prior (V0 = 0),
    like the truncation models.
    """
    from jax.scipy.special import gammaln
    from scipy.special import gammaln as gammaln_host

    Rs = jnp.asarray(Rs)
    Ys = jnp.asarray(Ys)
    basis = jnp.asarray(basis)
    T, N, _ = Rs.shape
    R, _, m = Ys.shape
    dtype = Rs.dtype

    center0 = jnp.atleast_1d(jnp.asarray(center0, dtype=dtype))
    disp0_np = np.atleast_2d(np.asarray(disp0, dtype=float))
    if not bool(np.all(disp0_np == 0)):
        raise NotImplementedError('csp_lml_grid2 supports the delta-mean prior')
    if np.isinf(df0):
        raise NotImplementedError('df0 must be finite for the TP evidence')

    L0 = batched_small_cholesky(Rs, leaf)
    diag = jnp.diagonal(L0, axis1=-2, axis2=-1)
    ok = jnp.all(jnp.isfinite(diag) & (diag > 0), axis=-1)
    eye = jnp.eye(N, dtype=dtype)
    Rs_safe = jax.lax.optimization_barrier(jnp.where(ok[:, None, None], Rs, eye))
    L = jax.lax.optimization_barrier(batched_small_cholesky(Rs_safe, leaf))
    Minv = batched_small_tri_inv(L, leaf)

    MY = jnp.einsum('tij,rjm->trim', Minv, Ys, precision=_HI)
    invR_Y = jnp.einsum('tji,trjm->trim', Minv, MY, precision=_HI)
    MB = jnp.matmul(Minv, basis, precision=_HI)
    invR_B = jnp.einsum('tji,tjp->tip', Minv, MB, precision=_HI)

    ybar = jnp.mean(Ys, axis=-1)
    invR_ybar = jnp.mean(invR_Y, axis=-1)

    df = df0 + N * m
    y_c = Ys - ybar[..., None]
    invR_yc = invR_Y - invR_ybar[..., None]
    quad = jnp.einsum('rnm,trnm->tr', y_c, invR_yc)
    avg_yc = ybar - (basis @ center0)[None]
    invR_avg_yc = invR_ybar - jnp.einsum('tnp,p->tn', invR_B, center0)[:, None]
    quad2 = m * jnp.einsum('rn,trn->tr', avg_yc, invR_avg_yc)
    scale_sq = (df0 * float(scale0) ** 2 + quad + quad2) / df

    # df is concrete — host gammaln (0-d device transcendentals fold at f32)
    log_norm_post = float(gammaln_host(df / 2.)) \
        - df / 2. * jnp.log(df * scale_sq / 2.)
    log_norm_prior = float(gammaln_host(df0 / 2.)
                           - df0 / 2. * np.log(df0 * float(scale0) ** 2 / 2.))

    logdet_R = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)),
                             axis=-1)
    lml = log_norm_post - log_norm_prior \
        - m / 2. * (N * _LOG_2PI + logdet_R)[:, None]
    return jnp.where(ok[:, None], lml, -jnp.inf)
