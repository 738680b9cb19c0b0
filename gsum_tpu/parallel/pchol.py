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
(tests/test_parallel.py) and N=8192 — value-only in round 3 (2.5e-10
relative at |lml| ~ 4e9 on a deliberately ill-conditioned RBF grid),
and the FULL MAP FIT in round 5: ``sharded_fit`` at N=8192 (Matern-1.5,
m=2 curves, maxiter=8, ls_steps=5) lands within |dtheta| = 2.0e-6 of
the dense fixed-trip L-BFGS through the identical objective
(linesearch-acceptance noise), with the reported lml self-consistent
against the dense objective at the sharded theta to 6.0e-9 relative
and the two optima's lml values agreeing to 5.5e-9 — shard-vs-dense
f64 accumulation order at this N and conditioning.  (On the 1-core CPU
host the 8-shard emulation is of course slower than the dense solve;
the path exists for real multi-chip meshes where each shard has its
own compute and HBM.)

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

__all__ = ['sharded_cholesky', 'sharded_mvn_lml', 'sharded_kernel_lml',
           'sharded_gram_logdet', 'sharded_cgp_lml', 'sharded_fit']

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


def _fwd_substitute(L_loc, Minv, Z_rep, axis, D):
    """Sharded blocked forward substitution ``L w = Z``.

    Same zero-carry invariant as :func:`_lml_body`: rows of w not yet
    solved are zero, so the full-width local GEMM picks up exactly the
    solved blocks.  Returns the (N, q) solution replicated (varying-typed)
    on every shard.
    """
    Nl, N = L_loc.shape
    q = Z_rep.shape[1]
    my = jax.lax.axis_index(axis)
    _z = jnp.int32(0)
    Z_mine = jax.lax.dynamic_slice(
        Z_rep, (my.astype(jnp.int32) * Nl, _z), (Nl, q))

    def fwd(k, w_all):
        rhs = Z_mine - jnp.matmul(L_loc, w_all, precision=_HI)
        w_mine = jnp.matmul(Minv, rhs, precision=_HI)
        w_k = jax.lax.all_gather(
            jnp.where(my == k, w_mine, jnp.zeros_like(w_mine)), axis)
        w_k = jax.lax.dynamic_index_in_dim(w_k, k, keepdims=False)
        return jax.lax.dynamic_update_slice(
            w_all, w_k, (k.astype(jnp.int32) * jnp.int32(Nl), _z))

    return jax.lax.fori_loop(
        0, D, fwd, jax.lax.pvary(jnp.zeros((N, q), L_loc.dtype), (axis,)))


def _bwd_substitute(L_loc, Minv, w_all, axis, D):
    """Sharded blocked backward substitution ``Lᵀ a = w``.

    Descending shard blocks: at step k every contribution
    ``L_{c,k}ᵀ a_c`` lives on shard c (which owns both its rows of L and,
    replicated, the already-solved rows of a) and is psum-reduced; rows of
    ``a`` not yet solved are zero, and ``L_{c,k}`` is zero for c < k, so
    no masking is needed beyond the zero carry.  Returns (N, q).
    """
    Nl, N = L_loc.shape
    q = w_all.shape[1]
    my = jax.lax.axis_index(axis)
    _z = jnp.int32(0)

    def bwd(t, a_all):
        k = (jnp.int32(D) - 1 - t).astype(jnp.int32)
        s = k * jnp.int32(Nl)
        Lck = jax.lax.dynamic_slice(L_loc, (_z, s), (Nl, Nl))  # my rows, cols k
        a_mine = jax.lax.dynamic_slice(
            a_all, (my.astype(jnp.int32) * Nl, _z), (Nl, q))
        contrib = jax.lax.psum(
            jnp.matmul(Lck.T, a_mine, precision=_HI), axis)    # Σ_c L_{c,k}ᵀ a_c
        w_k = jax.lax.dynamic_slice(w_all, (s, _z), (Nl, q))
        cand = jnp.matmul(Minv.T, w_k - contrib, precision=_HI)
        a_k = jax.lax.psum(
            jnp.where(my == k, cand, jnp.zeros_like(cand)), axis)
        return jax.lax.dynamic_update_slice(a_all, a_k, (s, _z))

    return jax.lax.fori_loop(
        0, D, bwd, jax.lax.pvary(jnp.zeros((N, q), L_loc.dtype), (axis,)))


def _gram_logdet_body(K_loc, Z_rep, axis, D):
    """Factor + forward substitution; returns (Gram, logdet, ok) replicated.

    Gram = Zᵀ K⁻¹ Z is accumulated as a psum of per-shard WᵀW row
    contributions (W = L⁻¹Z), so the output is mesh-invariant without an
    extra collective; logdet and the success flag reduce the same way.
    """
    Nl, N = K_loc.shape
    my = jax.lax.axis_index(axis)
    my32 = my.astype(jnp.int32)
    _z = jnp.int32(0)
    L_loc, Minv = _factor_body(K_loc, axis, D)
    diag_mine = jnp.diagonal(
        jax.lax.dynamic_slice(L_loc, (_z, my32 * Nl), (Nl, Nl)))
    ok_mine = jnp.all(jnp.isfinite(diag_mine) & (diag_mine > 0))
    ok = jax.lax.psum(ok_mine.astype(jnp.int32), axis) == D
    logdet = jax.lax.psum(2.0 * jnp.sum(jnp.log(diag_mine)), axis)
    w = _fwd_substitute(L_loc, Minv, Z_rep, axis, D)       # (N, q)
    w_mine = jax.lax.dynamic_slice(
        w, (my32 * Nl, _z), (Nl, Z_rep.shape[1]))
    gram = jax.lax.psum(
        jnp.matmul(w_mine.T, w_mine, precision=_HI), axis)  # (q, q)
    return gram, logdet, ok


def sharded_gram_logdet(value_fn, theta, X, Z, mesh, axis='model',
                        nugget=0.0):
    R"""``(ZᵀK⁻¹Z, log|K|, ok)`` with K(X;θ) built and factorized ON-SHARD.

    The natural sufficient statistic of every conjugate lml in this
    library: with Z = [y, basis], all quadratic forms (yᵀK⁻¹y, BᵀK⁻¹y,
    BᵀK⁻¹B) and the log-determinant that enter the CGP/CSP evidence
    (reference gsum/models.py:169-457) are small algebra on the returned
    (q, q) Gram matrix — so the model-parallel path only ever
    communicates O(N·Nl) tiles and returns O(q²) values.

    Differentiation: every op inside (shard_map, fori_loop, all_gather,
    psum, cholesky, GEMM) is JVP-transparent, so ``jax.jvp`` works
    directly; for reverse mode use :func:`sharded_cgp_lml`, whose
    custom VJP routes through forward-mode (θ is low-dimensional).

    Parameters
    ----------
    value_fn : (theta, Xa, Xb) -> kernel matrix (the ``Kernel.value_fn``
        protocol); theta : (p,) log-hyperparameters
    X : (N, d) inputs (replicated); Z : (N, q) right-hand sides
    mesh, axis : the model-parallel mesh axis; nugget : on-shard jitter

    Returns
    -------
    gram : (q, q); logdet : scalar; ok : bool — all replicated
    """
    D = mesh.shape[axis]
    X = jnp.atleast_2d(jnp.asarray(X))
    N = X.shape[0]
    _check_divides(N, D)
    Nl = N // D
    Z = jnp.asarray(Z)

    def body(X_rep, Z_rep, theta_rep):
        my = jax.lax.axis_index(axis)
        X_loc = jax.lax.dynamic_slice(
            X_rep, (my.astype(jnp.int32) * Nl, jnp.int32(0)),
            (Nl, X_rep.shape[1]))
        K_loc = value_fn(theta_rep, X_loc, X_rep)          # (Nl, N)
        if nugget:
            r_glob = my * Nl + jnp.arange(Nl)
            K_loc = K_loc + nugget * (
                r_glob[:, None] == jnp.arange(N)[None, :]).astype(K_loc.dtype)
        return _gram_logdet_body(K_loc, Z_rep, axis, D)

    fn = shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                   out_specs=(P(), P(), P()))
    return fn(X, Z, jnp.asarray(theta, dtype=X.dtype))


def _cgp_lml_from_gram(gram, logdet, N, m, center0, disp0_np, df0, scale0):
    """CGP log-marginal likelihood from (Gram = [y,B]ᵀR⁻¹[y,B], log|R|).

    Pure replicated algebra on (m+p, m+p) values — the sharded mirror of
    the conjugate updates in :func:`gsum_tpu.ops.gridlml.cgp_lml_grid`
    (reference gsum/models.py:169-457), against which it is tested exactly.
    """
    dtype = gram.dtype
    disp0_np = np.atleast_2d(np.asarray(disp0_np, dtype=float))
    disp0_zero = bool(np.all(disp0_np == 0))
    df0_inf = bool(np.isinf(df0))
    center0 = jnp.atleast_1d(jnp.asarray(center0, dtype=dtype))
    p = gram.shape[0] - m
    center0 = jnp.broadcast_to(center0, (p,))

    Gyy = gram[:m, :m]
    GBy = gram[m:, :m]                                      # (p, m)
    GBB = gram[m:, m:]
    one = jnp.ones((m,), dtype)
    row_y = GBy @ one                                       # Σ_c BᵀR⁻¹y_c
    sum_yy = one @ (Gyy @ one)
    tr_yy = jnp.trace(Gyy)

    df = df0 + N * m
    if disp0_zero:
        center = center0
        Lm = None
    else:
        disp0_inv = jnp.asarray(np.linalg.inv(disp0_np), dtype=dtype)
        M = disp0_inv + m * GBB
        Lm = jnp.linalg.cholesky(M)
        factor = disp0_inv @ center0 + row_y                # m·BᵀR⁻¹ȳ = GBy·1
        center = jax.scipy.linalg.cho_solve((Lm, True), factor)

    if df0_inf:
        scale_sq = jnp.asarray(float(scale0) ** 2, dtype=dtype)
    else:
        quad = tr_yy - sum_yy / m                           # Σ_c y_cᵀR⁻¹y_c, centered
        # avg_yc = ȳ − B·center0
        s0 = sum_yy / m ** 2 - (2.0 / m) * (center0 @ row_y) \
            + center0 @ (GBB @ center0)
        if disp0_zero:
            quad2 = m * s0
        else:
            u = row_y / m - GBB @ center0                   # BᵀR⁻¹ avg_yc
            w = jax.scipy.linalg.cho_solve((Lm, True), u)   # V u
            quad2 = m * (s0 - m * (u @ w))
        scale_sq = (df0 * float(scale0) ** 2 + quad + quad2) / df

    var = scale_sq if df0_inf else df * scale_sq / (df - 2)
    quad_t = (tr_yy - 2.0 * (center @ row_y)
              + m * (center @ (GBB @ center))) / var
    logdet_K = N * jnp.log(var) + logdet
    return -0.5 * (quad_t + m * (logdet_K + N * _LOG_2PI))


def sharded_cgp_lml(value_fn, theta, X, y, basis, center0, disp0, df0,
                    scale0, mesh, axis='model', nugget=0.0):
    R"""Differentiable CGP log-marginal likelihood at θ, model-parallel in N.

    The large-N leg of the MAP/HMC stack (reference gsum/models.py:812-900
    runs the same objective through one LAPACK potrf): the correlation
    matrix is built and factorized row-sharded over ``mesh[axis]`` (never
    materialized on one device), reduced to the (m+p, m+p) Gram sufficient
    statistic, and finished with replicated conjugate algebra.

    ``jax.grad`` works: the custom VJP computes ∂lml/∂θ by running one
    forward-mode JVP per θ component — p is the kernel's hyperparameter
    count (1–4 in practice), so the backward costs p forward passes with
    the SAME O(D)-sized compiled program as the value (no reverse sweep
    through the factorization loop, whose saved iterates would be O(N²)
    per shard and whose adjoint HLO is what OOM-killed the compile
    service in round 3 — docs/perf.md).

    Parameters mirror :func:`gsum_tpu.ops.gridlml.cgp_lml_grid`:
    y : (N,) or (N, m) curves; basis : (N, p_basis); priors
    (center0, disp0, df0, scale0) as in ConjugateGaussianProcess.

    Returns the scalar lml (−inf if the factorization failed).
    """
    X = jnp.atleast_2d(jnp.asarray(X))
    y2 = jnp.asarray(y)
    if y2.ndim == 1:
        y2 = y2[:, None]
    basis = jnp.asarray(basis)
    N, m = y2.shape
    Z = jnp.concatenate([y2, basis], axis=1)
    theta = jnp.asarray(theta, dtype=X.dtype)
    p = theta.shape[0]

    def impl(th):
        gram, logdet, ok = sharded_gram_logdet(
            value_fn, th, X, Z, mesh, axis=axis, nugget=nugget)
        lml = _cgp_lml_from_gram(gram, logdet, N, m, center0, disp0,
                                 df0, scale0)
        return jnp.where(ok, lml, -jnp.inf)

    @jax.custom_vjp
    def lml_fn(th):
        return impl(th)

    def fwd(th):
        return impl(th), th

    def bwd(th, g):
        # forward-over-reverse: p JVP passes, each the same O(D) program
        # as the value — never a reverse sweep through the panel loop
        eye = np.eye(p)
        tangents = [jax.jvp(impl, (th,), (jnp.asarray(eye[i], th.dtype),))[1]
                    for i in range(p)]
        grad = jnp.stack(tangents) if p else jnp.zeros_like(th)
        # a failed factorization yields NaN tangents; the value is −inf
        # there and callers mask on it — return zeros, not NaNs
        grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
        return (g * grad,)

    lml_fn.defvjp(fwd, bwd)
    return lml_fn(theta)


def sharded_fit(kernel, X, y, basis, center0, disp0, df0, scale0, mesh,
                axis='model', nugget=1e-10, maxiter=50, ls_steps=10,
                theta0=None):
    R"""MAP-fit kernel hyperparameters with the N axis sharded over a mesh.

    The missing half of the model-parallel story through round 3: the
    sharded path could *evaluate* an lml but not fit one.  This drives
    the fixed-trip bounded L-BFGS (``optimize.fixed_lbfgs_bounded``, the
    TPU-safe engine) on ``-sharded_cgp_lml`` — gradient via the
    forward-mode custom VJP, so the whole optimization is one jitted
    program whose compiled size is O(1) in N and in the shard count.

    Replaces, at N beyond one chip's budget, the reference's
    ``fmin_l_bfgs_b`` fit (gsum/models.py:884-900).

    Parameters
    ----------
    kernel : a ``gsum_tpu.kernels`` kernel — supplies ``value_fn``,
        the log-θ starting point, and log-bounds
    X, y, basis, priors, mesh, axis, nugget : as in
        :func:`sharded_cgp_lml`
    theta0 : optional (p,) log-θ start overriding ``kernel.theta``

    Returns
    -------
    (theta_opt, lml_opt) : optimal log-hyperparameters and the lml there
    """
    from ..optimize import fixed_lbfgs_bounded

    value_fn = kernel.value_fn
    th0 = jnp.asarray(kernel.theta if theta0 is None else theta0,
                      dtype=jnp.result_type(float))
    bounds = np.asarray(kernel.bounds, dtype=float).reshape(-1, 2)

    def neg(th):
        return -sharded_cgp_lml(value_fn, th, X, y, basis, center0,
                                disp0, df0, scale0, mesh, axis=axis,
                                nugget=nugget)

    theta_opt, f_opt = fixed_lbfgs_bounded(
        neg, th0, bounds[:, 0], bounds[:, 1], maxiter=maxiter,
        ls_steps=ls_steps)
    return theta_opt, -f_opt


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
