R"""Sharded batched fits and hyperparameter-grid likelihood sweeps.

The reference's large-scale patterns are Python loops: a (Q, ls) grid of
8000 full log-marginal-likelihood evaluations
(reference: docs/notebooks/correlated_EFT_publication.ipynb cell 53) and
per-observable refits in the KL diagnostic (diagnostics.py:527-555).  Here
they are single jitted programs: ``vmap`` over the batch dimension, sharded
over the mesh's ``'batch'`` axis with ``jax.jit`` + ``NamedSharding`` so XLA
lays the work across chips and inserts any needed collectives.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import _config  # noqa: F401
from .. import conjugate as _conj
from ..linalg import logdet_sqrt, solve_sqrt
from ..models import ConjugateGaussianProcess
from ..optimize import (fixed_lbfgs_bounded,
                        fixed_lbfgs_bounded_batched, jit_lbfgs_bounded)

__all__ = ['batched_fit', 'batched_predict', 'batched_posterior_at',
           'batched_lml_grid', 'truncation_lml_grid',
           'pointwise_evidence_grid', 'make_lml_fn', 'BatchedPosterior']

_np_log_2pi = float(np.log(2 * np.pi))


def _sc_gammaln(x):
    from scipy.special import gammaln
    return gammaln(x)


def _check_mesh_batch(B, mesh, where):
    """A batch NamedSharding needs B divisible by the 'batch' axis size —
    XLA refuses ragged shards.  Fail with the fix instead of a jit error."""
    n = mesh.shape['batch']
    if B % n:
        raise ValueError(
            f'{where}: batch size {B} is not divisible by the mesh '
            f"'batch' axis size {n}; pad the batch (e.g. repeat the last "
            f'row) or drop mesh= to run unsharded')


def make_lml_fn(kernel, center=0, disp=0, df=1, scale=1, nugget=1e-10,
                decomposition='cholesky', chol_fn=None):
    """Pure lml function ``(theta, X, y2d, basis) -> scalar`` for a kernel
    structure and concrete priors (the jit/vmap-able core of CGP)."""
    frozen = kernel.clone()
    return ConjugateGaussianProcess._make_lml_fn(
        frozen.value_fn, nugget, decomposition,
        np.atleast_1d(center), np.atleast_2d(disp), df, scale,
        chol_fn=chol_fn)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class BatchedPosterior:
    """Posterior state for a batch of conjugate-GP fits (an immutable pytree).

    Frozen so field writes cannot silently diverge from the registered
    flatten order — construct once with final values.
    """
    theta: Any
    lml: Any
    center: Any
    disp: Any
    df: Any
    scale_sq: Any
    cov_factor: Any
    chol: Any

    def tree_flatten(self):
        return ((self.theta, self.lml, self.center, self.disp, self.df,
                 self.scale_sq, self.cov_factor, self.chol), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _resolve_basis(basis, X):
    """Basis matrix at X: ``None`` → constant ones (the reference default);
    a callable is evaluated at X; an array is used as-is."""
    if basis is None:
        return jnp.ones((X.shape[0], 1), dtype=X.dtype)
    if callable(basis):
        return jnp.asarray(basis(X), dtype=X.dtype)
    b = jnp.asarray(basis, dtype=X.dtype)
    if b.shape[0] != X.shape[0]:
        raise ValueError('basis matrix has %d rows, expected %d'
                         % (b.shape[0], X.shape[0]))
    return b


# Compiled grid evaluators, keyed by kernel structure + priors so repeated
# sweeps (and sweeps from short-lived wrappers) reuse one executable —
# re-wrapping in a fresh jax.jit per call would retrace every time.
_GRID_FN_CACHE = {}


def _get_grid_fn(kernel, center, disp, df, scale, nugget, grid_engine,
                 mxu_precision=None):
    """Compiled grid evaluator; ``grid_engine`` is 'unrolled', 'scan',
    or None (the vmapped scalar lml)."""
    c0 = np.atleast_1d(center)
    V0 = np.atleast_2d(disp)
    key = (kernel.structure_key(), c0.tobytes(), V0.tobytes(), float(df),
           float(scale), float(nugget), grid_engine, str(mxu_precision))
    fn = _GRID_FN_CACHE.get(key)
    if fn is not None:
        return fn

    frozen = kernel.clone()
    if grid_engine is not None:
        from ..ops.gridlml import cgp_lml_grid

        def raw(ths, X, y2, basis):
            N = X.shape[0]
            Rs = jax.vmap(lambda th: frozen.value_fn(th, X, None))(ths)
            Rs = Rs + nugget * jnp.eye(N, dtype=Rs.dtype)
            # materialize Rs so XLA cannot fuse the covariance build into
            # every slice consumer of the blocked factorization
            Rs = jax.lax.optimization_barrier(Rs)
            return cgp_lml_grid(Rs, y2, basis, c0, V0, df, scale,
                                engine=grid_engine,
                                mxu_precision=mxu_precision)
    else:
        lml = make_lml_fn(kernel, center, disp, df, scale, nugget)

        def raw(ths, X, y2, basis):
            return jax.vmap(lambda th: lml(th, X, y2, basis))(ths)

    fn = jax.jit(raw)
    _GRID_FN_CACHE[key] = fn
    return fn


def batched_lml_grid(kernel, X, y, thetas, center=0, disp=0, df=1, scale=1,
                     nugget=1e-10, mesh=None, basis=None, engine='auto',
                     precision='f64', top_k=64, mxu_precision=None):
    R"""Log-marginal likelihood over a grid of kernel hyperparameters.

    For N <= 256 this runs the explicitly-batched evaluator
    (``ops.gridlml.cgp_lml_grid``): only the covariance build is vmapped;
    factorization, solves, and conjugate updates are batch-leading tensor
    ops (XLA's native batched Cholesky/TRSM are latency-bound far below
    peak in that regime — 150-180x at f32, docs/perf.md).  From N=257 to
    1024 the same evaluator runs on the scan-based factorization
    (``ops.scanchol``: O(1) compile size at ~6x the factorization FLOPs
    — the unrolled engine's HLO OOM-kills the remote compile service at
    N=512).  Above that, float32 sweeps on TPU use the blocked
    GEMM-dominated engine (``ops.blockchol`` — the 13.4 TF/s headline
    factorization); anything else falls back to the vmapped scalar lml.
    ``engine`` ('auto' | 'grid' | 'scan' | 'blocked' | 'scalar')
    overrides.

    Parameters
    ----------
    kernel : Kernel — fixes the structure; ``thetas`` supplies the values
    X : (N, d) inputs; y : (N,) or (N, m) data
    thetas : (G, n_params) grid of log-parameter vectors
    mesh : jax.sharding.Mesh, optional — shard the grid over the 'batch' axis
    basis : None | callable | (N, q) array — mean basis (None = constant
        ones, the reference default); ``center``/``disp`` must be shaped
        for q basis columns
    precision : 'f64' | 'f32' | 'mixed' — arithmetic width.  Emulated f64
        multiplies run ~30x slower than f32 on this TPU (docs/perf.md), so
        'mixed' sweeps the whole grid at f32 and re-evaluates the f32
        top-``top_k`` points at f64: those entries are *exactly* the f64
        values.  Error bound: an f32 lml carries ~eps32·κ(R_θ) relative
        error (κ bounded by λmax/nugget), so off-peak entries at
        ill-conditioned θ (long length scales, tiny nuggets) can be
        visibly off while the peak region — where the posterior mass is,
        and where κ is moderate — is both f32-ranked correctly and
        f64-polished.  Use 'mixed' whenever the grid feeds a MAP choice
        or a peak-region posterior; keep 'f64' when the far tails of the
        surface must be quadrature-grade.
    top_k : int — number of best f32 points polished at f64 in 'mixed'
    mxu_precision : None (= 'highest') | 'high' — MXU precision of the
        *blocked* engine's GEMMs; 'high' (bf16x3) is 13% faster at ~1e-3
        relative lml error (docs/perf.md round 3) — for sweeps feeding a
        MAP choice, not for reported evidences

    Returns
    -------
    (G,) array of log-marginal likelihoods
    """
    if precision not in ('f64', 'f32', 'mixed'):
        raise ValueError("precision must be 'f64', 'f32', or 'mixed'")
    if precision == 'mixed':
        vals32 = batched_lml_grid(kernel, X, y, thetas, center, disp, df,
                                  scale, nugget, mesh, basis, engine,
                                  precision='f32',
                                  mxu_precision=mxu_precision)
        thetas = jnp.asarray(thetas)
        G = thetas.shape[0]
        k = min(int(top_k), G)
        idx = np.argsort(np.asarray(vals32))[-k:]
        vals64 = batched_lml_grid(kernel, X, y, thetas[idx], center, disp,
                                  df, scale, nugget, mesh, basis, engine,
                                  precision='f64')
        out = jnp.asarray(np.asarray(vals32),
                          dtype=jnp.result_type(float))
        return out.at[jnp.asarray(idx)].set(jnp.asarray(vals64, out.dtype))
    if precision == 'f32':
        X = jnp.asarray(np.asarray(X), dtype=jnp.float32)
        y = jnp.asarray(np.asarray(y), dtype=jnp.float32)
        thetas = jnp.asarray(np.asarray(thetas), dtype=jnp.float32)

    X = jnp.atleast_2d(jnp.asarray(X))
    y = jnp.asarray(y)
    y2 = y[:, None] if y.ndim == 1 else y
    basis = _resolve_basis(basis, X)
    thetas = jnp.asarray(thetas)
    N = X.shape[0]

    if engine not in ('auto', 'grid', 'scan', 'blocked', 'scalar'):
        raise ValueError(
            "engine must be 'auto', 'grid', 'scan', 'blocked', or 'scalar'")
    if engine == 'auto':
        # forward-only sweep: above the scan engine's range, large f32
        # batches on TPU go to the blocked engine (the 13.4 TF/s headline
        # factorization); f64 stays on the vmapped scalar lml (every
        # engine is emulated-f64 bound there)
        blocked_ok = (jnp.result_type(X.dtype, y.dtype) == jnp.float32
                      and jax.default_backend() == 'tpu')
        grid_engine = ('unrolled' if N <= 256
                       else 'scan' if N <= 1024
                       else 'blocked' if blocked_ok else None)
    else:
        grid_engine = {'grid': 'unrolled', 'scan': 'scan',
                       'blocked': 'blocked', 'scalar': None}[engine]
    fn = _get_grid_fn(kernel, center, disp, df, scale, nugget, grid_engine,
                      mxu_precision=mxu_precision)
    if mesh is not None:
        _check_mesh_batch(thetas.shape[0], mesh, 'batched_lml_grid')
        thetas = jax.device_put(thetas, NamedSharding(mesh, P('batch')))
    return fn(thetas, X, y2, basis)


def _fit_one(lml_fn, value_fn, theta0, lower, upper, X, y2, basis,
             center0, disp0, df0, scale0, nugget, maxiter):
    """MAP-optimize theta and compute the conjugate posterior for one fit."""
    # The optimizer runs at the canonical float width (optax linesearch
    # state dtypes); the model math runs at the data's dtype.
    opt_dtype = jnp.result_type(float)

    def neg(th):
        return -lml_fn(th.astype(X.dtype), X, y2, basis)

    # fixed-trip L-BFGS: no while_loop (large vmapped while loops have
    # crashed this TPU runtime) and the backtracking linesearch vectorizes
    theta_opt, neg_min = fixed_lbfgs_bounded(neg, theta0.astype(opt_dtype),
                                             lower.astype(opt_dtype),
                                             upper.astype(opt_dtype),
                                             maxiter=maxiter)
    theta_opt = theta_opt.astype(X.dtype)

    R = value_fn(theta_opt, X, None)
    N = X.shape[0]
    R_reg = R + nugget * jnp.eye(N, dtype=R.dtype)
    L = jnp.linalg.cholesky(R_reg)

    center = _conj.compute_center(y2, L, basis, center0, disp0)
    disp = _conj.compute_disp(y2, L, basis, disp0)
    df = _conj.compute_df(y2, df0)
    scale_sq = _conj.compute_scale_sq(y2, L, basis, center0, disp0, df0, scale0)
    cov_factor = _conj.compute_cov_factor(scale_sq, df)
    return BatchedPosterior(theta=theta_opt, lml=-neg_min, center=center,
                            disp=disp, df=jnp.asarray(df, dtype=R.dtype),
                            scale_sq=scale_sq, cov_factor=cov_factor, chol=L)


def batched_fit(kernel, X, y_batch, center=0, disp=0, df=1, scale=1,
                nugget=1e-10, maxiter=100, theta0=None, mesh=None,
                n_restarts=0, seed=0, chunk=128, basis=None, engine='auto',
                ls_steps=10, precision='f64', polish_iters=4,
                mxu_precision=None):
    R"""MAP-fit a ConjugateGaussianProcess independently to each batch element.

    Replaces Python loops of ``gp.fit`` (e.g. the KL diagnostic's 1000
    refits, reference diagnostics.py:527-555) with one jitted, vmapped, and
    optionally mesh-sharded program.

    Parameters
    ----------
    kernel : Kernel — structure + initial theta + bounds
    X : (N, d) shared inputs
    y_batch : (B, N) or (B, N, m) — independent data sets
    mesh : optional Mesh — shard B over the 'batch' axis
    n_restarts : int — additional log-uniform restart points per fit
        (the vmapped analog of the reference's ``n_restarts_optimizer``,
        models.py:649-660); the restart fan runs as one extra vmap axis
        and the best optimum per fit is selected on device.
    seed : int — PRNG seed for the restart draws
    chunk : int or None — evaluate at most this many fits per device call
        (the tunneled TPU runtime here kills executions that run too long;
        chunking also bounds memory).  One compile serves all chunks.
    engine : 'auto' | 'grid' | 'scan' | 'blocked' | 'scalar' — lml
        engine for the wide lockstep objective.  'grid' is the
        explicitly-batched evaluator (fastest below N~256 but its
        unrolled forward+adjoint HLO grows with N until compilation
        becomes impractical); 'scan' is the same evaluator on the
        scan-based factorization (``ops.scanchol``: O(1) compile size,
        ~6x factorization FLOPs); 'blocked' runs it on the 13.4 TF/s
        blocked factorization (``ops.blockchol``, differentiable via
        custom VJPs — the large-N f32 engine); 'scalar' is the vmapped
        scalar lml (XLA batched Cholesky).  'auto' picks 'grid' for
        N <= 192, 'scan' to N <= 640, 'scalar' to N <= 1024 (measured
        3x faster than blocked there — XLA's native Cholesky adjoint
        beats the blocked custom VJP at mid-size N), 'blocked' for f32
        on TPU up to N = 2048 (the scalar linesearch OOMs HBM at that
        size; the blocked objective is leaner and runs), and 'scalar'
        otherwise (above that the optimizer adjoint of the blocked
        objective exceeds the remote compile service's limits;
        docs/perf.md).
    ls_steps : int — linesearch trial points per L-BFGS iteration.  Every
        trial's covariance build + factorization is live simultaneously
        (ls_steps x chunk matrices), so lower this together with ``chunk``
        at very large N to fit HBM (e.g. chunk=1, ls_steps=5 at N=4096).
    basis : None | callable | (N, q) array — mean basis shared by every fit
        (None = constant ones, the reference default); ``center``/``disp``
        must match its column count

    precision : 'f64' | 'f32' | 'mixed' — 'mixed' runs the whole lockstep
        L-BFGS sweep (restarts included) at f32 — ~30x cheaper per
        multiply than emulated f64 on this TPU — then polishes each fit
        with ``polish_iters`` f64 L-BFGS steps started from its own f32
        optimum and computes the final posterior state at f64.  The f32
        optimum is within ~sqrt(eps32)≈3e-4 of the f64 MAP in theta for
        well-conditioned objectives, which the f64 polish then closes;
        single-device path only.
    polish_iters : int — f64 polish steps per fit in 'mixed'.  Each
        polish step costs the same as a full-f64 sweep step, so this
        stays SMALL: the f32 sweep has already located the basin and
        the polish only closes the f32->f64 gap (the old default of 15
        made the polish alone longer than the f64 sweep it was meant
        to avoid — 2218 s vs the f64 sweep's 1402 s on the 10,240-fit
        N=128 workload; 4 measures 1511 s).  NOTE the measured domain
        caveat (docs/perf.md scale table): at latency/compile-bound
        sizes like N=128 'mixed' does NOT pay — its two programs double
        the fixed compile + per-chunk dispatch costs that dominate
        there.  The recipe's domain is compute-bound N (>= ~1024),
        where the ~30x emulated-f64 multiply tax is the bottleneck.
    mxu_precision : None (= 'highest') | 'high' — MXU precision of the
        *blocked* engine's objective GEMMs (ignored by the other
        engines).  'high' (bf16x3) measures 13% faster at ~1e-3 relative
        lml error (docs/perf.md round 3); the MAP argmax is robust to
        that (the objective is flat to ~1e-3 near its top — see the
        engine-spread note in docs/perf.md), and under ``precision=
        'mixed'`` the f64 polish removes it from the final state

    Returns
    -------
    BatchedPosterior with leading batch dimension B
    """
    if precision not in ('f64', 'f32', 'mixed'):
        raise ValueError("precision must be 'f64', 'f32', or 'mixed'")
    if precision == 'mixed':
        if mesh is not None:
            raise ValueError("precision='mixed' is single-device only "
                             "(shard the f32 sweep and polish separately)")
        post32 = batched_fit(kernel, np.asarray(X, dtype=np.float32),
                             np.asarray(y_batch, dtype=np.float32),
                             center, disp, df, scale, nugget, maxiter,
                             theta0, None, n_restarts, seed, chunk, basis,
                             engine, ls_steps, precision='f32',
                             mxu_precision=mxu_precision)
        dtype64 = jnp.result_type(float)
        X64 = jnp.atleast_2d(jnp.asarray(X, dtype=dtype64))
        y64 = jnp.asarray(y_batch, dtype=dtype64)
        if y64.ndim == 2:
            y64 = y64[:, :, None]
        basis64 = _resolve_basis(basis, X64)
        bounds = np.asarray(kernel.bounds, dtype=float)
        t0_pf = jnp.asarray(np.asarray(post32.theta), dtype=dtype64)
        return _batched_fit_wide(
            kernel.clone(), X64, y64, basis64, t0_pf[:1], # starts unused
            jnp.asarray(bounds[:, 0], dtype64),
            jnp.asarray(bounds[:, 1], dtype64),
            np.atleast_1d(center), np.atleast_2d(disp), df, scale, nugget,
            polish_iters, chunk, engine, ls_steps, t0_per_fit=t0_pf)
    if precision == 'f32':
        X = np.asarray(X, dtype=np.float32)
        y_batch = np.asarray(y_batch, dtype=np.float32)

    lml = make_lml_fn(kernel, center, disp, df, scale, nugget)
    frozen = kernel.clone()
    X = jnp.atleast_2d(jnp.asarray(X))
    y_batch = jnp.asarray(y_batch)
    if y_batch.ndim == 2:
        y_batch = y_batch[:, :, None]
    basis = _resolve_basis(basis, X)

    dtype = jnp.result_type(X.dtype, float)
    if theta0 is None:
        theta0 = jnp.asarray(kernel.theta, dtype=dtype)
    bounds = np.asarray(kernel.bounds, dtype=float)
    lower = jnp.asarray(bounds[:, 0], dtype=dtype)
    upper = jnp.asarray(bounds[:, 1], dtype=dtype)

    c0 = np.atleast_1d(center)
    V0 = np.atleast_2d(disp)

    if n_restarts > 0:
        if not np.all(np.isfinite(bounds)):
            raise ValueError('n_restarts > 0 requires finite bounds')
        key = jax.random.PRNGKey(seed)
        extra = jax.random.uniform(
            key, (n_restarts, theta0.shape[0]), dtype=dtype,
            minval=lower, maxval=upper)
        starts = jnp.concatenate([theta0[None], extra], axis=0)
    else:
        starts = theta0[None]

    if mesh is not None:
        _check_mesh_batch(y_batch.shape[0], mesh, 'batched_fit')

        def one(y2):
            def from_start(t0):
                return _fit_one(lml, frozen.value_fn, t0, lower, upper, X, y2,
                                basis, c0, V0, df, scale, nugget, maxiter)
            posts = jax.vmap(from_start)(starts)
            best = jnp.argmax(posts.lml)
            return jax.tree_util.tree_map(lambda a: a[best], posts)

        fn = jax.jit(jax.vmap(one),
                     in_shardings=NamedSharding(mesh, P('batch')))
        y_batch = jax.device_put(y_batch, NamedSharding(mesh, P('batch')))
        return fn(y_batch)

    # Single-device engine: lockstep batched L-BFGS over a *wide* objective
    # — every linesearch trial for every fit is one call of the explicitly-
    # batched grid-lml evaluator, which is ~100x the vmapped scalar path at
    # these matrix sizes.
    return _batched_fit_wide(frozen, X, y_batch, basis, starts, lower, upper,
                             c0, V0, df, scale, nugget, maxiter, chunk,
                             engine, ls_steps, mxu_precision=mxu_precision)


def _auto_fit_engine(dtype, N, backend):
    """Measured engine routing for the lockstep MAP-fit objective
    (benchmarks/fit_engines_tpu.py; docs/perf.md round-3 table).

    Returns the internal grid-engine name, or None for the vmapped
    scalar lml:

    - N <= 192: 'unrolled' — the explicitly-batched evaluator (XLA's
      batched small-N Cholesky is latency-bound ~20x slower), whose
      forward+adjoint HLO however grows with N until the remote compile
      service grinds or is OOM-killed (observed at N=256);
    - N <= 640: 'scan' — same formulation at O(1) compile size;
    - N <= 1024: scalar — XLA's batched Cholesky + native adjoint wins
      outright here: B=4 N=1024 ls_steps=10 fits measure 14.0 s warm /
      100 s cold vs the blocked engine's 43.5 s / 694 s (the blocked
      custom-VJP adjoint — two blocked N-RHS triangular solves plus a
      full GEMM — is ~9x the forward FLOPs);
    - 1024 < N <= 8192, f32 on TPU: 'blocked'.  At N=2048 the scalar
      objective's linesearch materializes ls_steps*chunk (N, N)
      covariance temps at once and OOMs the 16 GB HBM (measured 15.8 GB
      program) while the blocked objective runs (95.9 s warm, B=4).
      Past 2048 the round-4 fused solve+logdet custom VJP made the
      blocked optimizer adjoint compile where the old
      factorization-internals adjoint SIGKILLed the compile service:
      measured round 5, N=4096 B=8 ls_steps=10 chunk=4 runs 449.9 s
      cold / 106.0 s warm vs the scalar fallback's 785.9 s
      (chunk=1, ls_steps=5 — its HBM-capped configuration), and
      N=8192 B=2 chunk=2 completes (see docs/perf.md fit-engine
      table);
    - above (and all f64): scalar with chunk/ls_steps shrunk to fit
      HBM (the blocked driver's unrolled HLO exceeds the compile
      service's limits at N=16k, docs/perf.md).
    """
    if N <= 192:
        return 'unrolled'
    if N <= 640:
        return 'scan'
    if N <= 1024:
        return None
    if N <= 8192 and dtype == jnp.float32 and backend == 'tpu':
        return 'blocked'
    return None


def _scalar_chunk_cap(N, ls_steps, dtype):
    """HBM-aware chunk bound for the vmapped-scalar fit objective.

    The scalar objective's lockstep linesearch keeps ls_steps*chunk
    covariance builds + factorizations live at once — measured ~24
    (N, N)-sized temps per live element (ls_steps=10 x chunk=2 at N=4096
    f32 wanted ~32 GB HBM; docs/perf.md), so the default chunk=128 OOMs
    the 16 GB chip from N≈1500 up, and the f64 polish leg of
    ``precision='mixed'`` doubles the bytes at exactly the sizes the
    blocked f32 window hands it.  Budget a ~12 GB working set; callers
    only shrink (an explicit smaller chunk is always respected).
    """
    live_bytes = 24 * N * N * jnp.dtype(dtype).itemsize * max(ls_steps, 1)
    return max(1, int(12e9 // live_bytes))


def _batched_fit_wide(frozen, X, y_batch, basis, starts, lower, upper,
                      c0, V0, df0, scale0, nugget, maxiter, chunk,
                      engine='auto', ls_steps=10, t0_per_fit=None,
                      mxu_precision=None):
    from ..ops.gridlml import cgp_lml_grid
    from .. import conjugate as _conj2

    B, N, m = y_batch.shape
    Rstarts = starts.shape[0]
    dtype = X.dtype

    if engine not in ('auto', 'grid', 'scan', 'blocked', 'scalar'):
        raise ValueError(
            "engine must be 'auto', 'grid', 'scan', 'blocked', or 'scalar'")
    if engine == 'auto':
        grid_engine = _auto_fit_engine(dtype, N, jax.default_backend())
    else:
        grid_engine = {'grid': 'unrolled', 'scan': 'scan',
                       'blocked': 'blocked', 'scalar': None}[engine]
    use_grid_engine = grid_engine is not None
    # block=128 is the throughput optimum (docs/perf.md) and, with the
    # round-4 fused solve+logdet custom VJP, also the compile- and
    # VMEM-safe choice under the L-BFGS adjoint: the round-3 block=256
    # widening (an HLO-size mitigation for the old
    # factorization-internals adjoint) tipped the 16M scoped-VMEM limit
    # inside the linesearch program at N=4096 (16.37M measured).
    fit_block = None
    if not use_grid_engine:
        scalar_lml = ConjugateGaussianProcess._make_lml_fn(
            frozen.value_fn, nugget, 'cholesky', c0, V0, df0, scale0)
        if jax.default_backend() == 'tpu' and chunk is not None:
            chunk = min(chunk, _scalar_chunk_cap(N, ls_steps, dtype))
    elif grid_engine == 'blocked' and jax.default_backend() == 'tpu' \
            and chunk is not None:
        # VMEM cap for the blocked engine's Pallas diagonal kernel: the
        # linesearch keeps ls_steps*chunk problems live, and
        # chol_inv_block's scoped-VMEM stack grows with that batch —
        # measured at N=4096 block=128: batch 40 fits, batch 80 wants
        # 16.89M against the 16M scoped limit.  Cap at the measured-safe
        # 40 live blocks (benchmarks/fit_engines_tpu.py round 5).
        chunk = min(chunk, max(1, 40 // max(ls_steps, 1)))

    def run_chunk(Ys, T0):
        def fun_b(Thetas):
            # the lockstep linesearch widens the leading axis to
            # (ls_steps * B): trial l of fit b sits at index l*B + b, so the
            # data tiles to match
            reps = Thetas.shape[0] // Ys.shape[0]
            Ys_full = jnp.tile(Ys, (reps, 1, 1)) if reps > 1 else Ys
            if not use_grid_engine:
                return -jax.vmap(
                    lambda th, y2: scalar_lml(th.astype(dtype), X, y2,
                                              basis))(Thetas, Ys_full)
            Rs = jax.vmap(lambda th: frozen.value_fn(th.astype(dtype), X,
                                                     None))(Thetas)
            Rs = Rs + nugget * jnp.eye(N, dtype=Rs.dtype)
            Rs = jax.lax.optimization_barrier(Rs)
            return -cgp_lml_grid(Rs, Ys_full, basis, c0, V0, df0, scale0,
                                 engine=grid_engine, block=fit_block,
                                 mxu_precision=mxu_precision)

        topt, fmin = fixed_lbfgs_bounded_batched(fun_b, T0, lower, upper,
                                                 maxiter=maxiter,
                                                 ls_steps=ls_steps)
        topt = topt.astype(dtype)

        def posterior(theta, y2):
            R = frozen.value_fn(theta, X, None)
            L = jnp.linalg.cholesky(R + nugget * jnp.eye(N, dtype=R.dtype))
            center = _conj2.compute_center(y2, L, basis, c0, V0)
            disp = _conj2.compute_disp(y2, L, basis, V0)
            dfp = _conj2.compute_df(y2, df0)
            scale_sq = _conj2.compute_scale_sq(y2, L, basis, c0, V0, df0,
                                               scale0)
            cov_factor = _conj2.compute_cov_factor(scale_sq, dfp)
            return {'theta': theta, 'center': center, 'disp': disp,
                    'df': jnp.asarray(dfp, dtype=R.dtype),
                    'scale_sq': scale_sq, 'cov_factor': cov_factor, 'chol': L}

        parts = jax.vmap(posterior)(topt, Ys)
        # construct once with the final lml — BatchedPosterior is frozen
        return BatchedPosterior(lml=-fmin, **parts)

    run = jax.jit(run_chunk)

    # fold restarts into the batch axis; t0_per_fit (the mixed-precision
    # polish) gives every fit its own start instead
    if t0_per_fit is not None:
        Rstarts = 1
        Ys_all = y_batch
        T0_all = jnp.asarray(t0_per_fit)
    elif Rstarts > 1:
        Ys_all = jnp.repeat(y_batch, Rstarts, axis=0)
        T0_all = jnp.tile(starts, (B, 1))
    else:
        Ys_all = y_batch
        T0_all = jnp.broadcast_to(starts[0][None], (B, starts.shape[1]))
    T0_all = T0_all.astype(jnp.result_type(float))

    total = Ys_all.shape[0]
    if chunk is None or total <= chunk:
        posts = run(Ys_all, T0_all)
    else:
        pads = (-total) % chunk
        if pads:
            Ys_all = jnp.concatenate([Ys_all, Ys_all[:pads]], axis=0)
            T0_all = jnp.concatenate([T0_all, T0_all[:pads]], axis=0)
        outs = [run(Ys_all[i:i + chunk], T0_all[i:i + chunk])
                for i in range(0, Ys_all.shape[0], chunk)]
        posts = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        posts = jax.tree_util.tree_map(lambda a: a[:total], posts)

    if Rstarts > 1:
        def pick(a):
            a = a.reshape((B, Rstarts) + a.shape[1:])
            lml_r = posts.lml.reshape(B, Rstarts)
            best = jnp.argmax(lml_r, axis=1)
            return a[jnp.arange(B), best]
        posts = jax.tree_util.tree_map(pick, posts)
    return posts


def truncation_lml_grid(kernel, X, y, orders, ratios, thetas, ref=1,
                        center=0, disp=0, df=1, scale=1, nugget=1e-10,
                        excluded=None, process='gp'):
    R"""Joint (ratio, kernel-hyperparameter) log-likelihood surface.

    The reference computes this with a nested Python loop of full
    ``TruncationProcess.log_marginal_likelihood`` evaluations — 8000 of
    them for the publication's (Q, ls) posterior
    (correlated_EFT_publication.ipynb cell 53; reference models.py:1485-1507).
    Here the whole surface is one device program: coefficients are
    extracted for every ratio at once, each correlation matrix is
    factorized once, and every (theta, ratio) pair is evaluated with
    batched GEMMs, including the change-of-variables determinant.

    Parameters
    ----------
    kernel : Kernel — structure for theta
    X : (N, d); y : (N, n_orders) partial sums
    orders : (n_orders,) int array
    ratios : (R,) scalars or (R, N) per-point expansion parameters
    thetas : (T, n_params) log-parameter grid
    ref : scalar or (N,) reference scale
    excluded : orders excluded from the coefficient process

    The coefficient process uses the constant-ones mean basis (the only
    basis the reference's truncation models use); for a custom basis,
    evaluate :func:`batched_lml_grid` on pre-extracted coefficients.

    Returns
    -------
    (T, R) array: log p(y | theta_t, ratio_r)
    """
    from ..ops.gridlml import cgp_lml_grid2, csp_lml_grid2

    if process not in ('gp', 'tp'):
        raise ValueError("process must be 'gp' or 'tp'")
    grid2 = cgp_lml_grid2 if process == 'gp' else csp_lml_grid2

    X = jnp.atleast_2d(jnp.asarray(X))
    y = jnp.asarray(y)
    N = X.shape[0]
    orders = np.asarray(orders)
    mask = ~np.isin(orders, excluded)
    orders_in = orders[mask]
    n_in = len(orders_in)

    ratios = jnp.asarray(ratios, dtype=y.dtype)
    if ratios.ndim == 1:
        ratios = jnp.broadcast_to(ratios[:, None], (ratios.shape[0], N))
    ref_vec = jnp.broadcast_to(jnp.asarray(ref, dtype=y.dtype), (N,))
    thetas = jnp.asarray(thetas)

    c0 = np.atleast_1d(center)
    V0 = np.atleast_2d(disp)
    frozen = kernel.clone()
    mask_j = jnp.asarray(np.nonzero(mask)[0])
    orders_j = jnp.asarray(orders, dtype=y.dtype)

    def fn(ths, rats, Xa, ya, refv):
        # N comes from the traced argument, NOT the enclosing scope: the
        # jitted closure is cached by (structure, priors, orders) and
        # retraces on new input shapes — a closed-over Python N would be
        # baked in from the first call and break every later call at a
        # different data size (caught by the full suite: a (T, 15, 15)
        # grid adding the first caller's eye(12))
        Nl = Xa.shape[0]
        # coefficient extraction for every ratio (reference helpers.py:71-101)
        diffs = jnp.concatenate([ya[:, :1], jnp.diff(ya, axis=-1)], axis=-1)
        denom = refv[None, :, None] * rats[:, :, None] ** orders_j[None, None, :]
        coeffs = (diffs[None] / denom)[:, :, mask_j]               # (R, N, m)

        Rs = jax.vmap(lambda th: frozen.value_fn(th, Xa, None))(ths)
        Rs = Rs + nugget * jnp.eye(Nl, dtype=Rs.dtype)
        Rs = jax.lax.optimization_barrier(Rs)

        basis = jnp.ones((Nl, 1), dtype=Xa.dtype)
        lml = grid2(Rs, coeffs, basis, c0, V0, df, scale)  # (T, R)

        # change-of-variables determinant (reference models.py:1505-1506)
        det = (n_in * jnp.sum(jnp.log(jnp.abs(refv)))
               + float(np.sum(orders_in))
               * jnp.sum(jnp.log(jnp.abs(rats)), axis=-1))         # (R,)
        return lml - det[None, :]

    key = ('trunc_grid', process, kernel.structure_key(), c0.tobytes(),
           V0.tobytes(), float(df), float(scale), float(nugget),
           mask.tobytes(), orders.tobytes())
    cached = _GRID_FN_CACHE.get(key)
    if cached is None:
        cached = jax.jit(fn)
        _GRID_FN_CACHE[key] = cached
    return cached(thetas, ratios, X, y, ref_vec)


def pointwise_evidence_grid(y, orders, ratios, ref=1, df=1, scale=1,
                            excluded=None, mesh=None):
    R"""TruncationPointwise evidence over a batch of expansion parameters.

    The reference computes Lambda_b posteriors with a Python loop of
    ``TruncationPointwise.log_likelihood`` calls — one per Lambda_b value,
    1500 of them per observable in truncation_recap.ipynb cells 38-40
    (reference models.py:1755-1797).  Here the whole sweep is one jitted
    device program vectorized over the ratio batch: coefficient extraction,
    the conjugate (nu, tau) update, and the change-of-variables determinant
    are all batch-leading tensor ops.

    Parameters
    ----------
    y : (N, n_orders) partial sums
    orders : (n_orders,) int array
    ratios : (R, N) or (R,) expansion-parameter values, one row per sweep
        point (e.g. ``Q(E, Lambda_b_r)``)
    ref : scalar or (N,) reference scale
    df, scale : scaled-inverse-chi^2 prior (nu0, tau0); ``df=0`` is the
        scale-invariant prior, dropping its infinite normalization exactly
        as the reference does
    excluded : orders excluded from the coefficient model
    mesh : jax.sharding.Mesh, optional — shard the R axis over 'batch'

    Returns
    -------
    (R,) array: log p(y | ratio_r), matching
    ``TruncationPointwise(df, scale, excluded).fit(y, ...).log_likelihood``
    """
    y = jnp.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    N = y.shape[0]
    orders = np.asarray(orders)
    mask = ~np.isin(orders, excluded)
    orders_in = orders[mask]
    m = int(mask.sum())

    ratios = jnp.asarray(ratios, dtype=y.dtype)
    if ratios.ndim == 1:
        ratios = jnp.broadcast_to(ratios[:, None], (ratios.shape[0], N))
    ref_vec = jnp.broadcast_to(jnp.asarray(ref, dtype=y.dtype), (N,))

    df0, scale0 = float(df), float(scale)
    mask_j = jnp.asarray(np.nonzero(mask)[0])
    orders_j = jnp.asarray(orders, dtype=y.dtype)

    def fn(rats, ya, refv):
        # coefficient extraction for every ratio (reference helpers.py:71-101)
        diffs = jnp.concatenate([ya[:, :1], jnp.diff(ya, axis=-1)], axis=-1)
        denom = refv[None, :, None] * rats[:, :, None] ** orders_j[None, None, :]
        coeffs = (diffs[None] / denom)[:, :, mask_j]              # (R, N, m)

        # conjugate scaled-inv-chi^2 update (reference models.py:1623-1631)
        df_post = df0 + m
        scale_sq = (df0 * scale0 ** 2
                    + jnp.sum(coeffs * coeffs, axis=-1)) / df_post  # (R, N)

        # df_post is a concrete Python float — evaluate its gammaln on the
        # host: a device-side 0-d transcendental constant-folds at f32 on
        # this TPU (see CLAUDE.md), a ~1e-7 offset CPU tests cannot catch.
        ll = float(_sc_gammaln(df_post / 2.)) - 0.5 * m * _np_log_2pi
        if df0 > 0:  # scale-invariant prior df0=0 drops its normalization
            ll += 0.5 * df0 * float(np.log(df0 * scale0 ** 2 / 2.)) \
                - float(_sc_gammaln(df0 / 2.))
        ll = ll - 0.5 * jnp.sum(df_post * jnp.log(df_post * scale_sq / 2.),
                                axis=-1)                           # (R,)

        # change-of-variables determinant y -> c (reference models.py:1780-1784)
        det = (jnp.sum(jnp.log(jnp.abs(refv)))
               + float(np.sum(orders_in))
               * jnp.sum(jnp.log(rats), axis=-1))                  # (R,)
        return ll - det

    key = ('pw_evidence', df0, scale0, mask.tobytes(), orders.tobytes(),
           int(N), int(y.shape[1]))
    cached = _GRID_FN_CACHE.get(key)
    if cached is None:
        cached = jax.jit(fn)
        _GRID_FN_CACHE[key] = cached
    if mesh is not None:
        _check_mesh_batch(ratios.shape[0], mesh, 'pointwise_evidence_grid')
        ratios = jax.device_put(ratios, NamedSharding(mesh, P('batch')))
    return cached(ratios, y, ref_vec)


def batched_predict(kernel, post, X, y_batch, Xnew, mesh=None, basis=None,
                    student=False, student_mode='class'):
    R"""Predictive means/stds at ``Xnew`` for every fit in a BatchedPosterior.

    The vmapped analog of ``ConjugateGaussianProcess.predict``
    (reference models.py:751-845) given the state from :func:`batched_fit`.

    ``student=True`` adds the Student process's mean-uncertainty term: the
    conditional basis ``B_c = B_new - R_no R_oo^{-1} B_old`` contributes
    ``mu_var = cov_factor * diag(B_c V B_c^T)`` with ``V = post.disp``.
    How it enters the returned std is set by ``student_mode``:

    - ``'class'`` (default): ``std = sigma + sqrt(mu_var)`` — the
      std-addition convention of ``ConjugateStudentProcess.predict``'s
      return_std path (reference models.py:1127-1182), for parity with
      the class API.
    - ``'variance'``: ``std = sqrt(sigma**2 + mu_var)`` — the true
      per-draw predictive std (variance-additive, matching the class's
      return_cov path); use this when the stds feed a law-of-total-
      variance mixture downstream.

    ``basis``: None (constant ones, the reference default) or a callable
    evaluated at both X and Xnew; it must match the basis the posterior was
    fitted with.

    ``mesh``: optional Mesh — shard the batch of fits over the 'batch'
    axis (states and data placed with a batch NamedSharding; X/Xnew stay
    replicated).  B must be divisible by the mesh's 'batch' axis size.

    Returns
    -------
    (means, stds): ((B, N_new, m), (B, N_new)) arrays
    """
    from jax.scipy.linalg import cho_solve as _cho

    if basis is not None and not callable(basis):
        raise TypeError('batched_predict needs basis=None or a callable '
                        '(it must be evaluated at both X and Xnew)')
    if student_mode not in ('class', 'variance'):
        raise ValueError("student_mode must be 'class' or 'variance'")
    frozen = kernel.clone()
    X = jnp.atleast_2d(jnp.asarray(X))
    Xnew = jnp.atleast_2d(jnp.asarray(Xnew))
    y_batch = jnp.asarray(y_batch)
    if y_batch.ndim == 2:
        y_batch = y_batch[:, :, None]
    basis_old_c = _resolve_basis(basis, X)
    basis_new_c = _resolve_basis(basis, Xnew)

    def one(theta, L, center, cov_factor, disp, y2):
        basis_old = basis_old_c
        basis_new = basis_new_c
        m_old = basis_old @ center
        m_new = basis_new @ center
        R_on = frozen.value_fn(theta, X, Xnew)
        alpha = _cho((L, True), y2 - m_old[:, None])
        m_pred = m_new[:, None] + R_on.T @ alpha
        R_nn = frozen.value_fn(theta, Xnew, None)
        R_pred = R_nn - R_on.T @ _cho((L, True), R_on)
        std = jnp.sqrt(jnp.clip(cov_factor * jnp.diagonal(R_pred), 0.0))
        if student:
            # mean-uncertainty of the marginalized-mean process (reference
            # models.py:1171-1181); entered per student_mode (see docstring)
            b_cond = basis_new - R_on.T @ _cho((L, True), basis_old)
            mu_var = cov_factor * jnp.einsum(
                'nq,qr,nr->n', b_cond, disp, b_cond)
            if student_mode == 'variance':
                std = jnp.sqrt(std ** 2 + jnp.clip(mu_var, 0.0))
            else:
                std = std + jnp.sqrt(jnp.clip(mu_var, 0.0))
        return m_pred, std

    fn = jax.vmap(one)
    args = (post.theta, post.chol, post.center, post.cov_factor, post.disp,
            y_batch)
    if mesh is not None:
        _check_mesh_batch(post.theta.shape[0], mesh, 'batched_predict')
        sh = NamedSharding(mesh, P('batch'))
        args = tuple(jax.device_put(a, sh) for a in args)
        fn = jax.jit(fn, in_shardings=(sh,) * 6)
    else:
        fn = jax.jit(fn)
    return fn(*args)


def batched_posterior_at(kernel, X, y, thetas, center=0, disp=0, df=1,
                         scale=1, nugget=1e-10, basis=None, chunk=128,
                         mesh=None):
    R"""Conjugate posterior states at GIVEN hyperparameters — no optimization.

    The state half of :func:`batched_fit` evaluated at an externally
    supplied set of ``thetas`` (log-space, one row per draw), e.g. HMC
    draws from :func:`gsum_tpu.sample.sample_theta_posterior` or the nodes
    of a quadrature grid.  For each theta the covariance is built and
    factorized once and the closed-form conjugate updates (reference
    models.py:169-457 — here ``conjugate.compute_*``) produce
    ``center/disp/df/scale_sq/cov_factor`` exactly as ``fit`` would after
    its MAP optimization, plus the lml at that theta.

    Feeding the result to :func:`batched_predict` gives per-draw
    predictive moments — the building block of full-Bayes posterior
    predictives (``gsum_tpu.sample.posterior_predictive``).

    Parameters
    ----------
    kernel : Kernel — structure (its own theta is ignored)
    X : (N, d) inputs shared by every draw
    y : (N,) or (N, m) data shared by every draw
    thetas : (B, n_dims) log-hyperparameter rows
    center, disp, df, scale, nugget, basis : as in :func:`batched_fit`
    chunk : evaluate at most this many draws per device call (the
        tunneled TPU worker here kills overlong executions); one compile
        serves all full chunks
    mesh : optional Mesh — shard B over the 'batch' axis.  The sharded
        path runs as ONE program: ``chunk`` is bypassed, and B must be
        divisible by the mesh's 'batch' axis size

    Returns
    -------
    BatchedPosterior with leading dimension B
    """
    frozen = kernel.clone()
    lml = make_lml_fn(kernel, center, disp, df, scale, nugget)
    X = jnp.atleast_2d(jnp.asarray(X))
    y2 = jnp.asarray(y)
    if y2.ndim == 1:
        y2 = y2[:, None]
    basis_c = _resolve_basis(basis, X)
    c0 = np.atleast_1d(center)
    V0 = np.atleast_2d(disp)
    thetas = jnp.atleast_2d(jnp.asarray(thetas, dtype=X.dtype))
    N = X.shape[0]

    def one(theta):
        R = frozen.value_fn(theta, X, None)
        L = jnp.linalg.cholesky(R + nugget * jnp.eye(N, dtype=R.dtype))
        center_ = _conj.compute_center(y2, L, basis_c, c0, V0)
        disp_ = _conj.compute_disp(y2, L, basis_c, V0)
        df_ = _conj.compute_df(y2, df)
        scale_sq = _conj.compute_scale_sq(y2, L, basis_c, c0, V0, df, scale)
        cov_factor = _conj.compute_cov_factor(scale_sq, df_)
        return BatchedPosterior(
            theta=theta, lml=lml(theta, X, y2, basis_c), center=center_,
            disp=disp_, df=jnp.asarray(df_, dtype=R.dtype),
            scale_sq=scale_sq, cov_factor=cov_factor, chol=L)

    if mesh is not None:
        _check_mesh_batch(thetas.shape[0], mesh, 'batched_posterior_at')
        fn = jax.jit(jax.vmap(one),
                     in_shardings=NamedSharding(mesh, P('batch')))
        return fn(jax.device_put(thetas, NamedSharding(mesh, P('batch'))))

    fn = jax.jit(jax.vmap(one))
    B = thetas.shape[0]
    if chunk is None or B <= chunk:
        return fn(thetas)
    parts = [fn(thetas[i:i + chunk]) for i in range(0, B, chunk)]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *parts)
