R"""Kernel-hyperparameter MAP optimization.

Two interchangeable engines replace the reference's Fortran
``fmin_l_bfgs_b`` call (reference: models.py:884-900):

- ``'fmin_l_bfgs_b'`` (default): scipy's L-BFGS-B driving a *jitted*
  value-and-gradient of the log-marginal likelihood.  The line search and
  convergence behavior match the reference exactly; all numerical work
  runs on device.
- ``'lbfgs'``: a fully-jitted bounded L-BFGS built on ``optax.lbfgs`` with
  a sigmoid reparameterization of box constraints.  Being pure JAX it is
  ``vmap``-able, which is what powers batched fits over thousands of
  observables and hyperparameter-restart fans on a TPU mesh
  (``gsum_tpu.parallel``).
"""
from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import _config  # noqa: F401

__all__ = ['scipy_lbfgsb', 'jit_lbfgs_bounded', 'fixed_lbfgs_bounded',
           'fixed_lbfgs_bounded_batched', 'ConvergenceWarning']


try:  # sklearn's warning class if present, else a local stand-in
    from sklearn.exceptions import ConvergenceWarning
except Exception:  # pragma: no cover
    class ConvergenceWarning(UserWarning):
        pass


def scipy_lbfgsb(obj_func, initial_theta, bounds):
    """L-BFGS-B via scipy on the host; obj_func returns (f, grad) on device.

    Mirrors reference models.py:884-900 including the abnormal-termination
    warning.
    """
    from scipy.optimize import fmin_l_bfgs_b

    theta_opt, func_min, convergence_dict = fmin_l_bfgs_b(
        obj_func, initial_theta, bounds=bounds)
    if convergence_dict["warnflag"] != 0:
        warnings.warn("fmin_l_bfgs_b terminated abnormally with the "
                      " state: %s" % convergence_dict,
                      ConvergenceWarning)
    return theta_opt, func_min


# ----------------------------------------------------------------------
# Fully-jitted bounded L-BFGS
# ----------------------------------------------------------------------

# Per-iteration trust cap in z (logit) units for the fixed-trip engines.
# The whole usable range of the sigmoid reparameterization is ~±15 logit
# units (beyond that the box coordinate is within 1e-7 of its boundary
# and the z-gradient is exponentially small), so 2 units per iteration is
# plenty for progress while making the saturated tail unreachable in one
# jump.
_ZSTEP = 2.0


def _to_unbounded(theta, lo, hi):
    """Map box-constrained theta to an unconstrained z.

    Two-sided boxes use the logit; ONE-SIDED bounds use the softplus
    inverse (they used to be silently treated as unbounded, and the
    unguarded ``lo + (hi - lo) * t`` produced 0·inf = NaN in the
    discarded ``where`` branch, which poisons gradients).  Every branch
    is evaluated with sanitized operands for exactly that reason.
    """
    lo_f, hi_f = jnp.isfinite(lo), jnp.isfinite(hi)
    both = lo_f & hi_f
    lo_s = jnp.where(lo_f, lo, 0.0)
    hi_s = jnp.where(hi_f, hi, 0.0)
    span = jnp.where(both, hi - lo, 1.0)
    # clip strictly inside the box so logit stays finite
    t = jnp.clip((theta - lo_s) / span, 1e-10, 1 - 1e-10)
    z_box = jnp.log(t) - jnp.log1p(-t)
    # softplus inverse, stable at both ends: log(expm1(d)) = d + log(-expm1(-d))
    d_lo = jnp.maximum(theta - lo_s, 1e-10)
    z_lo = d_lo + jnp.log(-jnp.expm1(-d_lo))
    d_hi = jnp.maximum(hi_s - theta, 1e-10)
    z_hi = d_hi + jnp.log(-jnp.expm1(-d_hi))
    return jnp.where(both, z_box,
                     jnp.where(lo_f, z_lo, jnp.where(hi_f, z_hi, theta)))


def _to_bounded(z, lo, hi):
    """Inverse of :func:`_to_unbounded` (sigmoid / softplus / identity)."""
    lo_f, hi_f = jnp.isfinite(lo), jnp.isfinite(hi)
    both = lo_f & hi_f
    lo_s = jnp.where(lo_f, lo, 0.0)
    hi_s = jnp.where(hi_f, hi, 0.0)
    span = jnp.where(both, hi - lo, 1.0)
    x_box = lo_s + span * jax.nn.sigmoid(z)
    x_lo = lo_s + jax.nn.softplus(z)
    x_hi = hi_s - jax.nn.softplus(z)
    return jnp.where(both, x_box,
                     jnp.where(lo_f, x_lo, jnp.where(hi_f, x_hi, z)))


def jit_lbfgs_bounded(fun, x0, lower, upper, maxiter=200, tol=1e-10):
    R"""Minimize ``fun`` subject to ``lower <= x <= upper``; jit/vmap-safe.

    Box constraints are removed with a sigmoid reparameterization and the
    unconstrained problem is solved with ``optax.lbfgs`` (zoom linesearch).
    Non-finite objective values (e.g. -inf log-likelihood from a failed
    Cholesky, reference models.py:967-972) terminate the line search
    gracefully because optax's linesearch rejects them.

    Parameters
    ----------
    fun : callable
        Scalar objective of a 1d parameter vector (traceable).
    x0, lower, upper : arrays of identical shape
    maxiter : int
    tol : float — gradient-norm stopping tolerance (in z-space)

    Returns
    -------
    x_opt, f_opt
    """
    import optax

    lo = jnp.asarray(lower, dtype=x0.dtype)
    hi = jnp.asarray(upper, dtype=x0.dtype)

    def zfun(z):
        # optax initializes its linesearch value state at the canonical
        # float width (f64 under x64), so an f32 objective must be promoted
        # or lax.cond branches disagree on dtypes
        return jnp.asarray(fun(_to_bounded(z, lo, hi)),
                           dtype=jnp.result_type(float))

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(zfun)

    z0 = _to_unbounded(jnp.asarray(x0), lo, hi)
    state0 = opt.init(z0)

    def cond(carry):
        z, state, it = carry
        grad = optax.tree.get(state, 'grad')
        gnorm = jnp.linalg.norm(grad) if grad is not None else jnp.inf
        count = optax.tree.get(state, 'count')
        return (count < maxiter) & (gnorm > tol) | (count == 0)

    def body(carry):
        z, state, it = carry
        value, grad = value_and_grad(z, state=state)
        updates, state = opt.update(grad, state, z, value=value, grad=grad,
                                    value_fn=zfun)
        z = optax.apply_updates(z, updates)
        return z, state, it + 1

    z_opt, state, _ = jax.lax.while_loop(cond, body, (z0, state0, 0))
    x_opt = _to_bounded(z_opt, lo, hi)
    return x_opt, zfun(z_opt)


def fixed_lbfgs_bounded(fun, x0, lower, upper, maxiter=50, history=8,
                        ls_steps=10):
    R"""Bounded L-BFGS with fixed-trip-count control flow only.

    A TPU-native drop-in for :func:`jit_lbfgs_bounded`: no ``while_loop``
    (the tunneled TPU runtime here has crashed on large vmapped while
    loops), a ``lax.scan`` over exactly ``maxiter`` iterations, a static
    two-loop recursion over a rolled history buffer, and a *vectorized*
    backtracking linesearch — all ``ls_steps`` trial points are evaluated
    in one batched call and the first Armijo-acceptable step is selected
    with ``argmax``, so the linesearch costs one wide evaluation instead of
    a data-dependent loop.

    Box constraints are removed with the same sigmoid reparameterization.
    """
    lo = jnp.asarray(lower, dtype=x0.dtype)
    hi = jnp.asarray(upper, dtype=x0.dtype)

    def zfun(z):
        return jnp.asarray(fun(_to_bounded(z, lo, hi)),
                           dtype=jnp.result_type(float))

    value_and_grad = jax.value_and_grad(zfun)

    n = x0.shape[0]
    h = history
    dtype = jnp.result_type(float)
    z0 = _to_unbounded(jnp.asarray(x0), lo, hi).astype(dtype)
    f0, g0 = value_and_grad(z0)

    # geometric trial steps 1, 1/2, 1/4, ...
    ts = 0.5 ** jnp.arange(ls_steps, dtype=dtype)
    c1 = 1e-4

    def two_loop(g, S, Y, rho, m_cnt):
        """H @ g via the standard two-loop recursion; index 0 is newest."""
        q = g
        alphas = []
        for i in range(h):
            valid = i < m_cnt
            a = jnp.where(valid, rho[i] * jnp.dot(S[i], q), 0.0)
            q = q - a * Y[i]
            alphas.append(a)
        ysy = jnp.dot(Y[0], Y[0])
        gamma = jnp.where((m_cnt > 0) & (ysy > 0),
                          jnp.dot(S[0], Y[0]) / jnp.maximum(ysy, 1e-30), 1.0)
        r = gamma * q
        for i in reversed(range(h)):
            valid = i < m_cnt
            b = jnp.where(valid, rho[i] * jnp.dot(Y[i], r), 0.0)
            r = r + jnp.where(valid, alphas[i] - b, 0.0) * S[i]
        return r

    def step(carry, _):
        z, f, g, S, Y, rho, m_cnt = carry
        d = -two_loop(g, S, Y, rho, m_cnt)
        # safeguard: fall back to steepest descent on a bad direction
        descent = jnp.dot(g, d) < 0
        d = jnp.where(descent, d, -g)
        gd = jnp.dot(g, d)

        # trust cap: at most _ZSTEP logit units per iteration.  An
        # unbounded first step can throw z deep into the sigmoid's
        # saturated tail (observed: z -> -59 on a plain quadratic),
        # where the z-gradient vanishes exponentially and every later
        # iteration is stuck at the squashed box boundary.
        tcap = jnp.minimum(1.0, _ZSTEP / jnp.maximum(jnp.max(jnp.abs(d)),
                                                     1e-30))
        ts_eff = tcap * ts

        # vectorized Armijo backtracking
        f_trials = jax.vmap(lambda t: zfun(z + t * d))(ts_eff)
        ok = (f_trials <= f + c1 * ts_eff * gd) & jnp.isfinite(f_trials)
        any_ok = jnp.any(ok)
        idx = jnp.argmax(ok)
        t = jnp.where(any_ok, ts_eff[idx], 0.0)

        z_new = z + t * d
        f_new, g_new = value_and_grad(z_new)
        improved = any_ok & (f_new <= f)
        z_new = jnp.where(improved, z_new, z)
        f_new = jnp.where(improved, f_new, f)
        g_new = jnp.where(improved, g_new, g)

        s = z_new - z
        yv = g_new - g
        curv = jnp.dot(s, yv)
        store = improved & (curv > 1e-12)
        S2 = jnp.where(store, jnp.roll(S, 1, axis=0).at[0].set(s), S)
        Y2 = jnp.where(store, jnp.roll(Y, 1, axis=0).at[0].set(yv), Y)
        rho2 = jnp.where(store,
                         jnp.roll(rho, 1).at[0].set(1.0 / jnp.maximum(curv, 1e-30)),
                         rho)
        m2 = jnp.where(store, jnp.minimum(m_cnt + 1, h), m_cnt)
        return (z_new, f_new, g_new, S2, Y2, rho2, m2), None

    S0 = jnp.zeros((h, n), dtype)
    Y0 = jnp.zeros((h, n), dtype)
    rho0 = jnp.zeros((h,), dtype)
    (z_opt, f_opt, _, _, _, _, _), _ = jax.lax.scan(
        step, (z0, f0, g0, S0, Y0, rho0, jnp.asarray(0)), None, length=maxiter)
    return _to_bounded(z_opt, lo, hi), f_opt


def fixed_lbfgs_bounded_batched(fun_b, X0, lower, upper, maxiter=50,
                                history=8, ls_steps=10):
    R"""Lockstep batched variant of :func:`fixed_lbfgs_bounded`.

    ``fun_b`` evaluates the objective for a whole batch at once:
    ``(B, P) -> (B,)``.  Every optimizer step and every linesearch trial is
    one wide call — at small P/N this is what keeps the device busy: the
    linesearch evaluates all ``ls_steps x B`` candidate points as a single
    ``(ls_steps*B, P)`` batch (e.g. through the explicitly-batched grid-lml
    evaluator), instead of vmapping a scalar optimizer whose inner
    factorizations XLA cannot batch efficiently.

    Returns (X_opt (B, P), f_opt (B,)).
    """
    X0 = jnp.asarray(X0)
    B, P = X0.shape
    dtype = jnp.result_type(float)
    lo = jnp.broadcast_to(jnp.asarray(lower, dtype=dtype), (P,))
    hi = jnp.broadcast_to(jnp.asarray(upper, dtype=dtype), (P,))

    def zfun_b(Z):
        return jnp.asarray(fun_b(_to_bounded(Z, lo, hi)), dtype=dtype)

    def val_and_grad(Z):
        vals, vjp = jax.vjp(zfun_b, Z)
        grads = vjp(jnp.ones_like(vals))[0]
        return vals, grads

    h = history
    Z0 = jax.vmap(lambda x: _to_unbounded(x, lo, hi))(X0).astype(dtype)
    F0, G0 = val_and_grad(Z0)

    ts = 0.5 ** jnp.arange(ls_steps, dtype=dtype)
    c1 = 1e-4

    def two_loop(G, S, Y, rho, m_cnt):
        q = G                                            # (B, P)
        alphas = []
        for i in range(h):
            valid = (i < m_cnt)[:, None]                 # (B, 1)
            a = jnp.where(valid[:, 0], rho[i] * jnp.sum(S[i] * q, -1), 0.0)
            q = q - a[:, None] * Y[i]
            alphas.append(a)
        ysy = jnp.sum(Y[0] * Y[0], -1)
        gamma = jnp.where((m_cnt > 0) & (ysy > 0),
                          jnp.sum(S[0] * Y[0], -1) / jnp.maximum(ysy, 1e-30),
                          1.0)
        r = gamma[:, None] * q
        for i in reversed(range(h)):
            valid = i < m_cnt
            b = jnp.where(valid, rho[i] * jnp.sum(Y[i] * r, -1), 0.0)
            r = r + jnp.where(valid, alphas[i] - b, 0.0)[:, None] * S[i]
        return r

    def step(carry, _):
        Z, F, G, S, Y, rho, m_cnt = carry
        D = -two_loop(G, S, Y, rho, m_cnt)               # (B, P)
        gd = jnp.sum(G * D, -1)                          # (B,)
        descent = gd < 0
        D = jnp.where(descent[:, None], D, -G)
        gd = jnp.where(descent, gd, -jnp.sum(G * G, -1))

        # trust cap per fit (see fixed_lbfgs_bounded: an uncapped step
        # saturates the sigmoid and strands the fit at a box boundary)
        tcap = jnp.minimum(1.0, _ZSTEP / jnp.maximum(
            jnp.max(jnp.abs(D), axis=-1), 1e-30))        # (B,)
        ts_eff = ts[:, None] * tcap[None]                # (L, B)

        # one wide linesearch call: all trials x all fits
        Zt = Z[None] + ts_eff[:, :, None] * D[None]      # (L, B, P)
        Ft = zfun_b(Zt.reshape(-1, P)).reshape(ls_steps, B)
        ok = (Ft <= F[None] + c1 * ts_eff * gd[None]) & jnp.isfinite(Ft)
        any_ok = jnp.any(ok, axis=0)                     # (B,)
        idx = jnp.argmax(ok, axis=0)                     # (B,)
        t = jnp.where(any_ok, jnp.take_along_axis(
            ts_eff, idx[None], axis=0)[0], 0.0)

        Z_new = Z + t[:, None] * D
        F_new, G_new = val_and_grad(Z_new)
        improved = any_ok & (F_new <= F)
        Z_new = jnp.where(improved[:, None], Z_new, Z)
        F_new = jnp.where(improved, F_new, F)
        G_new = jnp.where(improved[:, None], G_new, G)

        sv = Z_new - Z
        yv = G_new - G
        curv = jnp.sum(sv * yv, -1)
        store = improved & (curv > 1e-12)
        S2 = jnp.where(store[None, :, None],
                       jnp.roll(S, 1, axis=0).at[0].set(sv), S)
        Y2 = jnp.where(store[None, :, None],
                       jnp.roll(Y, 1, axis=0).at[0].set(yv), Y)
        rho2 = jnp.where(store[None, :],
                         jnp.roll(rho, 1, axis=0).at[0].set(
                             1.0 / jnp.maximum(curv, 1e-30)), rho)
        m2 = jnp.where(store, jnp.minimum(m_cnt + 1, h), m_cnt)
        return (Z_new, F_new, G_new, S2, Y2, rho2, m2), None

    S0 = jnp.zeros((h, B, P), dtype)
    Y0 = jnp.zeros((h, B, P), dtype)
    rho0 = jnp.zeros((h, B), dtype)
    (Z_opt, F_opt, _, _, _, _, _), _ = jax.lax.scan(
        step, (Z0, F0, G0, S0, Y0, rho0, jnp.zeros(B, jnp.int32)), None,
        length=maxiter)
    return jax.vmap(lambda z: _to_bounded(z, lo, hi))(Z_opt), F_opt
