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

__all__ = ['scipy_lbfgsb', 'jit_lbfgs_bounded', 'ConvergenceWarning']


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

def _to_unbounded(theta, lo, hi):
    """Map box-constrained theta to an unconstrained z (logit reparam)."""
    finite = jnp.isfinite(lo) & jnp.isfinite(hi)
    span = jnp.where(finite, hi - lo, 1.0)
    # clip strictly inside the box so logit stays finite
    t = jnp.clip((theta - lo) / span, 1e-10, 1 - 1e-10)
    z_box = jnp.log(t) - jnp.log1p(-t)
    return jnp.where(finite, z_box, theta)


def _to_bounded(z, lo, hi):
    finite = jnp.isfinite(lo) & jnp.isfinite(hi)
    t = jax.nn.sigmoid(z)
    return jnp.where(finite, lo + (hi - lo) * t, z)


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
        return fun(_to_bounded(z, lo, hi))

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
