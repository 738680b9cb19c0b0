"""Bounded L-BFGS engines: box, one-sided, and unbounded constraints.

The sigmoid/softplus reparameterization had two failure modes pinned
here: (a) infinite bounds poisoned gradients through the discarded
``where`` branch (0*inf = NaN), so every engine silently returned the
starting point; (b) an uncapped first step threw z into the sigmoid's
saturated tail (observed z -> -59 on a plain quadratic), where the
z-gradient vanishes and the iterate is stuck at a box boundary.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gsum_tpu.optimize import (fixed_lbfgs_bounded,
                               fixed_lbfgs_bounded_batched,
                               jit_lbfgs_bounded)


def quad(x):
    return jnp.sum((x + 5.0) ** 2)


CASES = [
    # (lo, hi, x0, optimum)
    (-np.inf, np.inf, 1.0, -5.0),      # unbounded
    (0.0, np.inf, 1.0, 0.0),           # one-sided lower, optimum AT bound
    (-np.inf, -7.0, -8.0, -7.0),       # one-sided upper, optimum AT bound
    (-10.0, 10.0, 1.0, -5.0),          # box, interior optimum
    (-4.0, -1.0, -2.0, -4.0),          # box, optimum at a bound
]


@pytest.mark.parametrize('lo,hi,x0,want', CASES)
def test_jit_lbfgs_bounded(lo, hi, x0, want):
    x, f = jit_lbfgs_bounded(quad, jnp.array([x0]), jnp.array([lo]),
                             jnp.array([hi]), maxiter=100)
    np.testing.assert_allclose(np.asarray(x), [want], atol=1e-5)


@pytest.mark.parametrize('lo,hi,x0,want', CASES)
def test_fixed_lbfgs_bounded(lo, hi, x0, want):
    x, f = fixed_lbfgs_bounded(quad, jnp.array([x0]), jnp.array([lo]),
                               jnp.array([hi]), maxiter=60)
    np.testing.assert_allclose(np.asarray(x), [want], atol=1e-5)


def test_fixed_lbfgs_bounded_batched_cases():
    fun_b = lambda X: jnp.sum((X + 5.0) ** 2, axis=-1)
    X0 = jnp.array([[1.0], [8.0], [-9.0]])
    Xo, _ = fixed_lbfgs_bounded_batched(fun_b, X0, jnp.array([-10.0]),
                                        jnp.array([10.0]), maxiter=60)
    np.testing.assert_allclose(np.asarray(Xo), -5.0 * np.ones((3, 1)),
                               atol=1e-5)
    Xo, _ = fixed_lbfgs_bounded_batched(fun_b, X0 + 9.5, jnp.array([0.0]),
                                        jnp.array([np.inf]), maxiter=60)
    np.testing.assert_allclose(np.asarray(Xo), np.zeros((3, 1)), atol=1e-5)
