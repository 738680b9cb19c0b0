R"""Synthetic partial-sum dataset generators (sklearn ``make_*`` idiom).

TPU-native rebuild of the reference ``gsum/datasets.py``; sampling uses
``jax.random`` keys instead of NumPy RandomState (distributions match, draws
differ at equal seeds).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import _config  # noqa: F401
from .helpers import cartesian, partials
from .kernels import RBF

__all__ = [
    'make_gaussian_partial_sums',
    'make_gaussian_partial_sums_uniform',
    'make_gaussian_partial_sums_on_grid',
]


def _as_key(random_state):
    if random_state is None:
        return jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
    if isinstance(random_state, (int, np.integer)):
        return jax.random.PRNGKey(int(random_state))
    return random_state


def make_gaussian_partial_sums(X, orders=5, kernel=None, mean=None, ratio=0.3,
                               ref=1., nugget=0, random_state=0,
                               allow_singular=True):
    R"""Gaussian partial sums sampled at input points X.

    reference: datasets.py:8-72.

    Parameters
    ----------
    X : (n_samples, n_features) array
    orders : int or array — the orders included in the partial sum
    kernel : callable, optional — defaults to ``RBF(0.5)``
    mean : callable, optional — mean function of the coefficients
    ratio, ref : float or callable
    nugget : float — diagonal jitter on the coefficient covariance
    random_state : int, jax key, or None
    allow_singular : bool — adds a tiny jitter so singular covariances sample

    Returns
    -------
    y : (n_samples, n_orders) array of partial sums
    """
    X = jnp.atleast_2d(jnp.asarray(X))
    if kernel is None:
        kernel = RBF(0.5)
    if mean is None:
        def mean(a):
            return jnp.zeros(a.shape[0], dtype=a.dtype)

    if isinstance(orders, (int, np.integer)):
        orders = np.arange(orders)
    orders = np.asarray(orders)
    if callable(ratio):
        ratio = ratio(X)
    if callable(ref):
        ref = ref(X)

    m = mean(X)
    K = kernel(X)
    K = K + nugget * jnp.eye(K.shape[0], dtype=K.dtype)
    if allow_singular:
        K = K + 1e-10 * jnp.eye(K.shape[0], dtype=K.dtype)

    key = _as_key(random_state)
    L = jnp.linalg.cholesky(K)
    z = jax.random.normal(key, (len(orders), K.shape[0]), dtype=K.dtype)
    coeffs = (m + z @ L.T).T
    return partials(coeffs=coeffs, ratio=ratio, ref=ref, orders=orders)


def make_gaussian_partial_sums_uniform(n_samples=100, n_features=1, orders=5,
                                       kernel=None, mean=None, ratio=0.3,
                                       ref=1., nugget=0, random_state=0,
                                       allow_singular=True):
    R"""Partial sums at uniform-random inputs in [0, 1]^d.  reference: datasets.py:75-129."""
    key = _as_key(random_state)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (n_samples, n_features), dtype=jnp.result_type(float))
    y = make_gaussian_partial_sums(
        X=X, orders=orders, kernel=kernel, mean=mean, ratio=ratio, ref=ref,
        nugget=nugget, random_state=ky, allow_singular=allow_singular)
    return X, y


def make_gaussian_partial_sums_on_grid(n_samples=100, n_features=1, orders=5,
                                       kernel=None, mean=None, ratio=0.3,
                                       ref=1., nugget=0, random_state=0,
                                       allow_singular=True):
    R"""Partial sums on a full tensor grid in [0, 1]^d.

    reference: datasets.py:132-191.  The reference's ``n_features > 1`` path
    is broken (iterates ``range(n_features)`` instead of replicating the
    linspace, datasets.py:182); here the grid is the proper Cartesian
    product of ``n_features`` copies of ``linspace(0, 1, n_samples)``.
    """
    x = jnp.linspace(0, 1, n_samples)
    if n_features > 1:
        X = cartesian(*[x for _ in range(n_features)])
    else:
        X = x[:, None]
    y = make_gaussian_partial_sums(
        X=X, orders=orders, kernel=kernel, mean=mean, ratio=ratio, ref=ref,
        nugget=nugget, random_state=random_state, allow_singular=allow_singular)
    return X, y
