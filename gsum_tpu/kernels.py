R"""Covariance kernels with the scikit-learn hyperparameter protocol, in JAX.

The reference models program against ``sklearn.gaussian_process.kernels``
(reference: models.py:12,146-147, tests/test.py:31-45): kernels are callable
objects with a packed log-parameter vector ``theta``, log ``bounds``,
``clone_with_theta``, ``fixed`` hyperparameters, composition via ``+``/``*``
/``**``, and ``eval_gradient`` returning dK/d(log theta).

This module rebuilds that protocol natively on jax.numpy.  The crucial
TPU-first difference: every kernel exposes ``value_fn(theta, X, Y)`` — a
pure function of the *traced* log-parameter vector — so model code can jit
and differentiate the whole log-marginal-likelihood with ``jax.grad``
instead of hand-deriving gradients.  ``eval_gradient`` is provided for API
parity and is computed with ``jax.jacfwd`` over ``value_fn``.

Squared distances use the explicit difference form (not the dot-product
expansion) to match scikit-learn's ``pdist``-based values bit-for-bit at
float64; the fused Pallas covariance kernels in ``gsum_tpu.ops`` use the
MXU-friendly dot form.
"""
from __future__ import annotations

import copy
import inspect
import math
from collections import namedtuple

import jax
import jax.numpy as jnp
import numpy as np

from . import _config  # noqa: F401
from ._accmath import exp64

__all__ = [
    'Hyperparameter', 'Kernel', 'ConstantKernel', 'WhiteKernel', 'RBF',
    'Matern', 'RationalQuadratic', 'ExpSineSquared', 'DotProduct',
    'Sum', 'Product', 'Exponentiation',
]


class Hyperparameter(namedtuple('Hyperparameter',
                                ('name', 'value_type', 'bounds',
                                 'n_elements', 'fixed'))):
    """A kernel hyperparameter specification (sklearn-compatible)."""

    __slots__ = ()

    def __new__(cls, name, value_type, bounds, n_elements=1, fixed=None):
        if not isinstance(bounds, str) or bounds != 'fixed':
            bounds = np.atleast_2d(np.asarray(bounds, dtype=float))
            if n_elements > 1 and bounds.shape[0] == 1:
                bounds = np.repeat(bounds, n_elements, 0)
            if bounds.shape[0] != n_elements:
                raise ValueError(
                    'Bounds on %s should have either 1 or %d dimensions. Given are %d'
                    % (name, n_elements, bounds.shape[0]))
        if fixed is None:
            fixed = isinstance(bounds, str) and bounds == 'fixed'
        return super().__new__(cls, name, value_type, bounds, n_elements, fixed)

    def __eq__(self, other):
        return (self.name == other.name
                and self.value_type == other.value_type
                and (isinstance(self.bounds, str) and isinstance(other.bounds, str)
                     and self.bounds == other.bounds
                     or not isinstance(self.bounds, str)
                     and not isinstance(other.bounds, str)
                     and np.all(self.bounds == other.bounds))
                and self.n_elements == other.n_elements
                and self.fixed == other.fixed)


def _sqdist(X, Y=None):
    """Pairwise squared Euclidean distances via explicit differences."""
    if Y is None:
        Y = X
    diff = X[:, None, :] - Y[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


# Cache of jitted kernel-evaluation functions keyed by the kernel's
# *structure* (class tree + fixed parameter values), so repeated calls on
# any structurally-identical kernel reuse one compiled executable instead
# of dispatching eagerly op-by-op.
_JIT_CACHE = {}


class Kernel:
    """Base class for all kernels."""

    # ------------------------------------------------------------------
    # Parameter management (sklearn protocol)
    # ------------------------------------------------------------------
    def get_params(self, deep=True):
        params = {}
        cls = type(self)
        init_sig = inspect.signature(cls.__init__)
        for name, p in init_sig.parameters.items():
            if name == 'self' or p.kind == p.VAR_KEYWORD:
                continue
            params[name] = getattr(self, name)
        return params

    def set_params(self, **params):
        if not params:
            return self
        valid = self.get_params(deep=True)
        for key, value in params.items():
            split = key.split('__', 1)
            if len(split) > 1:
                name, sub_name = split
                if name not in valid:
                    raise ValueError('Invalid parameter %s for kernel %s' % (name, self))
                getattr(self, name).set_params(**{sub_name: value})
            else:
                if key not in valid:
                    raise ValueError('Invalid parameter %s for kernel %s' % (key, self))
                setattr(self, key, value)
        return self

    def clone(self):
        params = self.get_params(deep=False)
        cloned = {}
        for k, v in params.items():
            if isinstance(v, Kernel):
                cloned[k] = v.clone()
            else:
                cloned[k] = copy.deepcopy(v)
        return type(self)(**cloned)

    def clone_with_theta(self, theta):
        cloned = self.clone()
        cloned.theta = theta
        return cloned

    @property
    def n_dims(self):
        return self.theta.shape[0]

    @property
    def hyperparameters(self):
        r = []
        for attr in dir(type(self)):
            if attr.startswith('hyperparameter_'):
                r.append(getattr(self, attr))
        return r

    @property
    def theta(self):
        theta = []
        params = self.get_params()
        for hp in self.hyperparameters:
            if not hp.fixed:
                theta.append(np.atleast_1d(np.asarray(params[hp.name], dtype=float)))
        if theta:
            return np.log(np.hstack(theta))
        return np.array([])

    @theta.setter
    def theta(self, theta):
        theta = np.asarray(theta, dtype=float)
        params = self.get_params()
        i = 0
        for hp in self.hyperparameters:
            if hp.fixed:
                continue
            if hp.n_elements > 1:
                params[hp.name] = np.exp(theta[i:i + hp.n_elements])
                i += hp.n_elements
            else:
                params[hp.name] = np.exp(theta[i])
                i += 1
        if i != len(theta):
            raise ValueError('theta has not the correct number of entries. Should be %d; given are %d'
                             % (i, len(theta)))
        self.set_params(**params)

    @property
    def bounds(self):
        bounds = [hp.bounds for hp in self.hyperparameters if not hp.fixed]
        if bounds:
            return np.log(np.vstack(bounds))
        return np.array([])

    # ------------------------------------------------------------------
    # Evaluation
    # ------------------------------------------------------------------
    def value_fn(self, theta, X, Y=None):
        """K(X, Y) as a pure, traceable function of the free log-params."""
        raise NotImplementedError

    def diag_fn(self, theta, X):
        return jnp.diagonal(self.value_fn(theta, X, None))

    def structure_key(self):
        """Hashable description of the kernel's compute structure.

        Two kernels with the same key evaluate identical functions of
        (theta, X, Y): same class tree, same fixed/free split, and same
        baked-in fixed parameter values.
        """
        params = self.get_params(deep=False)
        free = {hp.name for hp in self.hyperparameters if not hp.fixed}
        items = []
        for name in sorted(params):
            v = params[name]
            if isinstance(v, Kernel):
                items.append((name, v.structure_key()))
            elif name in free:
                # free values are runtime inputs (theta); only arity matters
                items.append((name, 'free', np.atleast_1d(np.asarray(v)).shape[0]))
            elif name.endswith('_bounds'):
                items.append((name, 'fixed' if (isinstance(v, str) and v == 'fixed') else 'open'))
            else:
                arr = np.atleast_1d(np.asarray(v, dtype=object)).ravel()
                items.append((name, tuple(arr.tolist())))
        return (type(self).__name__, tuple(items))

    def _jitted(self, mode):
        """Fetch (or build) the compiled evaluator for this structure.

        mode is one of 'value' (K(X)), 'cross' (K(X, Y)), 'grad'
        ((K, dK/dtheta)), or 'diag'.
        """
        key = (self.structure_key(), mode)
        fn = _JIT_CACHE.get(key)
        if fn is None:
            frozen = self.clone()  # detach from self so later mutation can't alias
            if mode == 'value':
                fn = jax.jit(lambda theta, X: frozen.value_fn(theta, X, None))
            elif mode == 'cross':
                fn = jax.jit(lambda theta, X, Y: frozen.value_fn(theta, X, Y))
            elif mode == 'grad':
                def f(theta, X):
                    K = frozen.value_fn(theta, X, None)
                    dK = jax.jacfwd(lambda t: frozen.value_fn(t, X, None))(theta)
                    return K, dK
                fn = jax.jit(f)
            elif mode == 'diag':
                fn = jax.jit(lambda theta, X: frozen.diag_fn(theta, X))
            else:
                raise ValueError(mode)
            _JIT_CACHE[key] = fn
        return fn

    def __call__(self, X, Y=None, eval_gradient=False):
        X = jnp.atleast_2d(jnp.asarray(X))
        theta = jnp.asarray(self.theta)
        if eval_gradient:
            if Y is not None:
                raise ValueError('Gradient can only be evaluated when Y is None.')
            if theta.shape[0] == 0:
                K = self._jitted('value')(theta, X)
                return K, jnp.empty((K.shape[0], K.shape[0], 0), dtype=K.dtype)
            return self._jitted('grad')(theta, X)
        if Y is None:
            return self._jitted('value')(theta, X)
        Y = jnp.atleast_2d(jnp.asarray(Y))
        return self._jitted('cross')(theta, X, Y)

    def diag(self, X):
        return self._jitted('diag')(jnp.asarray(self.theta), jnp.atleast_2d(jnp.asarray(X)))

    def is_stationary(self):
        return True

    # ------------------------------------------------------------------
    # Composition and comparison
    # ------------------------------------------------------------------
    def __add__(self, b):
        if not isinstance(b, Kernel):
            return Sum(self, ConstantKernel(b))
        return Sum(self, b)

    def __radd__(self, b):
        if not isinstance(b, Kernel):
            return Sum(ConstantKernel(b), self)
        return Sum(b, self)

    def __mul__(self, b):
        if not isinstance(b, Kernel):
            return Product(self, ConstantKernel(b))
        return Product(self, b)

    def __rmul__(self, b):
        if not isinstance(b, Kernel):
            return Product(ConstantKernel(b), self)
        return Product(b, self)

    def __pow__(self, b):
        return Exponentiation(self, b)

    def __eq__(self, b):
        if type(self) != type(b):
            return False
        params_a = self.get_params()
        params_b = b.get_params()
        for key in set(list(params_a.keys()) + list(params_b.keys())):
            if np.any(params_a.get(key, None) != params_b.get(key, None)):
                return False
        return True

    def __repr__(self):
        return '{0}({1})'.format(
            type(self).__name__,
            ', '.join(map('{0:.3g}'.format, np.exp(self.theta))))

    # Resolve free-vs-fixed parameter values given a traced theta vector.
    # exp64, not jnp.exp: the TPU's f64 exp is f32-accurate on scalar
    # shapes, and these scalars set the Gram matrix everywhere (_accmath).
    def _resolve(self, theta):
        vals = {}
        i = 0
        params = self.get_params()
        for hp in self.hyperparameters:
            if hp.fixed:
                vals[hp.name] = jnp.asarray(params[hp.name], dtype=jnp.result_type(float))
            else:
                n = hp.n_elements
                if n > 1:
                    vals[hp.name] = exp64(theta[i:i + n])
                else:
                    vals[hp.name] = exp64(theta[i])
                i += n
        return vals


class ConstantKernel(Kernel):
    R"""Constant kernel: ``k(x, y) = constant_value``.

    sklearn-equivalent of ``ConstantKernel``; reference default kernel is
    ``ConstantKernel(1.0, 'fixed') * RBF(1.0, 'fixed')`` (models.py:146-147).
    """

    def __init__(self, constant_value=1.0, constant_value_bounds=(1e-5, 1e5)):
        self.constant_value = constant_value
        self.constant_value_bounds = constant_value_bounds

    @property
    def hyperparameter_constant_value(self):
        return Hyperparameter('constant_value', 'numeric', self.constant_value_bounds)

    def value_fn(self, theta, X, Y=None):
        vals = self._resolve(theta)
        n = X.shape[0]
        m = n if Y is None else Y.shape[0]
        dt = jnp.result_type(X.dtype, vals['constant_value'].dtype)
        return jnp.full((n, m), vals['constant_value'], dtype=dt)

    def diag_fn(self, theta, X):
        vals = self._resolve(theta)
        dt = jnp.result_type(X.dtype, vals['constant_value'].dtype)
        return jnp.full((X.shape[0],), vals['constant_value'], dtype=dt)

    def __repr__(self):
        return '{0:.3g}**2'.format(np.sqrt(self.constant_value))


class WhiteKernel(Kernel):
    R"""White noise kernel: ``noise_level`` on the diagonal for Y is None, else 0.

    Matches sklearn's semantics that the reference relies on by calling
    ``kernel(X)`` with a single argument for the self-covariance
    (models.py:822-824: "Only use one argument, otherwise WhiteKernel won't
    work right").
    """

    def __init__(self, noise_level=1.0, noise_level_bounds=(1e-5, 1e5)):
        self.noise_level = noise_level
        self.noise_level_bounds = noise_level_bounds

    @property
    def hyperparameter_noise_level(self):
        return Hyperparameter('noise_level', 'numeric', self.noise_level_bounds)

    def value_fn(self, theta, X, Y=None):
        vals = self._resolve(theta)
        dt = jnp.result_type(X.dtype, vals['noise_level'].dtype)
        if Y is None:
            return vals['noise_level'] * jnp.eye(X.shape[0], dtype=dt)
        return jnp.zeros((X.shape[0], Y.shape[0]), dtype=dt)

    def diag_fn(self, theta, X):
        vals = self._resolve(theta)
        dt = jnp.result_type(X.dtype, vals['noise_level'].dtype)
        return jnp.full((X.shape[0],), vals['noise_level'], dtype=dt)

    def __repr__(self):
        return 'WhiteKernel(noise_level={0:.3g})'.format(self.noise_level)


class RBF(Kernel):
    R"""Radial basis function (squared exponential) kernel.

    ``k(x, y) = exp(-0.5 * ||(x - y) / length_scale||^2)`` with scalar
    (isotropic) or vector (anisotropic ARD) length scale.
    """

    def __init__(self, length_scale=1.0, length_scale_bounds=(1e-5, 1e5)):
        self.length_scale = length_scale
        self.length_scale_bounds = length_scale_bounds

    @property
    def anisotropic(self):
        return np.iterable(self.length_scale) and len(np.atleast_1d(self.length_scale)) > 1

    @property
    def hyperparameter_length_scale(self):
        if self.anisotropic:
            return Hyperparameter('length_scale', 'numeric',
                                  self.length_scale_bounds,
                                  len(np.atleast_1d(self.length_scale)))
        return Hyperparameter('length_scale', 'numeric', self.length_scale_bounds)

    def value_fn(self, theta, X, Y=None):
        vals = self._resolve(theta)
        ls = jnp.atleast_1d(vals['length_scale'])
        Xs = X / ls
        Ys = None if Y is None else Y / ls
        return jnp.exp(-0.5 * _sqdist(Xs, Ys))

    def diag_fn(self, theta, X):
        return jnp.ones((X.shape[0],), dtype=X.dtype)

    def __repr__(self):
        if self.anisotropic:
            return 'RBF(length_scale=[{0}])'.format(
                ', '.join(map('{0:.3g}'.format, np.atleast_1d(self.length_scale))))
        return 'RBF(length_scale={0:.3g})'.format(np.squeeze(self.length_scale))


def _kv_real_order(nu, x, series_iters=34, cf_iters=72):
    R"""Modified Bessel function of the second kind :math:`K_\nu(x)` for a
    STATIC real order ``nu > 0`` and a traced array ``x > 0``.

    Temme's method (Temme 1975, J. Comput. Phys. 19; the same scheme
    scipy's ``kv`` uses): write ``nu = mu + n`` with integer ``n`` and
    ``|mu| <= 1/2``, evaluate the pair ``(K_mu, K_{mu+1})`` — by Temme's
    power series for ``x < 2`` and by Steed's continued fraction CF2 for
    ``x >= 2`` — then run the stable upward recurrence
    ``K_{s+1} = K_{s-1} + (2s/x) K_s`` the static ``n`` times.

    Everything order-dependent (gamma constants, trip counts, the
    recurrence depth) is computed on the host from the static ``nu``, so
    the traced program is pure fixed-trip elementwise arithmetic — both
    branches are evaluated and selected with ``where`` (guarded so the
    unselected branch stays finite), which keeps the function jit-able
    and reverse-differentiable on TPU.

    Accuracy: ~1e-13 relative vs scipy.special.kv in float64 over
    x in [1e-6, 30], nu in (0, 20] (tests/test_kernels.py).
    """
    from scipy.special import rgamma as _rgamma

    if nu <= 0:
        raise ValueError('_kv_real_order requires nu > 0')
    n_rec = int(nu + 0.5)
    mu = float(nu - n_rec)               # |mu| <= 1/2
    mu2 = mu * mu

    x = jnp.asarray(x)
    dt = x.dtype
    # ---- host constants (static in the traced program) ----
    inv_g1p = float(_rgamma(1.0 + mu))   # 1/Gamma(1+mu)
    inv_g1m = float(_rgamma(1.0 - mu))   # 1/Gamma(1-mu)
    if abs(mu) > 1e-6:
        gam1 = (inv_g1m - inv_g1p) / (2.0 * mu)
    else:
        # series limit: 1/Gamma(1+z) = 1 + gamma_E z + O(z^2)
        gam1 = -float(np.euler_gamma)
    gam2 = 0.5 * (inv_g1m + inv_g1p)
    # mu*pi/sin(mu*pi) == 1/sinc(mu) (numpy sinc is sin(pi t)/(pi t))
    fact = float(1.0 / np.sinc(mu))

    small = x < 2.0
    # ---------- Temme series branch (x < 2) ----------
    xs = jnp.where(small, x, jnp.asarray(1.0, dt))   # keep logs/powers finite
    half = 0.5 * xs
    dlog = -jnp.log(half)                            # log(2/x)
    e = mu * dlog
    tiny = jnp.abs(e) < 1e-5
    e_safe = jnp.where(tiny, jnp.asarray(1.0, dt), e)
    sinhc = jnp.where(tiny, 1.0 + e * e / 6.0, jnp.sinh(e_safe) / e_safe)
    f0 = fact * (gam1 * jnp.cosh(e) + gam2 * sinhc * dlog)
    ee = jnp.exp(e)
    p0 = 0.5 * ee / inv_g1p
    q0 = 0.5 / (ee * inv_g1m)
    d4 = half * half                                  # x^2/4

    def series_step(carry, i):
        ff, p, q, c, s0, s1 = carry
        ff = (i * ff + p + q) / (i * i - mu2)
        c = c * d4 / i
        p = p / (i - mu)
        q = q / (i + mu)
        s0 = s0 + c * ff
        s1 = s1 + c * (p - i * ff)
        return (ff, p, q, c, s0, s1), None

    ivals = jnp.arange(1, series_iters + 1, dtype=dt)
    ones = jnp.ones_like(xs)
    (_, _, _, _, s0, s1), _ = jax.lax.scan(
        series_step, (f0, p0 * ones, q0 * ones, ones, f0 + 0.0, p0 * ones),
        ivals)
    kmu_ser = s0
    kmu1_ser = s1 * (2.0 / xs)

    # ---------- Steed CF2 branch (x >= 2) ----------
    xc = jnp.where(small, jnp.asarray(2.0, dt), x)
    a1 = 0.25 - mu2
    b = 2.0 * (1.0 + xc)
    d = 1.0 / b
    h = d
    delh = d
    qc = jnp.full_like(xc, a1)

    cf_eps = 10.0 * float(np.finfo(np.dtype(dt)).eps)

    def cf_step(carry, i):
        b0, d0, h0, delh0, q10, q20, a0, c0, qc0, s0, done0 = carry
        a = a0 - 2.0 * (i - 1.0)
        c = -a * c0 / i
        qnew = (q10 - b0 * q20) / a
        q1, q2 = q20, qnew
        qc = qc0 + c * qnew
        b = b0 + 2.0
        d = 1.0 / (b + a * d0)
        delh = (b * d - 1.0) * delh0
        h = h0 + delh
        dels = qc * delh
        s = s0 + dels
        # joint rescale: the recurrences use (q1, q2) only through the
        # product c*qnew, which is invariant under (q1, q2)/r, c*r —
        # without it |c| reaches ~1e103 while |q2| falls to ~1e-93, far
        # outside the f32 exponent range that bounds BOTH dtypes on TPU
        # (f64 there is an f32-range emulation)
        r = jnp.maximum(jnp.maximum(jnp.abs(q1), jnp.abs(q2)),
                        jnp.asarray(1e-30, dt))
        q1, q2, c = q1 / r, q2 / r, c * r
        # freeze once converged: the CF tail DIVERGES past convergence
        # (|qc| ~ 1e42 by trip 72 at x=30 — factorial growth the early-
        # exit loop of a sequential implementation never sees), so the
        # fixed-trip scan must stop updating, not just stop caring
        done = done0 | (jnp.abs(dels) <= cf_eps * jnp.abs(s))
        new = (b, d, h, delh, q1, q2, a, c, qc, s)
        old = (b0, d0, h0, delh0, q10, q20, a0, c0, qc0, s0)
        out = tuple(jnp.where(done0, o, n) for o, n in zip(old, new))
        return out + (done,), None

    cf0 = (b, d, h, delh, jnp.zeros_like(xc), jnp.ones_like(xc),
           jnp.full_like(xc, -a1), jnp.full_like(xc, a1), qc,
           1.0 + qc * delh, jnp.zeros(xc.shape, dtype=bool))
    jvals = jnp.arange(2, cf_iters + 2, dtype=dt)
    (_, _, h, _, _, _, _, _, _, s, _), _ = jax.lax.scan(cf_step, cf0, jvals)
    h = a1 * h
    kmu_cf = jnp.sqrt(np.pi / (2.0 * xc)) * jnp.exp(-xc) / s
    kmu1_cf = kmu_cf * (mu + xc + 0.5 - h) / xc

    kmu = jnp.where(small, kmu_ser, kmu_cf)
    kmu1 = jnp.where(small, kmu1_ser, kmu1_cf)

    # ---------- static upward recurrence to order nu ----------
    two_over_x = 2.0 / x
    for j in range(n_rec):
        kmu, kmu1 = kmu1, kmu + (mu + j + 1.0) * two_over_x * kmu1
    return kmu


class Matern(RBF):
    R"""Matern kernel for any ``nu > 0`` (closed forms for
    ``nu`` in {0.5, 1.5, 2.5, inf}; Temme-series :math:`K_\nu` otherwise —
    the same general-``nu`` surface sklearn's Matern exposes via
    scipy ``kv``, reference models.py:12)."""

    _CLOSED_FORM_NU = (0.5, 1.5, 2.5, np.inf)

    def __init__(self, length_scale=1.0, length_scale_bounds=(1e-5, 1e5), nu=1.5):
        super().__init__(length_scale, length_scale_bounds)
        if not np.isinf(nu):
            nu = float(nu)
            if not nu > 0:
                raise ValueError('Matern needs nu > 0, got %r' % (nu,))
            if nu > 100:
                raise ValueError('Matern nu=%g: beyond nu~100 the kernel '
                                 'is numerically the RBF limit — use '
                                 'nu=inf' % nu)
        self.nu = nu

    def value_fn(self, theta, X, Y=None):
        vals = self._resolve(theta)
        ls = jnp.atleast_1d(vals['length_scale'])
        Xs = X / ls
        Ys = None if Y is None else Y / ls
        sq = _sqdist(Xs, Ys)
        if self.nu == np.inf:
            return jnp.exp(-0.5 * sq)
        # Double-where so d(sqrt)/d(sq) stays finite at sq == 0 under
        # autodiff.  The sq == 0 branch is the kernel's TAYLOR POLYNOMIAL
        # in sq (not the constant 1): nested autodiff of a `where`
        # differentiates the selected branch, so derivative observations
        # at coincident points (gsum_tpu.derivs — e.g. Var[f'(x)] on the
        # diagonal of a constraint covariance) read the branch's
        # derivatives.  A constant branch silently returns 0 where the
        # true limit is finite (e.g. 3/ls^2 for nu=1.5); the polynomial
        # matches every derivative of the kernel that exists at 0.
        zero = sq == 0
        d = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, sq)))
        if self.nu == 0.5:
            # C^0 at 0 — derivative observations are undefined for nu=0.5
            return jnp.where(zero, 1.0, jnp.exp(-d))
        elif self.nu == 1.5:
            # k(u) = (1+u)e^{-u}, u = sqrt(3 sq): 1 - (3/2)sq + O(sq^{3/2})
            K = d * math.sqrt(3)
            return jnp.where(zero, 1.0 - 1.5 * sq, (1. + K) * jnp.exp(-K))
        elif self.nu == 2.5:
            # k(u) = (1+u+u^2/3)e^{-u}, u = sqrt(5 sq):
            # 1 - (5/6)sq + (25/24)sq^2 + O(sq^{5/2})
            K = d * math.sqrt(5)
            return jnp.where(zero,
                             1.0 - (5.0 / 6.0) * sq + (25.0 / 24.0) * sq * sq,
                             (1. + K + K ** 2 / 3.0) * jnp.exp(-K))
        # general real nu: k(d) = 2^{1-nu}/Gamma(nu) * u^nu * K_nu(u),
        # u = sqrt(2 nu) d.  The zero guard pins coincident points to the
        # exact limit 1 (K_nu diverges at 0 but u^nu K_nu(u) -> 2^{nu-1}
        # Gamma(nu)); general-nu derivative observations are rejected by
        # derivs.max_kernel_deriv_order, so the constant branch carrying
        # no Taylor terms is safe.
        from scipy.special import gammaln as _h_gammaln
        nu = float(self.nu)
        u = d * math.sqrt(2.0 * nu)
        u_safe = jnp.where(zero, jnp.asarray(1.0, sq.dtype), u)
        # range-aware floor: K_nu(u) ~ u^{-nu} overflows once
        # u < range^(-1/nu), and on TPU even "f64" carries only the f32
        # exponent range (an f32-pair emulation).  Below the floor the
        # normalized kernel is 1 to far better than the arithmetic's own
        # precision (1 - O(u^2) for nu > 1), so clamping loses nothing.
        lim = -30.0 if (sq.dtype == jnp.float32
                        or jax.default_backend() == 'tpu') else -250.0
        u_safe = jnp.maximum(u_safe, jnp.asarray(10.0 ** (lim / nu),
                                                 sq.dtype))
        log_norm = (1.0 - nu) * math.log(2.0) - float(_h_gammaln(nu))
        val = math.exp(log_norm) * u_safe ** nu * _kv_real_order(nu, u_safe)
        return jnp.where(zero, jnp.asarray(1.0, sq.dtype), val)

    def __repr__(self):
        base = super().__repr__().replace('RBF', 'Matern')
        return base[:-1] + ', nu={0:.3g})'.format(self.nu)


class RationalQuadratic(Kernel):
    R"""Rational quadratic kernel (isotropic): ``(1 + d^2/(2 alpha l^2))^-alpha``."""

    def __init__(self, length_scale=1.0, alpha=1.0,
                 length_scale_bounds=(1e-5, 1e5), alpha_bounds=(1e-5, 1e5)):
        self.length_scale = length_scale
        self.alpha = alpha
        self.length_scale_bounds = length_scale_bounds
        self.alpha_bounds = alpha_bounds

    @property
    def hyperparameter_length_scale(self):
        return Hyperparameter('length_scale', 'numeric', self.length_scale_bounds)

    @property
    def hyperparameter_alpha(self):
        return Hyperparameter('alpha', 'numeric', self.alpha_bounds)

    def value_fn(self, theta, X, Y=None):
        vals = self._resolve(theta)
        sq = _sqdist(X, Y)
        base = 1 + sq / (2 * vals['alpha'] * vals['length_scale'] ** 2)
        return base ** (-vals['alpha'])

    def diag_fn(self, theta, X):
        return jnp.ones((X.shape[0],), dtype=X.dtype)


class ExpSineSquared(Kernel):
    R"""Periodic kernel: ``exp(-2 sin^2(pi d / p) / l^2)``."""

    def __init__(self, length_scale=1.0, periodicity=1.0,
                 length_scale_bounds=(1e-5, 1e5), periodicity_bounds=(1e-5, 1e5)):
        self.length_scale = length_scale
        self.periodicity = periodicity
        self.length_scale_bounds = length_scale_bounds
        self.periodicity_bounds = periodicity_bounds

    @property
    def hyperparameter_length_scale(self):
        return Hyperparameter('length_scale', 'numeric', self.length_scale_bounds)

    @property
    def hyperparameter_periodicity(self):
        return Hyperparameter('periodicity', 'numeric', self.periodicity_bounds)

    def value_fn(self, theta, X, Y=None):
        vals = self._resolve(theta)
        sq = _sqdist(X, Y)
        zero = sq == 0
        d = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, sq)))
        arg = jnp.pi * d / vals['periodicity']
        # sin^2(w*sqrt(sq)) is analytic in sq; the sq == 0 branch carries
        # its Taylor polynomial (w^2 sq - w^4 sq^2/3 + 2 w^6 sq^3/45) so
        # derivative observations at coincident points (gsum_tpu.derivs)
        # autodiff to the correct finite limits instead of 0 (see
        # Matern.value_fn).  Terms through sq^3 make mixed derivatives
        # exact through total order 6 (observation order 3 — the limit
        # enforced by derivs.max_kernel_deriv_order).
        w = jnp.pi / vals['periodicity']
        ws = (w * w) * sq
        sin2 = jnp.where(zero, ws * (1.0 - ws / 3.0 + 2.0 * ws * ws / 45.0),
                         jnp.sin(arg) ** 2)
        return jnp.exp(-2 * sin2 / vals['length_scale'] ** 2)

    def diag_fn(self, theta, X):
        return jnp.ones((X.shape[0],), dtype=X.dtype)


class DotProduct(Kernel):
    R"""Dot-product kernel: ``sigma_0^2 + x . y`` (non-stationary)."""

    def __init__(self, sigma_0=1.0, sigma_0_bounds=(1e-5, 1e5)):
        self.sigma_0 = sigma_0
        self.sigma_0_bounds = sigma_0_bounds

    @property
    def hyperparameter_sigma_0(self):
        return Hyperparameter('sigma_0', 'numeric', self.sigma_0_bounds)

    def value_fn(self, theta, X, Y=None):
        vals = self._resolve(theta)
        if Y is None:
            Y = X
        return vals['sigma_0'] ** 2 + X @ Y.T

    def diag_fn(self, theta, X):
        vals = self._resolve(theta)
        return vals['sigma_0'] ** 2 + jnp.sum(X * X, axis=-1)

    def is_stationary(self):
        return False


class KernelOperator(Kernel):
    """Base class for binary kernel compositions."""

    def __init__(self, k1, k2):
        self.k1 = k1
        self.k2 = k2

    def get_params(self, deep=True):
        params = dict(k1=self.k1, k2=self.k2)
        if deep:
            for prefix, k in (('k1', self.k1), ('k2', self.k2)):
                for key, value in k.get_params(deep=True).items():
                    params['%s__%s' % (prefix, key)] = value
        return params

    def clone(self):
        return type(self)(self.k1.clone(), self.k2.clone())

    @property
    def hyperparameters(self):
        r = [Hyperparameter('k1__' + hp.name, hp.value_type, hp.bounds, hp.n_elements)
             for hp in self.k1.hyperparameters]
        r += [Hyperparameter('k2__' + hp.name, hp.value_type, hp.bounds, hp.n_elements)
              for hp in self.k2.hyperparameters]
        return r

    @property
    def theta(self):
        return np.append(self.k1.theta, self.k2.theta)

    @theta.setter
    def theta(self, theta):
        n1 = self.k1.n_dims
        self.k1.theta = theta[:n1]
        self.k2.theta = theta[n1:]

    @property
    def bounds(self):
        if self.k1.bounds.size == 0:
            return self.k2.bounds
        if self.k2.bounds.size == 0:
            return self.k1.bounds
        return np.vstack((self.k1.bounds, self.k2.bounds))

    def __eq__(self, b):
        if type(self) != type(b):
            return False
        return (self.k1 == b.k1 and self.k2 == b.k2) \
            or (self.k1 == b.k2 and self.k2 == b.k1)

    def is_stationary(self):
        return self.k1.is_stationary() and self.k2.is_stationary()

    def _split(self, theta):
        n1 = self.k1.n_dims
        return theta[:n1], theta[n1:]


class Sum(KernelOperator):
    def value_fn(self, theta, X, Y=None):
        t1, t2 = self._split(theta)
        return self.k1.value_fn(t1, X, Y) + self.k2.value_fn(t2, X, Y)

    def diag_fn(self, theta, X):
        t1, t2 = self._split(theta)
        return self.k1.diag_fn(t1, X) + self.k2.diag_fn(t2, X)

    def __repr__(self):
        return '{0} + {1}'.format(self.k1, self.k2)


class Product(KernelOperator):
    def value_fn(self, theta, X, Y=None):
        t1, t2 = self._split(theta)
        return self.k1.value_fn(t1, X, Y) * self.k2.value_fn(t2, X, Y)

    def diag_fn(self, theta, X):
        t1, t2 = self._split(theta)
        return self.k1.diag_fn(t1, X) * self.k2.diag_fn(t2, X)

    def __repr__(self):
        return '{0} * {1}'.format(self.k1, self.k2)


class Exponentiation(Kernel):
    def __init__(self, kernel, exponent):
        self.kernel = kernel
        self.exponent = exponent

    def get_params(self, deep=True):
        params = dict(kernel=self.kernel, exponent=self.exponent)
        if deep:
            for key, value in self.kernel.get_params(deep=True).items():
                params['kernel__%s' % key] = value
        return params

    def clone(self):
        return Exponentiation(self.kernel.clone(), self.exponent)

    @property
    def hyperparameters(self):
        return [Hyperparameter('kernel__' + hp.name, hp.value_type, hp.bounds, hp.n_elements)
                for hp in self.kernel.hyperparameters]

    @property
    def theta(self):
        return self.kernel.theta

    @theta.setter
    def theta(self, theta):
        self.kernel.theta = theta

    @property
    def bounds(self):
        return self.kernel.bounds

    def value_fn(self, theta, X, Y=None):
        return self.kernel.value_fn(theta, X, Y) ** self.exponent

    def diag_fn(self, theta, X):
        return self.kernel.diag_fn(theta, X) ** self.exponent

    def __eq__(self, b):
        if type(self) != type(b):
            return False
        return self.kernel == b.kernel and self.exponent == b.exponent

    def is_stationary(self):
        return self.kernel.is_stationary()

    def __repr__(self):
        return '{0} ** {1}'.format(self.kernel, self.exponent)
