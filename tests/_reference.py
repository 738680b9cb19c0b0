"""Imports the reference gsum (read-only at /root/reference) as a test oracle.

The reference needs ``docrep`` and ``statsmodels``, which are not installed;
both are shimmed here with minimal functional equivalents (docrep only
manipulates docstrings; statsmodels provides the MVT distribution, which we
back with scipy's multivariate_t).  The reference code itself is never
modified or copied — it is executed as-is for numerical comparison.
"""
import sys
import types

import numpy as np


def _install_docrep_shim():
    if 'docrep' in sys.modules:
        return
    mod = types.ModuleType('docrep')

    class DocstringProcessor:
        def __init__(self, *a, **k):
            self.params = {}

        def get_sectionsf(self, name, *a, **k):
            def deco(obj):
                return obj
            return deco

        def dedent(self, obj):
            return obj

        def get_sections(self, *a, **k):
            def deco(obj):
                return obj
            return deco

    mod.DocstringProcessor = DocstringProcessor
    sys.modules['docrep'] = mod


def _install_statsmodels_shim():
    if 'statsmodels' in sys.modules:
        return
    from scipy import stats as _st

    class MVT:
        """statsmodels-compatible multivariate t backed by scipy."""

        def __init__(self, mean, sigma, df):
            self.mean = np.asarray(mean)
            self.sigma = np.asarray(sigma)
            self.df = df
            self._dist = _st.multivariate_t(loc=self.mean, shape=self.sigma,
                                            df=df)
            self.random_state = None

        def rvs(self, size=1):
            return self._dist.rvs(size=size,
                                  random_state=self.random_state)

        def logpdf(self, x):
            return self._dist.logpdf(x)

        def pdf(self, x):
            return self._dist.pdf(x)

    root = types.ModuleType('statsmodels')
    sandbox = types.ModuleType('statsmodels.sandbox')
    distributions = types.ModuleType('statsmodels.sandbox.distributions')
    mv_normal = types.ModuleType('statsmodels.sandbox.distributions.mv_normal')
    mv_normal.MVT = MVT
    root.sandbox = sandbox
    sandbox.distributions = distributions
    distributions.mv_normal = mv_normal
    sys.modules['statsmodels'] = root
    sys.modules['statsmodels.sandbox'] = sandbox
    sys.modules['statsmodels.sandbox.distributions'] = distributions
    sys.modules['statsmodels.sandbox.distributions.mv_normal'] = mv_normal


def _patch_numpy2_compat(gsum):
    """The reference's `_calibrate_kernel` does `np.array(list_of_(theta, f))`
    (models.py:664), which numpy >= 2.0 rejects as ragged.  Patch the method
    in memory with the same logic minus the ragged-array construction so the
    reference can run as an oracle on this numpy."""
    Base = gsum.models.BaseConjugateProcess

    def _calibrate_kernel(self):
        if self.optimizer is not None and self.kernel_.n_dims > 0:
            def obj_func(theta, eval_gradient=True):
                if eval_gradient:
                    lml, grad = self.log_marginal_likelihood(
                        theta, eval_gradient=True)
                    return -lml, -grad
                return -self.log_marginal_likelihood(theta)

            optima = [self._constrained_optimization(
                obj_func, self.kernel_.theta, self.kernel_.bounds)]
            if self.n_restarts_optimizer > 0:
                if not np.isfinite(self.kernel_.bounds).all():
                    raise ValueError(
                        "Multiple optimizer restarts (n_restarts_optimizer>0) "
                        "requires that all bounds are finite.")
                bounds = self.kernel_.bounds
                for _ in range(self.n_restarts_optimizer):
                    theta_initial = self._rng.uniform(bounds[:, 0], bounds[:, 1])
                    optima.append(self._constrained_optimization(
                        obj_func, theta_initial, bounds))
            lml_values = [opt[1] for opt in optima]
            best = int(np.argmin(lml_values))
            self.kernel_.theta = optima[best][0]
            self.log_marginal_likelihood_value_ = -np.min(lml_values)
        else:
            self.log_marginal_likelihood_value_ = \
                self.log_marginal_likelihood(self.kernel_.theta)

    Base._calibrate_kernel = _calibrate_kernel


def import_reference():
    """Returns the reference gsum package, shimming its missing deps."""
    _install_docrep_shim()
    _install_statsmodels_shim()
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    import gsum  # noqa: E402
    _patch_numpy2_compat(gsum)
    return gsum
