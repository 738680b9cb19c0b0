R"""Model-checking diagnostics (Bastos & O'Hagan style) and their plots.

TPU-native rebuild of the reference ``gsum/diagnostics.py``: the numerical
diagnostics (whitened errors, Mahalanobis distance, KL, credible-interval
coverage, variogram) run in JAX on device; the reference distributions come
from ``gsum_tpu.stats`` instead of scipy/statsmodels; plotting stays
host-side matplotlib with the reference's API.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import _config  # noqa: F401
from . import stats as gstats
from .helpers import VariogramFourthRoot
from .linalg import cholesky_errors, mahalanobis, pivoted_cholesky, spd_logdet

__all__ = ['Diagnostic', 'GraphicalDiagnostic']


class Diagnostic:
    R"""Numerical model-checking diagnostics for a given (mean, cov[, df]).

    reference: diagnostics.py:21-194.

    Parameters
    ----------
    mean : (n_samples,) array
    cov : (n_samples, n_samples) array
    df : int, optional — Student-t reference if given, else Gaussian
    random_state : int, optional
    """

    def __init__(self, mean, cov, df=None, random_state=1):
        self.mean = mean = jnp.asarray(mean)
        self.cov = cov = jnp.asarray(cov)
        self.sd = sd = jnp.sqrt(jnp.diag(cov))
        if df is None:
            self.dist = gstats.multivariate_normal(mean=mean, cov=cov)
            self.udist = gstats.norm(loc=mean, scale=sd)
            self.std_udist = gstats.norm(loc=0., scale=1.)
        else:
            sigma = cov * (df - 2) / df
            self.dist = gstats.multivariate_t(mean=mean, sigma=sigma, df=df)
            self.udist = gstats.t(loc=mean, scale=sd, df=df)
            self.std_udist = gstats.t(loc=0., scale=1., df=df)
        self.dist.random_state = random_state
        self.udist.random_state = random_state
        self.std_udist.random_state = random_state

        self._chol = jnp.linalg.cholesky(self.cov)
        self._pchol, self._piv, _ = pivoted_cholesky(self.cov, return_pivots=True)

        e, v = jnp.linalg.eigh(self.cov)
        # Bastos & O'Hagan order eigenvalues largest-to-smallest
        e, v = e[::-1], v[:, ::-1]
        self._eig_vals, self._eig_vecs = e, v
        self._eig = v @ jnp.diag(jnp.sqrt(e))

    def samples(self, n):
        R"""n reference draws, shape (n_samples, n_curves).  reference: diagnostics.py:70-82."""
        return self.dist.rvs(n).T

    def individual_errors(self, y):
        R"""(y - m) / sigma pointwise.  reference: diagnostics.py:84-98."""
        y = jnp.asarray(y)
        return ((y.T - self.mean) / jnp.sqrt(jnp.diag(self.cov))).T

    def cholesky_errors(self, y):
        y = jnp.asarray(y)
        return cholesky_errors(y.T, self.mean, self._chol).T

    def pivoted_cholesky_errors(self, y):
        # G = P L (row-permuted lower-triangular), so G x = b solves as a
        # triangular solve of the pivot-gathered rhs — no LU needed (the
        # TPU backend has no f64 LU).
        from jax.scipy.linalg import solve_triangular

        y = jnp.asarray(y)
        b = (y.T - self.mean).T
        L = self._pchol[self._piv]
        return solve_triangular(L, b[self._piv], lower=True)

    def eigen_errors(self, y):
        # E = V sqrt(e) with orthonormal V, so E^{-1} = diag(1/sqrt(e)) V^T
        y = jnp.asarray(y)
        b = (y.T - self.mean).T
        return (self._eig_vecs.T @ b) / jnp.sqrt(self._eig_vals)[:, None]

    def chi2(self, y):
        return jnp.sum(self.individual_errors(y), axis=0)

    def md_squared(self, y):
        R"""Squared Mahalanobis distance.  reference: diagnostics.py:112-114."""
        y = jnp.asarray(y)
        return mahalanobis(y.T, self.mean, self._chol) ** 2

    def kl(self, mean, cov):
        R"""KL divergence D_KL(N(mean, cov) || N(self.mean, self.cov)).

        reference: diagnostics.py:116-146.
        """
        from jax.scipy.linalg import cho_solve

        m1, c1, chol1 = self.mean, self.cov, self._chol
        m0, c0 = jnp.asarray(mean), jnp.asarray(cov)
        tr = jnp.trace(cho_solve((chol1, True), c0))
        dist = self.md_squared(m0)
        k = c1.shape[-1]
        logs = 2 * jnp.sum(jnp.log(jnp.diag(chol1))) - spd_logdet(c0)
        return 0.5 * (tr + dist - k + logs)

    def credible_interval(self, y, intervals):
        R"""Empirical coverage of pointwise credible intervals.

        reference: diagnostics.py:148-171.
        """
        y = jnp.asarray(y)
        intervals = jnp.atleast_2d(jnp.asarray(intervals)).T
        lower, upper = self.udist.interval(intervals)

        y2 = jnp.atleast_2d(y.T)  # (n_curves, n_samples)
        # indicator: (n_curves, n_intervals, n_samples)
        ind = (lower[None, :, :] < y2[:, None, :]) & (y2[:, None, :] < upper[None, :, :])
        dci = jnp.mean(ind.astype(jnp.result_type(float)), axis=-1)
        if y.ndim == 1:
            dci = jnp.squeeze(dci)
        return dci

    @staticmethod
    def variogram(X, y, bin_bounds):
        R"""Variogram wrapper.  reference: diagnostics.py:173-194."""
        v = VariogramFourthRoot(X, y, bin_bounds)
        bin_locations = v.bin_locations
        gamma, lower, upper = v.compute(rt_scale=False)
        return v, bin_locations, gamma, lower, upper


class GraphicalDiagnostic:
    R"""Graphical model-checking dashboard over :class:`Diagnostic`.

    Covers the reference's plotting capability (gsum/diagnostics.py:197-669:
    whitened-error index plots, QQ plots with simulated envelopes, MD²
    summaries, credible-interval coverage, KL and variogram panels, and the
    ``plotzilla``/``essentials`` dashboards) with an original architecture:
    every envelope is a batched device computation over the full
    reference-sample set (``gsum_tpu.viz``), and rendering is a set of
    generic matplotlib primitives — no pandas/seaborn.

    Parameters
    ----------
    data : (n_samples,) or (n_samples, n_curves) observed curves
    mean, cov : reference-process moments at the same points
    df : int, optional — Student-t reference process if given
    nref : int — number of simulated reference draws for the envelopes
    colors, markers, labels, gray, black, markeredgecolors,
    markerfillstyles : style overrides (matplotlib cycle by default)
    """

    #: whitening-map registry: name -> Diagnostic method name
    _WHITENERS = {
        'individual': 'individual_errors',
        'cholesky': 'cholesky_errors',
        'pivoted_cholesky': 'pivoted_cholesky_errors',
        'eigen': 'eigen_errors',
    }

    def __init__(self, data, mean, cov, df=None, random_state=1, nref=1000,
                 colors=None, markers=None, labels=None, gray='lightgray',
                 black='#262626', markeredgecolors=None, markerfillstyles=None):
        from . import viz

        self.diagnostic = Diagnostic(mean=mean, cov=cov, df=df,
                                     random_state=random_state)
        data = jnp.asarray(data)
        if data.ndim == 1:
            data = data[:, None]
        self.data = data
        self.nref = int(nref)
        self.samples = self.diagnostic.samples(self.nref)   # (N, nref)

        if labels is None:
            labels = [r'$c_{{{}}}$'.format(i) for i in range(data.shape[1])]
        self.labels = labels
        self.style = viz.PlotStyle(
            colors=colors, markers=markers, labels=labels, gray=gray,
            black=black, markeredgecolors=markeredgecolors,
            markerfillstyles=markerfillstyles)
        # style attributes kept as aliases for API parity
        self.colors = self.style.colors
        self.markers = self.style.markers
        self.gray = gray
        self.black = black

        n = int(np.asarray(cov).shape[-1])
        if df is None:
            self.md_ref_dist = gstats.chi2(df=n)
        else:
            self.md_ref_dist = gstats.f(dfn=n, dfd=df,
                                        scale=(df - 2) * n / df)
        self._ref_err_cache = {}

    # ------------------------------------------------------------------
    # Device-side envelope data (exposed for numeric testing)
    # ------------------------------------------------------------------
    def _whiten(self, name):
        return getattr(self.diagnostic, self._WHITENERS[name])

    def _ref_errors(self, name):
        """Whitened reference draws (N, nref), computed once per map."""
        if name not in self._ref_err_cache:
            self._ref_err_cache[name] = self._whiten(name)(self.samples)
        return self._ref_err_cache[name]

    def _qq_pipeline(self, data, whiten, ref_errors, band_perc):
        """Shared QQ arrays: theoretical quantiles of the standardized
        reference distribution, per-curve order statistics of the
        whitened data, and simulated order-statistic envelopes."""
        from . import viz

        N = jnp.asarray(data).shape[0]
        probs = (jnp.arange(1, N + 1) - 0.5) / N
        theo_q = np.asarray(self.diagnostic.std_udist.ppf(probs))
        sorted_data = np.sort(np.asarray(whiten(data)), axis=0)
        bands = viz.sorted_sample_envelope(ref_errors, band_perc)
        return theo_q, sorted_data, bands

    def qq_band_data(self, name, band_perc=(0.68, 0.95)):
        """The arrays behind a QQ panel: theoretical quantiles of the
        standardized reference distribution, per-curve order statistics of
        the whitened data, and simulated order-statistic envelopes.

        Returns (theo_q, sorted_data, bands); bands is a list of (lo, hi)
        (N,) arrays, one pair per entry of band_perc.
        """
        return self._qq_pipeline(self.data, self._whiten(name),
                                 self._ref_errors(name), band_perc)

    def coverage_band_data(self, intervals, band_perc=(0.68, 0.95)):
        """The arrays behind the credible-interval panel: per-curve data
        coverage and simulated coverage envelopes across the draws."""
        from . import viz

        data_cov = np.atleast_2d(
            np.asarray(self.diagnostic.credible_interval(self.data,
                                                         intervals)))
        ref_cov = self.diagnostic.credible_interval(self.samples, intervals)
        bands = viz.coverage_envelope(ref_cov, band_perc)
        return data_cov, bands

    # ------------------------------------------------------------------
    # Error index plots and QQ plots
    # ------------------------------------------------------------------
    def error_plot(self, err, title=None, xlabel='Index', ylabel=None,
                   ax=None):
        from . import viz

        sigma = float(np.asarray(self.diagnostic.std_udist.std()))
        return viz.draw_index_errors(err, sigma, self.style, title=title,
                                     xlabel=xlabel, ylabel=ylabel, ax=ax)

    def _errors_panel(self, name, title, ax):
        return self.error_plot(self._whiten(name)(self.data), title=title,
                               ax=ax)

    def _qq_panel(self, name, band_perc, title, ax):
        from . import viz

        theo_q, sorted_data, bands = self.qq_band_data(name, band_perc)
        return viz.draw_qq(theo_q, sorted_data, bands, self.style,
                           title=title, ax=ax)

    def individual_errors(self, title='Individual Errors', ax=None):
        return self._errors_panel('individual', title, ax)

    def cholesky_errors(self, title='Cholesky Errors', ax=None):
        return self._errors_panel('cholesky', title, ax)

    def pivoted_cholesky_errors(self, title='Pivoted Cholesky Errors',
                                ax=None):
        return self._errors_panel('pivoted_cholesky', title, ax)

    def eigen_errors(self, title='Eigen Errors', ax=None):
        return self._errors_panel('eigen', title, ax)

    def individual_errors_qq(self, title='Individual QQ Plot', ax=None):
        return self._qq_panel('individual', (0.68, 0.95), title, ax)

    def cholesky_errors_qq(self, title='Cholesky QQ Plot', ax=None):
        return self._qq_panel('cholesky', (0.68, 0.95), title, ax)

    def pivoted_cholesky_errors_qq(self, title='Pivoted Cholesky QQ Plot',
                                   ax=None):
        return self._qq_panel('pivoted_cholesky', (0.68, 0.95), title, ax)

    def eigen_errors_qq(self, title='Eigen QQ Plot', ax=None):
        return self._qq_panel('eigen', (0.68, 0.95), title, ax)

    def qq(self, data, ref, band_perc, func, title=None, ax=None):
        """Generic QQ panel for a custom whitening map ``func`` (kept for
        API parity with the reference; the named ``*_qq`` methods cover the
        standard maps)."""
        from . import viz

        theo_q, sorted_data, bands = self._qq_pipeline(data, func,
                                                       func(ref), band_perc)
        return viz.draw_qq(theo_q, sorted_data, bands, self.style,
                           title=title, ax=ax)

    # ------------------------------------------------------------------
    # Distribution summaries (hist / box / violin)
    # ------------------------------------------------------------------
    def _dist_grid(self, dist, n=200, tail=2e-3):
        lo = float(np.asarray(dist.ppf(tail)))
        hi = float(np.asarray(dist.ppf(1.0 - tail)))
        xs = np.linspace(lo, hi, n)
        return xs, np.asarray(dist.pdf(xs))

    def hist(self, data, ref, title=None, xlabel=None, ylabel=None,
             vlines=True, ax=None):
        """Observed statistics against a reference distribution (an object
        with ppf/pdf) or a set of reference samples (an array)."""
        from . import viz

        if hasattr(ref, 'ppf'):
            xs, pdf = self._dist_grid(ref)
            two_sigma = (ref.ppf(0.025), ref.ppf(0.975))
            ax = viz.draw_pdf_reference(
                xs, pdf, data, self.style, labels=self.labels, title=title,
                xlabel=xlabel, two_sigma=two_sigma, vlines=vlines, ax=ax)
        else:
            import matplotlib.pyplot as plt

            if ax is None:
                ax = plt.gca()
            ref = np.asarray(ref).ravel()
            m, sd = float(ref.mean()), float(ref.std(ddof=1))
            ax.hist(ref, density=True, histtype='step', color=self.black,
                    label='ref')
            for v in (m - 2 * sd, m + 2 * sd):
                ax.axvline(v, color='gray', ls='--', lw=1)
            if vlines:
                for i, v in enumerate(np.atleast_1d(np.asarray(data))):
                    ax.axvline(float(v), zorder=10,
                               color=self.colors[i % len(self.colors)])
            else:
                ax.hist(np.asarray(data), density=True, histtype='step',
                        label='data')
            ax.legend(fontsize='small')
            if title:
                ax.set_title(title)
            if xlabel:
                ax.set_xlabel(xlabel)
        if ylabel:
            ax.set_ylabel(ylabel)
        return ax

    def box(self, data, ref, title=None, xlabel=None, ylabel=None,
            trim=True, size=8, legend=False, ax=None):
        # ``size``/``legend`` are accepted for reference API parity
        # (reference diagnostics.py:387); the box renderer has no marker
        # sizing or legend content, so they are no-ops as in practice there
        del size, legend
        from . import viz

        if hasattr(ref, 'ppf'):
            ppf = ref.ppf
        else:
            arr = np.asarray(ref).ravel()
            ppf = lambda q: np.quantile(arr, q)   # noqa: E731
        ax = viz.draw_dist_box(ppf, data, self.style, title=title, ax=ax)
        if xlabel:
            ax.set_xlabel(xlabel)
        if ylabel:
            ax.set_ylabel(ylabel)
        return ax

    def violin(self, data, ref, title=None, xlabel=None, ylabel=None,
               ax=None):
        from . import viz

        if hasattr(ref, 'pdf'):
            xs, pdf = self._dist_grid(ref)
        else:
            arr = np.asarray(ref).ravel()
            xs = np.linspace(arr.min(), arr.max(), 100)
            h = max(arr.std(ddof=1) * arr.size ** (-0.2), 1e-12)
            pdf = np.exp(-0.5 * ((xs[:, None] - arr[None]) / h) ** 2
                         ).sum(axis=1) / (arr.size * h * np.sqrt(2 * np.pi))
        ax = viz.draw_dist_violin(xs, pdf, data, self.style, title=title,
                                  ax=ax)
        if xlabel:
            ax.set_xlabel(xlabel)
        if ylabel:
            ax.set_ylabel(ylabel)
        return ax

    # ------------------------------------------------------------------
    # Named diagnostics
    # ------------------------------------------------------------------
    def md_squared(self, ax=None, type='hist',
                   title='Mahalanobis Distance', **kwargs):
        """Squared Mahalanobis distance of each curve vs its reference
        distribution (χ²(n), or a scaled F for the Student-t process)."""
        md = np.atleast_1d(np.asarray(self.diagnostic.md_squared(self.data)))
        renderer = {'hist': self.hist, 'box': self.box,
                    'violin': self.violin}[type]
        return renderer(md, self.md_ref_dist, title=title, ax=ax, **kwargs)

    def kl(self, X, gp, predict=False, vlines=True, title='KL Divergence',
           ax=None, engine='auto', fit_kws=None):
        """Where the data's KL falls among reference draws: the GP is refit
        to every reference sample and to each data curve; each fit's
        (mean, cov) at X is compared to the diagnostic's via KL.

        This is the heaviest diagnostic in the suite (reference
        diagnostics.py:527-555 refits the GP once per draw, nref=1000 by
        default).  ``engine``:

        - 'batched' — all refits run as ONE chunked lockstep batched fit
          on device (``parallel.batched_fit``) and all KLs in one vmapped
          call: seconds instead of nref sequential host-loop fits.
          Requires a plain ``ConjugateGaussianProcess`` with the default
          constant basis and cholesky decomposition.
        - 'loop' — the reference's per-draw refit loop (any process type).
        - 'auto' — 'batched' whenever the gp qualifies.

        ``fit_kws`` are forwarded to ``parallel.batched_fit`` (e.g.
        ``chunk=``, ``maxiter=``, ``engine=`` for the lml engine).
        """
        data_kls, ref_kls = self.kl_data(X, gp, predict=predict,
                                         engine=engine, fit_kws=fit_kws)
        return self.hist(data_kls, ref_kls, title=title, vlines=vlines,
                         ax=ax)

    def kl_data(self, X, gp, predict=False, engine='auto', fit_kws=None):
        """The numbers behind :meth:`kl`: ``(data_kls, ref_kls)`` arrays.
        See :meth:`kl` for the ``engine`` semantics."""
        X = np.asarray(X)
        n_ref = self.samples.shape[1]
        n_data = self.data.shape[1]

        if engine not in ('auto', 'batched', 'loop'):
            raise ValueError("engine must be 'auto', 'batched', or 'loop'")
        use_batched = engine == 'batched' or (
            engine == 'auto' and self._kl_batchable(gp))
        if engine == 'batched' and not self._kl_batchable(gp):
            raise ValueError('engine="batched" needs a plain '
                             'ConjugateGaussianProcess with the default '
                             'constant basis and cholesky decomposition')

        if use_batched:
            Y_all = np.concatenate([np.asarray(self.samples),
                                    np.asarray(self.data)], axis=1).T
            kls = np.asarray(self._kl_batched(X, gp, Y_all, predict,
                                              fit_kws or {}))
            ref_kls, data_kls = kls[:n_ref], kls[n_ref:]
        else:
            def fit_kl(y):
                g = gp.fit(X, np.asarray(y))
                if predict:
                    m, c = g.predict(X, return_cov=True)
                else:
                    m, c = g.mean(X), g.cov(X)
                return float(np.asarray(self.diagnostic.kl(m, c)))

            ref_kls = np.asarray([fit_kl(self.samples[:, i])
                                  for i in range(n_ref)])
            data_kls = np.asarray([fit_kl(self.data[:, i])
                                   for i in range(n_data)])
        return data_kls, ref_kls

    @staticmethod
    def _kl_batchable(gp):
        from .models import ConjugateGaussianProcess, _default_basis

        return (type(gp) is ConjugateGaussianProcess
                and gp.basis is _default_basis
                and gp.decomposition == 'cholesky')

    def _kl_batched(self, X, gp, Y_all, predict, fit_kws):
        """Device-batched KL: one lockstep batched MAP fit of every curve
        (or, for a fully-fixed kernel, one shared factorization + vmapped
        conjugate updates), then one vmapped (mean, cov, KL) evaluation."""
        import jax

        from . import conjugate as _conj
        from .parallel.batched import batched_fit

        kernel = gp.kernel if gp.kernel is not None else gp._default_kernel
        frozen = kernel.clone()
        Xj = jnp.atleast_2d(jnp.asarray(X))
        diag = self.diagnostic
        Y2 = jnp.asarray(Y_all)[:, :, None]
        B = Y_all.shape[0]

        if gp.optimizer is not None and int(np.asarray(kernel.theta).size):
            seed = gp.random_state if isinstance(gp.random_state,
                                                 (int, np.integer)) else 0
            kws = dict(center=gp.center0, disp=gp.disp0, df=gp.df0,
                       scale=gp.scale0, nugget=gp.nugget,
                       n_restarts=gp.n_restarts_optimizer, seed=int(seed))
            kws.update(fit_kws)
            post = batched_fit(kernel, X, Y_all, **kws)
            thetas, centers = post.theta, post.center
            cov_factors, chols = post.cov_factor, post.chol
        else:
            # no optimization happens (fixed kernel, or optimizer=None):
            # the correlation matrix is shared, so factorize once and vmap
            # the closed-form conjugate update
            theta0 = jnp.asarray(kernel.theta, dtype=Xj.dtype)
            R0 = frozen.value_fn(theta0, Xj, None)
            L0 = jnp.linalg.cholesky(
                R0 + gp.nugget * jnp.eye(Xj.shape[0], dtype=R0.dtype))
            basis1 = jnp.ones((Xj.shape[0], 1), dtype=R0.dtype)
            c0, V0 = gp.center0, gp.disp0
            df0, scale0 = gp.df0, gp.scale0

            def upd(y2):
                c = _conj.compute_center(y2, L0, basis1, c0, V0)
                s2 = _conj.compute_scale_sq(y2, L0, basis1, c0, V0,
                                            df0, scale0)
                df = _conj.compute_df(y2, df0)
                return c, _conj.compute_cov_factor(s2, df)

            centers, cov_factors = jax.jit(jax.vmap(upd))(Y2)
            # every draw shares the unoptimized kernel θ — which is NOT
            # necessarily empty (optimizer=None with free parameters
            # lands here too, and value_fn still indexes θ)
            thetas = jnp.broadcast_to(theta0, (B,) + theta0.shape)
            chols = jnp.broadcast_to(L0, (B,) + L0.shape)

        def one(theta, center, cov_factor, chol, y2):
            from jax.scipy.linalg import cho_solve

            R = frozen.value_fn(theta, Xj, None)
            # constant basis (enforced by _kl_batchable): mean = 1 * center
            mean = jnp.ones((Xj.shape[0],), R.dtype) * jnp.squeeze(center)
            if predict:
                # conditioned at the training points themselves
                alpha = cho_solve((chol, True), y2 - mean[:, None])
                m_pred = mean + jnp.squeeze(R @ alpha, -1)
                R_pred = R - R @ cho_solve((chol, True), R)
                return diag.kl(m_pred, cov_factor * R_pred)
            return diag.kl(mean, cov_factor * R)

        fn = jax.jit(jax.vmap(one))
        return fn(thetas, centers, cov_factors, chols, Y2)

    def credible_interval(self, intervals, band_perc, ax=None,
                          title='Credible Interval Diagnostic',
                          xlabel='Credible Interval',
                          ylabel='Empirical Coverage', linestyles=None):
        from . import viz

        intervals = np.atleast_1d(np.asarray(intervals, dtype=float))
        data_cov, bands = self.coverage_band_data(intervals, band_perc)
        return viz.draw_coverage(intervals, data_cov, bands, self.style,
                                 title=title, ax=ax, xlabel=xlabel,
                                 ylabel=ylabel, linestyles=linestyles)

    def variogram(self, X, title='Variogram', xlabel='Lag', ax=None,
                  n_bins=6):
        import matplotlib.pyplot as plt

        if ax is None:
            ax = plt.gca()
        X = np.asarray(X)
        d = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
        # the estimator takes n_bins-1 INTERIOR boundaries (np.digitize
        # semantics: first bin reaches down to 0, last extends past the
        # max lag) — passing n_bins bounds used to create a meaningless
        # (n_bins+1)-th overflow bin holding only the single extreme pair
        bounds = np.linspace(0.0, d.max(), n_bins + 1)[1:-1]
        y = np.asarray(self.data).T   # (n_curves, n_samples)
        _, loc, gamma, lower, upper = self.diagnostic.variogram(X, y, bounds)
        loc = np.asarray(loc)
        gamma = np.atleast_2d(np.asarray(gamma).T)
        lower = np.atleast_2d(np.asarray(lower).T)
        upper = np.atleast_2d(np.asarray(upper).T)
        for i in range(gamma.shape[0]):
            c = self.style.curve(i)
            ax.plot(loc, gamma[i], color=c['color'], marker=c['marker'],
                    ls='-')
            ax.fill_between(loc, lower[i], upper[i], facecolor=c['color'],
                            alpha=0.2, lw=0)
        ax.set_xlabel(xlabel)
        if title:
            ax.set_title(title)
        return ax

    # ------------------------------------------------------------------
    # Dashboards
    # ------------------------------------------------------------------
    def plotzilla(self, X, gp=None, predict=False, vlines=True):
        """Everything at once: the four error maps and their QQ panels,
        MD², credible-interval coverage, variogram, and (given a gp) KL."""
        from . import viz

        panels = [
            lambda ax: self.individual_errors(ax=ax),
            lambda ax: self.cholesky_errors(ax=ax),
            lambda ax: self.pivoted_cholesky_errors(ax=ax),
            lambda ax: self.eigen_errors(ax=ax),
            lambda ax: self.individual_errors_qq(ax=ax),
            lambda ax: self.cholesky_errors_qq(ax=ax),
            lambda ax: self.pivoted_cholesky_errors_qq(ax=ax),
            lambda ax: self.eigen_errors_qq(ax=ax),
            lambda ax: self.md_squared(ax=ax, vlines=vlines),
            lambda ax: self.credible_interval(
                np.linspace(0.001, 0.999, 50), (0.68, 0.95), ax=ax),
            lambda ax: self.variogram(X, ax=ax),
        ]
        if gp is not None:
            panels.append(lambda ax: self.kl(X, gp, predict=predict,
                                             vlines=vlines, ax=ax))
        fig, axes = viz.grid_figure(len(panels), ncols=4)
        for panel, ax in zip(panels, axes.flat):
            panel(ax)
        return fig, axes

    def essentials(self, vlines=True, bare=False):
        """The short dashboard: Cholesky error index plot, MD², and
        credible-interval coverage."""
        from . import viz

        fig, axes = viz.grid_figure(3, ncols=3)
        self.cholesky_errors(ax=axes.flat[0],
                             title=None if bare else 'Cholesky Errors')
        self.md_squared(ax=axes.flat[1], vlines=vlines,
                        title=None if bare else 'Mahalanobis Distance')
        self.credible_interval(
            np.linspace(0.001, 0.999, 50), (0.68, 0.95), ax=axes.flat[2],
            title=None if bare else 'Credible Interval Diagnostic')
        if bare:
            for ax in axes.flat:
                leg = ax.get_legend()
                if leg is not None:
                    leg.remove()
        return fig, axes
