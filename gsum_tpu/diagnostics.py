R"""Model-checking diagnostics (Bastos & O'Hagan style) and their plots.

TPU-native rebuild of the reference ``gsum/diagnostics.py``: the numerical
diagnostics (whitened errors, Mahalanobis distance, KL, credible-interval
coverage, variogram) run in JAX on device; the reference distributions come
from ``gsum_tpu.stats`` instead of scipy/statsmodels; plotting stays
host-side matplotlib with the reference's API.
"""
from __future__ import annotations

from itertools import cycle

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
    R"""Plotting layer over :class:`Diagnostic` with simulated reference bands.

    reference: diagnostics.py:197-669.  Numerics (errors, MD², coverage, KL)
    run on device; rendering is host-side matplotlib/seaborn/pandas.
    """

    def __init__(self, data, mean, cov, df=None, random_state=1, nref=1000,
                 colors=None, markers=None, labels=None, gray='lightgray',
                 black='#262626', markeredgecolors=None, markerfillstyles=None):
        import matplotlib as mpl
        from cycler import cycler

        self.diagnostic = Diagnostic(mean=mean, cov=cov, df=df,
                                     random_state=random_state)
        data = jnp.asarray(data)
        if data.ndim == 1:
            data = jnp.atleast_2d(data).T
        self.data = data
        self.samples = self.diagnostic.samples(nref)
        prop_list = list(mpl.rcParams['axes.prop_cycle'])
        if colors is None:
            colors = [c['color'] for c in prop_list]
        if markers is None:
            markers = ['o' for _ in prop_list]
        if markeredgecolors is None:
            markeredgecolors = [None for _ in prop_list]
        if markerfillstyles is None:
            markerfillstyles = ['full' for _ in prop_list]
        if labels is None:
            labels = np.array([r'$c_{{{}}}$'.format(i) for i in range(data.shape[-1])])
        self.labels = labels
        self.markers = markers
        self.markeredgecolors = markeredgecolors
        self.markerfillstyles = markerfillstyles
        self.marker_cycle = cycler('marker', colors)
        self.colors = colors
        self.color_cycle = cycler('color', colors)
        self.gray = gray
        self.black = black

        n = len(np.asarray(cov))
        if df is None:
            self.md_ref_dist = gstats.chi2(df=n)
        else:
            self.md_ref_dist = gstats.f(dfn=n, dfd=df, scale=(df - 2) * n / df)

    # ------------------------------------------------------------------
    # Error index plots and QQ plots
    # ------------------------------------------------------------------
    def error_plot(self, err, title=None, xlabel='Index', ylabel=None, ax=None):
        import matplotlib.pyplot as plt
        from matplotlib.ticker import MaxNLocator

        if ax is None:
            ax = plt.gca()
        ax.axhline(0, 0, 1, linestyle='-', color=self.black, lw=1, zorder=0)
        sd = float(np.asarray(self.diagnostic.std_udist.std()))
        ax.axhline(-2 * sd, 0, 1, color=self.gray, zorder=0, lw=1)
        ax.axhline(2 * sd, 0, 1, color=self.gray, zorder=0, lw=1)
        index = np.arange(1, self.data.shape[0] + 1)
        size = 8

        err = np.asarray(err)
        if err.ndim == 1:
            err = err[:, None]
        for i, error in enumerate(err.T):
            ax.plot(index, error, ls='', color=self.colors[i],
                    marker=self.markers[i],
                    markeredgecolor=self.markeredgecolors[i],
                    fillstyle=self.markerfillstyles[i], markersize=size,
                    markeredgewidth=0.5)
        ax.xaxis.set_major_locator(MaxNLocator(integer=True))
        ax.set_xlabel(xlabel)
        ax.margins(x=0.05)
        ax.set_ylabel(ylabel)
        ax.set_title(title)
        return ax

    def individual_errors(self, title='Individual Errors', ax=None):
        err = self.diagnostic.individual_errors(self.data)
        return self.error_plot(err, title=title, ax=ax)

    def individual_errors_qq(self, title='Individual QQ Plot', ax=None):
        return self.qq(self.data, self.samples, [0.68, 0.95],
                       self.diagnostic.individual_errors, title=title, ax=ax)

    def cholesky_errors(self, title='Cholesky Errors', ax=None):
        err = self.diagnostic.cholesky_errors(self.data)
        return self.error_plot(err, title=title, ax=ax)

    def cholesky_errors_qq(self, title='Cholesky QQ Plot', ax=None):
        return self.qq(self.data, self.samples, [0.68, 0.95],
                       self.diagnostic.cholesky_errors, title=title, ax=ax)

    def pivoted_cholesky_errors(self, title='Pivoted Cholesky Errors', ax=None):
        err = self.diagnostic.pivoted_cholesky_errors(self.data)
        return self.error_plot(err, title=title, ax=ax)

    def pivoted_cholesky_errors_qq(self, title='Pivoted Cholesky QQ Plot', ax=None):
        return self.qq(self.data, self.samples, [0.68, 0.95],
                       self.diagnostic.pivoted_cholesky_errors, title=title, ax=ax)

    def eigen_errors(self, title='Eigen Errors', ax=None):
        err = self.diagnostic.eigen_errors(self.data)
        return self.error_plot(err, title=title, ax=ax)

    def eigen_errors_qq(self, title='Eigen QQ Plot', ax=None):
        return self.qq(self.data, self.samples, [0.68, 0.95],
                       self.diagnostic.eigen_errors, title=title, ax=ax)

    # ------------------------------------------------------------------
    # Histogram / violin / box renderers
    # ------------------------------------------------------------------
    def hist(self, data, ref, title=None, xlabel=None, ylabel=None, vlines=True,
             ax=None):
        import matplotlib.pyplot as plt

        if ax is None:  # reference has this check after first use of ax — fixed here
            ax = plt.gca()

        if hasattr(ref, 'ppf'):
            lower_95 = float(np.asarray(ref.ppf(0.975)))
            upper_95 = float(np.asarray(ref.ppf(0.025)))
            x = np.linspace(lower_95, upper_95, 100)
            ax.plot(x, np.asarray(ref.pdf(x)), label='ref', color=self.black)
        else:
            ref = np.asarray(ref)
            ref_sd = np.std(ref, ddof=1)
            ref_mean = np.mean(ref)
            lower_95 = ref_mean - 2 * ref_sd
            upper_95 = ref_mean + 2 * ref_sd
            ax.hist(ref, density=1, label='ref', histtype='step', color=self.black)

        ax.axvline(lower_95, 0, 1, color='gray', linestyle='--', label=r'$2\sigma$')
        ax.axvline(upper_95, 0, 1, color='gray', linestyle='--')
        if vlines:
            for c, d in zip(cycle(self.color_cycle), np.atleast_1d(np.asarray(data))):
                ax.axvline(d, 0, 1, zorder=50, **c)
        else:
            ax.hist(np.asarray(data), density=1, label='data', histtype='step')
        ax.legend()
        if title is not None:
            ax.set_title(title)
        if xlabel is not None:
            ax.set_xlabel(xlabel)
        if ylabel is not None:
            ax.set_ylabel(ylabel)
        return ax

    def violin(self, data, ref, title=None, xlabel=None, ylabel=None, ax=None):
        import matplotlib.pyplot as plt
        import pandas as pd
        import seaborn as sns

        if ax is None:
            ax = plt.gca()
        data = np.asarray(data)
        ref = np.asarray(ref)
        nref = len(ref)
        orders = np.arange(len(data))
        zero = np.zeros(len(data), dtype=int)
        nans = np.nan * np.ones(nref)
        fake = np.hstack((np.ones(nref, dtype=bool), np.zeros(nref, dtype=bool)))
        fake_ref = np.hstack((fake[:, None], np.hstack((ref, nans))[:, None]))

        label = 'label_'
        ref_df = pd.DataFrame(fake_ref, columns=['fake', label])
        tidy_data = np.hstack((orders[:, None], data[:, None]))
        data_df = pd.DataFrame(tidy_data, columns=['orders', label])
        sns.violinplot(x=np.zeros(2 * nref, dtype=int), y=label, data=ref_df,
                       color=self.gray, hue='fake', split=True, inner='box', ax=ax)
        with sns.color_palette(self.colors):
            sns.swarmplot(x=zero, y=label, data=data_df, hue='orders', ax=ax)
        ax.set_ylabel(ylabel)
        ax.set_xlabel(xlabel)
        ax.set_title(title)
        ax.set_xlim(-0.05, 0.5)
        return ax

    def box(self, data, ref, title=None, xlabel=None, ylabel=None, trim=True,
            size=8, legend=False, ax=None):
        import matplotlib.pyplot as plt
        import pandas as pd
        import seaborn as sns

        if ax is None:
            ax = plt.gca()

        label = 'labelll'
        data = np.asarray(data)

        if hasattr(ref, 'ppf'):
            gray = 'gray'
            boxartist = self._dist_boxplot(ref, ax=ax, positions=[0],
                                           patch_artist=True, widths=0.8)
            for box_ in boxartist['boxes']:
                box_.update(dict(facecolor='lightgrey', edgecolor=gray))
            for whisk in boxartist['whiskers']:
                whisk.update(dict(color=gray))
            for cap in boxartist['caps']:
                cap.update(dict(color=gray))
            for med in boxartist['medians']:
                med.update(dict(color=gray))
        else:
            ref = np.asarray(ref)
            nref = len(ref)
            ref_df = pd.DataFrame(ref, columns=[label])
            sns.boxplot(x=np.zeros(nref, dtype=int), y=label, data=ref_df,
                        color='lightgrey', ax=ax, fliersize=0,
                        whis=[2.5, 97.5], bootstrap=None)

        n = len(data)
        orders = np.array([r'$c_{{{}}}$'.format(i) for i in range(n)])
        zero = np.zeros(len(data), dtype=int)
        tidy_data = np.array([orders, data], dtype=object).T
        data_df = pd.DataFrame(tidy_data, columns=['orders', label])
        data_df[label] = data_df[label].astype(float)
        with sns.color_palette(self.colors):
            ss = sns.swarmplot(x=zero, y=label, data=data_df, hue='orders',
                               ax=ax, size=size, linewidth=0.5)
            # locate the swarm's point collection (its position in
            # ax.collections varies across seaborn versions)
            swarm = next(c for c in reversed(ss.collections)
                         if len(c.get_offsets()) == len(data))
            positions = np.asarray(swarm.get_offsets())
            swarm.remove()
            _, idx, inv = np.unique(data_df[label].values, return_index=True,
                                    return_inverse=True)
            positions = positions[inv]
        for i, (x, y) in enumerate(positions):
            ax.plot([x], [y], marker=self.markers[i], ls='', markersize=size,
                    zorder=5 + i, c=self.colors[i],
                    fillstyle=self.markerfillstyles[i],
                    markeredgecolor=self.markeredgecolors[i],
                    markeredgewidth=0.5, clip_on=False)

        ax.set_ylabel(ylabel)
        ax.set_xticks([])
        ax.set_xlabel(xlabel)
        ax.set_title(title)
        if legend:
            ax.legend(title=None)
        else:
            leg = ax.get_legend()
            if leg is not None:
                leg.remove()
        sns.despine(offset=0, trim=trim, bottom=True, ax=ax)
        return ax

    @staticmethod
    def _dist_boxplot(dist, q1=0.25, q3=0.75, whislo=0.025, whishi=0.975,
                      label=None, ax=None, other_stats=None, **kwargs):
        """Boxplot stats computed from a (frozen) distribution object."""
        import matplotlib.pyplot as plt

        if ax is None:
            ax = plt.gca()
        stat_dict = [{'med': float(np.asarray(dist.median())),
                      'q1': float(np.asarray(dist.ppf(q1))),
                      'q3': float(np.asarray(dist.ppf(q3))),
                      'whislo': float(np.asarray(dist.ppf(whislo))),
                      'whishi': float(np.asarray(dist.ppf(whishi)))}]
        if label is not None:
            stat_dict[0]['label'] = label
        if other_stats is not None:
            stat_dict = [*stat_dict, *other_stats]
        return ax.bxp(stat_dict, showfliers=False, **kwargs)

    def qq(self, data, ref, band_perc, func, title=None, ax=None):
        import matplotlib.pyplot as plt

        data = np.sort(np.asarray(func(jnp.asarray(data))), axis=0)
        ref = np.sort(np.asarray(func(jnp.asarray(ref))), axis=0)
        bands = np.array([
            np.percentile(ref, [100 * (1. - bi) / 2, 100 * (1. + bi) / 2], axis=1)
            for bi in band_perc])
        n = data.shape[0]
        quants = (np.arange(1, n + 1) - 0.5) / n
        q_theory = np.asarray(self.diagnostic.std_udist.ppf(quants))

        if ax is None:
            ax = plt.gca()

        for i in range(len(band_perc) - 1, -1, -1):
            ax.fill_between(q_theory, bands[i, 0], bands[i, 1], alpha=0.5,
                            color='gray')

        for i, dat in enumerate(data.T):
            ax.plot(q_theory, dat, c=self.colors[i], label=self.labels[i])
        yl, yu = ax.get_ylim()
        xl, xu = ax.get_xlim()
        ax.plot([xl, xu], [xl, xu], c=self.black)
        ax.set_ylim([yl, yu])
        ax.set_xlim([xl, xu])
        if title is not None:
            ax.set_title(title)
        ax.set_xlabel('Theoretical Quantiles')
        ax.set_ylabel('Empirical Quantiles')
        return ax

    # ------------------------------------------------------------------
    # Composite diagnostics
    # ------------------------------------------------------------------
    def md_squared(self, ax=None, type='hist', title='Mahalanobis Distance',
                   xlabel='MD', **kwargs):
        import matplotlib.pyplot as plt

        if ax is None:
            ax = plt.gca()
        md_data = self.diagnostic.md_squared(self.data)
        if type == 'hist':
            return self.hist(md_data, self.md_ref_dist, title=title,
                             xlabel=xlabel, ax=ax, **kwargs)
        elif type == 'box':
            return self.box(md_data, self.md_ref_dist, title=title,
                            xlabel=xlabel, ax=ax, **kwargs)

    def kl(self, X, gp, predict=False, vlines=True, title='KL Divergence',
           xlabel='KL', ax=None):
        R"""KL of refit GPs for data and reference samples.

        reference: diagnostics.py:527-555 (refits the GP once per reference
        sample — the heaviest diagnostic).
        """
        import matplotlib.pyplot as plt

        if ax is None:
            ax = plt.gca()
        ref_means, ref_covs = [], []
        for sample in np.asarray(self.samples).T:
            gp.fit(X, jnp.asarray(sample))
            if predict:
                mean, cov = gp.predict(X, return_cov=True)
            else:
                mean, cov = gp.mean(X), gp.cov(X)
            ref_means.append(mean)
            ref_covs.append(cov)

        data_means, data_covs = [], []
        for data in np.atleast_2d(np.asarray(self.data)).T:
            gp.fit(X, jnp.asarray(data))
            if predict:
                mean, cov = gp.predict(X, return_cov=True)
            else:
                mean, cov = gp.mean(X), gp.cov(X)
            data_means.append(mean)
            data_covs.append(cov)

        kl_ref = [float(np.asarray(self.diagnostic.kl(m, c)))
                  for m, c in zip(ref_means, ref_covs)]
        kl_data = [float(np.asarray(self.diagnostic.kl(m, c)))
                   for m, c in zip(data_means, data_covs)]
        return self.hist(kl_data, kl_ref, title=title, xlabel=xlabel,
                         vlines=vlines, ax=ax)

    def credible_interval(self, intervals, band_perc,
                          title='Credible Interval Diagnostic',
                          xlabel='Credible Interval',
                          ylabel='Empirical Coverage', ax=None, linestyles=None):
        import matplotlib as mpl
        import matplotlib.pyplot as plt

        intervals = np.asarray(intervals)
        dci_data = np.atleast_2d(np.asarray(
            self.diagnostic.credible_interval(self.data, intervals)))
        dci_ref = np.asarray(
            self.diagnostic.credible_interval(self.samples, intervals))
        bands = np.array([
            np.percentile(dci_ref, [100 * (1. - bi) / 2, 100 * (1. + bi) / 2], axis=0)
            for bi in band_perc])
        greys = mpl.colormaps['Greys']
        if ax is None:
            ax = plt.gca()
        band_perc = np.sort(band_perc)
        for i, perc in enumerate(band_perc):
            ax.fill_between(intervals, bands[i, 0], bands[i, 1], alpha=1.,
                            color=greys((len(band_perc) - i) / (len(band_perc) + 2.5)),
                            zorder=-perc)

        ax.plot([0, 1], [0, 1], c=self.black)
        for i, data in enumerate(dci_data):
            ls = None if linestyles is None else linestyles[i]
            ax.plot(intervals, data, color=self.colors[i], ls=ls,
                    label=self.labels[i])
        ax.set_xlim([0, 1])
        ax.set_ylim([0, 1])
        ax.set_ylabel(ylabel)
        ax.set_xlabel(xlabel)
        ax.set_title(title)
        return ax

    def variogram(self, X, title='Variogram', xlabel='Lag', ax=None):
        import matplotlib.pyplot as plt

        y = self.data
        X = np.asarray(X)
        N = len(X)
        nbins = int(np.ceil((N * (N - 1) / 2.) ** (1. / 3)))
        bin_bounds = np.linspace(0, np.max(np.linalg.norm(X, axis=-1)), nbins)
        v, loc, gamma, lower, upper = self.diagnostic.variogram(X, np.asarray(y).T,
                                                               bin_bounds)
        if ax is None:
            ax = plt.gca()
        ax.set_title(title)
        ax.set_xlabel(xlabel)
        gamma, lower, upper = np.asarray(gamma), np.asarray(lower), np.asarray(upper)
        for i in range(gamma.shape[1]):
            ax.plot(loc, gamma[:, i], ls='', marker='o', c=self.colors[i])
            ax.plot(loc, lower[:, i], lw=0.5, c=self.colors[i])
            ax.plot(loc, upper[:, i], lw=0.5, c=self.colors[i])
        return ax

    def plotzilla(self, X, gp=None, predict=False, vlines=True):
        R"""Everything-at-once diagnostic dashboard.  reference: diagnostics.py:604-624."""
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(4, 3, figsize=(12, 12))
        self.md_squared(vlines=vlines, ax=axes[0, 0])
        if gp is not None:
            self.kl(X, gp, predict, vlines=vlines, ax=axes[0, 1])
        self.credible_interval(np.linspace(0, 1, 101), [0.68, 0.95], ax=axes[0, 2])
        self.individual_errors(ax=axes[1, 0])
        self.individual_errors_qq(ax=axes[2, 0])
        self.cholesky_errors(ax=axes[1, 1])
        self.cholesky_errors_qq(ax=axes[2, 1])
        self.eigen_errors(ax=axes[1, 2])
        self.eigen_errors_qq(ax=axes[2, 2])
        self.pivoted_cholesky_errors(ax=axes[3, 0])
        self.pivoted_cholesky_errors_qq(ax=axes[3, 1])
        fig.tight_layout()
        return fig, axes

    def essentials(self, vlines=True, bare=False):
        R"""The three core diagnostics (MD², pivoted-Cholesky errors, CI coverage).

        reference: diagnostics.py:626-669.
        """
        import matplotlib.pyplot as plt

        if bare:
            fig, axes = plt.subplots(1, 3, figsize=(7, 3))
            self.md_squared(vlines=vlines, ax=axes[0])
            self.pivoted_cholesky_errors(ax=axes[1])
            self.credible_interval(np.linspace(0, 1, 101), [0.68, 0.95], ax=axes[2])
            axes[0].set_title('')
            axes[0].legend(title=r'$\mathrm{D}_{\mathrm{MD}}$')
            axes[0].set_ylabel('')
            axes[0].set_yticks([])
            axes[1].set_yticks([])
            axes[1].legend(title=r'$\mathrm{D}_{\mathrm{PC}}$')
            axes[1].set_title('')
            axes[1].set_ylabel('')
            axes[2].set_title('')
            axes[2].set_ylabel('')
            axes[2].set_xticks([0, 0.5, 1])
            axes[2].set_xticklabels(['0', '0.5', '1'])
            axes[2].yaxis.tick_right()
            axes[2].text(0.05, 0.94, r'$\mathrm{D}_{\mathrm{CI}}$',
                         transform=axes[2].transAxes, verticalalignment='top',
                         bbox=dict(boxstyle='round', facecolor='white',
                                   alpha=0.5, ec='grey'))
            fig.tight_layout(h_pad=0.01, w_pad=0.1)
        else:
            fig, axes = plt.subplots(2, 3, figsize=(12, 6))
            self.md_squared(vlines=vlines, ax=axes[0, 0])
            self.credible_interval(np.linspace(0, 1, 101), [0.68, 0.95], ax=axes[1, 0])
            self.eigen_errors(ax=axes[0, 1])
            self.eigen_errors_qq(ax=axes[1, 1])
            self.pivoted_cholesky_errors(ax=axes[0, 2])
            self.pivoted_cholesky_errors_qq(ax=axes[1, 2])
            fig.tight_layout()
        return fig, axes
