R"""Joint (length-scale, breakdown-scale) posterior by HMC.

The reference's flagship hyperparameter study is the (Q, ls) joint
posterior of ``correlated_EFT_publication.ipynb`` cell 53: an 80x100 grid
of 8000 sequential ``TruncationGP.log_marginal_likelihood`` calls
(reference models.py:1485-1507 supplies the change-of-variables factor
that makes the density over the expansion parameter proper).  This script
runs the same posterior on real NN total-cross-section data two ways and
overlays them:

1. ``gsum_tpu.sample_truncation_posterior`` — multi-chain HMC with the
   truncation model's own lml (coefficient extraction included) traced
   end-to-end as the target, all chains in ONE jitted scan program;
2. ``gsum_tpu.parallel.truncation_lml_grid`` — the whole (theta, ratio)
   surface as one batched device program, quadrature-normalized.

The two implementations share no code path past the model definition, so
their agreement cross-validates both (the suite asserts it numerically:
tests/test_sample.py and tests/test_notebook_flows.py).

Run:  python examples/hyperparameter_posterior.py [--data path.csv] [--out dir]
"""
import argparse
import os
import sys
import time

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax.numpy as jnp  # noqa: E402

import gsum_tpu as gm  # noqa: E402
from gsum_tpu.parallel import truncation_lml_grid  # noqa: E402

DEFAULT_DATA = '/root/reference/examples/data/cross_sec_kvnn_41.csv'
LAMBDA_REF = 600.0   # MeV — the breakdown scale the data's Q column assumes


def load(path):
    """15 energies of np total-cross-section partial sums (orders 0,2..5)."""
    import pandas as pd

    df = pd.read_csv(path)
    sub = df[df['theta'] == 0].iloc[4:64:4]
    orders = np.array([0, 2, 3, 4, 5])
    y = sub[['0', '2', '3', '4', '5']].to_numpy()
    Q = sub['Q'].to_numpy()
    E = sub['Energy'].to_numpy()
    X = (E / E.max())[:, None]
    return X, y, orders, Q, y[:, 0].copy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default=DEFAULT_DATA)
    ap.add_argument('--out', default='.')
    ap.add_argument('--n-samples', type=int, default=2000)
    ap.add_argument('--n-chains', type=int, default=4)
    ap.add_argument('--fast', action='store_true',
                    help='tiny sizes for the suite smoke test')
    args = ap.parse_args()

    X, y, orders, Q, ref_scale = load(args.data)
    n_warmup, thin = 500, 4
    if args.fast:
        args.n_samples, args.n_chains, n_warmup, thin = 16, 2, 16, 8
        X, y, Q = X[::3], y[::3], Q[::3]
    Qbar = float(np.mean(Q))

    # lam rescales the breakdown: Q(lam) = Q(600 MeV) / lam, so the sampled
    # lam is Lambda_b / 600.  The 1/Lambda_b prior of the reference's
    # Lambda_b studies enters through extra_log_prior.
    def ratio_fn(X_, lam=1.0):
        return jnp.full(X_.shape[0], Qbar / lam)

    tgp = gm.TruncationGP(kernel=gm.RBF(0.5, (0.05, 3.0)),
                          ratio=ratio_fn, ref=float(np.mean(ref_scale)),
                          center=0, disp=0, df=3, scale=1, nugget=1e-8,
                          optimizer=None)
    tgp.fit(X, y, orders=orders)

    lam_lo, lam_hi = 0.6, 2.0
    t0 = time.perf_counter()
    samples, info = gm.sample_truncation_posterior(
        tgp, ratio_param='lam', q_bounds=(lam_lo, lam_hi),
        n_chains=args.n_chains, n_samples=args.n_samples, n_warmup=n_warmup,
        random_state=0, extra_log_prior=lambda x: -jnp.log(x[-1]))
    s = np.asarray(samples).reshape(-1, 2)
    ls_s, lam_s = np.exp(s[:, 0]), s[:, 1]
    t_hmc = time.perf_counter() - t0
    print('HMC: %d chains x %d samples in %.1f s  accept=%s  rhat=%s  ess=%s'
          % (args.n_chains, args.n_samples, t_hmc,
             np.round(info['accept_rate'], 3), np.round(info['rhat'], 4),
             np.round(info['ess'], 0)))
    print('posterior medians: ls = %.3f,  Lambda_b = %.0f MeV'
          % (np.median(ls_s), LAMBDA_REF * np.median(lam_s)))

    # ---- the same density as one batched grid program ------------------
    t0 = time.perf_counter()
    T, R = (6, 7) if args.fast else (80, 81)
    th_grid = np.linspace(np.log(0.05), np.log(3.0), T)
    lam_grid = np.linspace(lam_lo, lam_hi, R)
    ratios = np.stack([np.full(X.shape[0], Qbar / lam) for lam in lam_grid])
    surf = np.asarray(truncation_lml_grid(
        gm.RBF(0.5, (0.05, 3.0)), X, y, orders, ratios, th_grid[:, None],
        ref=float(np.mean(ref_scale)), center=0, disp=0, df=3, scale=1,
        nugget=1e-8))
    logpost = surf - np.log(lam_grid)[None, :]        # 1/Lambda_b prior
    post = np.exp(logpost - logpost.max())
    t_grid = time.perf_counter() - t0
    print('grid: %d lml evaluations in %.1f s (one device program; the '
          'reference loops %d Python calls)' % (T * R, t_grid, T * R))

    # quadrature marginals for the overlay
    p_lam = np.trapezoid(post, th_grid, axis=0)
    p_lam /= np.trapezoid(p_lam, lam_grid)
    p_ls_log = np.trapezoid(post, lam_grid, axis=1)
    p_ls_log /= np.trapezoid(p_ls_log, th_grid)

    # ---- full-Bayes truncation band: mix the band over the joint draws --
    # The fixed-point band conditions on one (ls, Lambda_b); the posterior
    # predictive re-extracts coefficients and recomputes the conjugate
    # posterior at EVERY draw (device-batched) and mixes the bands by the
    # law of total variance, so hyperparameter + breakdown-scale
    # uncertainty is inside the band.
    k_fit = orders.max()
    n_f = 12 if args.fast else 60
    Xf = np.linspace(float(X.min()), float(X.max()), n_f)[:, None]
    t0 = time.perf_counter()
    mean_fb, std_fb = gm.truncation_posterior_predictive(
        tgp, Xf, k_fit, samples, ratio_param='lam', thin=thin)
    mean_fb, std_fb = np.asarray(mean_fb), np.asarray(std_fb)
    print('posterior predictive: %d draws mixed in %.1f s'
          % (s[::thin].shape[0], time.perf_counter() - t0))
    m_map, s_map = tgp.predict(Xf, order=k_fit, kind='trunc',
                               return_std=True)
    m_map, s_map = np.asarray(m_map), np.asarray(s_map)

    fig, axes = plt.subplots(1, 4, figsize=(15.5, 3.4))
    axes[0].hist2d(ls_s, lam_s, bins=60, cmap='Blues')
    axes[0].contour(np.exp(th_grid), lam_grid, post.T, levels=5,
                    colors='k', linewidths=0.7)
    axes[0].set_xlabel('length scale')
    axes[0].set_ylabel(r'$\Lambda_b / %.0f$ MeV' % LAMBDA_REF)
    axes[0].set_title('HMC samples + grid contours')

    axes[1].hist(lam_s, bins=60, density=True, alpha=0.6, label='HMC')
    axes[1].plot(lam_grid, p_lam, 'k-', label='grid quadrature')
    axes[1].set_xlabel(r'$\Lambda_b / %.0f$ MeV' % LAMBDA_REF)
    axes[1].legend()

    # HMC ls marginal in log space against the grid's log-space density
    axes[2].hist(s[:, 0], bins=60, density=True, alpha=0.6, label='HMC')
    axes[2].plot(th_grid, p_ls_log, 'k-', label='grid quadrature')
    axes[2].set_xlabel(r'$\log$ length scale')
    axes[2].legend()

    # truncation-error band y_inf - y_k: fixed-point vs full-Bayes
    xf = Xf[:, 0]
    axes[3].plot(xf, m_map, 'C0-', lw=1)
    axes[3].fill_between(xf, m_map - 2 * s_map, m_map + 2 * s_map,
                         color='C0', alpha=0.25, label='fixed (ls, $\\Lambda_b$)')
    axes[3].fill_between(xf, mean_fb - 2 * std_fb, mean_fb + 2 * std_fb,
                         color='C3', alpha=0.2, label='full Bayes')
    axes[3].set_xlabel(r'$E/E_{\max}$')
    axes[3].set_title(r'truncation band $y_\infty - y_%d$' % k_fit)
    axes[3].legend(fontsize=7)

    fig.tight_layout()
    out = os.path.join(args.out, 'hyperparameter_posterior.png')
    fig.savefig(out, dpi=120)
    print('wrote', out)


if __name__ == '__main__':
    main()
