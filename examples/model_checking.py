R"""Model-checking diagnostics: detecting misspecified GP hyperparameters.

Reproduces the flow of the reference's ``diagnostic_explorations.ipynb``
and ``examples/model_checking_tests.ipynb`` (Bastos & O'Hagan diagnostics):

1. the squared Mahalanobis distance of GP/TP samples follows its analytic
   reference distribution (chi^2 for a GP, scaled-F for a TP);
2. decomposed errors (Cholesky / pivoted-Cholesky / eigen) of curves drawn
   with WRONG hyperparameters blow past the +-2 sigma band, while curves
   from the correct model stay inside — the working criterion for length
   scale and marginal-variance checking;
3. the ``GraphicalDiagnostic`` dashboards (``essentials``/``plotzilla``)
   summarize all of it per model.

All band/quantile computations run device-side in batches
(`gsum_tpu.viz`); matplotlib only draws the final arrays.

Run:  python examples/model_checking.py [--out dir]
"""
import argparse
import os
import sys

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import gsum_tpu as gm  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='/tmp/gsum_tpu_example')
    ap.add_argument('--fast', action='store_true',
                    help='tiny sizes for the suite smoke test')
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # ------------------------------------------------------------------
    # 1. MD^2 sampling distributions: chi^2 (GP) and scaled F (TP)
    # ------------------------------------------------------------------
    n, df, n_samples = (12, 4, 300) if args.fast else (20, 4, 4000)
    X = np.linspace(0, 1, n)[:, None]
    mean = np.zeros(n)
    cov = np.asarray((gm.RBF(0.05) + gm.WhiteKernel(1e-6, 'fixed'))(X))

    fig, axes = plt.subplots(1, 2, figsize=(8, 3))
    md_vals = np.linspace(0, 3 * n, 200)
    for ax, use_df, title in [(axes[0], None, r'GP: $\chi^2_n$'),
                              (axes[1], df, r'TP: scaled $F$')]:
        dgn = gm.Diagnostic(mean, cov, df=use_df)
        samples = np.asarray(dgn.samples(n_samples))
        md = np.asarray(dgn.md_squared(samples))
        if use_df is None:
            ref_pdf = np.asarray(gm.stats.chi2(n).pdf(md_vals))
        else:
            ref_pdf = np.asarray(
                gm.stats.f(n, df, scale=(df - 2) * n / df).pdf(md_vals))
        ax.hist(md, density=True, bins=40, range=(0, 3 * n),
                alpha=0.6, label='empirical')
        ax.plot(md_vals, ref_pdf, 'k', label='analytic')
        ax.set_title(title)
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, 'md_squared_reference.png'), dpi=100)
    print('saved md_squared_reference.png')

    # ------------------------------------------------------------------
    # 2. Error decompositions flag wrong hyperparameters
    # ------------------------------------------------------------------
    ls, noise = 0.8, 1e-5
    n_dec, n_curves = (61, 4) if args.fast else (151, 6)
    X_dec = np.linspace(0, 3, n_dec)[:, None]
    test_mask = np.arange(n_dec) % 12 == 0
    gp_kwargs = dict(center=0, disp=0, df=np.inf, scale=1, optimizer=None)
    model_kernel = gm.RBF(ls, 'fixed') + gm.WhiteKernel(noise, 'fixed')

    cases = [('correct', ls, 1.0),
             ('short length scale', 0.5 * ls, 1.0),
             ('small variance', ls, 0.5)]
    fig, axes = plt.subplots(len(cases), 3, figsize=(10, 7.5))
    for row, (label, ls_true, sd_true) in enumerate(cases):
        true_kernel = (gm.ConstantKernel(sd_true ** 2, 'fixed')
                       * gm.RBF(ls_true, 'fixed')
                       + gm.WhiteKernel(noise, 'fixed'))
        sampler = gm.ConjugateGaussianProcess(true_kernel, **gp_kwargs)
        data = np.asarray(sampler.sample_y(X_dec, n_curves, random_state=3))

        # diagnose AGAINST the assumed model at the validation points
        gp = gm.ConjugateGaussianProcess(model_kernel, **gp_kwargs)
        mean_d = np.zeros(test_mask.sum())
        cov_d = np.asarray(gp.cov(X_dec[test_mask]))
        gd = gm.GraphicalDiagnostic(data[test_mask], mean_d, cov_d,
                                    nref=50 if args.fast else 400)

        axes[row, 0].plot(X_dec.ravel(), data, lw=0.8)
        axes[row, 0].set_title(f'{label}: curves', fontsize=9)
        gd.cholesky_errors(ax=axes[row, 1], title=f'{label}: Cholesky errors')
        gd.pivoted_cholesky_errors(ax=axes[row, 2],
                                   title=f'{label}: pivoted Cholesky')
        frac_out = float(np.mean(np.abs(np.asarray(
            gd.diagnostic.cholesky_errors(data[test_mask]))) > 2))
        print(f'{label:>20s}: {100 * frac_out:5.1f}% of whitened errors '
              f'outside +-2 (expect ~5% when correct)')
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, 'misspecification.png'), dpi=100)
    print('saved misspecification.png')

    # ------------------------------------------------------------------
    # 3. Full dashboards
    # ------------------------------------------------------------------
    gp = gm.ConjugateGaussianProcess(model_kernel, **gp_kwargs)
    data = np.asarray(gp.sample_y(X_dec, n_curves, random_state=3))
    mean_d = np.zeros(test_mask.sum())
    cov_d = np.asarray(gp.cov(X_dec[test_mask]))
    gd = gm.GraphicalDiagnostic(data[test_mask], mean_d, cov_d,
                                nref=50 if args.fast else 400)
    fig, _ = gd.essentials()
    fig.savefig(os.path.join(args.out, 'essentials.png'), dpi=100)
    fig, _ = gd.plotzilla(X_dec[test_mask])
    fig.savefig(os.path.join(args.out, 'plotzilla.png'), dpi=100)
    print('saved essentials.png, plotzilla.png')


if __name__ == '__main__':
    main()
