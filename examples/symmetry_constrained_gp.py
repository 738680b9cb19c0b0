R"""Truncation errors under symmetry constraints.

Reproduces the flow of the reference's ``correlated_EFT_publication.ipynb``
cells 24-27 (arXiv:1904.10581 Fig. 5): observable coefficients that are
known to vanish at the domain endpoints (a symmetry constraint) are drawn
from a GP conditioned on those zeros; the truncation-error model is then
fit with the same constraint passed as ``(dX, dy)``, so the predicted
truncation bands pinch to zero exactly where the symmetry forces them to.

Run:  python examples/symmetry_constrained_gp.py [--out dir]
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

    ratio = 0.5
    n_orders = 4
    orders = np.arange(n_orders)
    x = np.linspace(0, 1, 30 if args.fast else 50)
    X = x[:, None]
    kernel = gm.RBF(0.25) + gm.WhiteKernel(1e-7, 'fixed')

    # --- draw coefficient curves that vanish at x = 0 and x = 1 ----------
    # (condition the sampling GP on zeros at the endpoints)
    dX = np.array([[0.0], [1.0]])
    dy = np.zeros(2)
    sampler = gm.ConjugateGaussianProcess(kernel=kernel, optimizer=None)
    sampler.fit(dX, dy)
    cn = np.asarray(sampler.sample_y(X, n_samples=n_orders, random_state=5))
    yn = np.asarray(gm.partials(cn, ratio=ratio))

    # --- fit the truncation model WITH the symmetry constraint -----------
    # df=inf: fixed marginal variance, as in the publication figure
    tgp = gm.TruncationGP(kernel=kernel, ref=1, ratio=ratio, disp=0,
                          df=np.inf, scale=1, optimizer=None)
    tgp.fit(X[::10], yn[::10], orders=orders, dX=dX, dy=dy)

    # and WITHOUT it, for contrast
    tgp_free = gm.TruncationGP(kernel=kernel, ref=1, ratio=ratio, disp=0,
                               df=np.inf, scale=1, optimizer=None)
    tgp_free.fit(X[::10], yn[::10], orders=orders)

    fig, axes = plt.subplots(2, 2, sharex=True, sharey=True,
                             figsize=(6.5, 5.0))
    colors = plt.cm.viridis(np.linspace(0, 0.85, n_orders))
    for i, n in enumerate(orders):
        _, std_sym = tgp.predict(X, order=int(n), return_std=True,
                                 kind='trunc')
        _, std_free = tgp_free.predict(X, order=int(n), return_std=True,
                                       kind='trunc')
        std_sym, std_free = np.asarray(std_sym), np.asarray(std_free)
        assert std_sym[0] < 1e-6 and std_sym[-1] < 1e-6, \
            'constrained band must vanish at the symmetry points'

        for j in range(i, n_orders):
            ax = axes.ravel()[j]
            ax.plot(x, yn[:, i], zorder=i - 5, c=colors[i], lw=1)
            ax.fill_between(x, yn[:, i] - 2 * std_sym, yn[:, i] + 2 * std_sym,
                            zorder=i - 5, facecolor=colors[i], alpha=0.25)
        ax = axes.ravel()[i]
        ax.plot(x, yn[:, i] + 2 * std_free, c='gray', ls=':', lw=0.8)
        ax.plot(x, yn[:, i] - 2 * std_free, c='gray', ls=':', lw=0.8)
        ax.axhline(0, 0, 1, ls='--', lw=0.5, c='k', zorder=0)
        ax.set_title(f'order {n}', fontsize=9)
    fig.suptitle('Truncation bands with endpoint symmetry constraints\n'
                 '(dotted: unconstrained bands)')
    fig.tight_layout()
    out = os.path.join(args.out, 'symmetry_constrained_bands.png')
    fig.savefig(out, dpi=100)
    print(f'saved {out}')
    print('constrained band at x=0:', float(np.asarray(
        tgp.predict(X, order=1, return_std=True, kind="trunc")[1][0])),
        '(vanishes by construction)')

    # --- derivative constraints (beyond the reference) -------------------
    # An even observable about x=0 has zero SLOPE there, not zero value.
    # dderivs=[[1]] conditions the truncation error on d/dx = 0 at x=0
    # (gsum_tpu.derivs: autodiff derivative cross-covariances; the
    # reference only prototypes this in examples/Constraints.ipynb).
    tgp_slope = gm.TruncationGP(kernel=kernel, ref=1, ratio=ratio, disp=0,
                                df=np.inf, scale=1, optimizer=None)
    tgp_slope.fit(X[::10], yn[::10], orders=orders,
                  dX=np.array([[0.0]]), dy=np.array([0.0]),
                  dderivs=np.array([[1]]))
    m_s, std_s = tgp_slope.predict(X, order=2, return_std=True, kind='trunc')
    m_s, std_s = np.asarray(m_s), np.asarray(std_s)
    # the band is flat at x=0 (zero mean slope) but does NOT vanish there
    slope0 = (m_s[1] - m_s[0]) / (x[1] - x[0])
    print('slope-constrained trunc band: mean slope at 0 ~ %.2e, '
          'std at 0 = %.3f (nonzero)' % (slope0, std_s[0]))

    fig2, ax2 = plt.subplots(figsize=(4.5, 3.0))
    ax2.fill_between(x, -2 * std_s, 2 * std_s, alpha=0.3,
                     label='slope pinned at 0')
    _, std_v = tgp.predict(X, order=2, return_std=True, kind='trunc')
    ax2.fill_between(x, -2 * np.asarray(std_v), 2 * np.asarray(std_v),
                     alpha=0.3, label='value pinned at 0, 1')
    ax2.legend(fontsize=8)
    ax2.set_title('Derivative vs value constraints on the truncation error',
                  fontsize=9)
    fig2.tight_layout()
    out2 = os.path.join(args.out, 'derivative_constrained_bands.png')
    fig2.savefig(out2, dpi=100)
    print(f'saved {out2}')

    # --- derivative TRAINING data (beyond the reference) ------------------
    # fit(X, y, dorders=...): observation rows may be derivatives of the
    # process itself.  Sparse values + slopes recover the curve far better
    # than sparse values alone, with MAP length-scale calibration running
    # through the same derivative-aware lml.
    f = lambda t: np.sin(2 * np.pi * t)  # noqa: E731
    fp = lambda t: 2 * np.pi * np.cos(2 * np.pi * t)  # noqa: E731
    Xv = np.linspace(0, 1, 5)[:, None]
    Xd = np.linspace(0.1, 0.9, 5)[:, None]
    Xt = np.vstack([Xv, Xd])
    yt = np.concatenate([f(Xv[:, 0]), fp(Xd[:, 0])])
    dorders = np.concatenate([np.zeros(5, int), np.ones(5, int)])

    gp_vd = gm.ConjugateGaussianProcess(
        kernel=gm.RBF(0.3, (0.05, 2.0)), center=0, disp=0, df=np.inf,
        scale=1, nugget=1e-10)
    gp_vd.fit(Xt, yt, dorders=dorders)
    gp_v = gm.ConjugateGaussianProcess(
        kernel=gm.RBF(0.3, (0.05, 2.0)), center=0, disp=0, df=np.inf,
        scale=1, nugget=1e-10)
    gp_v.fit(Xv, f(Xv[:, 0]))

    m_vd, s_vd = (np.asarray(a) for a in gp_vd.predict(X, return_std=True))
    m_v, s_v = (np.asarray(a) for a in gp_v.predict(X, return_std=True))
    err_vd = float(np.max(np.abs(m_vd - f(x))))
    err_v = float(np.max(np.abs(m_v - f(x))))
    print('derivative training data: max |err| %.2e (values+slopes) vs '
          '%.2e (values only)' % (err_vd, err_v))
    assert err_vd < err_v, 'slope observations must tighten the fit'

    fig3, ax3 = plt.subplots(figsize=(4.5, 3.0))
    ax3.plot(x, f(x), 'k--', lw=0.8, label='truth')
    ax3.plot(x, m_v, c='C1', lw=1)
    ax3.fill_between(x, m_v - 2 * s_v, m_v + 2 * s_v, color='C1', alpha=0.25,
                     label='5 values')
    ax3.plot(x, m_vd, c='C0', lw=1)
    ax3.fill_between(x, m_vd - 2 * s_vd, m_vd + 2 * s_vd, color='C0',
                     alpha=0.35, label='5 values + 5 slopes')
    ax3.plot(Xv[:, 0], f(Xv[:, 0]), 'ko', ms=4)
    ax3.legend(fontsize=8)
    ax3.set_title('GP regression with derivative training data '
                  '(fit(dorders=))', fontsize=9)
    fig3.tight_layout()
    out3 = os.path.join(args.out, 'derivative_training_data.png')
    fig3.savefig(out3, dpi=100)
    print(f'saved {out3}')


if __name__ == '__main__':
    main()
